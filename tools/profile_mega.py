"""Decompose megakernel cost on the real chip.

Times single capped kernel invocations on fresh camera rays with the
CMR_MEGA_DEBUG ablations (nonee / nodist) to attribute per-bounce cost to
the main traverse + physics, the distance trace, and the NEE march.

Usage: python tools/profile_mega.py [scene] [res]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


# Reference-scene shorthands resolve against CMR_REF_SCENES (defaulting
# to the conventional reference checkout); a shorthand whose target is
# missing falls through as a literal path argument.
_REF_DIR = os.environ.get(
    "CMR_REF_SCENES", "/root/reference/resources/scenes"
)
SHORTHANDS = {
    name: os.path.join(_REF_DIR, f"{name}.obj")
    for name in ("cup", "gem_corner", "stanford_dragon")
}
SHORTHANDS = {k: v for k, v in SHORTHANDS.items() if os.path.exists(v)}


def main() -> None:
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/showcase.obj"
    scene_path = SHORTHANDS.get(scene_path, scene_path)
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax
    import jax.numpy as jnp

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene
    from complex_materials_renderer_tpu.accel.clusters import build_clusters
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        device_cluster_grid,
    )
    from complex_materials_renderer_tpu.kernels import megakernel as mk
    from complex_materials_renderer_tpu.ops import rng as rng_ops
    from complex_materials_renderer_tpu.ops.camera import make_camera, generate_rays
    from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
    from complex_materials_renderer_tpu.render.integrator import Lights
    from complex_materials_renderer_tpu.render.megarender import _tile_perm

    opt = RenderOptions()
    opt.obj_path = scene_path
    scene = load_scene(opt.obj_path, opt)
    o = scene.options
    quads = os.environ.get("CMR_PROFILE_QUADS", "auto") != "off"
    grid = device_cluster_grid(
        build_clusters(
            scene.triangles, scene.mat_ids, cluster_size=128, quads=quads
        )
    )
    arrays = make_scene_arrays(
        scene.triangles, scene.mat_ids, scene.media, o.scale, o.background
    )
    camera = make_camera(o.camera_pos, o.camera_look_at, o.camera_fov)
    lights = Lights(
        position=jnp.asarray(o.light_pos, jnp.float32),
        intensity=jnp.asarray(o.light_color, jnp.float32)
        * jnp.float32(o.light_intensity),
    )
    print(
        f"scene={scene_path} tris={scene.triangles.shape[0]} "
        f"clusters={grid.num_clusters} supers={grid.num_supers}"
    )

    r = res * res
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    pixel_xy = jnp.asarray(
        np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1), jnp.int32
    )
    perm, _ = _tile_perm(res, res)
    pixel_xy = jnp.take(pixel_xy, jnp.asarray(perm), axis=0)
    linear = pixel_xy[:, 1] * res + pixel_xy[:, 0]
    rng = rng_ops.seed_counter(linear, jnp.uint32(0))
    rng, j1 = rng_ops.next_float(rng)
    rng, j2 = rng_ops.next_float(rng)
    org, d = generate_rays(camera, pixel_xy, jnp.stack([j1, j2], -1), (res, res))

    media9 = mk.pack_media(arrays.media, arrays.scale)
    misc = mk.pack_misc(lights, arrays.world_lo, arrays.world_hi)

    def timed(label, max_iters, debug, chain=1):
        """Time ``chain`` state-chained kernel calls inside ONE jit (the
        host<->axon round trip is ~26 ms per Python-level call, so only
        in-jit slopes measure device time)."""
        from functools import partial as _p

        @_p(jax.jit, static_argnames=("n",))
        def run(st, n):
            def body(s, _):
                s2 = mk.trace_paths_mega(
                    grid, media9, misc, s,
                    background=arrays.background, max_depth=o.max_depth,
                    rr_depth=o.rr_depth, nee_max_media=o.nee_max_media,
                    max_iters=max_iters, debug=debug,
                )
                return s2, None
            st, _ = jax.lax.scan(body, st, None, length=n)
            return st

        st = mk.fresh_state(org, d, rng)
        out = run(st, chain)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(st, chain)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        alive = int(np.sum(np.asarray(out.alive)))
        print(
            f"{label:30s} iters={max_iters:2d}x{chain} debug={debug or '-':18s} "
            f"{best * 1e3:8.2f} ms  live_after={alive}"
        )
        return best

    n_blocks = (r + 1023) // 1024
    print(f"lanes={r} blocks={n_blocks}")
    # NB 'nonee'/'nodist' imply the SEPARATE-walks path (fusion needs
    # both traces), so their deltas are taken against the 'nofuse'
    # baseline; the fused dnee walk's cost comes from the both-off delta
    # against the fused default.
    t1 = timed("1 bounce, full (fused)", 1, "", chain=1)
    t5 = timed("5 bounces, full (fused)", 1, "", chain=5)
    t5_nofuse = timed("5 bounces, separate walks", 1, "nofuse", chain=5)
    t5_nonee = timed("5 bounces, no NEE", 1, "nonee", chain=5)
    t5_nodist = timed("5 bounces, no dist", 1, "nodist", chain=5)
    t5_both = timed("5 bounces, no dist+NEE", 1, "nonee,nodist", chain=5)
    t5_cull = timed("5 bounces, cull-only walks", 1, "cullonly", chain=5)
    t5_notr = timed("5 bounces, phys only", 1, "notrace,nonee,nodist", chain=5)
    t5_off = timed("5 bounces, all off", 1, "notrace,nonee,nodist,nophys", chain=5)
    per = (t5 - t1) / 4
    print(
        f"\ndevice-time slopes (bounces 1-4, {n_blocks} blocks):\n"
        f"  full bounce (fused)   : {per * 1e3:7.2f} ms\n"
        f"  - fused dnee walk     : {(t5 - t5_both) / 4 * 1e3:7.2f} ms\n"
        f"  - fusion gain vs sep  : {(t5_nofuse - t5) / 4 * 1e3:7.2f} ms\n"
        f"  - sep NEE march       : {(t5_nofuse - t5_nonee) / 4 * 1e3:7.2f} ms\n"
        f"  - sep dist trace      : {(t5_nofuse - t5_nodist) / 4 * 1e3:7.2f} ms\n"
        f"  - main traverse       : {(t5_both - t5_notr) / 4 * 1e3:7.2f} ms\n"
        f"  - physics             : {(t5_notr - t5_off) / 4 * 1e3:7.2f} ms\n"
        f"  - walk culls/scaffold (cullonly-physonly): {(t5_cull - t5_notr) / 4 * 1e3:7.2f} ms\n"
        f"  - walk visit arithmetic (full-cullonly)  : {(t5 - t5_cull) / 4 * 1e3:7.2f} ms\n"
        f"  - loop scaffold       : {(t5_off - t1) / 4 * 1e3:7.2f} ms"
    )


if __name__ == "__main__":
    main()
