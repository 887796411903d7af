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


def main() -> None:
    scene_path = sys.argv[1] if len(sys.argv) > 1 else "scenes/showcase.obj"
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
    grid = device_cluster_grid(
        build_clusters(scene.triangles, scene.mat_ids, cluster_size=128)
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
    misc = mk.pack_misc(lights)

    def timed(label, max_iters, debug):
        os.environ["CMR_MEGA_DEBUG"] = debug
        mk.trace_paths_mega.clear_cache()
        st = mk.fresh_state(org, d, rng)
        out = mk.trace_paths_mega(
            grid, media9, misc, st,
            background=arrays.background, max_depth=o.max_depth,
            rr_depth=o.rr_depth, nee_max_media=o.nee_max_media,
            max_iters=max_iters,
        )
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = mk.trace_paths_mega(
                grid, media9, misc, st,
                background=arrays.background, max_depth=o.max_depth,
                rr_depth=o.rr_depth, nee_max_media=o.nee_max_media,
                max_iters=max_iters,
            )
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        alive = int(np.sum(np.asarray(out.alive)))
        print(
            f"{label:28s} iters={max_iters:2d} debug={debug or '-':8s} "
            f"{best * 1e3:8.2f} ms  live_after={alive}"
        )
        return best

    n_blocks = (r + 1023) // 1024
    print(f"lanes={r} blocks={n_blocks}")
    t1_full = timed("1 bounce, full", 1, "")
    t1_full2 = timed("1 bounce, full (repeat)", 1, "")
    t1_lin = timed("1 bounce, linear trav", 1, "lin")
    t1_none = timed("1 bounce, no NEE+dist", 1, "nonee,nodist")
    t1_lin_none = timed("1 bounce, lin+no NEE+dist", 1, "lin,nonee,nodist")
    t32 = timed("to death, full", 32, "")
    t32_lin = timed("to death, linear trav", 32, "lin")

    # Round-1 standalone tracer on the same camera rays, for reference.
    from complex_materials_renderer_tpu.kernels.pallas_trace import (
        trace_shaded_clusters,
    )

    sh = trace_shaded_clusters(org, d, grid, 1e-4, 1e4)
    jax.block_until_ready(sh.t)
    t0 = time.perf_counter()
    sh = trace_shaded_clusters(org, d, grid, 1e-4, 1e4)
    jax.block_until_ready(sh.t)
    t_r1 = time.perf_counter() - t0
    print(f"round-1 pallas_trace full-payload trace: {t_r1 * 1e3:8.2f} ms")
    os.environ.pop("CMR_MEGA_DEBUG", None)


if __name__ == "__main__":
    main()
