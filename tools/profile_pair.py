"""Chip profile: trace_pairs stage costs on real cup camera rays.

Times one full 'full'-payload trace on a 65536-lane bounce-0 wavefront
(and the dist/nee shapes), slope-timed across chained repeats with
scalar-fetch sync (block_until_ready does not wait through the axon
tunnel — NOTES round 4c). Knob sweeps: list_len, chunk_blocks, max_gens
(max_gens=1 is WRONG results, only a cost bound for the generation
loop's share).

Run: python tools/profile_pair.py [scene] [payload]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.config import RenderOptions
from complex_materials_renderer_tpu.kernels.megakernel import pack_media
from complex_materials_renderer_tpu.kernels.pairsweep import trace_pairs
from complex_materials_renderer_tpu.kernels.binned_trace import trace_binned
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
)
from complex_materials_renderer_tpu.ops import rng as rng_ops
from complex_materials_renderer_tpu.ops.camera import generate_rays, make_camera
from complex_materials_renderer_tpu.scene import load_scene

SHORT = {
    "cup": "/root/reference/resources/scenes/cup.obj",
    "showcase": "/root/repo/scenes/showcase.obj",
}


def timed(f, *args):
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    return time.perf_counter() - t0


def main():
    scene_arg = sys.argv[1] if len(sys.argv) > 1 else "cup"
    obj = SHORT.get(scene_arg, scene_arg)
    opt = RenderOptions()
    opt.obj_path = obj
    opt.width = opt.height = 256
    scene = load_scene(obj, opt)
    opt = scene.options
    media_mats = set(int(m) for m in np.asarray(scene.media.mat_id) if m >= 0)
    grid = build_clusters(
        scene.triangles, scene.mat_ids, quads=True
    )
    dg = device_cluster_grid(grid, interpret=False)
    media9 = pack_media(scene.media, opt.scale)
    print(f"clusters={grid.num_clusters} supers={grid.super_bounds.shape[0]}")

    cam = make_camera(opt.camera_pos, opt.camera_look_at, opt.camera_fov)
    ys, xs = np.meshgrid(np.arange(256), np.arange(256), indexing="ij")
    pix = jnp.asarray(
        np.stack([xs.reshape(-1), ys.reshape(-1)], -1), jnp.int32
    )
    rngs = rng_ops.seed_counter(pix[:, 1] * 256 + pix[:, 0], jnp.uint32(0))
    rngs, j1 = rng_ops.next_float(rngs)
    rngs, j2 = rng_ops.next_float(rngs)
    o, d = generate_rays(cam, pix, jnp.stack([j1, j2], -1), (256, 256))
    bound = jnp.full((65536,), 1e4, jnp.float32)
    wlo = scene.triangles.reshape(-1, 3).min(0)
    whi = scene.triangles.reshape(-1, 3).max(0)

    def chain(fn):
        # TRACED repeat count: one executable per variant serves every k
        # (each heavy compile is minutes through the remote service).
        def run(o_, k):
            def body(i, o_):
                out = fn(o_)
                t = out[0]
                return o_ + (t[:, None] % jnp.float32(1e-3)) * jnp.float32(1e-6)
            return jax.lax.fori_loop(0, k, body, o_).sum()
        return jax.jit(run)

    def slope(fn, ks=(1, 5)):
        f = chain(fn)
        timed(f, o, jnp.int32(ks[0]))
        ts = []
        for k in ks:
            ts.append(min(timed(f, o, jnp.int32(k)) for _ in range(3)))
        return (ts[1] - ts[0]) / (ks[1] - ks[0]) * 1e3

    # Baseline: binned + mega-equivalent reference numbers.
    def binned_full(o_):
        return trace_binned(
            dg, media9, o_, d, bound, "full", world_lo=wlo, world_hi=whi,
        )

    if "--binned" in sys.argv:
        print(f"binned full: {slope(binned_full):8.2f} ms/trace", flush=True)

    # NEE-shaped trace: origins INSIDE the medium (scatter points along
    # the camera rays), direction toward the light, bound = light dist.
    lp = jnp.asarray(opt.light_pos, jnp.float32)
    o_in = o + d * 2.0  # roughly inside the cup volume for many lanes
    tl = lp[None] - o_in
    ldist = jnp.linalg.norm(tl, axis=1)
    ldir = tl / jnp.maximum(ldist, 1e-20)[:, None]

    for payload, L_list in (("nee", (6, 12)), ("dist", (4, 6)), ("full", (12,))):
        for L in L_list:
            for mg in (64, 1):
                if payload == "nee":
                    def fn(o_, L=L, mg=mg):
                        out = trace_pairs(
                            dg, media9, o_ + (o_in - o), ldir, ldist, "nee",
                            list_len=L, chunk_blocks=8, max_gens=mg,
                        )
                        return out
                elif payload == "dist":
                    def fn(o_, L=L, mg=mg):
                        return trace_pairs(
                            dg, media9, o_ + (o_in - o), d,
                            jnp.full((65536,), 0.3, jnp.float32), "dist",
                            world_lo=wlo, world_hi=whi,
                            list_len=L, chunk_blocks=8, max_gens=mg,
                        )
                else:
                    def fn(o_, L=L, mg=mg):
                        return trace_pairs(
                            dg, media9, o_, d, bound, "full",
                            world_lo=wlo, world_hi=whi,
                            list_len=L, chunk_blocks=8, max_gens=mg,
                        )
                t = slope(fn)
                print(
                    f"pair {payload:4s} L={L:2d} gens<={mg:2d}: "
                    f"{t:8.2f} ms/trace", flush=True,
                )


if __name__ == "__main__":
    main()
