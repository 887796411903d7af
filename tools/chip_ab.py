"""Generic single-config chip benchmark for A/B experiments.

One invocation = one (scene, resolution, spp, knobs) measurement with
the round-3 protocol: persistent compile cache, counter RNG, no
sharding, mega engine, warm render then timed render, Mpaths/s + image
mean printed on one line (the mean pins bit-drift between variants).

Examples (PYTHONPATH=/root/repo:/root/.axon_site):
    python tools/chip_ab.py scenes/showcase.obj --res 256 --spp 8
    python tools/chip_ab.py cup --res 256 --spp 4 --debug nofuse
    python tools/chip_ab.py cup --res 256 --spp 4 --partition media --width 32

Scene shorthands: cup/gem_corner/stanford_dragon resolve to the
reference assets; anything else is a path.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

SHORTHANDS = {
    "cup": "/root/reference/resources/scenes/cup.obj",
    "gem_corner": "/root/reference/resources/scenes/gem_corner.obj",
    "stanford_dragon": "/root/reference/resources/scenes/stanford_dragon.obj",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--wh", default="", help="WxH (overrides --res)")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--chunk", type=int, default=0,
                    help="samples per device pass (0 = auto)")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed repetitions after the warm render")
    ap.add_argument("--debug", default="", help="CMR_MEGA_DEBUG token(s)")
    ap.add_argument("--sched", default="1:1,4:1,16:2,64:32",
                    help="CMR_MEGA_SCHED ('' keeps the engine default)")
    ap.add_argument("--width", type=int, default=128, help="cluster size")
    ap.add_argument("--super", type=int, default=0, dest="super_factor",
                    help="clusters per super-cluster (0 = auto)")
    ap.add_argument("--partition", default="off",
                    choices=["auto", "off", "media"])
    ap.add_argument("--quads", default="auto", choices=["auto", "off"],
                    help="quad slot merging (accel/clusters.pair_quads)")
    ap.add_argument("--engine", default="mega")
    ap.add_argument("--direct", default="scatter",
                    choices=["scatter", "analytic"],
                    help="media direct-light estimator (config.py)")
    ap.add_argument("--rng", default="counter")
    ap.add_argument("--nee-bound", type=int, default=0, dest="nee_bound",
                    help="max media crossings on shadow rays (0 = default)")
    ap.add_argument("--save", default="", help="optional .npy for the image")
    args = ap.parse_args()

    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    if args.sched:
        os.environ["CMR_MEGA_SCHED"] = args.sched
    os.environ["CMR_MEGA_DEBUG"] = args.debug

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    opt = RenderOptions()
    opt.obj_path = SHORTHANDS.get(args.scene, args.scene)
    opt.width = opt.height = args.res
    if args.wh:
        w, h = args.wh.lower().split("x")
        opt.width, opt.height = int(w), int(h)
    opt.num_samples = args.spp
    opt.sample_chunk = args.chunk
    opt.cluster_size = args.width
    opt.super_factor = args.super_factor
    opt.partition = args.partition
    opt.quads = args.quads
    opt.rng = args.rng
    opt.shard = "none"
    opt.engine = args.engine
    opt.direct = args.direct
    if args.nee_bound:
        opt.nee_max_media = args.nee_bound

    scene = load_scene(opt.obj_path, opt)
    r = Renderer(scene, scene.options)
    print(
        f"[grid] clusters={r._host_accel.num_clusters} "
        f"supers={r._host_accel.super_bounds.shape[0]} "
        f"width={r._host_accel.v0x.shape[1]}",
        flush=True,
    )
    r.render()  # warm the exact signature
    for _ in range(args.reps):
        t0 = time.perf_counter()
        img = np.asarray(r.render())
        dt = time.perf_counter() - t0
        mp = opt.width * opt.height * args.spp / dt / 1e6
        print(
            f"{os.path.basename(opt.obj_path)} {opt.width}x{opt.height}"
            f"@{args.spp} chunk={args.chunk or 'auto'} "
            f"debug='{args.debug}' part={args.partition} w={args.width} "
            f"sf={args.super_factor} quads={args.quads} "
            f"engine={args.engine} direct={args.direct} rng={args.rng}: "
            f"{mp:.3f} Mpaths/s mean={img.mean():.5f}",
            flush=True,
        )
    if args.save:
        np.save(args.save, img)


if __name__ == "__main__":
    main()
