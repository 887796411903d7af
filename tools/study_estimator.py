"""Chip A/B: estimator efficiency at the config-5 RMSE protocol.

Round-5 verdict #1: raw Mpaths/s is measured-plateaued, so the
time-to-RMSE axis is the open multiplier. This study measures, on the
real chip, the spp -> RMSE curve of the available media direct-light
estimators on the bench's own convergence scene (showcase 256^2,
counter RNG, mega engine — exactly bench.py's spp_to_target protocol):

- scatter   : the reference estimator (volpath:691-710 semantics)
- analytic  : closed-form in-scatter direct term (--direct analytic,
              ops/medium.analytic_direct_scale)

Protocol:
1. truth = high-spp analytic render (lowest-variance estimator of the
   shared estimand; scatter/analytic mean agreement is cross-checked
   with a separate scatter truth).
2. K independent 64-spp renders per estimator (disjoint sample_offset
   windows) -> RMSE mean +/- spread vs truth.
3. Per-pixel error maps saved to /tmp for variance attribution (where
   does the remaining noise live: media interior vs geometric edges).

Usage: python tools/study_estimator.py [--truth-spp 8192] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--truth-spp", type=int, default=8192)
    ap.add_argument("--cross-spp", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="scenes/showcase.obj")
    ap.add_argument("--quick", action="store_true",
                    help="tiny spp counts for a smoke run")
    ap.add_argument("--out", default="/tmp/study_estimator")
    args = ap.parse_args()
    if args.quick:
        args.truth_spp, args.cross_spp, args.reps, args.spp = 256, 128, 2, 16

    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene

    opt = RenderOptions()
    opt.obj_path = args.scene
    opt.width = opt.height = args.res
    opt.rng = "counter"
    opt.shard = "none"
    scene = load_scene(opt.obj_path, opt)
    r = Renderer(scene, scene.options)
    os.makedirs(args.out, exist_ok=True)

    def render(spp, direct, offset, chunk=512):
        """Accumulate `spp` counter-mode samples starting at sample
        window `offset`, in bounded chunks (single compile per chunk
        size thanks to the dynamic schedule)."""
        acc = np.zeros((args.res, args.res, 3), np.float64)
        done = 0
        while done < spp:
            n = min(chunk, spp - done)
            img = render_beauty_mega(
                r.camera, r.scene_arrays, r.bvh, r.lights,
                (args.res, args.res), n,
                rng_mode="counter", sample_offset=offset + done,
                schedule_mode="all", direct=direct,
            )
            acc += np.asarray(img, np.float64) * n
            done += n
        return (acc / spp).astype(np.float32)

    def rmse(a, b):
        return float(np.sqrt(((a.astype(np.float64) - b) ** 2).mean()))

    t0 = time.time()
    truth_path = os.path.join(
        args.out, f"truth_analytic_{args.res}_{args.truth_spp}.npy"
    )
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
        print(f"# truth loaded from {truth_path}", flush=True)
    else:
        truth = render(args.truth_spp, "analytic", 0)
        np.save(truth_path, truth)
        print(f"# truth rendered in {time.time()-t0:.0f}s", flush=True)

    # Estimand cross-check: a scatter render at cross_spp must approach
    # the analytic truth at its own noise floor (no systematic offset).
    cross = render(args.cross_spp, "scatter", 1 << 20)
    cross_rmse = rmse(cross, truth)
    print(
        json.dumps({"cross_check": {
            "scatter_vs_analytic_truth_rmse": round(cross_rmse, 6),
            "mean_truth": round(float(truth.mean()), 6),
            "mean_scatter": round(float(cross.mean()), 6),
        }}), flush=True,
    )

    results = {}
    for direct in ("scatter", "analytic"):
        rmses = []
        errmap = np.zeros((args.res, args.res), np.float64)
        for rep in range(args.reps):
            img = render(args.spp, direct, (1 << 21) + rep * args.spp)
            rmses.append(rmse(img, truth))
            errmap += ((img.astype(np.float64) - truth) ** 2).mean(-1)
        errmap /= args.reps
        np.save(os.path.join(args.out, f"errmap_{direct}.npy"), errmap)
        r_mean = float(np.mean(rmses))
        results[direct] = {
            "rmse_mean": round(r_mean, 6),
            "rmse_all": [round(x, 6) for x in rmses],
            "spp_to_1e3": int(np.ceil(args.spp * (r_mean / 1e-3) ** 2)),
        }
        print(json.dumps({direct: results[direct]}), flush=True)

    if results["scatter"]["rmse_mean"] > 0:
        var_ratio = (
            results["scatter"]["rmse_mean"] / results["analytic"]["rmse_mean"]
        ) ** 2
        print(json.dumps({
            "variance_ratio_scatter_over_analytic": round(var_ratio, 3),
            "elapsed_s": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
