"""Chip A/B: sampler (counter PCG vs Owen-scrambled Sobol 'ld') x media
direct estimator (scatter vs analytic) at the config-5 RMSE protocol.

Round-5 verdict #1: the perf fight moved to time-to-RMSE. This measures,
on the real chip with the mega engine (bench protocol: showcase 256^2),
the 64-spp RMSE of each (rng, direct) combination against a high-spp
truth, plus an spp sweep for the winner to establish its actual
convergence ORDER — Owen-scrambled Sobol converges faster than
RMSE ~ spp^-0.5 on smooth integrands, so the bench's sqrt extrapolation
is conservative for it.

Rep windows use sample offsets aligned to the rep spp so every ld rep
covers an aligned dyadic index block (a (t,m,s)-net — see ops/rng.py).

Usage: python tools/study_sampler.py [--quick]
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
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="scenes/showcase.obj")
    ap.add_argument("--sweep", default="16,64,256",
                    help="spp sweep for the winner's convergence slope")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="/tmp/study_sampler")
    args = ap.parse_args()
    if args.quick:
        args.truth_spp, args.reps, args.spp, args.sweep = 512, 2, 16, "16"

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

    def render(spp, rng, direct, offset, chunk=512):
        acc = np.zeros((args.res, args.res, 3), np.float64)
        done = 0
        while done < spp:
            n = min(chunk, spp - done)
            img = render_beauty_mega(
                r.camera, r.scene_arrays, r.bvh, r.lights,
                (args.res, args.res), n,
                rng_mode=rng, sample_offset=offset + done,
                schedule_mode="all", direct=direct,
            )
            acc += np.asarray(img, np.float64) * n
            done += n
        return (acc / spp).astype(np.float32)

    def rmse(a, b):
        return float(np.sqrt(((a.astype(np.float64) - b) ** 2).mean()))

    t0 = time.time()
    truth_path = os.path.join(
        "/tmp/study_estimator", f"truth_analytic_{args.res}_{args.truth_spp}.npy"
    )
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
        print(f"# truth loaded from {truth_path}", flush=True)
    else:
        truth = render(args.truth_spp, "counter", "analytic", 0)
        os.makedirs(os.path.dirname(truth_path), exist_ok=True)
        np.save(truth_path, truth)
        print(f"# truth rendered in {time.time()-t0:.0f}s", flush=True)

    results = {}
    for rng in ("counter", "ld"):
        for direct in ("scatter", "analytic"):
            rmses = []
            for rep in range(args.reps):
                # Offsets aligned to spp so ld reps are dyadic blocks.
                off = (1 << 21) + rep * args.spp
                img = render(args.spp, rng, direct, off)
                rmses.append(rmse(img, truth))
            m = float(np.mean(rmses))
            results[f"{rng}/{direct}"] = {
                "rmse_mean": round(m, 6),
                "rmse_all": [round(x, 6) for x in rmses],
                "spp_to_1e3_sqrt": int(np.ceil(args.spp * (m / 1e-3) ** 2)),
            }
            print(json.dumps({f"{rng}/{direct}": results[f"{rng}/{direct}"]}),
                  flush=True)

    base = results["counter/scatter"]["rmse_mean"]
    for k, v in results.items():
        v["var_reduction_vs_base"] = round((base / v["rmse_mean"]) ** 2, 3)

    # Convergence sweep for ld (slope tells the real extrapolation order).
    sweep = [int(s) for s in args.sweep.split(",") if s]
    slope_pts = {}
    for spp in sweep:
        img = render(spp, "ld", "analytic", 1 << 21)
        slope_pts[spp] = round(rmse(img, truth), 6)
        print(json.dumps({"ld_sweep": {str(spp): slope_pts[spp]}}), flush=True)
    if len(slope_pts) >= 2:
        xs = np.log([float(s) for s in slope_pts])
        ys = np.log(list(slope_pts.values()))
        slope = float(np.polyfit(xs, ys, 1)[0])
        print(json.dumps({"ld_convergence_order": round(-slope, 3)}), flush=True)

    print(json.dumps({"summary": results,
                      "elapsed_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
