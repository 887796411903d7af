"""Host-model for adaptive per-pixel sample allocation (round-5 #1).

The config-5 metric is image RMSE at a total sample budget. With
per-pixel sample counts n_p and per-sample variance s_p^2,

    MSE(alloc) = mean_p( s_p^2 / n_p ),   sum_p n_p = N fixed.

Uniform allocation gives mean_p(s_p^2)/n_bar; the optimal allocation
(n_p proportional to s_p) gives (mean_p s_p)^2 / n_bar, so the headroom
factor is

    gain_ideal = mean(v) / mean(sqrt(v))^2   (= 1 + CV^2 of sigma_p)

measured here from the per-pixel variance map v_p of the shipped best
estimator (ld/analytic, mega engine) at the bench protocol (showcase
256^2). The map comes from R independent replicate renders at low spp
(no truth needed — the estimator is unbiased, so replicate variance IS
the MSE's stochastic part).

Also reported: a REALIZABLE gain, cross-validated — allocation weights
are computed from half the replicates (the information a real warmup
phase would have), optionally 3x3-smoothed, mixed 25% uniform
(defensive floor against zero-variance lockout), and evaluated against
the variance map of the OTHER half. Build the renderer feature only if
gain_real clears the needed 1.67x (spp_to_rmse_best 10,001 -> <= 6,000).

Usage: python tools/study_adaptive.py [--rng ld] [--reps 8] [--spp 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def box3(x):
    """3x3 box filter with edge clamping (pure numpy)."""
    p = np.pad(x, 1, mode="edge")
    return (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0


def gains(v_alloc, v_eval, uniform_frac=0.25, smooth=False):
    """Expected MSE ratio uniform/adaptive when weights come from
    v_alloc (the warmup's noisy variance estimate) and the true
    per-pixel variance is v_eval. n_p proportional to the mixed weight,
    same total budget."""
    s = np.sqrt(np.maximum(v_alloc, 0.0))
    if smooth:
        s = box3(s)
    w = s / max(s.mean(), 1e-30)
    w = uniform_frac + (1.0 - uniform_frac) * w
    n_rel = w / w.mean()  # mean 1 == same budget as uniform
    mse_adapt = float((v_eval / np.maximum(n_rel, 1e-9)).mean())
    mse_unif = float(v_eval.mean())
    return mse_unif / mse_adapt


def measure(args) -> None:
    """Realized A/B on chip: adaptive vs uniform RMSE against a high-spp
    truth at equal average budgets (the bench protocol), plus wall time
    for the throughput-overhead check. Sample windows: truth 0..truth_spp,
    measured runs from 1<<21 — disjoint, so no correlated errors.

    Default (auto) schedule throughout: the static schedule renders
    showcase 256^2 at 2.2 vs the dynamic all-mode's 0.7 Mpaths/s
    (round-5 probe; images are schedule-invariant)."""
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

    def make_renderer(spp, spp_mode="uniform"):
        opt = RenderOptions()
        opt.obj_path = args.scene
        opt.width = opt.height = args.res
        opt.rng = args.rng
        opt.direct = args.direct
        opt.shard = "none"
        opt.num_samples = spp
        opt.spp_mode = spp_mode
        scene = load_scene(opt.obj_path, opt)
        return Renderer(scene, scene.options)

    def render_uniform(r, spp, offset):
        acc = np.zeros((args.res, args.res, 3), np.float64)
        done = 0
        while done < spp:
            n = min(512, spp - done)
            img = render_beauty_mega(
                r.camera, r.scene_arrays, r.bvh, r.lights,
                (args.res, args.res), n,
                rng_mode=args.rng, sample_offset=offset + done,
                direct=args.direct,
            )
            acc += np.asarray(img, np.float64) * n
            done += n
        return (acc / spp).astype(np.float32)

    def rmse(a, b):
        return float(np.sqrt(((a.astype(np.float64) - b) ** 2).mean()))

    truth_path = (
        f"/tmp/study_adaptive_truth_{args.rng}_{args.direct}_"
        f"{args.res}_{args.truth_spp}.npy"
    )
    r = make_renderer(64)
    if os.path.exists(truth_path):
        truth = np.load(truth_path)
        print(f"# truth loaded from {truth_path}", flush=True)
    else:
        t0 = time.time()
        truth = render_uniform(r, args.truth_spp, 0)
        np.save(truth_path, truth)
        print(f"# truth rendered in {time.time()-t0:.0f}s", flush=True)

    out = {"protocol": f"{args.scene} {args.res}^2 {args.rng}/{args.direct}"}
    for spp in (int(s) for s in args.budgets.split(",")):
        ru = make_renderer(spp)
        ru.render()  # warm the uniform signature
        t0 = time.time()
        img_u = render_uniform(ru, spp, 1 << 21)
        t_u = time.time() - t0
        ra = make_renderer(spp, "adaptive")
        ra.render_adaptive(sample_base=1 << 21)  # warm
        t0 = time.time()
        img_a = ra.render_adaptive(sample_base=1 << 21)
        t_a = time.time() - t0
        e_u, e_a = rmse(img_u, truth), rmse(img_a, truth)
        out[f"spp{spp}"] = {
            "rmse_uniform": round(e_u, 6),
            "rmse_adaptive": round(e_a, 6),
            "var_gain": round((e_u / e_a) ** 2, 3),
            "wall_uniform_s": round(t_u, 1),
            "wall_adaptive_s": round(t_a, 1),
        }
        print(json.dumps({f"spp{spp}": out[f"spp{spp}"]}), flush=True)

    if args.crossing:
        # MEASURED RMSE<=1e-3 crossing for the adaptive estimator: one
        # long adaptive run, floor-adjusted RMSE evaluated at every
        # round snapshot (the truth's own noise floor is estimated from
        # the measured uniform 64-spp RMSE, same convention as bench.py).
        e_u64 = out.get("spp64", {}).get("rmse_uniform")
        floor2 = (e_u64**2) * (64.0 / args.truth_spp) if e_u64 else 0.0
        ra = make_renderer(args.crossing_budget, "adaptive")
        hist = []

        def snap(avg, img_fn):
            e2 = ((img_fn().astype(np.float64) - truth) ** 2).mean()
            hist.append((avg, float(np.sqrt(max(e2 - floor2, 0.0)))))
            # Incremental print: a killed/timed-out run still leaves the
            # partial curve in the log (round-5 lesson).
            print(f"# snap {hist[-1][0]:.1f} {hist[-1][1]:.6f}", flush=True)

        t0 = time.time()
        ra.render_adaptive(snapshot_cb=snap, sample_base=1 << 21)
        wall = time.time() - t0
        crossing = next((a for a, e in hist if e <= 1e-3), None)
        res = {
            "crossing_spp": crossing,
            "budget": args.crossing_budget,
            "wall_s": round(wall, 1),
            "mpaths": round(
                args.crossing_budget * args.res**2 / wall / 1e6, 3
            ),
            "tail": [(round(a, 1), round(e, 6)) for a, e in hist[-6:]],
        }
        out["crossing"] = res
        print(json.dumps({"crossing": res}), flush=True)
    print(json.dumps(out), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--scene", default="scenes/showcase.obj")
    ap.add_argument("--rng", default="ld", choices=["ld", "counter"])
    ap.add_argument("--direct", default="analytic")
    ap.add_argument("--measure", action="store_true",
                    help="realized adaptive-vs-uniform A/B (needs the "
                    "feature built; the default mode is the pre-build "
                    "headroom model)")
    ap.add_argument("--budgets", default="64,256",
                    help="average spp budgets for --measure")
    ap.add_argument("--truth-spp", type=int, default=4096)
    ap.add_argument("--crossing", action="store_true",
                    help="with --measure: run the RMSE<=1e-3 crossing")
    ap.add_argument("--crossing-budget", type=int, default=10240)
    args = ap.parse_args()
    if args.measure:
        return measure(args)

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
    opt.rng = args.rng
    opt.shard = "none"
    scene = load_scene(opt.obj_path, opt)
    r = Renderer(scene, scene.options)

    t0 = time.time()
    reps = []
    for rep in range(args.reps):
        # Dyadic-aligned offsets so each ld rep is an aligned net block.
        off = (1 << 21) + rep * args.spp
        img = render_beauty_mega(
            r.camera, r.scene_arrays, r.bvh, r.lights,
            (args.res, args.res), args.spp,
            rng_mode=args.rng, sample_offset=off,
            schedule_mode="all", direct=args.direct,
        )
        reps.append(np.asarray(img, np.float64))
        print(f"# rep {rep} done t={time.time()-t0:.0f}s", flush=True)
    reps = np.stack(reps)  # (R, H, W, 3)

    # Per-pixel variance of one spp-sample estimate, averaged over
    # channels (the RMSE metric averages squared error over channels).
    v = reps.var(axis=0, ddof=1).mean(axis=-1)  # (H, W)

    sig = np.sqrt(v)
    out = {
        "protocol": f"{args.scene} {args.res}^2 {args.rng}/{args.direct} "
                    f"{args.reps}x{args.spp}spp",
        "gain_ideal": round(float(v.mean() / (sig.mean() ** 2)), 3),
        "mse_frac_top1pct": round(
            float(np.sort(v.reshape(-1))[-v.size // 100:].sum() / v.sum()), 3
        ),
        "mse_frac_top10pct": round(
            float(np.sort(v.reshape(-1))[-v.size // 10:].sum() / v.sum()), 3
        ),
    }

    # Cross-validated realizable gain: weights from odd reps, evaluated
    # on the variance map of even reps (and vice versa, averaged).
    h1 = reps[0::2].var(axis=0, ddof=1).mean(axis=-1)
    h2 = reps[1::2].var(axis=0, ddof=1).mean(axis=-1)
    for label, smooth in (("raw", False), ("smooth3", True)):
        g = 0.5 * (gains(h1, h2, smooth=smooth) + gains(h2, h1, smooth=smooth))
        out[f"gain_real_{label}"] = round(float(g), 3)
        # And with a perfect (self) variance map as the upper bound of
        # the mixture policy itself:
        g_self = gains(v, v, smooth=smooth)
        out[f"gain_mix_oracle_{label}"] = round(float(g_self), 3)

    np.save("/tmp/study_adaptive_varmap.npy", v.astype(np.float32))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
