"""Benchmark: Mpaths/sec/chip on the showcase scene + acceptance regimes.

Prints ONE JSON line. The primary metric (showcase 512x512@16) keeps the
round-1 protocol; the BASELINE.json acceptance regimes ride along in the
"configs" field so dense-media / TIR / isotropic performance is tracked
per round:

- showcase: mixed media studio corner (primary, vs the 50 Mpaths/s bar)
- isobox:   homogeneous isotropic medium (BASELINE config 2)
- gembox:   anisotropic HG multi-media, TIR-heavy gems (config 3)
- vessel:   dense high-extinction coffee, deep bounces (config 4)
- cup:      the reference's own dense-media scene, when its assets are
            present (optional; absent on a bare checkout)

A "path" is one camera sample: jittered primary ray plus its full bounce
history (volpath.comp.glsl:580-798 per-thread workload).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TARGET_MPATHS = 50.0  # BASELINE.json north-star, v5e


# Decision-flip budget for the golden gate. Root-caused in round 5
# (tools/study_goldengate.py, NOTES 5b): with identical parity RNG
# streams, 99.5-99.7% of the gate's MSE comes from a handful of pixels
# where ONE sample's discrete path decision (a Fresnel rand<r compare or
# a hit t-compare at a knife edge) resolves differently under a
# different compiler/backend — the engine step alone (Mosaic mega vs XLA
# wavefront, SAME chip, SAME accel) produces 10 such flips; platform and
# accel steps contribute the rest; quads ~0-1. Every non-flip pixel
# agrees to ~1.1e-4 RMSE — 9x inside the 1e-3 oracle. A flip's
# contribution is sample-quantized (|diff| ~ radiance/spp), so the raw
# RMSE measures the FLIP COUNT, not estimator agreement. The gate
# therefore asserts (a) non-flip RMSE <= 1e-3 (the oracle's actual
# intent) and (b) a flip budget from the measured per-path flip rate:
# p ~ 6-9e-5 (8-12 flips / 4096px*32spp); budgeted at p=1e-4 with a
# +3 sigma Poisson allowance: lambda = 13.1 -> 24.
_FLIP_THRESHOLD = 1e-2
_FLIP_BUDGET = 24


def _golden_rmse() -> dict:
    """Render the showcase gate config (64x64@32, parity RNG) with the
    MEGA engine on the real chip and compare against the committed CPU
    golden — the per-round record of TPU-vs-golden drift (the committed
    corpus is CPU-rendered; this is the only artifact comparing the
    flagship engine's hardware output against it).

    Reports the raw RMSE (historical series), the non-flip RMSE and
    flip count (the round-5 re-specced gate — see _FLIP_BUDGET above),
    and the pass verdict."""
    from complex_materials_renderer_tpu.tools.goldens import (
        load_golden,
        rmse,
    )
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene

    golden = load_golden("showcase_gate")
    if golden is None:
        return {"golden_rmse": "no golden"}
    opt = RenderOptions()
    opt.obj_path = "scenes/showcase.obj"
    opt.width = opt.height = 64
    opt.num_samples = 32
    opt.rng = "parity"
    opt.shard = "none"
    opt.engine = "mega"
    scene = load_scene(opt.obj_path, opt)
    img = np.asarray(Renderer(scene, scene.options).render())
    diff = np.abs(img.astype(np.float64) - golden).max(-1)
    flip = diff > _FLIP_THRESHOLD
    flips = int(flip.sum())
    err2 = ((img.astype(np.float64) - golden) ** 2)
    nonflip_rmse = float(np.sqrt(err2[~flip].mean()))
    return {
        "golden_rmse": round(rmse(img, golden), 6),
        "golden_rmse_nonflip": round(nonflip_rmse, 6),
        "golden_flip_pixels": flips,
        "golden_gate_pass": bool(
            nonflip_rmse <= 1e-3 and flips <= _FLIP_BUDGET
        ),
    }


def _config5_acceptance() -> dict:
    """BASELINE.json config 5: 1920x1080 @ 1024 spp, tiles sharded over
    v5e-8, scored as time-to-RMSE <= 1e-3.

    One real chip is available, so the artifact decomposes honestly:
    - measured single-chip 1080p throughput (Mpaths/s at the full
      framebuffer, 4 spp timed after warm);
    - measured RMSE convergence on 256^2 (RMSE per spp is
      resolution-independent for a per-pixel MC estimator): a 64-spp
      render against a 4096-spp truth calibrates c in RMSE = c/sqrt(spp),
      giving the spp needed for RMSE <= 1e-3;
    - estimated single-chip and v5e-8 times (tile-DP tracing is
      communication-free — one psum at the end — so 8-chip scaling is
      taken at the mesh width; the driver's dryrun_multichip validates
      the sharded step compiles and runs).
    """
    import jax

    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene
    from complex_materials_renderer_tpu.tools.goldens import rmse

    def bench_1080p():
        # 16 spp, not 4: the auto sample chunk at 1080p is 16 samples
        # per device pass, and config 5 is a 1024-spp render — every
        # production pass runs full 16-sample chunks. Timing 4 spp
        # amortized per-pass fixed costs 4x worse and UNDER-reported the
        # acceptance resolution by 29% (round-4 weak #3; round-5
        # tools/study_1080p.py: 1080p@4 1.371 vs 1080p@16 2.259
        # Mpaths/s — the "1080p cliff" was chunk amortization, not
        # geometry: at equal chunks 1080p is FASTER than 512^2).
        opt = RenderOptions()
        opt.obj_path = "scenes/showcase.obj"
        opt.width, opt.height = 1920, 1080
        opt.num_samples = 16
        opt.rng = "counter"
        opt.shard = "none"
        scene = load_scene(opt.obj_path, opt)
        r = Renderer(scene, scene.options)
        r.render()
        t0 = time.perf_counter()
        img = r.render()
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(np.asarray(img)))
        return 1920 * 1080 * 16 / dt / 1e6

    from complex_materials_renderer_tpu.render.megarender import (
        render_beauty_mega,
    )

    def make_renderer(spp, rng, direct, spp_mode="uniform"):
        opt = RenderOptions()
        opt.obj_path = "scenes/showcase.obj"
        opt.width = opt.height = 256
        opt.rng = rng
        opt.direct = direct
        opt.shard = "none"
        opt.num_samples = spp
        opt.spp_mode = spp_mode
        scene = load_scene(opt.obj_path, opt)
        return Renderer(scene, scene.options)

    def render_256(r, spp, rng, direct, offset):
        """Chunked mega passes at an explicit sample offset: the probes'
        sample windows must be DISJOINT from the truth's (0..4095) —
        shared (pixel, sample) indices correlate probe and truth and
        understate RMSE ~3% (fixed round 5; the r4 artifact had the
        overlap). Default (auto) schedule: images are schedule-invariant
        (the schedule moves work, not samples), and the static schedule
        renders showcase 256^2 at 2.2 vs the dynamic all-mode's 0.7
        Mpaths/s (round-5 probe) — the r4 truth render paid that 3x."""
        acc = np.zeros((256, 256, 3), np.float64)
        done = 0
        while done < spp:
            n = min(512, spp - done)
            img = render_beauty_mega(
                r.camera, r.scene_arrays, r.bvh, r.lights, (256, 256), n,
                rng_mode=rng, sample_offset=offset + done,
                direct=direct,
            )
            acc += np.asarray(img, np.float64) * n
            done += n
        return (acc / spp).astype(np.float32)

    def spp_to_target(target=1e-3):
        """64-spp RMSE -> spp needed, for the REFERENCE estimator
        (counter/scatter — volpath's own sampling), the best uniform
        estimator (ld/analytic: Owen-scrambled Sobol + closed-form
        in-scatter direct term — 1.83x variance, round-5a NOTES), and
        the best shipped estimator (ld/analytic/adaptive: + per-pixel
        allocation, --spp-mode adaptive — round-5e NOTES).

        Truth = 4096-spp ld/analytic render (the lowest-variance uniform
        estimator of the shared estimand). Its own noise floor inflates
        each measured RMSE in quadrature, so it is subtracted back out;
        extrapolation uses RMSE = c/sqrt(spp) — CONSERVATIVE for ld
        (measured order ~0.535 at low spp) and for adaptive (measured
        gain GROWS with budget: 1.29x at 64, 1.35x at 256). The adaptive
        crossing below replaces extrapolation with measurement."""
        rt = make_renderer(64, "ld", "analytic")
        truth = render_256(rt, 4096, "ld", "analytic", 0)
        out = {}
        floor2 = None
        for key, rng_mode, direct in (
            ("ld/analytic", "ld", "analytic"),
            ("counter/scatter", "counter", "scatter"),
        ):
            img64 = render_256(rt, 64, rng_mode, direct, 1 << 21)
            r_meas = rmse(img64, truth)
            if floor2 is None:
                # truth floor estimate: same estimator at 64x the spp
                floor2 = (r_meas**2) * (64.0 / 4096.0)
            r_est = float(np.sqrt(max(r_meas**2 - floor2, 1e-12)))
            out[key] = (r_est, int(np.ceil(64 * (r_est / target) ** 2)))

        # Adaptive: ONE run whose round snapshots give both the 64-spp
        # point and the MEASURED RMSE<=1e-3 crossing (floor-adjusted).
        # Budget: 1.25x the uniform-ld extrapolation, bounded to keep the
        # bench inside the driver's patience; if the budget ends before
        # the crossing, the artifact reports the extrapolation from the
        # last snapshot instead (and says so).
        spp_u = out["ld/analytic"][1]
        budget = int(min(8192, max(2048, -(-int(1.25 * spp_u) // 16) * 16)))
        ra = make_renderer(budget, "ld", "analytic", "adaptive")
        hist = []

        def snap(avg, img_fn):
            e2 = ((img_fn().astype(np.float64) - truth) ** 2).mean()
            e = float(np.sqrt(max(e2 - floor2, 0.0)))
            hist.append((avg, e))
            # Early stop: once the crossing is measured (past the 64-spp
            # comparability point), the rest of the budget adds nothing.
            return avg >= 64 and e <= target

        # Default (auto) schedule: the crossing is a multi-hundred-spp
        # render, and the static schedule is 3x the dynamic all-mode's
        # throughput on showcase 256^2 (round-5 probe). Its extra width
        # compiles are once-per-machine under the persistent cache.
        ra.render_adaptive(snapshot_cb=snap, sample_base=1 << 21)
        r64_a = next(e for a, e in hist if a >= 64)
        crossing = next((a for a, e in hist if e <= target), None)
        out["ld/analytic/adaptive"] = (
            r64_a,
            int(np.ceil(64 * (r64_a / target) ** 2)),
        )
        out["adaptive_crossing"] = (crossing, budget, hist[-1])
        return out

    mp = bench_1080p()
    curves = spp_to_target()
    r64, spp_star = curves["counter/scatter"]
    r64_u, spp_u = curves["ld/analytic"]
    r64_a, spp_a = curves["ld/analytic/adaptive"]
    crossing, budget, last = curves["adaptive_crossing"]
    spp_best = int(np.ceil(crossing)) if crossing is not None else spp_a
    paths_1024 = 1920 * 1080 * 1024
    t_single_1024 = paths_1024 / (mp * 1e6)
    return {
        "config5": {
            "mpaths_1080p_chip": round(mp, 3),
            # reference estimator (counter/scatter), r1-r4-comparable:
            "rmse_64spp_256": round(r64, 5),
            "spp_to_rmse_1e3": spp_star,
            # best uniform estimator (--rng ld --direct analytic):
            "rmse_64spp_256_ld": round(r64_u, 5),
            "spp_to_rmse_1e3_ld": spp_u,
            # best shipped estimator (+ --spp-mode adaptive); the spp_-
            # _best figure is the MEASURED crossing when the budget
            # reached it, else the sqrt extrapolation from 64 spp:
            "rmse_64spp_256_best": round(r64_a, 5),
            "spp_to_rmse_1e3_best": spp_best,
            "spp_best_basis": (
                f"measured crossing (budget {budget})"
                if crossing is not None
                else f"sqrt extrapolation (no crossing in {budget}; "
                f"last snapshot {last})"
            ),
            "best_estimator": "ld/analytic/adaptive",
            "time_1080p_1024spp_chip_s": round(t_single_1024, 1),
            "time_1080p_1024spp_v5e8_s": round(t_single_1024 / 8, 1),
            "time_to_rmse_1e3_1080p_v5e8_s": round(
                1920 * 1080 * spp_star / (mp * 1e6) / 8, 1
            ),
            "time_to_rmse_1e3_1080p_v5e8_s_best": round(
                1920 * 1080 * spp_best / (mp * 1e6) / 8, 1
            ),
            # One chip is physically available: v5e-8 numbers are /8
            # extrapolations (tile-DP tracing is communication-free; the
            # driver's dryrun_multichip validates the sharded step).
            "v5e8_basis": "measured 1-chip / 8 (tile-DP, no comms)",
        }
    }


def _preview_cold_s() -> dict:
    """BASELINE.json config 1 (default scene, 128x128@8): cold
    time-to-first-image — the reference's zero-compile launch is the bar
    (main.cpp:271-291).

    Measured IN-PROCESS with this process's jit caches empty (scene
    load -> accel build -> trace/lower -> compile (persistent disk cache
    applies) -> render -> hdr write). A fresh-subprocess measurement is
    NOT usable here: the axon sitecustomize registers a PJRT tunnel
    claim for every python interpreter, so a child process contends
    with its live parent (measured 21 s from a bash parent vs 223-900+ s
    under any python parent). Standalone CLI launches verified by hand
    with a warm disk cache: ~21-26 s end-to-end; expect 20-80 s here
    depending on device-grant/compile-service latency (most of the time
    is waiting, not compute — user time ~12 s)."""
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene
    from complex_materials_renderer_tpu.io import write_hdr

    t0 = time.perf_counter()
    opt = RenderOptions()
    opt.width = opt.height = 128
    opt.num_samples = 8
    scene = load_scene(opt.obj_path, opt)
    img = Renderer(scene, scene.options).render()
    write_hdr("/tmp/cmr_preview_bench.hdr", np.asarray(img))
    return {"preview_cold_s": round(time.perf_counter() - t0, 1)}


def _bench_scene(obj_path, width, height, samples, warm_samples=None):
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene

    opt = RenderOptions()
    opt.obj_path = obj_path
    opt.width, opt.height = width, height
    opt.num_samples = samples
    opt.rng = "counter"  # sample-parallel-safe mode is the perf path
    opt.shard = "none"  # single-chip number

    scene = load_scene(opt.obj_path, opt)
    renderer = Renderer(scene, scene.options)

    # Warm with the EXACT timed configuration: any difference (even the
    # sample-chunk scan length) is a different jit signature and the
    # recompile would land in the timed region.
    renderer.render()

    t0 = time.perf_counter()
    img = renderer.render()
    elapsed = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(img)))

    paths = width * height * samples
    return paths / elapsed / 1e6


def main() -> None:
    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    primary = _bench_scene("scenes/showcase.obj", 512, 512, 16)

    # Side configs run the DEFAULT schedule — the numbers reported here
    # are exactly the steady-state a default user gets (round-4 verdict:
    # a bench-private CMR_MEGA_SCHED under-reported them ~10%). The
    # compile cost of the 7-width static schedule is a once-per-machine
    # cost under the persistent cache.
    configs = {}
    for name, path, res, spp in [
        ("isobox", "scenes/isobox.obj", 256, 8),
        ("gembox", "scenes/gembox.obj", 256, 8),
        ("vessel", "scenes/vessel.obj", 256, 8),
        ("cup", "/root/reference/resources/scenes/cup.obj", 256, 4),
    ]:
        if not os.path.exists(path):
            continue
        try:
            configs[name] = round(_bench_scene(path, res, res, spp), 3)
        except Exception as e:  # a failing side config must not kill the bench
            configs[name] = f"error: {type(e).__name__}"

    try:
        golden = _golden_rmse()
    except Exception as e:
        golden = {"golden_rmse": f"error: {type(e).__name__}"}

    try:
        config5 = _config5_acceptance()
    except Exception as e:
        config5 = {"config5": f"error: {type(e).__name__}"}

    # Preview cold-start LAST: its dominant cost is compile-service
    # latency (measured 25 s to 1079 s for identical work), and a slow
    # grant must not precede the throughput measurements. Its jit
    # signature (16384-lane dynamic pass) is unique in this process, so
    # it still measures a cold in-process compile.
    try:
        preview = _preview_cold_s()
    except Exception as e:
        preview = {"preview_cold_s": f"error: {type(e).__name__}"}

    print(
        json.dumps(
            {
                "metric": "Mpaths/sec/chip (showcase 512x512)",
                "value": round(primary, 3),
                "unit": "Mpaths/s",
                "vs_baseline": round(primary / TARGET_MPATHS, 4),
                "configs": configs,
                **golden,
                **config5,
                **preview,
            }
        )
    )


if __name__ == "__main__":
    main()
