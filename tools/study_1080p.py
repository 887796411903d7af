"""Attribute the 1080p throughput cliff (round-5 verdict #3).

BENCH_r04: mpaths_1080p_chip = 1.441 vs 2.025 at 512^2 — 29% lost at the
acceptance resolution. Candidate mechanisms, each isolated here (counter
RNG, showcase, warm, timed like bench._bench_scene):

  A. sample-chunk amortization: the bench times 1080p at 4 spp, so each
     device pass scans 4 samples (512^2@16 scans 16) and per-pass fixed
     costs (dispatch, host accumulate, transfers) weigh 4x more.
  B. band shape: rows-per-band = 65536 // 1920 = 34 — one full 32-row
     tile stripe plus a ragged 2-row remainder whose "tiles" are thin
     strips; 512^2 bands are 128 rows = perfect 32x32 tiles.
  C. genuine per-path cost at 1080p geometry/ray distribution.

Matrix: 512^2@16 (baseline), 1080p@4 (bench config), 1080p@16 (isolates
A), 1080p@16 rows=32 via CMR_LANES_PER_PASS=61440 (isolates B; 1920*32
lanes/pass), plus a 1088-row render (34 full tile rows, no remainder).

Timing caveat (NOTES round-4): never time against the tunnel with host
contention; run alone.

Usage: python tools/study_1080p.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(width, height, spp, lanes_env=None):
    """Fresh-subprocess-free in-process bench, mirroring bench._bench_scene
    (warm with the exact signature, then time)."""
    import importlib

    if lanes_env is not None:
        os.environ["CMR_LANES_PER_PASS"] = str(lanes_env)
    else:
        os.environ.pop("CMR_LANES_PER_PASS", None)
    # renderer reads LANES_PER_PASS at import; re-import to apply.
    import complex_materials_renderer_tpu.renderer as rmod

    importlib.reload(rmod)
    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.scene import load_scene

    opt = RenderOptions()
    opt.obj_path = "scenes/showcase.obj"
    opt.width, opt.height = width, height
    opt.num_samples = spp
    opt.rng = "counter"
    opt.shard = "none"
    scene = load_scene(opt.obj_path, opt)
    r = rmod.Renderer(scene, scene.options)
    r.render()
    t0 = time.perf_counter()
    img = r.render()
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(np.asarray(img)))
    return width * height * spp / dt / 1e6


def main() -> None:
    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    out = {}
    for label, args in {
        "512@16": (512, 512, 16, None),
        "1080p@4 (bench)": (1920, 1080, 4, None),
        "1080p@16": (1920, 1080, 16, None),
        "1080p@16 rows32": (1920, 1080, 16, 61440),
        "1080p@4 rows32": (1920, 1080, 4, 61440),
    }.items():
        w, h, s, lanes = args
        out[label] = round(bench(w, h, s, lanes), 3)
        print(json.dumps({label: out[label]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
