"""Root-cause the TPU-vs-golden gate failure (round-5 verdict #2).

The bench gate compares [TPU + cluster accel + mega engine] against the
committed golden [CPU + threaded-BVH + wavefront engine] — THREE factors
changing at once. This renders the gate config (showcase 64x64 @ 32 spp,
parity RNG) along a one-factor-at-a-time chain and reports each step's
RMSE + strong-flip pixels (|diff| > 1e-2), so the 8-pixel failure can be
attributed:

  G  : committed golden          (CPU,  bvh,     wavefront)
  C2 : accel-backend step        (CPU,  cluster, wavefront, quads auto)
  T2 : platform step             (TPU,  cluster, wavefront, quads auto)
  T2n: quads step                (TPU,  cluster, wavefront, quads off)
  T3 : engine step = bench gate  (TPU,  cluster, mega,      quads auto)

(A TPU+bvh platform probe is impossible: the threaded-BVH XLA path at
32-spp parity is one gather-bound mega-dispatch that trips the TPU
runtime watchdog — reproducible device error; the cluster path is the
only TPU-viable traversal, as NOTES has said since round 1. So the
platform step is taken on the CLUSTER backend instead, and the CPU leg
runs the Pallas interpreter — slow, run it with --variants C2.)

Usage: python tools/study_goldengate.py [--variants T2,T2n,T3,T3n]
       JAX_PLATFORMS=cpu python tools/study_goldengate.py --variants C2
Results accumulate in /tmp/goldengate_imgs.npz across runs; comparisons
print for whatever pairs are present.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="T2,T2n,T3,T3n")
    args = ap.parse_args()

    from complex_materials_renderer_tpu.utils.cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    from complex_materials_renderer_tpu.config import RenderOptions
    from complex_materials_renderer_tpu.renderer import Renderer
    from complex_materials_renderer_tpu.scene import load_scene
    from complex_materials_renderer_tpu.tools.goldens import (
        load_golden,
        rmse,
    )

    def render(backend, engine, quads="auto"):
        kw = dict(
            width=64, height=64, num_samples=32, shard="none",
            rng="parity", backend=backend, engine=engine, quads=quads,
        )
        opt = RenderOptions(obj_path="scenes/showcase.obj", **kw)
        scene = load_scene(opt.obj_path, opt)
        opts = dataclasses.replace(scene.options, **kw)
        return np.asarray(Renderer(scene, opts).render(), np.float64)

    imgs = {"G": load_golden("showcase_gate").astype(np.float64)}
    store = "/tmp/goldengate_imgs.npz"
    if os.path.exists(store):
        with np.load(store) as z:
            imgs.update({k: z[k] for k in z.files})
    variants = {
        "C2": ("cluster", "wavefront", "auto"),
        "T2": ("cluster", "wavefront", "auto"),
        "T2n": ("cluster", "wavefront", "off"),
        "T3": ("cluster", "mega", "auto"),
        "T3n": ("cluster", "mega", "off"),
    }
    for name in args.variants.split(","):
        backend, engine, quads = variants[name]
        imgs[name] = render(backend, engine, quads)
        print(f"# {name} rendered, mean {imgs[name].mean():.6f}", flush=True)
        np.savez(store, **{k: v for k, v in imgs.items() if k != "G"})

    def cmp(a, b):
        d = np.abs(imgs[a] - imgs[b]).max(-1)
        flips = np.argwhere(d > 1e-2)
        return {
            "rmse": round(rmse(imgs[a], imgs[b]), 7),
            "flips": int((d > 1e-2).sum()),
            "flip_px": [tuple(int(v) for v in p) for p in flips[:12]],
            "max_diff": round(float(d.max()), 5),
        }

    out = {}
    for a, b, label in [
        ("G", "C2", "accel backend (bvh->cluster, CPU wavefront)"),
        ("C2", "T2", "platform (CPU->TPU, cluster wavefront)"),
        ("T2n", "T2", "quads (off->auto, TPU cluster wavefront)"),
        ("T2", "T3", "engine (wavefront->mega, TPU cluster)"),
        ("T3n", "T3", "quads under mega (off->auto)"),
        ("G", "T3", "FULL GATE (golden vs bench config)"),
    ]:
        if a in imgs and b in imgs:
            out[label] = cmp(a, b)
            print(json.dumps({label: out[label]}), flush=True)

    print(json.dumps({"done": sorted(imgs)}))


if __name__ == "__main__":
    main()
