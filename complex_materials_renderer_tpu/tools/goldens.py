"""Golden-image regression corpus: configs, generator, and gate logic.

The reference renders deterministically (RNG seed = linear pixel index,
volpath.comp.glsl:575), making frozen renders the natural integration
oracle (SURVEY §4). The Vulkan reference cannot run in this environment,
so the corpus freezes THIS renderer's verified output (parity RNG, XLA
CPU backend, threaded-BVH traversal) and gates regressions against it:

- exact gate: same backend, same platform -> images must match to float
  noise (``GOLDEN_ATOL``); a structural change (e.g. a 10% error in the
  scatter branch) fails loudly.
- RMSE gate: cross-backend / cross-platform comparisons use the
  BASELINE.json oracle threshold (RMSE <= 1e-3 at equal spp).

Regenerate with ``python -m complex_materials_renderer_tpu.tools.goldens``
after an INTENDED image change, and say why in the commit message.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# Hermetic scenes ship in-repo; reference scenes are used when present.
_REF = "/root/reference/resources/scenes"

# name -> (obj path, spp). 64x64, parity RNG, bvh backend, CPU.
GOLDEN_CONFIGS = {
    "showcase": ("scenes/showcase.obj", 4),
    # The bench's TPU-vs-golden acceptance gate. 32 spp instead of 4: a
    # cross-backend knife-edge decision flip (a hit or Fresnel draw
    # resolving differently on the CPU-bvh golden path vs the TPU mega
    # engine) perturbs ONE sample of the pixel's average, so at 32 spp
    # its RMSE contribution shrinks ~8x versus 4 spp — the r3 gate
    # failed at 1.8e-3 purely from 2/4096 flip pixels by measurement
    # design (round-3 verdict #2).
    "showcase_gate": ("scenes/showcase.obj", 32),
    "isobox": ("scenes/isobox.obj", 2),
    "gembox": ("scenes/gembox.obj", 2),
    "vessel": ("scenes/vessel.obj", 2),
    "gem_corner": (os.path.join(_REF, "gem_corner.obj"), 2),
    "stanford_dragon": (os.path.join(_REF, "stanford_dragon.obj"), 2),
    # The reference's flagship dense-media workload (20,624 tris, presso
    # coffee + glass): slowest golden by far, slow-marked in the tests.
    "cup": (os.path.join(_REF, "cup.obj"), 2),
}

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "golden")
GOLDEN_RES = 64
GOLDEN_ATOL = 1e-5  # same-backend float-noise allowance
GOLDEN_RMSE = 1e-3  # BASELINE.json cross-backend oracle


def render_golden(obj_path: str, spp: int) -> np.ndarray:
    """Render a golden-config frame (64x64, parity RNG, threaded-BVH
    backend — the portable deterministic path; scene JSON still overrides
    camera/lights exactly as in production)."""
    from ..config import RenderOptions
    from ..renderer import Renderer
    from ..scene import load_scene

    kw = dict(
        width=GOLDEN_RES,
        height=GOLDEN_RES,
        num_samples=spp,
        shard="none",
        backend="bvh",
        rng="parity",
    )
    opt = RenderOptions(obj_path=obj_path, **kw)
    scene = load_scene(obj_path, opt)
    opts = dataclasses.replace(scene.options, **kw)
    return np.asarray(Renderer(scene, opts).render())


def golden_path(name: str) -> str:
    return os.path.join(GOLDEN_DIR, f"{name}.npz")


def load_golden(name: str) -> np.ndarray | None:
    path = golden_path(name)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return np.asarray(z["img"], np.float32)


def rmse(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean((np.asarray(a, np.float64) - b) ** 2)))


def generate(names=None) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (path, spp) in GOLDEN_CONFIGS.items():
        if names and name not in names:
            continue
        if not os.path.exists(path):
            print(f"skip {name}: {path} absent")
            continue
        img = render_golden(path, spp)
        np.savez_compressed(
            golden_path(name), img=img.astype(np.float32), spp=spp,
            res=GOLDEN_RES,
        )
        print(f"{name}: mean={img.mean():.5f} std={img.std():.5f} -> "
              f"{golden_path(name)}")


if __name__ == "__main__":
    import sys

    import jax

    # Goldens are CPU-deterministic artifacts; force the CPU platform
    # before any backend touch (the env preselects the axon TPU).
    jax.config.update("jax_platforms", "cpu")
    generate(set(sys.argv[1:]) or None)
