"""Golden-render regression canaries on the reference's shipped scenes
(SURVEY §4: deterministic renders are the natural integration oracle).

Loose statistical bounds rather than bit-hashes so legitimate
compiler-level fp drift doesn't trip them; structural changes (lighting,
occlusion, medium handling) will.
"""

import dataclasses
import os

import numpy as np
import pytest

from complex_materials_renderer_tpu.config import RenderOptions
from complex_materials_renderer_tpu.renderer import Renderer
from complex_materials_renderer_tpu.scene import load_scene

from conftest import reference_scene


def _render(path, **kw):
    opt = RenderOptions(
        obj_path=path,
        width=32,
        height=32,
        num_samples=2,
        shard="none",
        backend="bvh",
        **kw,
    )
    scene = load_scene(path, opt)
    # Keep CLI-era fields; JSON overrode camera etc.
    opts = dataclasses.replace(
        scene.options, width=32, height=32, num_samples=2, shard="none", backend="bvh"
    )
    return Renderer(scene, opts).render()


def test_gem_corner_golden():
    img = _render(reference_scene("gem_corner.obj"))
    assert img.shape == (32, 32, 3)
    assert np.all(np.isfinite(img))
    # Canary bounds captured from the first verified render (CPU, parity
    # RNG). MC noise at 2spp stays well inside these.
    assert 0.05 < img.mean() < 0.35
    assert img.max() > 0.3
    # The checkerboard background alternates: distinct bright/dark floor
    # pixels must exist.
    assert img.std() > 0.05


def test_stanford_dragon_golden():
    img = _render(reference_scene("stanford_dragon.obj"))
    assert np.all(np.isfinite(img))
    assert img.mean() > 0.01  # milk medium scatters light back


def test_determinism_across_runs():
    path = reference_scene("gem_corner.obj")
    a = _render(path)
    b = _render(path)
    np.testing.assert_array_equal(a, b)
