"""Golden-render regression gates (SURVEY §4: deterministic renders are
the natural integration oracle; BASELINE.json oracle is RMSE <= 1e-3 at
equal spp).

Committed goldens live in tests/golden/*.npz (64x64, parity RNG, bvh
backend, CPU — see complex_materials_renderer_tpu/tools/goldens.py).
Regenerate deliberately with
``python -m complex_materials_renderer_tpu.tools.goldens`` after an
intended image change. Two gates per scene:

- exact: same backend/platform re-render matches to float noise (atol
  1e-5) — a structural change (e.g. 10% scatter-branch error) fails;
- RMSE: stays under the BASELINE oracle threshold 1e-3.

The hermetic scenes (showcase/isobox/gembox/vessel) always run; the
reference's cup/gem/dragon goldens run when /root/reference is present.
"""

import os

import numpy as np
import pytest

from complex_materials_renderer_tpu.tools.goldens import (
    GOLDEN_ATOL,
    GOLDEN_CONFIGS,
    GOLDEN_RMSE,
    load_golden,
    render_golden,
    rmse,
)


def _check(name):
    path, spp = GOLDEN_CONFIGS[name]
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    golden = load_golden(name)
    assert golden is not None, (
        f"no committed golden for {name}; run "
        "python -m complex_materials_renderer_tpu.tools.goldens"
    )
    img = render_golden(path, spp)
    assert img.shape == golden.shape
    assert np.all(np.isfinite(img))
    e = rmse(img, golden)
    assert e <= GOLDEN_RMSE, f"{name}: RMSE {e:.2e} > {GOLDEN_RMSE}"
    np.testing.assert_allclose(img, golden, atol=GOLDEN_ATOL, rtol=1e-4)


def test_showcase_golden():
    _check("showcase")


def test_isobox_golden():
    _check("isobox")


@pytest.mark.slow
def test_gembox_golden():
    _check("gembox")


@pytest.mark.slow
def test_vessel_golden():
    _check("vessel")


@pytest.mark.slow
def test_gem_corner_golden():
    _check("gem_corner")


@pytest.mark.slow
def test_cup_golden():
    _check("cup")


@pytest.mark.slow
def test_stanford_dragon_golden():
    _check("stanford_dragon")


def test_determinism_across_runs():
    path, _ = GOLDEN_CONFIGS["isobox"]
    a = render_golden(path, 2)
    b = render_golden(path, 2)
    np.testing.assert_array_equal(a, b)
