"""Binned-trace engine tests (render/binnedrender.py).

The binned engine must be a drop-in for the wavefront/mega engines: same
physics module (integrator._bounce with a swapped Tracer), same per-lane
RNG streams, same image. CPU CI interprets the Pallas kernels on a tiny
frame with float-noise tolerance (the engines associate float ops
differently)."""

import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
)
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.integrator import render_beauty
from complex_materials_renderer_tpu.render.megarender import (
    render_beauty_mega,
)

from helpers import make_test_scene, fixture_camera, fixture_lights


def _setup():
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    return scene, grid


@pytest.mark.slow
def test_binned_matches_wavefront_tiny():
    """Binned engine vs the XLA wavefront engine on an 8x8 frame: the
    physics is literally the same code (integrator._bounce), the NEE
    march differs (K-list sweep vs per-leg queries) but resolves the
    same boundaries on this scene, and the traces must agree."""
    scene, grid = _setup()
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=2)
    img_b = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            trace_engine="binned", **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    assert np.all(np.isfinite(img_b))
    np.testing.assert_allclose(img_b, img_w, atol=1e-5)


@pytest.mark.slow
def test_binned_matches_mega_counter_mode():
    """Counter-RNG sample-packed path: binned vs fused megakernel, both
    under the megarender driver (same banking/packing)."""
    scene, grid = _setup()
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=2, rng_mode="counter")
    img_b = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2,
            trace_engine="binned", **kw
        )
    )
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2, **kw
        )
    )
    assert np.all(np.isfinite(img_b))
    np.testing.assert_allclose(img_b, img_m, atol=1e-5)


@pytest.mark.slow
def test_binned_tight_list_matches():
    """A 2-slot candidate list (forcing overflow generations inside every
    trace) must not change the image."""
    scene, grid = _setup()
    kw = dict(max_depth=3, rr_depth=2, nee_max_media=2)
    img_a = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            trace_engine="binned", binned_list=2, binned_cap=2, **kw
        )
    )
    img_b = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1,
            trace_engine="binned", **kw
        )
    )
    np.testing.assert_allclose(img_a, img_b, atol=1e-6)
