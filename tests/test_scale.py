"""Scene-scale boundaries (round-3 verdict #6): huge scenes auto-bump the
super fan-out instead of rejecting, and material ids are unbounded (the
NEE keys carry the media-table row index, not the raw id)."""

from __future__ import annotations

import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
)
from complex_materials_renderer_tpu.ops.medium import MediaTable
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.integrator import render_beauty
from complex_materials_renderer_tpu.render.megarender import render_beauty_mega
from complex_materials_renderer_tpu.renderer import Renderer
from complex_materials_renderer_tpu.scene.scene import Scene
from complex_materials_renderer_tpu.config import RenderOptions

from helpers import make_test_scene, fixture_camera, fixture_lights


def _random_tris(n, seed=0, extent=100.0):
    r = np.random.default_rng(seed)
    base = r.uniform(0, extent, (n, 1, 3)).astype(np.float32)
    return base + r.uniform(0, 0.5, (n, 3, 3)).astype(np.float32)


@pytest.mark.slow
def test_huge_scene_super_factor_autobump():
    """1.2M triangles: the Renderer widens the super fan-out until the
    grid fits the megakernel's 1024-super cap instead of raising."""
    n = 1_200_000
    tris = _random_tris(n)
    mats = np.zeros(n, np.int32)
    opt = RenderOptions()
    opt.backend = "cluster"
    opt.width = opt.height = 8
    opt.num_samples = 1
    from complex_materials_renderer_tpu.scene.scene import _empty_media

    scene = Scene(
        triangles=tris, mat_ids=mats, media=_empty_media(), options=opt,
        material_names=["m0"],
    )
    r = Renderer(scene, opt)
    grid = r._host_accel
    assert grid.super_bounds.shape[0] <= 1024, grid.super_bounds.shape
    assert grid.num_clusters * grid.v0x.shape[1] >= n
    # The device grid uploads without tripping any cap.
    dev = device_cluster_grid(grid)
    assert dev.num_supers <= 1024


def test_large_material_ids_render():
    """Material ids beyond the old 6-bit cap (e.g. 50000) work: mega
    (packed media-index keys) matches the wavefront engine (raw-id
    lookups) on a media scene."""
    tris, mats, media = make_test_scene()
    mats = np.where(mats == 1, 50000, 70000).astype(np.int32)
    media = MediaTable(
        mat_id=np.array([50000], np.int32),
        sigma_s=media.sigma_s, sigma_a=media.sigma_a,
        g=media.g, ior=media.ior,
    )
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    img_m = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    img_w = np.asarray(
        render_beauty(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 1, **kw
        )
    )
    assert np.all(np.isfinite(img_m))
    np.testing.assert_allclose(img_m, img_w, atol=1e-5)
