"""Adaptive per-pixel sample allocation (--spp-mode adaptive).

The feature has two layers, each pinned here:

- render_samples_mega (render/megarender.py): the per-lane entry point —
  caller-chosen (pixel, sample-index) pairs. For the SAME pairs it must
  reproduce the uniform path bit-for-bit (counter/ld streams are derived
  per (pixel, sample), so the estimator cannot depend on lane packing).
- Renderer.render_adaptive (renderer.py): the allocation driver — same
  total budget as uniform, per-pixel counts tracking measured noise.
  Measured headroom: ideal 1.50x / realizable ~1.34x variance at the
  bench protocol (tools/study_adaptive.py, NOTES round 5e).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.config import RenderOptions
from complex_materials_renderer_tpu.kernels.pallas_trace import device_cluster_grid
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays
from complex_materials_renderer_tpu.render.megarender import (
    render_beauty_mega,
    render_samples_mega,
)
from complex_materials_renderer_tpu.renderer import Renderer
from complex_materials_renderer_tpu.scene.scene import Scene

from helpers import make_test_scene, fixture_camera, fixture_lights


def _tiny_adaptive_options(**over):
    opt = RenderOptions()
    opt.width = opt.height = 8
    opt.num_samples = 4
    opt.rng = "counter"
    opt.shard = "none"
    opt.backend = "cluster"
    opt.engine = "mega"
    opt.spp_mode = "adaptive"
    opt.max_depth = 4
    opt.rr_depth = 2
    opt.nee_max_media = 1
    opt.cluster_size = 8
    opt.camera_pos = (0.0, 1.5, 5.0)
    opt.camera_look_at = (0.0, 1.0, 0.0)
    opt.camera_fov = 36.0
    opt.scale = 1.0
    for k, v in over.items():
        setattr(opt, k, v)
    return opt


@pytest.mark.slow
@pytest.mark.parametrize("rng_mode", ["counter", "ld"])
def test_render_samples_matches_uniform(rng_mode):
    """A lane list containing exactly the uniform (pixel, sample) pairs
    must reproduce render_beauty_mega bit-for-bit: the streams are keyed
    by (pixel, sample), not by lane position."""
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    kw = dict(max_depth=4, rr_depth=2, nee_max_media=1)
    img = np.asarray(
        render_beauty_mega(
            fixture_camera(), scene, grid, fixture_lights(), (8, 8), 2,
            rng_mode=rng_mode, **kw,
        )
    )
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    pix = np.stack([xs.reshape(-1), ys.reshape(-1)], -1).astype(np.int32)
    pix2 = np.repeat(pix, 2, axis=0)
    sidx = np.tile(np.arange(2, dtype=np.uint32), 64)
    rad = np.asarray(
        render_samples_mega(
            fixture_camera(), scene, grid, fixture_lights(),
            jnp.asarray(pix2), jnp.asarray(sidx), jnp.ones(128, bool),
            (8, 8), rng_mode=rng_mode, **kw,
        )
    )
    per_px = rad.reshape(64, 2, 3).mean(1).reshape(8, 8, 3)
    np.testing.assert_array_equal(per_px, img)


@pytest.mark.slow
def test_render_samples_invalid_lanes_are_zero():
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    pix = np.tile(np.array([[4, 4]], np.int32), (8, 1))
    sidx = np.arange(8, dtype=np.uint32)
    val = np.array([True, False] * 4)
    rad = np.asarray(
        render_samples_mega(
            fixture_camera(), scene, grid, fixture_lights(),
            jnp.asarray(pix), jnp.asarray(sidx), jnp.asarray(val), (8, 8),
            max_depth=4, rr_depth=2, nee_max_media=1,
        )
    )
    assert np.all(rad[~val] == 0.0)
    assert np.all(np.isfinite(rad))


def test_render_samples_rejects_parity():
    tris, mats, media = make_test_scene()
    scene = make_scene_arrays(tris, mats, media, 1.0, 1)
    grid = device_cluster_grid(build_clusters(tris, mats, cluster_size=8))
    with pytest.raises(ValueError, match="stateless"):
        render_samples_mega(
            fixture_camera(), scene, grid, fixture_lights(),
            jnp.zeros((8, 2), jnp.int32), jnp.zeros(8, jnp.uint32),
            jnp.ones(8, bool), (8, 8), rng_mode="parity",
        )


@pytest.mark.slow
def test_adaptive_render_budget_and_estimate():
    """End-to-end adaptive render: exact total budget, all counts >= 1
    (warmup + uniform floor), finite image, and the snapshot hook sees a
    monotone average-spp sequence ending at -s."""
    tris, mats, media = make_test_scene()
    opt = _tiny_adaptive_options()
    scene = Scene(tris, mats, media, opt, [])
    r = Renderer(scene, opt)
    seen = []
    img = r.render_adaptive(snapshot_cb=lambda avg, f: seen.append(avg))
    assert img.shape == (8, 8, 3)
    assert np.all(np.isfinite(img))
    assert seen == sorted(seen) and abs(seen[-1] - opt.num_samples) < 1e-9


def test_adaptive_option_guards():
    tris, mats, media = make_test_scene()
    opt = _tiny_adaptive_options(rng="parity")
    with pytest.raises(ValueError, match="stateless"):
        Renderer(Scene(tris, mats, media, opt, []), opt).render()
    opt = _tiny_adaptive_options(checkpoint="/tmp/ck.npz")
    with pytest.raises(ValueError, match="checkpoint"):
        Renderer(Scene(tris, mats, media, opt, []), opt).render()
    opt = _tiny_adaptive_options(backend="bvh", engine="wavefront")
    with pytest.raises(ValueError, match="mega"):
        Renderer(Scene(tris, mats, media, opt, []), opt).render()


def test_spp_mode_cli_parse():
    from complex_materials_renderer_tpu.config import parse_argv

    opt = parse_argv(["--spp-mode", "adaptive"])
    assert opt.spp_mode == "adaptive"
    with pytest.raises(ValueError):
        parse_argv(["--spp-mode", "bogus"])
