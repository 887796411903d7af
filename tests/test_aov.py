"""AOV render tests: closed-form depth/normal/topology on analytic scenes
(the reference's debug kernels as oracles, SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops.camera import make_camera
from complex_materials_renderer_tpu.render.aov import render_aov
from helpers import assemble, make_test_scene, quad


def _flat_quad_scene():
    # A single quad at z = -2 spanning the whole view.
    tris = np.asarray(quad([-50, -50, -2], [50, -50, -2], [50, 50, -2], [-50, 50, -2]), np.float32)
    mats = np.zeros(2, np.int32)
    from complex_materials_renderer_tpu.ops.medium import MediaTable

    media = MediaTable(
        mat_id=np.array([-2], np.int32),
        sigma_s=np.zeros((1, 3), np.float32),
        sigma_a=np.zeros((1, 3), np.float32),
        g=np.zeros((1, 3), np.float32),
        ior=np.ones((1,), np.float32),
    )
    return tris, mats, media


def test_depth_of_axis_aligned_quad():
    tris, mats, media = _flat_quad_scene()
    scene, bvh = assemble(tris, mats, media)
    cam = make_camera((0.0, 0.0, 1.0), (0.0, 0.0, -2.0), 36.0)
    img = np.asarray(render_aov(tris, cam, bvh, (16, 16), "depth"))
    assert img.shape == (16, 16, 3)
    # Center pixel: ray straight down -z, quad 3 units away -> t/10 = 0.3.
    # Off-center rays are longer: t = 3 / cos(angle) >= 3.
    assert np.all(img * 10.0 >= 3.0 - 1e-3)
    center = img[8, 8, 0] * 10.0
    np.testing.assert_allclose(center, 3.0, rtol=1e-3)
    # Greyscale.
    np.testing.assert_array_equal(img[..., 0], img[..., 1])


def test_normal_aov_colors():
    tris, mats, media = _flat_quad_scene()
    scene, bvh = assemble(tris, mats, media)
    cam = make_camera((0.0, 0.0, 1.0), (0.0, 0.0, -2.0), 36.0)
    img = np.asarray(render_aov(tris, cam, bvh, (8, 8), "normal"))
    # Quad normal is +z -> color (0.5, 0.5, 1.0).
    np.testing.assert_allclose(img.reshape(-1, 3), [[0.5, 0.5, 1.0]] * 64, atol=1e-5)


def test_normal_aov_sky():
    tris, mats, media = _flat_quad_scene()
    scene, bvh = assemble(tris, mats, media)
    # Camera looking away from the quad.
    cam = make_camera((0.0, 0.0, 1.0), (0.0, 0.0, 4.0), 36.0)
    img = np.asarray(render_aov(tris, cam, bvh, (8, 8), "normal"))
    np.testing.assert_allclose(img.reshape(-1, 3), [[0.0, 0.0, 0.5]] * 64, atol=1e-6)


def test_topology_barycentrics_sum():
    tris, mats, media = make_test_scene()
    scene, bvh = assemble(tris, mats, media)
    from helpers import fixture_camera

    img = np.asarray(render_aov(tris, fixture_camera(), bvh, (32, 24), "topology"))
    sky = np.all(np.abs(img - np.array([0.0, 0.0, 0.5])) < 1e-6, axis=-1)
    sums = img.sum(axis=-1)
    assert np.all(np.abs(sums[~sky] - 1.0) < 1e-4)
    assert (~sky).sum() > 0
