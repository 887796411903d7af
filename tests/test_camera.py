"""Camera ray-generation tests (reference volpath:575-601)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops.camera import TWOPI, make_camera, generate_rays


def test_lookat_basis_orthonormal():
    cam = make_camera((1.0, 2.0, 3.0), (0.0, 1.0, 0.0), 36.0)
    f, r, u = np.asarray(cam.forward), np.asarray(cam.right), np.asarray(cam.up)
    for v in (f, r, u):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.dot(f, r), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.dot(r, u), 0.0, atol=1e-6)
    # right = forward x world_up (volpath:589).
    np.testing.assert_allclose(r, np.cross(f, [0, 1, 0]) / np.linalg.norm(np.cross(f, [0, 1, 0])), atol=1e-6)


def test_fov_quirk():
    cam = make_camera((0, 0, 0), (0, 0, -1), 36.0)
    np.testing.assert_allclose(
        float(cam.fov_scale), TWOPI - np.deg2rad(36.0), rtol=1e-6
    )


def test_center_ray_is_forward():
    w, h = 64, 48
    cam = make_camera((0.0, 1.0, 5.0), (0.0, 1.0, 0.0), 36.0)
    pix = jnp.array([[w // 2, h // 2]])
    # Jitter chosen so the sample lands exactly at the image center.
    jitter = jnp.array([[0.0, 0.0]])
    o, d = generate_rays(cam, pix, jitter, (w, h))
    np.testing.assert_allclose(np.asarray(o)[0], [0, 1, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(d)[0], np.asarray(cam.forward), atol=1e-6)


def test_screen_mapping_and_y_flip():
    """u = (2x - W)/H, v = -(2y - H)/H (volpath:596-597): +x pixels go
    right, +y pixels go DOWN in world (flip)."""
    w, h = 64, 64
    cam = make_camera((0.0, 0.0, 5.0), (0.0, 0.0, 0.0), 36.0)
    pix = jnp.array([[w - 1, h // 2], [w // 2, h - 1]])
    jitter = jnp.array([[0.5, 0.0], [0.0, 0.5]])
    _, d = generate_rays(cam, pix, jitter, (w, h))
    d = np.asarray(d)
    right = np.asarray(cam.right)
    up = np.asarray(cam.up)
    assert np.dot(d[0], right) > 0  # right edge points along +right
    assert np.dot(d[1], up) < 0  # bottom edge points along -up (flip)


def test_aspect_ratio_uses_height():
    # u is normalized by height (volpath:596) — wide images widen the fov.
    cam = make_camera((0, 0, 0), (0, 0, -1), 36.0)
    pix = jnp.array([[0, 0]])
    jitter = jnp.array([[0.0, 0.0]])
    _, d_wide = generate_rays(cam, pix, jitter, (200, 100))
    _, d_sq = generate_rays(cam, pix, jitter, (100, 100))
    # Left edge of the wide image is farther out in x than the square's.
    assert abs(float(d_wide[0, 0])) > abs(float(d_sq[0, 0]))
