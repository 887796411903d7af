"""Fresnel/reflect/refract unit tests (reference volpath:312-335,545-562)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops import fresnel


def _n(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_reflect_mirror():
    d = jnp.array([[1.0, -1.0, 0.0]]) / np.sqrt(2)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = np.asarray(fresnel.reflect(d, n))[0]
    np.testing.assert_allclose(out, _n([1.0, 1.0, 0.0]), atol=1e-6)


def test_refract_normal_incidence_straight():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, tir = fresnel.refract(d, n, 1.0, 1.5)
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(out)[0] / np.linalg.norm(out[0]), [0, -1, 0], atol=1e-6)


def test_refract_snell_law():
    theta_i = np.deg2rad(40.0)
    d = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, tir = fresnel.refract(d, n, 1.0, 1.5)
    out = np.asarray(out)[0]
    out = out / np.linalg.norm(out)
    sin_t = out[0]
    np.testing.assert_allclose(sin_t, np.sin(theta_i) / 1.5, atol=1e-6)
    assert not bool(tir[0])


def test_total_internal_reflection_flag():
    # Glass -> air beyond the critical angle (~41.8 deg for n=1.5).
    theta_i = np.deg2rad(60.0)
    d = jnp.array([[np.sin(theta_i), -np.cos(theta_i), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    out, tir = fresnel.refract(d, n, 1.5, 1.0)
    assert bool(tir[0])
    np.testing.assert_allclose(np.asarray(out)[0], 0.0)
    # Full Fresnel routes TIR into the refract branch via R=0 (see docstring).
    r = fresnel.fresnel_r(1.5, 1.0, d, n)
    assert float(r[0]) == 0.0


def test_fresnel_normal_incidence():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = float(fresnel.fresnel_r(1.0, 1.5, d, n)[0])
    np.testing.assert_allclose(r, ((1.5 - 1.0) / (2.5)) ** 2, atol=1e-5)


def test_fresnel_brewster_angle():
    # At Brewster's angle rp = 0, so R = rs^2 / 2.
    n1, n2 = 1.0, 1.5
    brewster = np.arctan(n2 / n1)
    d = jnp.array([[np.sin(brewster), -np.cos(brewster), 0.0]], dtype=jnp.float32)
    n = jnp.array([[0.0, 1.0, 0.0]])
    r = float(fresnel.fresnel_r(n1, n2, d, n)[0])
    t2 = np.arcsin(n1 / n2 * np.sin(brewster))
    rs = (n1 * np.cos(brewster) - n2 * np.cos(t2)) / (
        n1 * np.cos(brewster) + n2 * np.cos(t2)
    )
    np.testing.assert_allclose(r, rs * rs / 2.0, atol=1e-5)


def test_fresnel_energy_bounds():
    rng = np.random.default_rng(1)
    d = rng.normal(size=(256, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    n = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (256, 1))
    for n1, n2 in [(1.0, 1.33), (1.33, 1.0), (1.0, 1.77), (1.77, 1.0)]:
        r = np.asarray(fresnel.fresnel_r(n1, n2, jnp.asarray(d), jnp.asarray(n)))
        assert np.all(r >= 0.0) and np.all(r <= 1.0)


def test_schlick_close_to_full_at_moderate_angles():
    d = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    full = float(fresnel.fresnel_r(1.0, 1.5, d, n, fast=False)[0])
    schlick = float(fresnel.fresnel_r(1.0, 1.5, d, n, fast=True)[0])
    np.testing.assert_allclose(full, schlick, atol=1e-4)
