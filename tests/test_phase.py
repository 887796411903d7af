"""Henyey-Greenstein phase tests (reference volpath:428-479)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops import phase


def test_eval_matches_closed_form():
    g = jnp.array([0.5])
    ind = jnp.array([[0.0, 0.0, 1.0]])
    outd = jnp.array([[0.0, 0.0, 1.0]])  # cos = 1
    val = float(phase.hg_eval(ind, outd, g)[0])
    expect = phase.INV_FOURPI * (1 - 0.25) / ((1 + 0.25 + 1.0) ** 1.5)
    np.testing.assert_allclose(val, expect, rtol=1e-6)


def test_eval_integrates_to_one():
    # Integrate HG over the sphere with uniform directions: mean * 4pi = 1.
    rng = np.random.default_rng(2)
    d = rng.normal(size=(200_000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ind = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (d.shape[0], 1))
    for g in [0.0, 0.3, -0.4, 0.9]:
        vals = np.asarray(phase.hg_eval(jnp.asarray(ind), jnp.asarray(d), jnp.full(d.shape[0], g, np.float32)))
        integral = vals.mean() * 4.0 * np.pi
        np.testing.assert_allclose(integral, 1.0, atol=0.02)


def test_eval_zero_matches_cos0():
    g = jnp.array([0.7])
    ind = jnp.array([[0.0, 0.0, 1.0]])
    perp = jnp.array([[1.0, 0.0, 0.0]])  # cos = 0
    np.testing.assert_allclose(
        float(phase.hg_eval_zero(g)[0]), float(phase.hg_eval(ind, perp, g)[0]), rtol=1e-6
    )


def _sample_many(g, n=100_000, seed=3):
    rng = np.random.default_rng(seed)
    r1 = jnp.asarray(rng.random(n, np.float32))
    r2 = jnp.asarray(rng.random(n, np.float32))
    ind = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    out, w = phase.hg_sample(ind, jnp.full(n, g, jnp.float32), r1, r2)
    return np.asarray(out), np.asarray(w)


def test_sample_unit_vectors_and_mean_cosine():
    for g in [0.0, 0.25, 0.75, -0.5]:
        out, w = _sample_many(g)
        np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-4)
        np.testing.assert_allclose(w, 1.0)
        # mean cosine of HG = g. inDir = -z so forward scattering is +z
        # relative to the propagation direction +z... the frame normal is
        # -inDir = +z, and cos_theta is measured against it.
        cos = out[:, 2]
        np.testing.assert_allclose(cos.mean(), g, atol=0.01)


def test_sample_isotropic_guard_no_nan():
    out, _ = _sample_many(0.0)
    assert np.all(np.isfinite(out))
    # Isotropic: uniform over the sphere.
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=0.02)


def test_sample_chi_square_against_pdf():
    """Histogram of cos(theta) vs the analytic HG pdf of cos."""
    g = 0.6
    out, _ = _sample_many(g, n=400_000)
    cos = out[:, 2]
    bins = np.linspace(-1, 1, 41)
    histogram, _ = np.histogram(cos, bins=bins, density=True)
    centers = 0.5 * (bins[:-1] + bins[1:])
    # The reference sampler's cos_theta convention gives mean +g against
    # the frame normal; pdf over that cosine:
    pdf = 0.5 * (1 - g * g) / (1 + g * g - 2 * g * centers) ** 1.5
    rel = np.abs(histogram - pdf) / np.maximum(pdf, 1e-3)
    assert np.quantile(rel, 0.9) < 0.1
