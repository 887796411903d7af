"""Diffuse BSDF tests (reference volpath:255-310)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops import diffuse


def _sample_many(n=200_000, seed=4):
    rng = np.random.default_rng(seed)
    r1 = jnp.asarray(rng.random(n, np.float32))
    r2 = jnp.asarray(rng.random(n, np.float32))
    wi = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    nrm = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))
    wo, val = diffuse.diffuse_sample(wi, nrm, r1, r2)
    return np.asarray(wo), np.asarray(val)


def test_sample_upper_hemisphere_unit():
    wo, val = _sample_many()
    assert np.all(wo[:, 2] > 0)
    np.testing.assert_allclose(np.linalg.norm(wo, axis=-1), 1.0, atol=1e-3)
    np.testing.assert_allclose(val, diffuse.REFLECTANCE)


def test_cosine_distribution_chi_square():
    wo, _ = _sample_many(400_000)
    cos = wo[:, 2]
    bins = np.linspace(0, 1, 21)
    hist, _ = np.histogram(cos, bins=bins, density=True)
    centers = 0.5 * (bins[:-1] + bins[1:])
    pdf = 2.0 * centers  # p(cos) = 2 cos for cosine-weighted hemisphere
    rel = np.abs(hist - pdf) / np.maximum(pdf, 0.05)
    assert np.quantile(rel, 0.9) < 0.08


def test_backface_sample_zero():
    wi = jnp.array([[0.0, 0.0, -1.0]])
    nrm = jnp.array([[0.0, 0.0, 1.0]])
    _, val = diffuse.diffuse_sample(wi, nrm, jnp.array([0.3]), jnp.array([0.7]))
    np.testing.assert_allclose(np.asarray(val), 0.0)


def test_eval_quirky_frame_mix():
    # wo is local (z-up) but dotted against the world normal (volpath:257-262).
    wi = jnp.array([[0.0, 0.0, 1.0]])
    nrm = jnp.array([[0.0, 0.0, 1.0]])
    wo_local = jnp.array([[0.6, 0.0, 0.8]])
    val = np.asarray(diffuse.diffuse_eval(wi, wo_local, nrm))[0]
    np.testing.assert_allclose(val, diffuse.REFLECTANCE * diffuse.INV_PI * 0.8, rtol=1e-6)
    # Normal pointing -z: local wo has negative dot -> zero.
    val2 = np.asarray(diffuse.diffuse_eval(wi, wo_local, -nrm))[0]
    np.testing.assert_allclose(val2, 0.0)


def test_concentric_disk_zero_input():
    x, y = diffuse.concentric_disk(jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_allclose(np.asarray(x), 0.0)
    np.testing.assert_allclose(np.asarray(y), 0.0)
