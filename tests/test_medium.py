"""Medium lookup / transmittance / distance sampling tests
(reference volpath:137-145, 248-253, 482-543)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops import medium


def _table():
    return medium.MediaTable(
        mat_id=jnp.array([0, 2, 3], jnp.int32),
        sigma_s=jnp.array([[1.0, 2.0, 3.0], [0.1, 0.1, 0.1], [0.0, 0.0, 0.0]], jnp.float32),
        sigma_a=jnp.array([[0.5, 0.5, 0.5], [0.2, 0.2, 0.2], [1.0, 1.0, 1.0]], jnp.float32),
        g=jnp.array([[0.9, 0.9, 0.9], [0.0, 0.0, 0.0], [0.5, 0.5, 0.5]], jnp.float32),
        ior=jnp.array([1.33, 1.5, 1.77], jnp.float32),
    )


def test_lookup_scaling_and_miss():
    mats = jnp.array([0, 1, 2, 3, -1], jnp.int32)
    lanes = medium.lookup(mats, _table(), scale=10.0)
    has = np.asarray(lanes.has_medium)
    np.testing.assert_array_equal(has, [True, False, True, True, False])
    # sigma scaled by 10 (volpath:141), g and ior unscaled.
    np.testing.assert_allclose(np.asarray(lanes.sigma_s)[0], [10.0, 20.0, 30.0])
    np.testing.assert_allclose(np.asarray(lanes.sigma_a)[2], [2.0, 2.0, 2.0])
    np.testing.assert_allclose(np.asarray(lanes.g)[0], [0.9, 0.9, 0.9])
    np.testing.assert_allclose(np.asarray(lanes.ior)[3], 1.77)
    # Missing lanes get the none medium (volpath:107).
    np.testing.assert_allclose(np.asarray(lanes.sigma_s)[1], 0.0)
    np.testing.assert_allclose(np.asarray(lanes.ior)[4], 1.0)


def test_transmittance_beer_lambert():
    ss = jnp.array([[1.0, 0.0, 2.0]])
    sa = jnp.array([[0.5, 0.5, 0.5]])
    tr = np.asarray(medium.eval_transmittance(jnp.array([2.0]), ss, sa))[0]
    np.testing.assert_allclose(tr, np.exp(-np.array([1.5, 0.5, 2.5]) * 2.0), rtol=1e-5)


def test_sample_distance_success_branch():
    ss = jnp.array([[1.0, 1.0, 1.0]])
    sa = jnp.array([[1.0, 1.0, 1.0]])
    # density = 2, albedo = 0.5 -> weight = 0.5; rand=0.25 < 0.5 -> draw.
    s = medium.sample_distance(jnp.array([0.25]), ss, sa, jnp.array([100.0]))
    assert bool(s.success[0])
    expected_t = -np.log(1 - 0.5) / 2.0
    np.testing.assert_allclose(float(s.t[0]), expected_t, rtol=1e-5)
    pf = np.exp(-2.0 * expected_t)
    np.testing.assert_allclose(float(s.prob_success[0]), 2.0 * pf * 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(s.prob_fail[0]), 0.5 * pf + 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s.transmittance)[0], np.exp(-2.0 * expected_t), rtol=1e-5)


def test_sample_distance_weight_clamp():
    # Tiny albedo still clamps the weight up to 0.5 (volpath:501-504).
    ss = jnp.array([[0.01, 0.01, 0.01]])
    sa = jnp.array([[1.0, 1.0, 1.0]])
    s = medium.sample_distance(jnp.array([0.49]), ss, sa, jnp.array([1e4]))
    assert bool(s.success[0])  # rand < 0.5 draws an interaction
    s2 = medium.sample_distance(jnp.array([0.51]), ss, sa, jnp.array([1e4]))
    assert not bool(s2.success[0])  # beyond the clamped weight -> sentinel


def test_sample_distance_no_scatter_medium():
    # sigma_s = 0 -> weight 0 -> never scatters, prob_fail = 1.
    ss = jnp.zeros((1, 3))
    sa = jnp.array([[1.0, 1.0, 1.0]])
    s = medium.sample_distance(jnp.array([0.0]), ss, sa, jnp.array([3.0]))
    assert not bool(s.success[0])
    np.testing.assert_allclose(float(s.prob_fail[0]), 1.0)
    np.testing.assert_allclose(np.asarray(s.transmittance)[0], np.exp(-3.0), rtol=1e-5)


def test_sample_distance_failure_uses_segment_length():
    ss = jnp.array([[1.0, 1.0, 1.0]])
    sa = jnp.zeros((1, 3))
    # weight = 1 (albedo 1); huge rand -> long sample > dist -> failure at dist.
    s = medium.sample_distance(jnp.array([0.999999]), ss, sa, jnp.array([0.1]))
    assert not bool(s.success[0])
    np.testing.assert_allclose(float(s.t[0]), 0.1)


def test_sample_distance_transmittance_clamp():
    ss = jnp.array([[1.0, 1.0, 1.0]])
    sa = jnp.zeros((1, 3))
    # weight = 1, t = -log(1 - 0.99995) ~ 9.9 -> exp(-9.9) ~ 5e-5 < 1e-4
    s = medium.sample_distance(jnp.array([0.99995]), ss, sa, jnp.array([100.0]))
    # max transmittance < 1e-4 -> clamped to zero (volpath:537-540).
    np.testing.assert_array_equal(np.asarray(s.transmittance)[0], 0.0)


def test_sample_distance_zero_extinction_channel():
    # A channel with zero extinction must not poison the weight (GLSL 0/0
    # NaN compares false, volpath:494-498).
    ss = jnp.array([[0.5, 0.0, 0.0]])
    sa = jnp.array([[0.5, 0.0, 1.0]])
    s = medium.sample_distance(jnp.array([0.3]), ss, sa, jnp.array([5.0]))
    assert np.isfinite(float(s.prob_fail[0]))
    assert np.isfinite(float(s.t[0]))


def test_expected_scatter_probability():
    """Monte-Carlo expectation: fraction of successes over u ~ U[0,1]
    equals w * (1 - exp(-density * dist))."""
    ss = jnp.full((200_000, 3), 0.8)
    sa = jnp.full((200_000, 3), 0.2)
    rng = np.random.default_rng(5)
    rand = jnp.asarray(rng.random(200_000, np.float32))
    dist = jnp.full((200_000,), 1.5)
    s = medium.sample_distance(rand, ss, sa, dist)
    density = 1.0
    w = 0.8
    expect = w * (1 - np.exp(-density * 1.5))
    np.testing.assert_allclose(np.asarray(s.success).mean(), expect, atol=0.005)
