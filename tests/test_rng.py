"""PCG32 stream parity with the reference shader RNG (volpath:231-246)."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.ops import rng


def _ref_step(state: int) -> int:
    return (state * 747796405 + 1) & 0xFFFFFFFF


def _ref_next(state: int):
    """Literal python port of stepAndOutputRNGFloat for cross-checking."""
    state = _ref_step(state)
    word = (((state >> ((state >> 28) + 4)) ^ state) * 277803737) & 0xFFFFFFFF
    word = (word >> 22) ^ word
    return state, np.float32(word) / np.float32(4294967295.0)


def test_stream_matches_scalar_model():
    seeds = np.array([0, 1, 12345, 0xFFFFFFFF, 1920 * 540 + 960], np.uint32)
    state = jnp.asarray(seeds)
    py_state = [int(s) for s in seeds]
    for _ in range(32):
        state, val = rng.next_float(state)
        expect = []
        for i in range(len(py_state)):
            py_state[i], v = _ref_next(py_state[i])
            expect.append(v)
        np.testing.assert_array_equal(np.asarray(state), np.asarray(py_state, np.uint32))
        np.testing.assert_allclose(np.asarray(val), np.asarray(expect), rtol=0, atol=0)


def test_uniform_range_and_mean():
    state = jnp.arange(4096, dtype=jnp.uint32)
    vals = []
    for _ in range(16):
        state, v = rng.next_float(state)
        vals.append(np.asarray(v))
    vals = np.concatenate(vals)
    assert vals.min() >= 0.0 and vals.max() <= 1.0
    assert abs(vals.mean() - 0.5) < 0.01
    assert abs(vals.var() - 1.0 / 12.0) < 0.01


def test_masked_draw_preserves_state():
    state = jnp.arange(8, dtype=jnp.uint32)
    mask = jnp.array([True, False] * 4)
    new_state, _ = rng.next_float_masked(state, mask)
    np.testing.assert_array_equal(
        np.asarray(new_state)[1::2], np.arange(8, dtype=np.uint32)[1::2]
    )
    assert not np.any(
        np.asarray(new_state)[::2] == np.arange(8, dtype=np.uint32)[::2]
    )


def test_counter_seeds_decorrelated():
    pix = jnp.zeros(1024, jnp.uint32)
    s0 = np.asarray(rng.seed_counter(pix, 0))
    s1 = np.asarray(rng.seed_counter(pix, 1))
    assert not np.any(s0 == s1)
