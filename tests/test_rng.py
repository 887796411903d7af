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


# --- ld mode: padded Owen-scrambled low-discrepancy sampler ---


def _ld_draws(pixels, sample_indices, n_dims):
    """(len(pixels)*len(samples), n_dims) draw matrix."""
    import itertools

    pix = jnp.asarray(
        [p for p, _ in itertools.product(pixels, sample_indices)], jnp.uint32
    )
    smp = jnp.asarray(
        [s for _, s in itertools.product(pixels, sample_indices)], jnp.uint32
    )
    state = rng.seed_ld(pix, smp)
    out = []
    for _ in range(n_dims):
        state, v = rng.next_float(state)
        out.append(np.asarray(v))
    return np.stack(out, axis=-1)


def test_ld_uniform():
    vals = _ld_draws(range(256), range(16), 4)
    assert vals.min() >= 0.0 and vals.max() < 1.0
    assert abs(vals.mean() - 0.5) < 0.01
    assert abs(vals.var() - 1.0 / 12.0) < 0.01


def test_ld_stratified_per_pixel_dimension():
    """For every (pixel, dim), the first 2^k samples land one per 1/2^k
    bin — the defining property of an Owen-scrambled (0,1)-sequence, and
    the variance mechanism of the whole mode."""
    for n in (16, 64):
        vals = _ld_draws(range(32), range(n), 3)  # (32*n, 3)
        vals = vals.reshape(32, n, 3)
        bins = np.floor(vals * n).astype(int)
        for p in range(32):
            for d in range(3):
                assert sorted(bins[p, :, d]) == list(range(n)), (
                    f"pixel {p} dim {d} not stratified at {n} samples"
                )


def test_ld_dims_and_pixels_decorrelated():
    n = 4096
    vals = _ld_draws(range(2), range(n), 2)
    v = vals.reshape(2, n, 2)
    # correlation across dims within a pixel, and across pixels per dim
    for a, b in [
        (v[0, :, 0], v[0, :, 1]),
        (v[0, :, 0], v[1, :, 0]),
        (v[1, :, 0], v[1, :, 1]),
    ]:
        c = np.corrcoef(a, b)[0, 1]
        assert abs(c) < 0.05, c


def test_ld_masked_draw_advances_dim_on_every_lane():
    """Dimensions are lockstep: a masked draw advances EVERY lane's dim
    (a masked-out lane just never uses the value), so all lanes always
    share one dimension index — the property the kernels' scalar
    direction-row fetch relies on."""
    state = rng.seed_ld(jnp.arange(8, dtype=jnp.uint32), 3)
    mask = jnp.array([True, False] * 4)
    new_state, _ = rng.next_float_masked(state, mask)
    ns = np.asarray(new_state)
    os = np.asarray(state)
    np.testing.assert_array_equal(ns[:, 2], os[:, 2] + 1)
    # sample / pixel-hash fields never change
    np.testing.assert_array_equal(ns[:, :2], os[:, :2])


def test_ld_matches_scrambled_sobol_model():
    """Draw values equal a direct numpy model: Owen-scrambled Sobol
    (torch Joe-Kuo directions), scramble keyed by (pixel, dim)."""
    mat = rng.sobol_matrices()
    pix = jnp.asarray([0, 7, 123], jnp.uint32)
    state = rng.seed_ld(pix, 0)
    got = []
    for _ in range(3):
        state, v = rng.next_float(state)
        got.append(np.asarray(v))
    state = rng.seed_ld(pix, 5)  # sample index 5 = bits 0 and 2
    _, v5 = rng.next_float(state)

    def model(p, s, d):
        shuffle = np.asarray(
            rng._output(rng.step(np.uint32(p) * np.uint32(0x85EBCA6B) + np.uint32(2)))
        )
        rev0 = lambda x: np.asarray(rng._reverse_bits32(jnp.uint32(x)))
        s = rev0(np.asarray(rng._lk_hash(jnp.uint32(rev0(np.uint32(s))), jnp.uint32(shuffle))))
        v = np.uint32(0)
        for j in range(30):
            if (s >> j) & 1:
                v ^= mat[d, j]
        ph = np.asarray(
            rng._output(rng.step(np.uint32(p) * np.uint32(0x9E3779B9) + np.uint32(1)))
        )
        key = np.asarray(
            rng._output(rng.step(ph ^ (np.uint32(d) * np.uint32(0x9E3779B9))))
        )
        rev = lambda x: np.asarray(rng._reverse_bits32(jnp.uint32(x)))
        word = rev(np.asarray(rng._lk_hash(jnp.uint32(rev(v)), jnp.uint32(key))))
        return np.float32(word) * np.float32(1.0 / 4294967295.0)

    for d in range(3):
        for i, p in enumerate([0, 7, 123]):
            assert got[d][i] == model(p, 0, d), (d, p)
    assert v5[1] == model(7, 5, 0)


def test_ld_wavefront_converges_to_counter_image():
    """rng='ld' samples the same estimand as 'counter': a moderate-spp ld
    render of the tiny scene must agree with a counter render to within
    their combined noise floor, and beat counter's RMSE vs a high-spp
    truth at equal spp."""
    from tests.helpers import tiny_scene_render

    truth = tiny_scene_render(rng="counter", spp=512)
    counter = tiny_scene_render(rng="counter", spp=32, sample_offset=1024)
    ld = tiny_scene_render(rng="ld", spp=32)

    def rmse(a, b):
        return float(np.sqrt(((a - b) ** 2).mean()))

    assert rmse(ld, truth) < rmse(counter, truth) * 1.05
    assert abs(ld.mean() - truth.mean()) < 0.02
