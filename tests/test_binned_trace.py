"""Binned per-lane tracer: equivalence vs a brute-force oracle that
replicates the kernels' exact epsilon semantics (interpret mode on CPU;
the same kernels compile on TPU). Payload contract must match the
megakernel's traverse — kernels/cluster_test.py is shared, so these
tests pin the listing/round/overflow machinery, not the triangle math."""

import jax.numpy as jnp
import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.kernels.binned_trace import trace_binned
from complex_materials_renderer_tpu.kernels.megakernel import pack_media
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
)
from complex_materials_renderer_tpu.ops.medium import MediaTable

_W = 8  # narrow cluster unroll keeps the Pallas interpreter fast
T_MIN = 1e-4


def _random_tris(n, seed=0, spread=2.0, size=0.5):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(n, 1, 3))
    return (base + rng.uniform(-size, size, size=(n, 3, 3))).astype(np.float32)


def _random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _media_table(mat_ids):
    return MediaTable(
        mat_id=np.asarray(mat_ids, np.int32),
        sigma_s=np.full((len(mat_ids), 3), 0.3, np.float32),
        sigma_a=np.full((len(mat_ids), 3), 0.1, np.float32),
        g=np.zeros((len(mat_ids), 3), np.float32),
        ior=np.full((len(mat_ids),), 1.33, np.float32),
    )


def _world(tris):
    return tris.min(axis=(0, 1)), tris.max(axis=(0, 1))


def _eff_clamped(o, d, bound, wlo, whi):
    """Scene-box exit clamp, replicating trace_binned/traverse."""
    tiny = 1e-12
    inv = 1.0 / np.where(np.abs(d) < tiny, np.where(d < 0, -tiny, tiny), d)
    tf = np.maximum((wlo[None] - o) * inv, (whi[None] - o) * inv).min(1)
    eff = np.where(bound > T_MIN, bound, 0.0)
    return np.minimum(eff, np.maximum(tf, 0.0) * 1.0001 + 10.0 * T_MIN)


def _oracle_hits(o, d, tris):
    """All (t, u, v, tri) candidates per ray with the kernels' epsilons."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    p = np.cross(d[:, None, :], e2[None])
    det = np.einsum("tk,rtk->rt", e1, p)
    inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1e30)
    s = o[:, None, :] - v0[None]
    u = np.einsum("rtk,rtk->rt", s, p) * inv
    q = np.cross(s, e1[None])
    v = np.einsum("rk,rtk->rt", d, q) * inv
    t = np.einsum("tk,rtk->rt", e2, q) * inv
    eps = 1e-6
    ok = (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (t > T_MIN)
    return np.where(ok, t, np.inf), u, v


def _scene(n=60, seed=0, media_every=3):
    tris = _random_tris(n, seed)
    mats = (np.arange(n) % media_every == 0).astype(np.int32)  # 1 = medium
    grid = device_cluster_grid(
        build_clusters(tris, mats, cluster_size=_W), interpret=True
    )
    media9 = pack_media(_media_table([1]), 1.0)
    return tris, mats, grid, media9


def test_binned_full_matches_oracle():
    tris, mats, grid, media9 = _scene()
    wlo, whi = _world(tris)
    o, d = _random_rays(200, seed=3)
    bound = np.full(200, 1e4, np.float32)
    bound[::17] = 0.0  # inactive lanes

    out = trace_binned(
        grid, media9, jnp.asarray(o), jnp.asarray(d), jnp.asarray(bound),
        "full", world_lo=tuple(map(float, wlo)),
        world_hi=tuple(map(float, whi)),
    )
    t, slot, u, v, nx, ny, nz, mat, px, py, pz = (np.asarray(x) for x in out)

    eff = _eff_clamped(o, d, bound, wlo, whi)
    ot, _ou, _ov = _oracle_hits(o, d, tris)
    ot = np.where(ot < eff[:, None], ot, np.inf)
    best = ot.min(axis=1)
    jt = ot.argmin(axis=1)

    hit = np.isfinite(best)
    assert np.array_equal(slot >= 0, hit)
    np.testing.assert_allclose(t[hit], best[hit], rtol=1e-5)
    # Miss lanes carry their (clamped) bound.
    np.testing.assert_allclose(t[~hit], eff[~hit], rtol=1e-5)
    # slot -> original triangle id
    tri_of_slot = np.asarray(grid.tri_index)[slot[hit].astype(np.int32)]
    assert np.array_equal(tri_of_slot, jt[hit])
    assert np.array_equal(mat[hit].astype(np.int32), mats[jt[hit]])
    # Barycentric position reconstruction lands on the ray.
    expect_p = o[hit] + t[hit, None] * d[hit]
    got_p = np.stack([px, py, pz], -1)[hit]
    np.testing.assert_allclose(got_p, expect_p, atol=2e-3)
    # Dead lanes: no hit.
    assert np.all(slot[bound <= T_MIN] == -1.0)


def test_binned_dist_matches_oracle():
    tris, mats, grid, media9 = _scene(seed=5)
    wlo, whi = _world(tris)
    o, d = _random_rays(300, seed=6)
    rng = np.random.default_rng(9)
    bound = rng.uniform(0.1, 6.0, 300).astype(np.float32)
    bound[::11] = 0.0

    t, slot = (
        np.asarray(x)
        for x in trace_binned(
            grid, media9, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(bound), "dist",
            world_lo=tuple(map(float, wlo)), world_hi=tuple(map(float, whi)),
        )
    )
    eff = _eff_clamped(o, d, bound, wlo, whi)
    ot, _, _ = _oracle_hits(o, d, tris)
    ot = np.where(ot < eff[:, None], ot, np.inf)
    best = ot.min(axis=1)
    hit = np.isfinite(best)
    assert np.array_equal(slot >= 0, hit)
    np.testing.assert_allclose(t[hit], best[hit], rtol=1e-5)
    np.testing.assert_allclose(t[~hit], eff[~hit], rtol=1e-5)


def test_binned_nee_matches_oracle():
    from complex_materials_renderer_tpu.kernels.cluster_test import (
        nee_list_len,
    )

    tris, mats, grid, media9 = _scene(seed=11, media_every=2)
    o, d = _random_rays(200, seed=12)
    rng = np.random.default_rng(13)
    bound = rng.uniform(1.0, 8.0, 200).astype(np.float32)
    K = nee_list_len(3)  # 2*3 crossings + the duplicate-absorbing spares

    out = trace_binned(
        grid, media9, jnp.asarray(o), jnp.asarray(d), jnp.asarray(bound),
        "nee", nee_max_media=3,
    )
    ts = np.stack([np.asarray(x) for x in out[:K]], -1)
    t_opq = np.asarray(out[2 * K])  # ts[0:K], mats[K:2K], t_opq last
    eff = np.where(bound > T_MIN, bound, 0.0)

    ot, _, _ = _oracle_hits(o, d, tris)
    ot = np.where(ot < eff[:, None], ot, np.inf)
    # nearest opaque
    opq = np.where(mats[None, :] == 0, ot, np.inf).min(axis=1)
    opq = np.minimum(opq, eff)
    np.testing.assert_allclose(t_opq, opq, rtol=1e-5)
    # media boundaries below the FINAL opaque bound are order-independent:
    # the K nearest must match the oracle's sorted list exactly.
    med_t = np.where(mats[None, :] == 1, ot, np.inf)
    med_sorted = np.sort(med_t, axis=1)
    for lane in range(200):
        exp = med_sorted[lane]
        exp = exp[exp < opq[lane]][:K]
        # The list is ascending, so below-opaque entries are a prefix;
        # compare the FULL prefix including its length (a duplicate
        # insertion would lengthen it — regression for the exactly-once
        # masking of the round kernel's repeated SIMD tests).
        got = ts[lane][ts[lane] < opq[lane]]
        assert len(got) == len(exp), f"lane {lane}: {got} vs {exp}"
        np.testing.assert_allclose(got, exp, rtol=1e-5, err_msg=f"lane {lane}")


def test_binned_overflow_generations_match():
    """A 2-slot list forces eviction + multi-generation resume; results
    must equal the roomy-list run bit for bit."""
    tris, mats, grid, media9 = _scene(n=120, seed=21)
    wlo, whi = _world(tris)
    o, d = _random_rays(128, seed=22)
    bound = np.full(128, 1e4, np.float32)
    args = (grid, media9, jnp.asarray(o), jnp.asarray(d), jnp.asarray(bound))
    kw = dict(
        world_lo=tuple(map(float, wlo)), world_hi=tuple(map(float, whi))
    )
    tight = trace_binned(*args, "full", list_len=2, cap_iters=3, **kw)
    roomy = trace_binned(*args, "full", list_len=16, **kw)
    for a, b in zip(tight, roomy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_binned_nee_overflow_matches():
    """The 2-slot list's multi-generation resume must produce the same
    MARCH-RELEVANT result as a roomy single-generation run: identical
    t_opq and identical boundary prefix below it (entries beyond the
    nearest opaque hit are legitimately visit-order-dependent and the
    march never reads them — see megakernel.nee_march)."""
    tris, mats, grid, media9 = _scene(n=120, seed=31, media_every=2)
    o, d = _random_rays(96, seed=32)
    bound = np.full(96, 8.0, np.float32)
    args = (grid, media9, jnp.asarray(o), jnp.asarray(d), jnp.asarray(bound))
    tight = [np.asarray(x) for x in trace_binned(*args, "nee", list_len=2,
                                                 cap_iters=2)]
    roomy = [np.asarray(x) for x in trace_binned(*args, "nee", list_len=16)]
    K = 8
    np.testing.assert_array_equal(tight[2 * K], roomy[2 * K])  # t_opq
    opq = roomy[2 * K]
    ts_t = np.stack(tight[:K], -1)
    ts_r = np.stack(roomy[:K], -1)
    ms_t = np.stack(tight[K : 2 * K], -1)
    ms_r = np.stack(roomy[K : 2 * K], -1)
    for lane in range(96):
        n_t = int((ts_t[lane] < opq[lane]).sum())
        n_r = int((ts_r[lane] < opq[lane]).sum())
        assert n_t == n_r, f"lane {lane}"
        np.testing.assert_array_equal(ts_t[lane][:n_t], ts_r[lane][:n_r])
        np.testing.assert_array_equal(ms_t[lane][:n_t], ms_r[lane][:n_r])


def test_media_row_count_guard():
    """The NEE key packs the MEDIA-TABLE ROW INDEX into 6 bits (material
    ids themselves are unbounded — tests/test_scale.py); pack_media must
    reject tables that overflow the field."""
    m = 64
    media = MediaTable(
        mat_id=np.arange(m, dtype=np.int32),
        sigma_s=np.ones((m, 3), np.float32),
        sigma_a=np.ones((m, 3), np.float32),
        g=np.zeros((m, 3), np.float32),
        ior=np.ones((m,), np.float32),
    )
    with pytest.raises(ValueError, match="63"):
        pack_media(media, 1.0)
