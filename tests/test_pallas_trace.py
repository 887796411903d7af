"""Cluster-grid Pallas tracer: equivalence vs the brute-force oracle
(interpret mode on CPU; the same kernel compiles on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from complex_materials_renderer_tpu.accel.clusters import build_clusters

_TEST_CLUSTER = 8  # narrow unroll keeps the Pallas interpreter fast
from complex_materials_renderer_tpu.kernels import intersect
from complex_materials_renderer_tpu.kernels.pallas_trace import (
    device_cluster_grid,
    trace_closest_clusters,
)


def _random_tris(n, seed=0, spread=2.0, size=0.4):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(n, 1, 3))
    return (base + rng.uniform(-size, size, size=(n, 3, 3))).astype(np.float32)


def _random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_cluster_build_invariants():
    tris = _random_tris(300)
    g = build_clusters(tris)
    assert g.num_clusters == 3
    assert g.v0x.shape == (3, 128)
    assert g.mat_id.shape == (3, 128)
    real = g.tri_index >= 0
    assert real.sum() == 300
    assert sorted(g.tri_index[real].tolist()) == list(range(300))
    # Bounds enclose member triangles.
    for c in range(3):
        sl = slice(c * 128, (c + 1) * 128)
        members = g.tri_index[sl] >= 0
        for arr, lo_i, hi_i in [(g.v0x, 0, 3), (g.v0y, 1, 4), (g.v0z, 2, 5)]:
            vals = arr[c][members]
            assert np.all(vals >= g.bounds[c, lo_i] - 1e-5)
            assert np.all(vals <= g.bounds[c, hi_i] + 1e-5)


def test_split_oversized_preserves_geometry():
    """Longest-edge bisection (build_clusters split_frac) changes no
    geometry: children lie in the parent's plane with the same winding,
    total area is preserved, and the index map points at the parent."""
    from complex_materials_renderer_tpu.accel.clusters import (
        _split_oversized,
    )

    tris = np.asarray(
        [
            [[-10, 0, -10], [10, 0, -10], [10, 0, 10]],  # scene-spanning
            [[0, 1, 0], [1, 1, 0], [0, 1, 1]],  # small, untouched
        ],
        np.float32,
    )
    index = np.arange(2, dtype=np.int32)
    out, idx = _split_oversized(tris, index, frac=0.25, max_factor=64.0)
    assert len(out) > 2
    assert set(idx.tolist()) == {0, 1}

    def area(t):
        return 0.5 * np.linalg.norm(
            np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0]), axis=1
        )

    # Area conserved per parent; children stay in the parent plane.
    for parent in (0, 1):
        kids = out[idx == parent]
        np.testing.assert_allclose(
            area(kids).sum(), area(tris[parent : parent + 1]).sum(),
            rtol=1e-5,
        )
        n = np.cross(
            tris[parent, 1] - tris[parent, 0],
            tris[parent, 2] - tris[parent, 0],
        )
        n = n / np.linalg.norm(n)
        d = np.dot(tris[parent, 0], n)
        assert np.allclose(kids.reshape(-1, 3) @ n, d, atol=1e-4)
        # Same winding: child normals align with the parent's.
        kn = np.cross(kids[:, 1] - kids[:, 0], kids[:, 2] - kids[:, 0])
        assert np.all(kn @ n > 0)
    # No edge above the limit survives.
    lo = out.min(axis=(0, 1))
    hi = out.max(axis=(0, 1))
    limit = float(np.max(hi - lo)) * 0.25
    e = np.linalg.norm(np.roll(out, -1, axis=1) - out, axis=2)
    assert np.all(e <= limit + 1e-4)


@pytest.mark.parametrize("num_tris,num_rays", [(5, 64), (61, 256)])
def test_matches_naive(num_tris, num_rays):
    tris = _random_tris(num_tris, seed=num_tris)
    o, d = _random_rays(num_rays, seed=num_tris + 1)
    grid = device_cluster_grid(
        build_clusters(tris, cluster_size=_TEST_CLUSTER), interpret=True
    )

    got = trace_closest_clusters(o, d, grid, 1e-4, 1e4)
    want = intersect.trace_naive(o, d, jnp.asarray(tris), 1e-4, 1e4)

    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5)
    # Hits agree; exact prim may differ only on exactly-tied t.
    same = np.asarray(got.prim) == np.asarray(want.prim)
    assert same.mean() > 0.99
    hitm = np.asarray(want.prim) >= 0
    np.testing.assert_array_equal(np.asarray(got.prim) >= 0, hitm)
    np.testing.assert_allclose(
        np.asarray(got.u)[same & hitm], np.asarray(want.u)[same & hitm], rtol=1e-4, atol=1e-5
    )


def test_active_mask_and_t_window():
    tris = _random_tris(24, seed=3)
    o, d = _random_rays(128, seed=4)
    grid = device_cluster_grid(
        build_clusters(tris, cluster_size=_TEST_CLUSTER), interpret=True
    )
    full = trace_closest_clusters(o, d, grid, 1e-4, 1e4)
    parked = trace_closest_clusters(
        o, d, grid, 1e-4, 1e4, active=jnp.zeros(128, bool)
    )
    assert np.all(np.asarray(parked.prim) == -1)
    np.testing.assert_allclose(np.asarray(parked.t), 1e4)
    some = jnp.arange(128) % 3 == 0
    mixed = trace_closest_clusters(o, d, grid, 1e-4, 1e4, active=some)
    np.testing.assert_array_equal(
        np.asarray(mixed.prim)[::3], np.asarray(full.prim)[::3]
    )
    assert np.all(np.asarray(mixed.prim)[1::3] == -1)


def test_per_lane_tmax():
    tris = np.asarray(
        [[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32
    )
    grid = device_cluster_grid(
        build_clusters(tris, cluster_size=_TEST_CLUSTER), interpret=True
    )
    o = jnp.zeros((2, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (2, 1))
    tmax = jnp.array([10.0, 1.0])
    hit = trace_closest_clusters(o, d, grid, 1e-4, tmax)
    assert int(hit.prim[0]) == 0 and int(hit.prim[1]) == -1
    np.testing.assert_allclose(float(hit.t[1]), 1.0)
