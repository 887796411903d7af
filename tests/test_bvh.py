"""BVH build + threaded traversal tests: structure invariants and
equivalence against the brute-force oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from complex_materials_renderer_tpu.accel import build_bvh
from complex_materials_renderer_tpu.kernels import intersect
from complex_materials_renderer_tpu.kernels.traverse import device_bvh, trace_closest


def _random_tris(n, seed=0, spread=2.0, size=0.4):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, size=(n, 1, 3))
    tris = base + rng.uniform(-size, size, size=(n, 3, 3))
    return tris.astype(np.float32)


def _random_rays(n, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("num_tris", [1, 2, 5, 64, 333])
def test_structure_invariants(num_tris):
    tris = _random_tris(num_tris, seed=num_tris)
    bvh = build_bvh(tris, leaf_size=4)
    n = bvh.num_nodes
    # Permutation covers all triangles exactly once.
    assert sorted(bvh.tri_order.tolist()) == list(range(num_tris))
    # Leaves partition the permuted stream.
    leaves = bvh.count > 0
    spans = sorted(
        (int(f), int(c)) for f, c in zip(bvh.left[leaves], bvh.count[leaves])
    )
    cursor = 0
    for first, count in spans:
        assert first == cursor
        assert 1 <= count <= 4
        cursor += count
    assert cursor == num_tris
    # Interior left child is the next preorder node; links stay in range.
    interior = ~leaves
    assert np.all(bvh.left[interior] == np.nonzero(interior)[0] + 1) or num_tris <= 4
    assert np.all(bvh.miss < n)
    assert bvh.miss[0] == -1
    # Child AABBs nest inside parents (checked via traversal below anyway).
    assert np.all(bvh.bmin <= bvh.bmax + 1e-6)


@pytest.mark.parametrize("num_tris,num_rays", [(1, 64), (7, 128), (128, 256), (1000, 512)])
def test_traversal_matches_naive(num_tris, num_rays):
    tris = _random_tris(num_tris, seed=num_tris + 7)
    o, d = _random_rays(num_rays, seed=num_tris)
    flat = build_bvh(tris, leaf_size=4)
    dbvh = device_bvh(flat, tris, leaf_size=4)

    got = trace_closest(o, d, dbvh, 1e-4, 1e4)
    want = intersect.trace_naive(o, d, jnp.asarray(tris), 1e-4, 1e4)

    np.testing.assert_array_equal(np.asarray(got.prim), np.asarray(want.prim))
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(want.t), rtol=1e-5)
    hitmask = np.asarray(want.prim) >= 0
    np.testing.assert_allclose(
        np.asarray(got.u)[hitmask], np.asarray(want.u)[hitmask], rtol=1e-4, atol=1e-5
    )


def test_traversal_t_window_and_active_mask():
    tris = _random_tris(50, seed=3)
    o, d = _random_rays(100, seed=4)
    flat = build_bvh(tris)
    dbvh = device_bvh(flat, tris, leaf_size=4)
    full = trace_closest(o, d, dbvh, 1e-4, 1e4)
    # Shrinking t_max below every hit yields misses.
    clipped = trace_closest(o, d, dbvh, 1e-4, 1e-3)
    assert np.all(np.asarray(clipped.prim) == -1)
    np.testing.assert_allclose(np.asarray(clipped.t), 1e-3)
    # Inactive lanes report misses.
    active = jnp.zeros(100, bool)
    parked = trace_closest(o, d, dbvh, 1e-4, 1e4, active=active)
    assert np.all(np.asarray(parked.prim) == -1)
    # Active mask on matches full trace.
    some = jnp.arange(100) % 2 == 0
    mixed = trace_closest(o, d, dbvh, 1e-4, 1e4, active=some)
    np.testing.assert_array_equal(
        np.asarray(mixed.prim)[::2], np.asarray(full.prim)[::2]
    )
    assert np.all(np.asarray(mixed.prim)[1::2] == -1)


def test_traversal_under_jit_and_grid_scene():
    # A regular grid of quads (two tris per cell) — worst case for sloppy
    # AABBs, good coverage of leaf boundaries.
    cells = 8
    tris = []
    for i in range(cells):
        for j in range(cells):
            x0, y0 = i * 1.0, j * 1.0
            v = [
                [[x0, y0, 0], [x0 + 1, y0, 0], [x0 + 1, y0 + 1, 0]],
                [[x0, y0, 0], [x0 + 1, y0 + 1, 0], [x0, y0 + 1, 0]],
            ]
            tris.extend(v)
    tris = np.asarray(tris, np.float32)
    flat = build_bvh(tris)
    dbvh = device_bvh(flat, tris, leaf_size=4)

    import jax

    fn = jax.jit(lambda o, d: trace_closest(o, d, dbvh, 1e-4, 1e4))
    rng = np.random.default_rng(9)
    px = rng.uniform(0.01, cells - 0.01, size=(256, 2)).astype(np.float32)
    o = jnp.asarray(
        np.stack([px[:, 0], px[:, 1], np.full(256, 5.0, np.float32)], axis=-1)
    )
    d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]], jnp.float32), (256, 1))
    hit = fn(o, d)
    assert np.all(np.asarray(hit.prim) >= 0)
    np.testing.assert_allclose(np.asarray(hit.t), 5.0, rtol=1e-5)
