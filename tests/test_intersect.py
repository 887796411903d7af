"""Ray-triangle / ray-AABB / brute-force trace tests."""

import jax.numpy as jnp
import numpy as np

from complex_materials_renderer_tpu.kernels import intersect


def test_ray_triangle_hit_and_barycentrics():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, t, u, v = intersect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e4)
    assert bool(hit[0])
    np.testing.assert_allclose(float(t[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(u[0]), 0.25, rtol=1e-5)
    np.testing.assert_allclose(float(v[0]), 0.25, rtol=1e-5)


def test_ray_triangle_no_cull_backface():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.25, 0.25, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit, t, _, _ = intersect.ray_triangle(o, d, v0, v1, v2, 1e-4, 1e4)
    assert bool(hit[0])  # face culling disabled (main.cpp:198)


def test_ray_triangle_respects_t_window():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.25, 0.25, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit, *_ = intersect.ray_triangle(o, d, v0, v1, v2, 1e-4, 0.5)
    assert not bool(hit[0])
    hit, *_ = intersect.ray_triangle(o, d, v0, v1, v2, 2.0, 1e4)
    assert not bool(hit[0])


def test_ray_aabb_axis_parallel():
    o = jnp.array([[0.5, 0.5, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    inv = intersect.safe_inv_dir(d)
    bmin = jnp.array([[0.0, 0.0, 0.0]])
    bmax = jnp.array([[1.0, 1.0, 1.0]])
    assert bool(intersect.ray_aabb(o, inv, bmin, bmax, 0.0, 1e4)[0])
    # Ray starting inside.
    o2 = jnp.array([[0.5, 0.5, 0.5]])
    assert bool(intersect.ray_aabb(o2, inv, bmin, bmax, 0.0, 1e4)[0])
    # Pointing away.
    o3 = jnp.array([[0.5, 0.5, 2.0]])
    assert not bool(intersect.ray_aabb(o3, inv, bmin, bmax, 0.0, 1e4)[0])


def _random_tris(n, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-2, 2, size=(n, 1, 3))
    tris = base + rng.uniform(-0.4, 0.4, size=(n, 3, 3))
    return tris.astype(np.float32)


def test_trace_naive_closest_of_stacked_quads():
    # Two parallel triangles; the closer one must win.
    tris = np.array(
        [
            [[-1, -1, -2], [1, -1, -2], [0, 1, -2]],
            [[-1, -1, -1], [1, -1, -1], [0, 1, -1]],
        ],
        np.float32,
    )
    o = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    hit = intersect.trace_naive(o, d, jnp.asarray(tris), 1e-4, 1e4)
    assert int(hit.prim[0]) == 1
    np.testing.assert_allclose(float(hit.t[0]), 2.0, rtol=1e-6)


def test_trace_naive_miss_returns_tmax():
    tris = _random_tris(33)
    o = jnp.array([[100.0, 100.0, 100.0]])
    d = jnp.array([[1.0, 0.0, 0.0]])
    hit = intersect.trace_naive(o, d, jnp.asarray(tris), 1e-4, 1e4)
    assert int(hit.prim[0]) == -1
    np.testing.assert_allclose(float(hit.t[0]), 1e4)
