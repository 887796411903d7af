"""Ray-triangle and ray-AABB intersection primitives.

These replace the intersection math the reference delegates to the Vulkan
ray-tracing hardware (reference volpath.comp.glsl:612-627). Conventions
match VK_KHR_ray_query: a hit commits when t is in (t_min, t_max); the
returned barycentrics (u, v) weight vertices v1/v2 so that
P = (1-u-v)*v0 + u*v1 + v*v2 (reference volpath:161-170).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# np (not jnp): a module-level jnp constant initializes the XLA backend
# at import, breaking import-before-jax.distributed.initialize().
T_MISS = np.float32(1e30)
_DET_EPS = 1e-12
# Barycentric tolerance: Vulkan's fixed-function traversal is watertight
# along shared edges; a strict u,v >= 0 test drops rays that land exactly on
# an edge (1-ulp negative barycentrics), punching pixel holes in quad
# diagonals. The slack re-admits those; duplicate edge hits resolve by
# closest-t like any other pair of hits.
_BARY_EPS = 1e-6


class Hit(NamedTuple):
    t: jnp.ndarray  # (R,) hit distance; t_max where missed
    prim: jnp.ndarray  # (R,) triangle index; -1 where missed
    u: jnp.ndarray  # (R,) barycentric toward v1
    v: jnp.ndarray  # (R,) barycentric toward v2

    @property
    def valid(self):
        return self.prim >= 0


def ray_aabb(o, inv_d, bmin, bmax, t_min, t_max):
    """Slab test. Returns a hit mask for the interval [t_min, t_max].

    ``inv_d`` must come from :func:`safe_inv_dir` so zero components do not
    produce NaNs.
    """
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t_near <= t_far


def safe_inv_dir(d):
    """Reciprocal direction with zero components nudged off zero."""
    tiny = jnp.float32(1e-12)
    safe = jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    return 1.0 / safe


def ray_triangle(o, d, v0, v1, v2, t_min, t_max):
    """Moller-Trumbore, culling disabled (the reference disables face
    culling on its TLAS, main.cpp:198).

    All arguments broadcast; returns (hit_mask, t, u, v).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    p = jnp.cross(d, e2)
    det = jnp.sum(e1 * p, axis=-1)
    valid = jnp.abs(det) > _DET_EPS
    inv_det = 1.0 / jnp.where(valid, det, 1.0)
    tv = o - v0
    u = jnp.sum(tv * p, axis=-1) * inv_det
    q = jnp.cross(tv, e1)
    v = jnp.sum(d * q, axis=-1) * inv_det
    t = jnp.sum(e2 * q, axis=-1) * inv_det
    hit = (
        valid
        & (u >= -_BARY_EPS)
        & (v >= -_BARY_EPS)
        & (u + v <= 1.0 + _BARY_EPS)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def trace_naive(o, d, triangles, t_min, t_max, chunk: int = 512) -> Hit:
    """Brute-force closest hit against every triangle.

    Ground-truth oracle for the BVH backends and the practical path for
    trivially small scenes. ``triangles`` is (T, 3, 3). Scans triangle
    chunks with dense ray x chunk tests — no gathers, fully VPU-shaped.
    """
    v0 = triangles[:, 0]
    v1 = triangles[:, 1]
    v2 = triangles[:, 2]
    num_tris = triangles.shape[0]
    pad = (-num_tris) % chunk
    if pad:
        padv = jnp.full((pad, 3), jnp.inf, v0.dtype)
        v0 = jnp.concatenate([v0, padv])
        v1 = jnp.concatenate([v1, padv])
        v2 = jnp.concatenate([v2, padv])
    n_chunks = v0.shape[0] // chunk
    v0 = v0.reshape(n_chunks, chunk, 3)
    v1 = v1.reshape(n_chunks, chunk, 3)
    v2 = v2.reshape(n_chunks, chunk, 3)

    r = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))

    def body(carry, tris):
        best_t, best_prim, best_u, best_v, base = carry
        c0, c1, c2 = tris
        hit, t, u, v = ray_triangle(
            o[:, None, :],
            d[:, None, :],
            c0[None],
            c1[None],
            c2[None],
            t_min,
            best_t[:, None],
        )
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        rows = jnp.arange(r)
        tj = t[rows, j]
        improved = tj < best_t
        best_t = jnp.where(improved, tj, best_t)
        best_prim = jnp.where(improved, base + j, best_prim)
        best_u = jnp.where(improved, u[rows, j], best_u)
        best_v = jnp.where(improved, v[rows, j], best_v)
        return (best_t, best_prim, best_u, best_v, base + chunk), None

    init = (
        t_max_arr,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
        jnp.int32(0),
    )
    (best_t, best_prim, best_u, best_v, _), _ = jax.lax.scan(
        body, init, (v0, v1, v2)
    )
    best_t = jnp.where(best_prim >= 0, best_t, t_max_arr)
    return Hit(t=best_t, prim=best_prim, u=best_u, v=best_v)
