"""Wavefront threaded-BVH traversal.

The TPU-native replacement for the reference's hardware ray queries
(reference volpath.comp.glsl:612-627: rayQueryInitializeEXT/ProceedEXT on
a driver-built TLAS). Design:

- Every ray lane carries exactly one int32 node cursor into the threaded
  BVH (see accel/bvh.py): on an AABB hit at an interior node the cursor
  moves to the first child (``left``); on a miss, or after testing a
  leaf's triangles, it follows the node's ``miss`` link. Control flow is
  therefore identical across lanes — no stacks, no divergence — and the
  whole batch steps in lock-step under a single ``lax.while_loop``.
- Node and triangle fetches are XLA gathers from tables that are tiny by
  LLM^W renderer standards (tens of KB — they live comfortably in cache);
  a Pallas one-hot-matmul gather path is the planned MXU upgrade.
- ``t_best`` shrinks monotonically, so later AABB tests prune against the
  current closest hit like an ordered traversal would, just without the
  near-child-first ordering.

The same kernel serves closest-hit and shadow/distance queries (the
reference uses TerminateOnFirstHit for its distance query, volpath:678,
whose driver semantics are "any hit"; we return the closest, which is the
intended distance-to-medium-boundary value).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .intersect import Hit, ray_aabb, ray_triangle, safe_inv_dir


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bmin", "bmax", "left", "count", "miss", "v0", "v1", "v2", "tri_index"],
    meta_fields=["leaf_size"],
)
@dataclasses.dataclass(frozen=True)
class DeviceBVH:
    """FlatBVH plus re-ordered triangle vertices, resident on device.

    ``leaf_size`` is pytree metadata (static under jit): the traversal
    unrolls the leaf triangle loop over it.
    """

    bmin: jnp.ndarray  # (N, 3)
    bmax: jnp.ndarray  # (N, 3)
    left: jnp.ndarray  # (N,)
    count: jnp.ndarray  # (N,)
    miss: jnp.ndarray  # (N,)
    v0: jnp.ndarray  # (T, 3) in BVH leaf order
    v1: jnp.ndarray  # (T, 3)
    v2: jnp.ndarray  # (T, 3)
    tri_index: jnp.ndarray  # (T,) original triangle id per leaf-order slot
    leaf_size: int  # static max triangles per leaf


def device_bvh(flat, triangles, leaf_size: int) -> DeviceBVH:
    """Upload a host FlatBVH + triangle soup (T, 3, 3) as device arrays."""
    tris = jnp.asarray(triangles, jnp.float32)[jnp.asarray(flat.tri_order)]
    return DeviceBVH(
        bmin=jnp.asarray(flat.bmin),
        bmax=jnp.asarray(flat.bmax),
        left=jnp.asarray(flat.left),
        count=jnp.asarray(flat.count),
        miss=jnp.asarray(flat.miss),
        v0=tris[:, 0],
        v1=tris[:, 1],
        v2=tris[:, 2],
        tri_index=jnp.asarray(flat.tri_order),
        leaf_size=leaf_size,
    )


def trace_closest(o, d, accel, t_min, t_max, active=None) -> Hit:
    """Closest-hit trace dispatch: threaded-BVH wavefront walk for a
    DeviceBVH, the Pallas cluster kernel for a DeviceClusterGrid."""
    if not isinstance(accel, DeviceBVH):
        from .pallas_trace import trace_closest_clusters

        return trace_closest_clusters(o, d, accel, t_min, t_max, active=active)
    return _trace_closest_bvh(o, d, accel, t_min, t_max, active=active)


def trace_shaded(o, d, accel, scene_v0, scene_v1, scene_v2, scene_mat_ids,
                 t_min, t_max, active=None):
    """Closest-hit trace returning the shading payload (hit mask, normal,
    material id) — the integrator's primitive. On the Pallas backend the
    payload comes straight out of the kernel (zero per-lane gathers); on
    the XLA BVH backend it is derived from the hit triangle's vertices
    (reference getObjectHitInfo semantics, volpath:184-196)."""
    from .pallas_trace import DeviceClusterGrid, ShadedHit, trace_shaded_clusters

    if isinstance(accel, DeviceClusterGrid):
        return trace_shaded_clusters(o, d, accel, t_min, t_max, active=active)

    hit = _trace_closest_bvh(o, d, accel, t_min, t_max, active=active)
    p = jnp.maximum(hit.prim, 0)
    a = scene_v0[p]
    b = scene_v1[p]
    c = scene_v2[p]
    raw_n = jnp.cross(b - a, c - a)
    n = raw_n / jnp.maximum(jnp.linalg.norm(raw_n, axis=-1, keepdims=True), 1e-20)
    got = hit.prim >= 0
    mat = jnp.where(got, scene_mat_ids[p], -1)
    # Barycentric position, like the reference (volpath:158-181).
    u = hit.u[:, None]
    v = hit.v[:, None]
    position = a + u * (b - a) + v * (c - a)
    return ShadedHit(
        t=hit.t, hit=got, u=hit.u, v=hit.v, normal=n, mat_id=mat, position=position
    )


def _trace_closest_bvh(o, d, bvh: DeviceBVH, t_min, t_max, active=None) -> Hit:
    """Closest-hit traversal for a batch of rays.

    ``active``: optional (R,) bool — inactive lanes are parked (cursor -1)
    and return a miss, so dead wavefront lanes cost no traversal steps.
    Returned ``prim`` indexes the *original* triangle order (like the
    reference's primitiveID, volpath:127), ``t`` equals ``t_max`` on miss
    (VK ray-query semantics for an uncommitted t).
    """
    r = o.shape[0]
    inv_d = safe_inv_dir(d)
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    t_min_arr = jnp.broadcast_to(jnp.asarray(t_min, jnp.float32), (r,))

    cur0 = jnp.zeros((r,), jnp.int32)
    if active is not None:
        cur0 = jnp.where(active, cur0, -1)

    leaf_size = bvh.leaf_size

    def cond(state):
        cur, *_ = state
        return jnp.any(cur >= 0)

    def body(state):
        cur, best_t, best_slot, best_u, best_v = state
        c = jnp.maximum(cur, 0)
        node_bmin = bvh.bmin[c]
        node_bmax = bvh.bmax[c]
        left = bvh.left[c]
        count = bvh.count[c]
        miss = bvh.miss[c]

        live = cur >= 0
        box_hit = ray_aabb(o, inv_d, node_bmin, node_bmax, t_min_arr, best_t) & live
        is_leaf = count > 0

        test_leaf = box_hit & is_leaf
        # Unrolled leaf loop: leaf_size is small and static.
        for j in range(leaf_size):
            slot = left + j
            valid = test_leaf & (j < count)
            slot_c = jnp.clip(slot, 0, bvh.v0.shape[0] - 1)
            tv0 = bvh.v0[slot_c]
            tv1 = bvh.v1[slot_c]
            tv2 = bvh.v2[slot_c]
            hit, t, u, v = ray_triangle(o, d, tv0, tv1, tv2, t_min_arr, best_t)
            upd = valid & hit
            best_t = jnp.where(upd, t, best_t)
            best_slot = jnp.where(upd, slot_c, best_slot)
            best_u = jnp.where(upd, u, best_u)
            best_v = jnp.where(upd, v, best_v)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, left, miss)
        cur = jnp.where(live, nxt, -1)
        return cur, best_t, best_slot, best_u, best_v

    init = (
        cur0,
        t_max_arr,
        jnp.full((r,), -1, jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    _, best_t, best_slot, best_u, best_v = jax.lax.while_loop(cond, body, init)

    prim = jnp.where(best_slot >= 0, bvh.tri_index[jnp.maximum(best_slot, 0)], -1)
    best_t = jnp.where(best_slot >= 0, best_t, t_max_arr)
    return Hit(t=best_t, prim=prim, u=best_u, v=best_v)
