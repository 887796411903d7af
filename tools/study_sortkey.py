"""Simulate block-union visit counts under different wavefront sort keys.

The block-shared walk visits the union of clusters its 1024 lanes need;
study_order.py measured per-lane ideal ~2-4 visits vs unions of 11-168.
Question: does sorting lanes by their PREDICTED first traversal clusters
(the 1-2 nearest-entry clusters along the ray) collapse the union toward
the per-lane ideal, where (octant, morton) keys measurably did not?

Simulates a 64-block wavefront of interior lanes (worst case measured)
and camera lanes, sorted by each key, and reports mean per-block visits
of the tree-order walk with true per-lane bound tightening.

Pure numpy; PYTHONPATH=/root/repo.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.scene.obj import parse_obj
from tools.study_order import box_exit_t, first_hits

RNG = np.random.default_rng(23)


def entry_all(o, d, bound, lo, hi):
    """(R, C) entry distance; inf when the segment misses the box."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    s0 = (lo[None] - o[:, None]) * inv[:, None]
    s1 = (hi[None] - o[:, None]) * inv[:, None]
    tn = np.maximum(np.minimum(s0, s1).max(2), 1e-4)
    tf = np.minimum(np.maximum(s0, s1).min(2), bound[:, None])
    return np.where(tn <= tf, tn, np.inf)


def spread3(v):
    v = v.astype(np.uint32)
    v = (v | (v << 16)) & np.uint32(0x030000FF)
    v = (v | (v << 8)) & np.uint32(0x0300F00F)
    v = (v | (v << 4)) & np.uint32(0x030C30C3)
    v = (v | (v << 2)) & np.uint32(0x09249249)
    return v


def keys_morton(o, d, wlo, whi):
    ext = np.maximum(whi - wlo, 1e-6)
    q = np.clip((o - wlo) / ext * 32.0, 0, 31).astype(np.uint32)
    cell = (
        (spread3(q[:, 0]) << 2) | (spread3(q[:, 1]) << 1) | spread3(q[:, 2])
    )
    octant = (
        (d[:, 0] > 0).astype(np.uint32) * 4
        + (d[:, 1] > 0).astype(np.uint32) * 2
        + (d[:, 2] > 0).astype(np.uint32)
    )
    return (octant.astype(np.uint64) << 15) | cell.astype(np.uint64)


def study(name, obj_path, mode):
    mesh = parse_obj(obj_path)
    tris = mesh.vertices[mesh.indices].astype(np.float32)
    grid = build_clusters(tris, mesh.material_ids.astype(np.int32))
    C = grid.num_clusters
    width = grid.v0x.shape[1]
    tri_cluster = np.full(len(tris), -1, np.int32)
    for c in range(C):
        ids = grid.tri_index[c * width : (c + 1) * width]
        ids = ids[ids >= 0]
        tri_cluster[ids] = c
    wlo, whi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
    center = 0.5 * (wlo + whi)
    span = 0.25 * (whi - wlo)
    ext = float(np.max(whi - wlo))

    R = 8 * 1024
    if mode == "interior":
        # wavefront of deep-bounce lanes: positions across the interior,
        # random dirs (NO artificial ball coherence — the sort must find it)
        o = center + (RNG.random((R, 3), np.float32) * 2 - 1) * span
        d = RNG.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    else:
        eye = center + np.array([0.3, 0.35, 1.05], np.float32) * (
            whi - center
        ) * 2
        tgt = center + RNG.normal(size=(R, 3)).astype(np.float32) * 0.25 * ext
        d = tgt - eye
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(eye, (R, 3)).copy()

    t_hit, c_hit = first_hits(o, d, tris, tri_cluster)
    bx = box_exit_t(o, d, wlo, whi)
    t_hit = np.minimum(t_hit, bx)

    ent = entry_all(o, d, bx, grid.bounds[:, :3], grid.bounds[:, 3:6])
    order2 = np.argsort(ent, axis=1)[:, :2]  # two nearest-entry clusters
    e1 = np.take_along_axis(ent, order2[:, :1], 1)[:, 0]
    c1 = np.where(np.isfinite(e1), order2[:, 0], C)
    e2 = np.take_along_axis(ent, order2[:, 1:2], 1)[:, 0]
    c2 = np.where(np.isfinite(e2), order2[:, 1], C)

    keysets = {
        "morton(cur)": keys_morton(o, d, wlo, whi),
        "c1": c1.astype(np.uint64),
        "c1,c2": c1.astype(np.uint64) * (C + 1) + c2.astype(np.uint64),
        "c1,c2,oct": (
            (c1.astype(np.uint64) * (C + 1) + c2.astype(np.uint64)) * 8
            + keys_morton(o, d, wlo, whi) >> np.uint64(15)
        ),
    }

    print(f"\n=== {name} [{mode}]: {len(tris)} tris, {C} clusters ===")
    # Precompute per-lane per-cluster slab [tn, tf-without-bound] once.
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    lo = grid.bounds[:, :3]
    hi = grid.bounds[:, 3:6]
    s0 = (lo[None] - o[:, None]) * inv[:, None]
    s1 = (hi[None] - o[:, None]) * inv[:, None]
    TN = np.maximum(np.minimum(s0, s1).max(2), 1e-4)
    TF = np.maximum(s0, s1).min(2)
    del s0, s1

    for label, key in keysets.items():
        perm = np.argsort(key, kind="stable")
        B = R // 1024
        tn = TN[perm].reshape(B, 1024, C)
        tf = TF[perm].reshape(B, 1024, C)
        ch = c_hit[perm].reshape(B, 1024)
        th = t_hit[perm].reshape(B, 1024)
        bound = bx[perm].reshape(B, 1024).copy()
        visits = np.zeros(B, np.int64)
        for c in range(C):
            hit_c = tn[:, :, c] <= np.minimum(tf[:, :, c], bound)
            blk = hit_c.any(axis=1)
            visits += blk
            settle = blk[:, None] & (ch == c)
            bound = np.where(settle, th * 1.0001 + 1e-3, bound)
        print(f"  {label:12s}: mean block visits {visits.mean():7.1f} / {C}")


if __name__ == "__main__":
    study("cup", "/root/reference/resources/scenes/cup.obj", "interior")
    study("cup", "/root/reference/resources/scenes/cup.obj", "camera")
    study("showcase", "/root/repo/scenes/showcase.obj", "interior")
    study("vessel", "/root/repo/scenes/vessel.obj", "interior")
