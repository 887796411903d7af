"""Host-side simulation: does a front-to-back (static, per-octant) cluster
walk order cut block visit counts vs the current tree-order linear walk?

The linear walk culls cluster c against per-lane bounds [t_min, t_best];
t_best starts at the scene-box exit and shrinks only after the cluster
containing the lane's true hit is visited. In tree order a block can walk
most of the scene before bounds tighten; a front-to-back order (by
cluster-centroid projection onto the block's mean direction) tightens
them after the first few visits. This simulates both (plus the ideal
per-block-entry-distance order) with REAL per-lane first hits.

Pure numpy; PYTHONPATH=/root/repo.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.scene.obj import parse_obj

RNG = np.random.default_rng(11)


def first_hits(o, d, tris, tri_cluster):
    """Brute-force closest hit: returns (t_hit, hit_cluster) per ray.
    Chunked over rays AND triangles to bound temporary sizes."""
    R = o.shape[0]
    if R > 1024:
        parts = [
            first_hits(o[i : i + 1024], d[i : i + 1024], tris, tri_cluster)
            for i in range(0, R, 1024)
        ]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )
    t_best = np.full(R, 1e30, np.float32)
    c_best = np.full(R, -1, np.int32)
    for lo_i in range(0, len(tris), 4096):
        chunk = tris[lo_i : lo_i + 4096]
        v0 = chunk[:, 0]
        e1 = chunk[:, 1] - chunk[:, 0]
        e2 = chunk[:, 2] - chunk[:, 0]
        p = np.cross(d[:, None, :], e2[None])  # (R, T, 3)
        det = np.einsum("tk,rtk->rt", e1, p)
        inv = 1.0 / np.where(np.abs(det) > 1e-12, det, 1e30)
        s = o[:, None, :] - v0[None]
        u = np.einsum("rtk,rtk->rt", s, p) * inv
        q = np.cross(s, e1[None])
        v = np.einsum("rk,rtk->rt", d, q) * inv
        t = np.einsum("tk,rtk->rt", e2, q) * inv
        ok = (u >= -1e-6) & (v >= -1e-6) & (u + v <= 1 + 1e-6) & (t > 1e-4)
        t = np.where(ok, t, 1e30)
        j = t.argmin(axis=1)
        tm = t[np.arange(R), j]
        better = tm < t_best
        t_best = np.where(better, tm, t_best)
        c_best = np.where(better, tri_cluster[lo_i + j], c_best)
    return t_best, c_best


def seg_hits(o, d, bound, lo, hi):
    """(R,) bool: per-lane does [t_min, bound] hit this cluster AABB."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    s0 = (lo[None] - o) * inv
    s1 = (hi[None] - o) * inv
    tn = np.maximum(np.minimum(s0, s1).max(1), 1e-4)
    tf = np.minimum(np.maximum(s0, s1).min(1), bound)
    return tn <= tf


def walk_visits(o, d, t_hit, c_hit, box_exit, bounds, order):
    """Simulate the linear culled walk in the given cluster order; returns
    visit count for this block."""
    bound = box_exit.copy()
    visits = 0
    for c in order:
        lo = bounds[c, 0:3]
        hi = bounds[c, 3:6]
        if seg_hits(o, d, bound, lo, hi).any():
            visits += 1
            settle = c_hit == c
            bound = np.where(settle, t_hit * 1.0001 + 1e-3, bound)
    return visits


def box_exit_t(o, d, wlo, whi):
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    s0 = (wlo[None] - o) * inv
    s1 = (whi[None] - o) * inv
    tf = np.maximum(s0, s1).min(1)
    return np.maximum(tf, 0.0) * 1.0001 + 1e-3


def study(name, obj_path, blocks):
    mesh = parse_obj(obj_path)
    tris = mesh.vertices[mesh.indices].astype(np.float32)
    grid = build_clusters(tris, mesh.material_ids.astype(np.int32))
    C = grid.num_clusters
    width = grid.v0x.shape[1]
    # slot -> cluster of each original triangle (first slot wins)
    tri_cluster = np.full(len(tris), -1, np.int32)
    for c in range(C):
        ids = grid.tri_index[c * width : (c + 1) * width]
        ids = ids[ids >= 0]
        tri_cluster[ids] = c
    cent = 0.5 * (grid.bounds[:, 0:3] + grid.bounds[:, 3:6])
    wlo, whi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
    print(f"\n=== {name}: {len(tris)} tris, {C} clusters ===")

    res = {"tree": [], "f2b": [], "b2f": []}
    lane_ideal = []
    for o, d in blocks(wlo, whi):
        t_hit, c_hit = first_hits(o, d, tris, tri_cluster)
        bx = box_exit_t(o, d, wlo, whi)
        t_hit = np.minimum(t_hit, bx)
        mean_d = d.mean(axis=0)
        mean_d /= np.linalg.norm(mean_d) + 1e-12
        proj = cent @ mean_d
        res["tree"].append(
            walk_visits(o, d, t_hit, c_hit, bx, grid.bounds, range(C))
        )
        res["f2b"].append(
            walk_visits(o, d, t_hit, c_hit, bx, grid.bounds, np.argsort(proj))
        )
        res["b2f"].append(
            walk_visits(
                o, d, t_hit, c_hit, bx, grid.bounds, np.argsort(-proj)
            )
        )
        # ideal per-lane: clusters hit by [0, t_hit]
        cnt = 0
        for c in range(C):
            cnt += seg_hits(
                o, d, t_hit * 1.0001 + 1e-3, grid.bounds[c, :3],
                grid.bounds[c, 3:6],
            ).sum()
        lane_ideal.append(cnt / len(o))
    for k, v in res.items():
        print(f"  {k:5s}: mean visits {np.mean(v):7.1f} / {C}")
    print(f"  per-lane ideal visit count: {np.mean(lane_ideal):.2f}")


def interior_blocks(wlo, whi):
    """Deep-bounce-like: coherent ball of origins, random directions."""
    center = 0.5 * (wlo + whi)
    span = 0.25 * (whi - wlo)
    ext = float(np.max(whi - wlo))
    for _ in range(6):
        c0 = center + (RNG.random(3).astype(np.float32) * 2 - 1) * span
        o = c0 + RNG.normal(size=(1024, 3)).astype(np.float32) * (0.03 * ext)
        d = RNG.normal(size=(1024, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        yield o, d


def camera_blocks(wlo, whi):
    """Primary-ray-like: one eye, a tight cone of directions per block."""
    center = 0.5 * (wlo + whi)
    ext = float(np.max(whi - wlo))
    eye = center + np.array([0.3, 0.35, 1.05], np.float32) * (whi - center) * 2
    for _ in range(6):
        tgt0 = center + RNG.normal(size=3).astype(np.float32) * 0.2 * ext
        tgt = tgt0 + RNG.normal(size=(1024, 3)).astype(np.float32) * 0.02 * ext
        d = tgt - eye
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        yield np.broadcast_to(eye, (1024, 3)).copy(), d


if __name__ == "__main__":
    study("cup/interior", "/root/reference/resources/scenes/cup.obj",
          interior_blocks)
    study("cup/camera", "/root/reference/resources/scenes/cup.obj",
          camera_blocks)
    study("showcase/camera", "/root/repo/scenes/showcase.obj", camera_blocks)
    study("showcase/interior", "/root/repo/scenes/showcase.obj",
          interior_blocks)
    study("vessel/interior", "/root/repo/scenes/vessel.obj", interior_blocks)
