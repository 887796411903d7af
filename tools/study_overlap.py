"""Host-side diagnostic: WHY does the block-shared traversal visit so many
clusters on dense-media scenes?

Hypothesis under test (round 3): cluster AABBs on curved shells (cup wall,
vessel) bulge deep into the enclosed interior, so an interior lane's short
free-flight segment still "intersects" many cluster boxes no matter how
spatially coherent the block is — which would explain why every footprint
attack (sorting, widths, clamps) measured flat. If true, ONE extra
oriented plane-pair per cluster (slab along the cluster's best-fit normal)
should collapse the pass count; this script quantifies that before we pay
the kernel cost.

Pure numpy; run with PYTHONPATH=/root/repo:/root/.axon_site.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from complex_materials_renderer_tpu.accel.clusters import build_clusters
from complex_materials_renderer_tpu.scene.obj import parse_obj

RNG = np.random.default_rng(7)


def cluster_planes(tris, tri_index, C, width):
    """Per-cluster best-fit slab: PCA minor axis of member vertices,
    (n, dmin, dmax). Returns (C,3) normals, (C,) dmin, (C,) dmax."""
    n_out = np.zeros((C, 3), np.float32)
    dmin = np.zeros(C, np.float32)
    dmax = np.zeros(C, np.float32)
    for c in range(C):
        ids = tri_index[c * width : (c + 1) * width]
        ids = ids[ids >= 0]
        if len(ids) == 0:
            n_out[c] = (1.0, 0.0, 0.0)
            dmin[c], dmax[c] = 1e30, 1e30
            continue
        v = tris[ids].reshape(-1, 3)
        mu = v.mean(axis=0)
        cov = np.cov((v - mu).T)
        w, vec = np.linalg.eigh(cov)
        n = vec[:, 0]  # minor axis
        d = v @ n
        n_out[c] = n
        dmin[c], dmax[c] = d.min(), d.max()
    return n_out, dmin, dmax


def seg_passes_aabb(o, d, t_hi, lo, hi):
    """(R, C) bool: does segment [0, t_hi] of ray (o, d) hit AABB?"""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    s0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    s1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.minimum(s0, s1).max(axis=2)
    tf = np.maximum(s0, s1).min(axis=2)
    tn = np.maximum(tn, 1e-4)
    tf = np.minimum(tf, t_hi[:, None])
    return tn <= tf


def seg_passes_slab(o, d, t_hi, n, dmin, dmax):
    """(R, C) bool for the oriented plane-pair."""
    no = o @ n.T  # (R, C)
    nd = d @ n.T
    nd = np.where(np.abs(nd) < 1e-12, 1e-12, nd)
    s0 = (dmin[None, :] - no) / nd
    s1 = (dmax[None, :] - no) / nd
    tn = np.maximum(np.minimum(s0, s1), 1e-4)
    tf = np.minimum(np.maximum(s0, s1), t_hi[:, None])
    return tn <= tf


def study(name, obj_path, media_hint=None):
    mesh = parse_obj(obj_path)
    tris = mesh.vertices[mesh.indices].astype(np.float32)
    grid = build_clusters(tris, mesh.material_ids.astype(np.int32))
    C = grid.num_clusters
    width = grid.v0x.shape[1]
    lo = grid.bounds[:, 0:3]
    hi = grid.bounds[:, 3:6]
    wlo, whi = tris.min(axis=(0, 1)), tris.max(axis=(0, 1))
    ext = float(np.max(whi - wlo))
    print(f"\n=== {name}: {len(tris)} tris, {C} clusters ===")

    n, dmin, dmax = cluster_planes(tris, grid.tri_index, C, width)
    # Slab tightness: thickness along best-fit normal vs min AABB extent
    th = dmax - dmin
    box = hi - lo
    live = th < 1e29
    print(
        f"slab thickness / min-box-extent: median "
        f"{np.median((th[live] / np.maximum(box[live].min(1), 1e-9))):.3f}  "
        f"(thickness median {np.median(th[live]) / ext:.4f} of scene extent)"
    )

    # --- interior-point containment: how many cluster AABBs contain a
    # point sampled inside the central region of the scene?
    center = 0.5 * (wlo + whi)
    span = 0.25 * (whi - wlo)
    pts = center + (RNG.random((4096, 3), np.float32) * 2 - 1) * span
    inside_box = (
        (pts[:, None, :] >= lo[None]) & (pts[:, None, :] <= hi[None])
    ).all(axis=2)
    d_pt = pts @ n.T
    inside_slab = inside_box & (d_pt >= dmin[None]) & (d_pt <= dmax[None])
    print(
        f"central-point containment: AABB mean {inside_box.sum(1).mean():.1f} "
        f"/ {C} clusters; +slab mean {inside_slab.sum(1).mean():.1f}"
    )

    # --- short-segment pass count (dist-trace proxy): 64 'blocks' of 1024
    # coherent lanes (origins in a ball of 3% scene extent around a random
    # central point, random dirs, seg len exp(5% extent)).
    for seg_frac, tag in [(0.02, "short"), (0.2, "long")]:
        cur, slab = [], []
        for _ in range(16):
            c0 = center + (RNG.random(3).astype(np.float32) * 2 - 1) * span
            o = c0 + RNG.normal(size=(1024, 3)).astype(np.float32) * (
                0.03 * ext
            )
            d = RNG.normal(size=(1024, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=1, keepdims=True)
            t_hi = RNG.exponential(seg_frac * ext, 1024).astype(np.float32)
            pa = seg_passes_aabb(o, d, t_hi, lo, hi)
            ps = pa & seg_passes_slab(o, d, t_hi, n, dmin, dmax)
            # block-shared: cluster visited if ANY lane passes
            cur.append(pa.any(axis=0).sum())
            slab.append(ps.any(axis=0).sum())
        print(
            f"block visits ({tag} segs): AABB {np.mean(cur):.1f} -> "
            f"+slab {np.mean(slab):.1f}  (of {C})"
        )

    # --- camera-like coherent block (main-trace proxy): parallel-ish rays
    # from outside toward center, bound = first-hit-ish (0.6 ext)
    cur, slab = [], []
    for _ in range(16):
        eye = center + np.array([0, 0, 2.2], np.float32) * span * 4
        tgt = center + (RNG.random((1024, 3)).astype(np.float32) * 2 - 1) * span
        d = tgt - eye
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        o = np.broadcast_to(eye, (1024, 3))
        t_hi = np.full(1024, 0.8 * ext, np.float32)
        pa = seg_passes_aabb(o, d, t_hi, lo, hi)
        ps = pa & seg_passes_slab(o, d, t_hi, n, dmin, dmax)
        cur.append(pa.any(axis=0).sum())
        slab.append(ps.any(axis=0).sum())
    print(
        f"block visits (camera-ish): AABB {np.mean(cur):.1f} -> "
        f"+slab {np.mean(slab):.1f}  (of {C})"
    )


if __name__ == "__main__":
    study("cup", "/root/reference/resources/scenes/cup.obj")
    study("vessel", "/root/repo/scenes/vessel.obj")
    study("showcase", "/root/repo/scenes/showcase.obj")
    study("gembox", "/root/repo/scenes/gembox.obj")
