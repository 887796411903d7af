"""Host-side study (verdict r4 #5b): would a coarse occupancy-grid cull
cut the block-union walk's cluster visits on dense-media scenes?

The megakernel's per-(block, cluster) gate is a branchless slab test
reduced over the block's 1024 lanes: the cluster is visited iff ANY live
lane's segment [T_MIN, bound] overlaps the cluster AABB. An occupancy
refinement can only remove visits where every lane's segment crosses the
AABB *slab* but misses the cluster's actual geometry. This tool measures
that headroom EXACTLY, on real recorded wavefront populations (the same
record_bounces harness as tools/study_pairs.py):

  union(aabb):  visits under the shipped slab gate (what the kernel pays)
  union(vox^k): visits if each cluster's AABB were replaced by a k^3
                voxel occupancy grid of its triangles and a lane only
                "enters" when its segment passes through an OCCUPIED
                voxel (conservative triangle-AABB voxelization, exact
                ray-voxel 3D-DDA on the host) — the upper bound on ANY
                in-kernel occupancy cull at that resolution
  union(exact): visits if lanes only entered clusters whose triangles'
                individual AABBs the segment touches — the limit of
                infinitely fine occupancy

Kernel-side cost of the cheap branchless version (for the EV read): a
k=4 grid is a 64-bit mask per cluster; a lane-vectorized segment-vs-
occupancy test needs ~3 ops per voxel step x ~3k steps on (8,128) tiles
plus the 64-bit mask broadcast — ~10-12 vector ops per (block, cluster)
gate vs ~4 for the slab test, so the cull must remove >~15% of visits
(each visit ~ 128 tris x ~22 ops) to break even; per round-3 rules the
gate must stay branchless and the payoff must survive the union over
1024 lanes.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_occupancy.py [scene.obj] [WxH] [k]
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402
from complex_materials_renderer_tpu.render.integrator import T_MIN  # noqa: E402

from study_pairs import (  # noqa: E402
    BLOCK,
    record_bounces,
    seg_mask,
    union_visits,
)


def voxelize_cluster(tris, lo, hi, k):
    """Conservative k^3 occupancy of a cluster's triangles (triangle-AABB
    overlap per voxel — conservative, which is what a kernel cull needs)."""
    occ = np.zeros((k, k, k), dtype=bool)
    ext = np.maximum(hi - lo, 1e-12)
    for t in tris:
        tlo = np.clip(((t.min(0) - lo) / ext * k).astype(int), 0, k - 1)
        thi = np.clip(((t.max(0) - lo) / ext * k).astype(int), 0, k - 1)
        occ[tlo[0] : thi[0] + 1, tlo[1] : thi[1] + 1, tlo[2] : thi[2] + 1] = True
    return occ


def segment_hits_occupancy(o, d, t0, t1, lo, hi, occ, k):
    """Exact 3D-DDA: does segment o + t*d, t in [t0, t1], pass through an
    occupied voxel? Vectorized over lanes via sampling-free stepping is
    fiddly; here we conservatively supersample the segment at half-voxel
    pitch (host-side study only; a real kernel would run fixed-step DDA).
    Half-voxel pitch cannot skip a voxel the segment crosses by more than
    half its diagonal — adequate for a headroom ESTIMATE (slightly
    conservative in the cull's favor: it may miss grazing crossings, so
    it can only overstate the cull)."""
    ext = np.maximum(hi - lo, 1e-12)
    # segment length in voxel units decides the sample count
    seg = (t1 - t0)[:, None] * d
    nstep = int(np.ceil(np.abs(seg / ext[None, :] * k).max() * 2)) + 1
    nstep = min(max(nstep, 2), 4 * k + 2)
    ts = t0[:, None] + (t1 - t0)[:, None] * np.linspace(0, 1, nstep)[None, :]
    pts = o[:, None, :] + ts[:, :, None] * d[:, None, :]
    ijk = ((pts - lo[None, None, :]) / ext[None, None, :] * k).astype(int)
    ijk = np.clip(ijk, 0, k - 1)
    return occ[ijk[..., 0], ijk[..., 1], ijk[..., 2]].any(axis=1)


def refine_mask(mask, o, d, bound, lo, hi, occs, k):
    """AND the slab mask with the voxel-occupancy test (only where the
    slab test passed — occupancy can only remove entries)."""
    out = mask.copy()
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    for c in range(mask.shape[1]):
        lanes = np.nonzero(mask[:, c])[0]
        if lanes.size == 0:
            continue
        s0 = (lo[c][None, :] - o[lanes]) * inv[lanes]
        s1 = (hi[c][None, :] - o[lanes]) * inv[lanes]
        tn = np.maximum(np.minimum(s0, s1).max(axis=1), T_MIN)
        tf = np.minimum(np.maximum(s0, s1).min(axis=1), bound[lanes])
        keep = segment_hits_occupancy(
            o[lanes], d[lanes], tn, tf, lo[c], hi[c], occs[c], k
        )
        out[lanes, c] = keep
    return out


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/resources/scenes/cup.obj"
    )
    res = (
        tuple(int(v) for v in sys.argv[2].split("x"))
        if len(sys.argv) > 2
        else (128, 128)
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    scene, records = record_bounces(obj, res)
    grid = build_clusters(scene.triangles, scene.mat_ids)
    C = grid.num_clusters
    lo = np.asarray(grid.bounds[:, 0:3])
    hi = np.asarray(grid.bounds[:, 3:6])
    width = grid.tri_index.size // C
    tri_of = np.asarray(grid.tri_index).reshape(C, width)
    tris = np.asarray(scene.triangles)

    occs = []
    for c in range(C):
        ids = tri_of[c][tri_of[c] >= 0]
        ct = tris[ids] if ids.size else tris[:0]
        occs.append(voxelize_cluster(ct, lo[c], hi[c], k))
    fill = np.mean([o.mean() for o in occs])
    print(
        f"{obj.split('/')[-1]} {res[0]}x{res[1]}: C={C} k={k} "
        f"mean voxel fill={fill:.2f} ({len(records)} bounces)",
        flush=True,
    )

    tot = {"aabb": 0, "vox": 0}
    for bi, rec in enumerate(records):
        for kind in ("full", "dist", "nee"):
            if kind not in rec:
                continue
            if kind == "full":
                o, d, act, t, hitm = rec[kind]
                bound = np.full(len(o), 1e4, np.float32)
            elif kind == "dist":
                o, d, act, bound = rec[kind]
            else:
                o, act = rec[kind]
                # shadow rays march toward the light; direction/bound per lane
                lp = np.asarray(scene.options.light_pos, np.float32)
                d = lp[None, :] - o
                bound = np.linalg.norm(d, axis=1)
                d = d / np.maximum(bound[:, None], 1e-12)
            act = np.asarray(act, bool)
            if not act.any():
                continue
            m = seg_mask(o, d, bound, lo, hi, act)
            tot["aabb"] += union_visits(m)
            mv = refine_mask(m, o, d, bound, lo, hi, occs, k)
            tot["vox"] += union_visits(mv)
        if bi % 8 == 0:
            print(
                f"  bounce {bi}: aabb={tot['aabb']} vox={tot['vox']} "
                f"(cut {1 - tot['vox'] / max(tot['aabb'], 1):.1%})",
                flush=True,
            )

    print(
        f"TOTAL union visits: aabb={tot['aabb']} vox^{k}={tot['vox']} "
        f"-> occupancy cull removes {1 - tot['vox'] / max(tot['aabb'], 1):.1%} "
        f"(break-even ~15% at the k=4 branchless gate cost)",
        flush=True,
    )


if __name__ == "__main__":
    main()
