"""Host-side study: can a conservative distance field prove dense-media
dist traces EMPTY before they walk anything?

Cup's cost is the per-bounce distance-to-boundary trace: rays deep inside
the coffee draw SHORT free-flight candidates (dense sigma_t), yet their
segments still intersect many bulging shell-cluster AABBs (study_overlap:
oriented slabs don't fix it). But a short interior segment is usually
NOWHERE NEAR a triangle — if a per-lane conservative lower bound on
distance-to-surface exceeds the segment bound, the lane can drop out of
the fused walk's set A entirely, shrinking every block's b-slab union.

This measures, over REAL recorded cup dist populations:
  - ceiling: lanes with true dist-to-nearest-triangle lower bound
    (|p - centroid| - r_tri, exact enough) > segment bound;
  - implementable: lanes provably empty via a VOXEL distance field
    (N^3 occupancy -> euclidean distance transform, minus diagonals);
  - the union shrink if those lanes leave set A.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_distfield.py [scene.obj] [WxH] [N]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import record_bounces, seg_mask  # noqa: E402
from tools.study_blocksize import mega_key  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCK = 1024


def voxel_distance_field(tris, wlo, whi, n):
    """(n,n,n) conservative lower bound on distance from ANY point in a
    voxel to ANY triangle: mark voxels overlapping a triangle AABB as
    occupied, take the euclidean distance between voxel CENTERS to the
    nearest occupied voxel, subtract one voxel diagonal (center-to-corner
    of self + the occupied voxel's extent)."""
    ext = np.maximum(whi - wlo, 1e-9)
    cell = ext / n
    occ = np.zeros((n, n, n), bool)
    tlo = tris.min(axis=1)
    thi = tris.max(axis=1)
    lo_i = np.clip(((tlo - wlo) / cell).astype(int), 0, n - 1)
    hi_i = np.clip(((thi - wlo) / cell).astype(int), 0, n - 1)
    for a, b in zip(lo_i, hi_i):
        occ[a[0] : b[0] + 1, a[1] : b[1] + 1, a[2] : b[2] + 1] = True

    idx = np.argwhere(occ).astype(np.float32)  # occupied voxel centers
    grid = np.stack(
        np.meshgrid(*[np.arange(n, dtype=np.float32)] * 3, indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    # distance in voxel units, chunked to bound memory
    field = np.empty(grid.shape[0], np.float32)
    for s in range(0, grid.shape[0], 8192):
        g = grid[s : s + 8192]
        d2 = ((g[:, None, :] - idx[None, :, :]) ** 2).sum(-1)
        field[s : s + 8192] = np.sqrt(d2.min(axis=1))
    field = field.reshape(n, n, n)
    diag = float(np.linalg.norm(cell))
    return np.maximum(field * cell.min() - diag, 0.0), cell


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/resources/scenes/cup.obj"
    )
    res = (128, 64)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    scene, records = record_bounces(obj, res)
    tris = scene.triangles
    flat = tris.reshape(-1, 3)
    wlo, whi = flat.min(axis=0), flat.max(axis=0)
    grid = build_clusters(tris, scene.mat_ids)
    clo = grid.bounds[:, 0:3]
    chi = grid.bounds[:, 3:6]

    cent = tris.mean(axis=1)
    r_tri = np.linalg.norm(tris - cent[:, None, :], axis=2).max(axis=1)
    field, cell = voxel_distance_field(tris, wlo, whi, n)
    print(f"{obj}: {tris.shape[0]} tris, {grid.num_clusters} clusters, "
          f"field {n}^3 (occ {100 * (field == 0).mean():.0f}% zero)")

    tot = prov_true = prov_vox = 0
    vis_now = vis_field = 0
    for rec in records:
        if "dist" not in rec:
            continue
        pos, dd, trans, bound = rec["dist"]
        act = trans.astype(bool)
        if not act.any():
            continue
        # segment END could also be used; origin-only matches the cheap
        # in-kernel test (one lookup per lane).
        # ceiling: true conservative point distance (subsampled lanes —
        # the full pairwise matrix is too heavy for every record)
        sub = np.flatnonzero(act)[::8][:1024]
        d_c = np.linalg.norm(
            pos[sub, None, :] - cent[None, :, :], axis=2
        ) - r_tri[None, :]
        true_lb_sub = np.maximum(d_c.min(axis=1), 0.0)
        # voxel field at the origin
        vi = np.clip(((pos - wlo) / cell).astype(int), 0, n - 1)
        vox_lb = field[vi[:, 0], vi[:, 1], vi[:, 2]]

        e_vox = act & (vox_lb > bound)
        tot += int(act.sum())
        tot_sub = len(sub)
        prov_true += int((true_lb_sub > bound[sub]).sum()) * max(
            int(act.sum()) // max(tot_sub, 1), 1
        )
        prov_vox += int(e_vox.sum())

        # union effect (dist walk only, mega sort order)
        key = mega_key(pos, dd, wlo, whi)
        key[~act] = np.uint64(1) << 62
        order = np.argsort(key, kind="stable")
        m = seg_mask(pos[order], dd[order], bound[order], clo, chi,
                     act[order])
        m2 = m & ~e_vox[order][:, None]
        for b0 in range(0, m.shape[0], BLOCK):
            vis_now += int(m[b0 : b0 + BLOCK].any(axis=0).sum())
            vis_field += int(m2[b0 : b0 + BLOCK].any(axis=0).sum())

    print(f"dist lanes: {tot}; provably empty: true-bound "
          f"{100 * prov_true / max(tot, 1):.1f}%  voxel-field({n}^3) "
          f"{100 * prov_vox / max(tot, 1):.1f}%")
    print(f"dist-walk block-union visits: now {vis_now} -> with field "
          f"{vis_field}  (x{vis_field / max(vis_now, 1):.3f})")


if __name__ == "__main__":
    main()
