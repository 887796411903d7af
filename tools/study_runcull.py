"""Host-side study: would per-RUN (16-triangle) cull gates pay off now
that the walk's state lives in scratch refs?

Round-2/3 sub-culling lost because each gate carried the 11-tile hit
state through a lax.cond (~500 cycles). The round-3c scratch-ref walk
made gates carry nothing, so the question is purely geometric now: of a
VISITED cluster's 8 sub-runs, how many does the BLOCK (any live lane,
under the walk's bound) actually enter? Per-lane stats (3.2-4.3 of 8)
are irrelevant — the gate fires on the block union, the same dilution
that killed every per-lane idea.

Model: per visited cluster,
  now        = subs * RUN_COST
  gated      = subs * GATE + entered_runs * (RUN_COST + STATE_TRAFFIC)
with RUN_COST ~ 16 tris x ~35-59 cyc, GATE ~ 100 cyc (slab vec ops +
cross-lane reduce + branch + AABB row read), STATE_TRAFFIC ~ 20-70 cyc
(payload tiles through VMEM refs per entered run).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_runcull.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import record_bounces, seg_mask  # noqa: E402
from tools.study_blocksize import mega_key  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCK = 1024
RUN = 16


def run_bounds(tris, grid):
    """(C*subs, 6) per-run AABBs from the grid's triangle order."""
    C = grid.num_clusters
    width = grid.v0x.shape[1]
    subs = width // RUN
    lo = np.full((C * subs, 3), 1e30, np.float32)
    hi = np.full((C * subs, 3), -1e30, np.float32)
    for c in range(C):
        for r in range(subs):
            ids = grid.tri_index[c * width + r * RUN : c * width + (r + 1) * RUN]
            ids = ids[ids >= 0]
            if len(ids) == 0:
                lo[c * subs + r] = 1e30
                hi[c * subs + r] = 1e30
                continue
            v = tris[ids].reshape(-1, 3)
            lo[c * subs + r] = v.min(axis=0)
            hi[c * subs + r] = v.max(axis=0)
    return lo, hi, subs


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scenes/showcase.obj"
    res = (128, 64)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))

    scene, records = record_bounces(obj, res)
    grid = build_clusters(scene.triangles, scene.mat_ids)
    clo = grid.bounds[:, 0:3]
    chi = grid.bounds[:, 3:6]
    tris = scene.triangles
    rlo, rhi, subs = run_bounds(tris, grid)
    flat = tris.reshape(-1, 3)
    wlo, whi = flat.min(axis=0), flat.max(axis=0)
    C = grid.num_clusters
    print(f"{obj}: {tris.shape[0]} tris, {C} clusters x {subs} runs, "
          f"{len(records)} bounces")

    visited = 0          # block-union cluster visits (what we pay today)
    entered = 0          # block-union runs entered within visited clusters
    total_runs = 0       # subs * visited
    for rec in records:
        sets = []
        if "full" in rec:
            o, d, act, t, hit = rec["full"]
            act = act.astype(bool)
            inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
            s0 = (wlo[None] - o) * inv
            s1 = (whi[None] - o) * inv
            box_exit = np.minimum(np.maximum(s0, s1), 1e9).min(axis=1)
            sets.append((o, d, box_exit.astype(np.float32), act))
        if "dist" in rec:
            pos, dd, trans, bound = rec["dist"]
            sets.append((pos, dd, bound, trans.astype(bool)))
        if "nee" in rec:
            pos, act_n = rec["nee"]
            lp = np.asarray(scene.options.light_pos, np.float32)
            to_l = lp[None] - pos
            dist_l = np.linalg.norm(to_l, axis=1)
            dn = to_l / np.maximum(dist_l[:, None], 1e-12)
            sets.append((pos, dn, (dist_l * 0.999).astype(np.float32),
                         act_n.astype(bool)))

        for o, d, bound, act in sets:
            if not act.any():
                continue
            key = mega_key(o, d, wlo, whi)
            key[~act] = np.uint64(1) << 62
            order = np.argsort(key, kind="stable")
            o, d, bound, act = o[order], d[order], bound[order], act[order]
            m_c = seg_mask(o, d, bound, clo, chi, act)   # (R, C)
            m_r = seg_mask(o, d, bound, rlo, rhi, act)   # (R, C*subs)
            for b0 in range(0, o.shape[0], BLOCK):
                uc = m_c[b0 : b0 + BLOCK].any(axis=0)            # (C,)
                ur = m_r[b0 : b0 + BLOCK].any(axis=0)            # (C*subs,)
                ur = ur.reshape(C, subs) & uc[:, None]
                visited += int(uc.sum())
                entered += int(ur.sum())
                total_runs += int(uc.sum()) * subs

    frac = entered / max(total_runs, 1)
    print(f"\nblock-union visited clusters: {visited}")
    print(f"runs entered / runs in visited clusters: {entered}/{total_runs} "
          f"= {frac:.3f}")
    for run_cost in (560, 950):
        for gate, traffic in ((80, 30), (120, 70)):
            now = total_runs * run_cost
            gated = visited * subs * gate + entered * (run_cost + traffic)
            print(f"  run_cost={run_cost} gate={gate} traffic={traffic}: "
                  f"gated/now = {gated / now:.3f}")


if __name__ == "__main__":
    main()
