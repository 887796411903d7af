"""Host-side study: joint (cluster width, super fan-out) for the linear walk.

study_width.py models the gate cost as ``every cluster slab tested``
(one-level walk), which overcharges small widths: the real walk
(megakernel.py super_lin/cluster_lin) tests EVERY super's slab but only
the clusters INSIDE entered supers. With that two-level model, quartering
the width (x4 clusters) costs x4 cluster gates only inside the entered
footprint, not globally — so the optimum (W, sf) must be picked jointly.

Per trace set, per 1024-lane block:

  cost = S * GATE                      # all super slabs tested
       + entered_supers * sf * GATE    # member cluster slabs tested
       + visited_clusters * (W * TRI + FIXED)

entered/visited are block UNIONS of per-lane slab hits (the kernel's
cull reduces over the whole block). Populations are real recorded
wavefronts (study_pairs.record_bounces with the mega sort key applied).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_widthsf.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import record_bounces, seg_mask  # noqa: E402
from tools.study_blocksize import mega_key  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCK = 1024
WIDTHS = (16, 32, 64, 128)
SFS = (4, 8, 16, 32, 64)
TRI = 35.0      # cycles per unrolled triangle (fused-era scale)
FIXED = 150.0   # per-visit fixed: refs round-trip + loop overhead
GATE = 90.0     # per-slab-test: scalar slab + cross-lane reduce + branch


def seg_mask_chunked(o, d, bound, lo, hi, act, chunk=2048):
    out = np.zeros((o.shape[0], lo.shape[0]), bool)
    for i in range(0, o.shape[0], chunk):
        s = slice(i, i + chunk)
        out[s] = seg_mask(o[s], d[s], bound[s], lo, hi, act[s])
    return out


def collect_sets(scene, records):
    flat = scene.triangles.reshape(-1, 3)
    wlo, whi = flat.min(axis=0), flat.max(axis=0)
    sets = []
    for rec in records:
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
    return wlo, whi, sets


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scenes/showcase.obj"
    res = (128, 64)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))

    scene, records = record_bounces(obj, res)
    wlo, whi, sets = collect_sets(scene, records)
    print(f"{obj}: {scene.triangles.shape[0]} tris, {len(sets)} trace sets")

    rows = []
    for W in WIDTHS:
        grid = build_clusters(scene.triangles, scene.mat_ids, cluster_size=W)
        clo = grid.bounds[:, 0:3]
        chi = grid.bounds[:, 3:6]
        C = grid.num_clusters
        # Per-set block stats, cluster level (sf-independent).
        per_set = []
        for o, d, bound, act in sets:
            if not act.any():
                per_set.append(None)
                continue
            key = mega_key(o, d, wlo, whi)
            key[~act] = np.uint64(1) << 62
            order = np.argsort(key, kind="stable")
            m = seg_mask_chunked(o[order], d[order], bound[order], clo, chi,
                                 act[order])
            blocks = []  # per-block union cluster hit vector (incl. empty)
            for b0 in range(0, m.shape[0], BLOCK):
                blocks.append(m[b0 : b0 + BLOCK].any(axis=0))
            per_set.append((np.array(blocks), o[order], d[order],
                            bound[order], act[order]))

        lanes = sum(int(s[4].sum()) for s in per_set if s is not None)
        for sf in SFS:
            S = -(-C // sf)
            # Super boxes: union of each consecutive-sf cluster group.
            slo = np.full((S, 3), 1e30, np.float32)
            shi = np.full((S, 3), -1e30, np.float32)
            real = ~(clo[:, 0] >= 1e29)  # skip empty pad clusters
            for s in range(S):
                g = slice(s * sf, (s + 1) * sf)
                r = real[g]
                if r.any():
                    slo[s] = clo[g][r].min(axis=0)
                    shi[s] = chi[g][r].max(axis=0)
                else:
                    slo[s] = 1e30
                    shi[s] = 1e30
            visited = tested_c = tested_s = 0
            for ps in per_set:
                if ps is None:
                    continue
                blocks, o, d, bound, act = ps
                ms = seg_mask_chunked(o, d, bound, slo, shi, act)
                for bi, b0 in enumerate(range(0, ms.shape[0], BLOCK)):
                    blk_s = ms[b0 : b0 + BLOCK]
                    if not blk_s.any():
                        continue
                    ent = blk_s.any(axis=0)
                    visited += int(blocks[bi].sum())
                    tested_c += int(ent.sum()) * sf
                    tested_s += S
            cyc = (tested_s + tested_c) * GATE + visited * (W * TRI + FIXED)
            rows.append((W, sf, S, visited, tested_s, tested_c,
                         cyc / max(lanes, 1)))
            print(f"  W={W:3d} sf={sf:2d}: S={S:4d} visited={visited:7d} "
                  f"gateS={tested_s:8d} gateC={tested_c:8d} "
                  f"-> {cyc / max(lanes, 1):8.1f} cyc/lane", flush=True)

    base = next(r[6] for r in rows if r[0] == 128 and r[1] == 16)
    print("\nrelative to W=128 sf=16:")
    for W, sf, S, v, ts, tc, cl in sorted(rows, key=lambda r: r[6]):
        print(f"  W={W:3d} sf={sf:2d}: x{base / cl:.3f} faster")


if __name__ == "__main__":
    main()
