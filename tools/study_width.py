"""Host-side study: optimal CLUSTER WIDTH now that cull gates are cheap.

Width 64/32 measured as losers in the carried-state era, when every
cluster gate cost ~500 cycles of phi traffic; the round-3c scratch-ref
walk cut a culled cluster to slab test + branch. The trade is now:

  cost = sum over blocks/bounces of
         tested_clusters * GATE + visited * (W * TRI + FIXED)

where smaller W shrinks the arithmetic a visit pays but raises cluster
count (more gates) and union count (more visits, though tighter boxes
grow it sublinearly). This evaluates real recorded populations at
W in {32, 64, 128, 256}.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_width.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import record_bounces, seg_mask  # noqa: E402
from tools.study_blocksize import mega_key  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCK = 1024
WIDTHS = (16, 32, 64, 128, 256)
TRI = 40.0      # cycles per unrolled triangle (sep-walk scale)
FIXED = 150.0   # per-visit fixed: state ref round-trip + loop overhead
GATES = (60.0, 120.0)  # per-tested-cluster slab + reduce + branch


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scenes/showcase.obj"
    res = (128, 64)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))

    scene, records = record_bounces(obj, res)
    flat = scene.triangles.reshape(-1, 3)
    wlo, whi = flat.min(axis=0), flat.max(axis=0)

    # Collect the per-bounce trace sets once (same as study_runcull).
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

    print(f"{obj}: {scene.triangles.shape[0]} tris, {len(sets)} trace sets")
    results = {}
    for W in WIDTHS:
        grid = build_clusters(scene.triangles, scene.mat_ids, cluster_size=W)
        clo = grid.bounds[:, 0:3]
        chi = grid.bounds[:, 3:6]
        C = grid.num_clusters
        visited = 0
        tested = 0
        lanes = 0
        for o, d, bound, act in sets:
            if not act.any():
                continue
            key = mega_key(o, d, wlo, whi)
            key[~act] = np.uint64(1) << 62
            order = np.argsort(key, kind="stable")
            m = seg_mask(o[order], d[order], bound[order], clo, chi,
                         act[order])
            nb = 0
            for b0 in range(0, m.shape[0], BLOCK):
                blk = m[b0 : b0 + BLOCK]
                if not blk.any():
                    continue
                visited += int(blk.any(axis=0).sum())
                nb += 1
            tested += nb * C  # linear walk tests every cluster's slab
            lanes += int(act.sum())
        results[W] = (C, visited, tested, lanes)
        print(f"  W={W:3d}: C={C:4d} visited={visited:7d} tested={tested:8d}")

    print()
    base = None
    for W in WIDTHS:
        C, visited, tested, lanes = results[W]
        for G in GATES:
            cyc = tested * G + visited * (W * TRI + FIXED)
            tag = f"W={W:3d} gate={G:.0f}: {cyc / max(lanes, 1):8.1f} cyc/lane"
            if base is None:
                base = {}
            if G not in base:
                base[G] = cyc
            print(f"  {tag}  x{cyc / base[G]:.3f}")


if __name__ == "__main__":
    main()
