"""Host-side study: per-SUBLANE-GROUP traversal — treat the (8, 128)
vector tile as g independent groups of 1024/g lanes, each walking its
OWN cluster visit list, with per-row operands ((8,1) sublane broadcasts
from per-group dynamic row reads) instead of one scalar splat per
triangle.

Mechanism: groups proceed in LOCKSTEP through their own entered-cluster
lists (all clusters are the same static width), so one (8,128) vector op
tests g different (triangle, group) pairs at once. The step count per
block trace is therefore max_g(per-group union), not the 1024-lane block
union — the quantity this script measures on REAL recorded wavefront
populations (study_pairs.record_bounces), lanes ordered by the mega
engine's coherence key.

Cost model per 128-triangle visit-step at group count g:
  cyc = 128 * (E * r(g) + V)
where E is the extract/row-read share, V the vector share, and r(g) the
extract inflation: per 16-triangle run the kernel reads g rows instead
of 1, and the per-triangle operand build becomes an (8,1) extract +
lane-broadcast instead of a scalar splat (similar op count, so r models
mainly the extra row reads; r(1)=1, sensitivity range below).

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_subgroups.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import record_bounces, seg_mask  # noqa: E402
from tools.study_blocksize import mega_key  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCK = 1024
GROUPS = (1, 2, 4, 8)  # groups per block (group size = 1024/g lanes)

# Fused-walk per-triangle shares at 1024 lanes (study_blocksize MODELS).
E_FUSED, V_FUSED = 25.0, 34.0
# Extract-inflation sensitivity: optimistic (row reads only) and
# pessimistic (operand build also doubles).
R_OF_G = {
    "r=1+0.02(g-1)": lambda g: 1.0 + 0.02 * (g - 1),
    "r=1+0.10(g-1)": lambda g: 1.0 + 0.10 * (g - 1),
}


def steps_by_block(mask, g):
    """Sum over blocks of max over the block's g groups of the group's
    cluster union — the lockstep visit-step count."""
    tot = 0
    gs = BLOCK // g
    for b0 in range(0, mask.shape[0], BLOCK):
        blk = mask[b0 : b0 + BLOCK]
        per_group = [
            int(blk[i * gs : (i + 1) * gs].any(axis=0).sum())
            for i in range(max(1, (blk.shape[0] + gs - 1) // gs))
        ]
        tot += max(per_group) if per_group else 0
    return tot


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scenes/showcase.obj"
    res = (256, 128)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))

    scene, records = record_bounces(obj, res)
    grid = build_clusters(scene.triangles, scene.mat_ids)
    lo = grid.bounds[:, 0:3]
    hi = grid.bounds[:, 3:6]
    tris = scene.triangles.reshape(-1, 3)
    wlo, whi = tris.min(axis=0), tris.max(axis=0)
    print(
        f"{obj}: {scene.triangles.shape[0]} tris, {grid.num_clusters} "
        f"clusters, {len(records)} bounces, lanes {res[0] * res[1]}"
    )

    steps = {k: {g: 0 for g in GROUPS} for k in ("full", "fused")}
    for rec in records:
        o, d, act, t, hit = rec["full"]
        act = act.astype(bool)
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        s0 = (wlo[None] - o) * inv
        s1 = (whi[None] - o) * inv
        box_exit = np.minimum(np.maximum(s0, s1), 1e9).min(axis=1)
        m_full = seg_mask(o, d, box_exit.astype(np.float32), lo, hi, act)
        key = mega_key(o, d, wlo, whi)
        key[~act] = np.uint64(1) << 62
        m_full = m_full[np.argsort(key, kind="stable")]

        m_fused = None
        if "dist" in rec or "nee" in rec:
            parts = []
            o_f = d_f = None
            if "dist" in rec:
                pos, dd, trans, bound = rec["dist"]
                parts.append(seg_mask(pos, dd, bound, lo, hi, trans.astype(bool)))
                o_f, d_f = pos, dd
            if "nee" in rec:
                pos, act_n = rec["nee"]
                lp = np.asarray(scene.options.light_pos, np.float32)
                to_l = lp[None] - pos
                dist_l = np.linalg.norm(to_l, axis=1)
                dn = to_l / np.maximum(dist_l[:, None], 1e-12)
                parts.append(
                    seg_mask(pos, dn, dist_l * 0.999, lo, hi, act_n.astype(bool))
                )
                if o_f is None:
                    o_f, d_f = pos, dn
            m_fused = parts[0]
            for p in parts[1:]:
                m_fused = m_fused | p
            key = mega_key(o_f, d_f, wlo, whi)
            key[~(m_fused.any(axis=1))] = np.uint64(1) << 62
            m_fused = m_fused[np.argsort(key, kind="stable")]

        for name, m in (("full", m_full), ("fused", m_fused)):
            if m is None:
                continue
            for g in GROUPS:
                steps[name][g] += steps_by_block(m, g)

    for name in ("full", "fused"):
        print(f"\n--- {name} trace ---")
        base = steps[name][1]
        for g in GROUPS:
            s = steps[name][g]
            rels = ", ".join(
                f"{rn}: x{(s * 128 * (E_FUSED * rf(g) + V_FUSED)) / max(base * 128 * (E_FUSED + V_FUSED), 1):.3f}"
                for rn, rf in R_OF_G.items()
            )
            print(
                f"  g={g}: steps {s:7d} (x{s / max(base, 1):.3f} vs block-union); "
                f"model cost {rels}"
            )


if __name__ == "__main__":
    main()
