"""Host-side study: how does block-union traversal cost scale with LANES
PER BLOCK?

Motivation (round 3c): the measured inner-loop margin is the per-triangle
scalar extract/broadcast stream, which is paid once per (triangle, block
visit) regardless of how many lane tiles the block holds; the vector
arithmetic scales with lane tiles. So a 2048-lane block pays
~(E + 2V) per triangle to serve 2048 lanes where a 1024-lane block pays
(E + V) for 1024 — a win whenever the block's cluster UNION grows by
less than (E + 2V)/(E + V) when merging two sorted neighbor blocks.
This script measures that union growth on REAL recorded wavefront
populations (study_pairs.record_bounces), with lanes ordered by the mega
engine's own coherence key, and evaluates the cost model.

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site \
     python tools/study_blocksize.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.study_pairs import T_MIN, record_bounces, seg_mask  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402

BLOCKS = (512, 1024, 2048, 4096, 8192)

# Per-triangle cycle model at 1024 lanes (profile_mega slope + the
# stored-normal A/B): E = lane-count-independent share (scalar extracts,
# row reads, loop overhead), V = lane-tile vector share per 1024 lanes.
MODELS = {"fused(E25,V34)": (25.0, 34.0), "sep(E18,V17)": (18.0, 17.0)}


def mega_key(o, d, wlo, whi):
    ext = np.maximum(whi - wlo, 1e-6)
    q = np.clip((o - wlo) / ext * 32.0, 0.0, 31.0).astype(np.uint64)

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    cell = (spread(q[:, 0]) << 2) | (spread(q[:, 1]) << 1) | spread(q[:, 2])
    octant = (
        (d[:, 0] > 0).astype(np.uint64) * 4
        + (d[:, 1] > 0).astype(np.uint64) * 2
        + (d[:, 2] > 0).astype(np.uint64)
    )
    return (octant << np.uint64(15)) | cell


def union_by_block(mask, block):
    tot = 0
    for b0 in range(0, mask.shape[0], block):
        tot += int(mask[b0 : b0 + block].any(axis=0).sum())
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

    # visits[kind][block] accumulated over all bounces
    visits = {k: {b: 0 for b in BLOCKS} for k in ("full", "fused")}
    live = {k: 0 for k in visits}
    for rec in records:
        # main trace: bound by scene-box exit (the kernel's walk clamp).
        o, d, act, t, hit = rec["full"]
        act = act.astype(bool)
        inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
        s0 = (wlo[None] - o) * inv
        s1 = (whi[None] - o) * inv
        box_exit = np.maximum(np.minimum(s0, s1), 0).sum(axis=1) * 0 + np.minimum(
            np.maximum(s0, s1), 1e9
        ).min(axis=1)
        m_full = seg_mask(o, d, box_exit.astype(np.float32), lo, hi, act)
        key = mega_key(o, d, wlo, whi)
        key[~act] = np.uint64(1) << 62
        order = np.argsort(key, kind="stable")
        m_full = m_full[order]

        # fused dist+nee: same origin, two per-lane bounds -> per-lane OR.
        m_fused = None
        if "dist" in rec or "nee" in rec:
            parts = []
            if "dist" in rec:
                pos, dd, trans, bound = rec["dist"]
                parts.append(seg_mask(pos, dd, bound, lo, hi, trans.astype(bool)))
                o_f, d_f = pos, dd
            if "nee" in rec:
                pos, act_n = rec["nee"]
                lp = np.asarray(
                    scene.options.light_pos, np.float32
                ) * np.float32(1.0)
                to_l = lp[None] - pos
                dist_l = np.linalg.norm(to_l, axis=1)
                dn = to_l / np.maximum(dist_l[:, None], 1e-12)
                parts.append(
                    seg_mask(pos, dn, dist_l * 0.999, lo, hi, act_n.astype(bool))
                )
                o_f, d_f = pos, dn
            m_fused = parts[0]
            for p in parts[1:]:
                m_fused = m_fused | p
            key = mega_key(o_f, d_f, wlo, whi)
            key[~(m_fused.any(axis=1))] = np.uint64(1) << 62
            order = np.argsort(key, kind="stable")
            m_fused = m_fused[order]

        for name, m in (("full", m_full), ("fused", m_fused)):
            if m is None:
                continue
            live[name] += int(m.any(axis=1).sum())
            for b in BLOCKS:
                visits[name][b] += union_by_block(m, b)

    for name in ("full", "fused"):
        print(f"\n--- {name} trace ({live[name]} live lane-bounces) ---")
        base = None
        for b in BLOCKS:
            v = visits[name][b]
            line = f"  B={b:5d}: visits {v:7d}"
            for mname, (E, V) in MODELS.items():
                cyc = v * 128 * (E + V * b / 1024.0) / max(live[name], 1)
                if base is None:
                    pass
                line += f"  {mname}: {cyc:8.0f} cyc/lane"
            print(line)
        v1024 = visits[name][1024]
        for b in BLOCKS:
            r = visits[name][b] / max(v1024, 1)
            rels = ", ".join(
                f"{mname} x{(visits[name][b] * (E + V * b / 1024.0)) / (v1024 * (E + V)):.3f}"
                for mname, (E, V) in MODELS.items()
            )
            print(f"  B={b:5d}: union x{r:.3f} vs 1024; model cost {rels}")


if __name__ == "__main__":
    main()
