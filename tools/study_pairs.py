"""Host-side study: would PAIR-EXPANDED traversal beat the block-union walk
on dense-media scenes?

The binned per-lane tracer failed because it served per-lane cluster lists
in ROUNDS (lanes resorted by their k-th cluster between rounds): after the
first entry, round-k groups fragment to ~28 lanes/visit (NOTES round 3b).
Pair expansion removes rounds entirely: materialize one (lane, cluster)
PAIR per list entry, sort pairs once by cluster id, and sweep 1024-pair
blocks — every pair in a block needs one of the block's few distinct
clusters, so visit count is sum-over-blocks of distinct clusters, not the
union over 1024 unrelated lanes.

This records REAL per-bounce trace populations from the wavefront engine
(jitted bounce returning trace-request intermediates, parity RNG, actual
compaction order) and compares, per trace type:

  mega model:   sum over 1024-lane blocks of |union of clusters any live
                lane's segment intersects|  (what the megakernel pays)
  pair model:   pairs/1024 + cluster-span overheads after a global sort
                (what a pair sweep would pay), plus the listing walk
                (union visits again, but at slab-test cost only)

Run: JAX_PLATFORMS=cpu PYTHONPATH=/root/repo:/root/.axon_site python
     tools/study_pairs.py [scene.obj] [WxH]
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from complex_materials_renderer_tpu.accel import build_bvh  # noqa: E402
from complex_materials_renderer_tpu.accel.clusters import build_clusters  # noqa: E402
from complex_materials_renderer_tpu.config import RenderOptions  # noqa: E402
from complex_materials_renderer_tpu.kernels.traverse import device_bvh  # noqa: E402
from complex_materials_renderer_tpu.ops import rng as rng_ops  # noqa: E402
from complex_materials_renderer_tpu.ops.camera import generate_rays, make_camera  # noqa: E402
from complex_materials_renderer_tpu.ops.medium import free_flight_candidate  # noqa: E402
from complex_materials_renderer_tpu.render.hitinfo import make_scene_arrays  # noqa: E402
from complex_materials_renderer_tpu.render.integrator import (  # noqa: E402
    T_MAX,
    T_MIN,
    Lights,
    Tracer,
    _State,
    _bounce,
    _compact,
    default_tracer,
)
from complex_materials_renderer_tpu.scene import load_scene  # noqa: E402

BLOCK = 1024


def record_bounces(obj_path, res, samples=1, max_bounces=48):
    opt = RenderOptions()
    opt.obj_path = obj_path
    opt.width, opt.height = res
    scene = load_scene(obj_path, opt)
    opt = scene.options
    arrays = make_scene_arrays(
        scene.triangles, scene.mat_ids, scene.media, opt.scale, opt.background
    )
    bvh = device_bvh(build_bvh(scene.triangles), scene.triangles, 4)
    camera = make_camera(opt.camera_pos, opt.camera_look_at, opt.camera_fov)
    lights = Lights(
        position=jnp.asarray(opt.light_pos, jnp.float32),
        intensity=jnp.asarray(opt.light_color, jnp.float32)
        * jnp.float32(opt.light_intensity),
    )

    def bounce_with_records(state):
        recs = {}
        base = default_tracer(arrays, bvh, lights, opt.nee_max_media)

        def closest(o, d, a):
            sh = base.closest(o, d, a)
            recs["full"] = (o, d, a, sh.t, sh.hit)
            return sh

        def distance(pos, d, trans, rngs, med):
            _ns, rand_d = rng_ops.next_float_masked(rngs, trans)
            cand = free_flight_candidate(rand_d, med.sigma_s, med.sigma_a)
            bound = jnp.minimum(cand * 1.00001 + 10.0 * T_MIN, T_MAX)
            recs["dist"] = (pos, d, trans, bound)
            return base.distance(pos, d, trans, rngs, med)

        def direct(pos, act):
            recs["nee"] = (pos, act)
            return base.direct(pos, act)

        ns = _bounce(
            state, arrays, bvh, lights, opt.max_depth, opt.rr_depth,
            opt.nee_max_media, tracer=Tracer(closest, distance, direct),
        )
        return _compact(ns, arrays), recs

    step = jax.jit(bounce_with_records)

    w, h = res
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1).astype(jnp.int32)
    linear = pix[:, 1] * w + pix[:, 0]
    r = pix.shape[0]

    records = []
    for s in range(samples):
        rng = rng_ops.seed_counter(linear, jnp.uint32(s))
        rng, j1 = rng_ops.next_float(rng)
        rng, j2 = rng_ops.next_float(rng)
        org, d = generate_rays(camera, pix, jnp.stack([j1, j2], -1), (w, h))
        state = _State(
            org=org, dir=d,
            thr=jnp.ones((r, 3), jnp.float32),
            rad=jnp.zeros((r, 3), jnp.float32),
            rng=rng, depth=jnp.zeros((r,), jnp.int32),
            alive=jnp.ones((r,), bool),
            lane=jnp.arange(r, dtype=jnp.int32),
        )
        for it in range(max_bounces):
            state, recs = step(state)
            records.append({k: [np.asarray(x) for x in v] for k, v in recs.items()})
            if not bool(np.asarray(state.alive).any()):
                break
    return scene, records


def seg_mask(o, d, bound, lo, hi, act):
    """(R, C) bool: per-lane segment [T_MIN, bound] vs every cluster AABB."""
    inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
    s0 = (lo[None, :, :] - o[:, None, :]) * inv[:, None, :]
    s1 = (hi[None, :, :] - o[:, None, :]) * inv[:, None, :]
    tn = np.maximum(np.minimum(s0, s1).max(axis=2), T_MIN)
    tf = np.minimum(np.maximum(s0, s1).min(axis=2), bound[:, None])
    return (tn <= tf) & act[:, None]


def pair_visits(mask):
    """Visits for the pair sweep: sort pairs by cluster, chunk into
    1024-pair blocks, count distinct clusters per block."""
    lanes, clusters = np.nonzero(mask)
    if len(clusters) == 0:
        return 0, 0
    order = np.argsort(clusters, kind="stable")
    cs = clusters[order]
    visits = 0
    for b0 in range(0, len(cs), BLOCK):
        visits += len(np.unique(cs[b0 : b0 + BLOCK]))
    return visits, len(cs)


def union_visits(mask):
    """Visits for the block-shared walk: per 1024-lane block, |union|."""
    visits = 0
    for b0 in range(0, mask.shape[0], BLOCK):
        visits += int(mask[b0 : b0 + BLOCK].any(axis=0).sum())
    return visits


def main():
    obj = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/reference/resources/scenes/cup.obj"
    )
    res = (128, 64)
    if len(sys.argv) > 2:
        w, h = sys.argv[2].split("x")
        res = (int(w), int(h))

    scene, records = record_bounces(obj, res)
    grid = build_clusters(scene.triangles, scene.mat_ids)
    lo = grid.bounds[:, 0:3]
    hi = grid.bounds[:, 3:6]
    wlo = scene.triangles.reshape(-1, 3).min(axis=0)
    whi = scene.triangles.reshape(-1, 3).max(axis=0)
    print(f"{obj}: {scene.triangles.shape[0]} tris, "
          f"{grid.num_clusters} clusters, {len(records)} bounces, "
          f"lanes {res[0] * res[1]}")

    tot = {}
    lens = {"full": [], "dist": [], "nee": []}
    fused = np.zeros(3, np.int64)  # union(dist), union(nee), union(dist|nee)
    for rec in records:
        m_dist = m_nee = None
        for kind in ("full", "dist", "nee"):
            if kind not in rec:
                continue
            if kind == "full":
                o, d, act, t, hit = rec[kind]
                act = act.astype(bool)
                # box-exit bound (what a pair LISTING must use: no early
                # termination) and hit-t bound (ideal ordered walk).
                inv = 1.0 / np.where(np.abs(d) < 1e-12, 1e-12, d)
                ex = np.maximum((wlo[None] - o) * inv, (whi[None] - o) * inv)
                box_exit = ex.min(axis=1) * 1.0001 + 10 * T_MIN
                bound_ideal = np.where(hit, t, box_exit)
                m_ideal = seg_mask(o, d, bound_ideal, lo, hi, act)
                m_list = seg_mask(o, d, box_exit, lo, hi, act)
                key = "full"
                u = union_visits(m_ideal)
                pv, npairs = pair_visits(m_list)
                lens[key].append(m_list.sum(axis=1)[act])
            elif kind == "dist":
                o, d, act, bound = rec[kind]
                act = act.astype(bool)
                if not act.any():
                    continue
                m = seg_mask(o, d, bound, lo, hi, act)
                m_dist = m
                key = "dist"
                u = union_visits(m)
                pv, npairs = pair_visits(m)
                lens[key].append(m.sum(axis=1)[act])
            else:
                o, act = rec[kind]
                act = act.astype(bool)
                if not act.any():
                    continue
                lp = np.asarray(scene.options.light_pos, np.float32)
                tl = lp[None] - o
                ldist = np.linalg.norm(tl, axis=1)
                d = tl / np.maximum(ldist, 1e-20)[:, None]
                m = seg_mask(o, d, ldist * 0.999, lo, hi, act)
                m_nee = m
                key = "nee"
                u = union_visits(m)
                pv, npairs = pair_visits(m)
                lens[key].append(m.sum(axis=1)[act])
            a, b, c = tot.get(key, (0, 0, 0))
            tot[key] = (a + u, b + pv, c + npairs)
        # Fusion study: dist_i and nee_i rays are both known right after
        # the bounce's physics part 1 (nee dir = light - px regardless of
        # the scatter outcome), so ONE walk could test both ray sets and
        # pay the per-triangle extract stream once. Worth it only if the
        # two footprints overlap enough: fused per-tri cost ~59cyc vs 35,
        # so the fused union must be < 0.59 * (sum of separate unions).
        if m_dist is not None and m_nee is not None:
            fused += (
                union_visits(m_dist),
                union_visits(m_nee),
                union_visits(m_dist | m_nee),
            )

    print(f"{'trace':6} {'union-visits':>12} {'pair-visits':>12} "
          f"{'pairs':>9} {'ratio':>6}  list-len p50/p90/p99/max  ovfl@L=6")
    for key in ("full", "dist", "nee"):
        if key not in tot:
            continue
        u, pv, npairs = tot[key]
        ll = np.concatenate(lens[key]) if lens[key] else np.zeros(1)
        q = np.percentile(ll, [50, 90, 99])
        ovf = float((ll > 6).mean())
        print(f"{key:6} {u:12d} {pv:12d} {npairs:9d} {u / max(pv, 1):6.1f}  "
              f"{q[0]:.0f}/{q[1]:.0f}/{q[2]:.0f}/{ll.max():.0f}  {ovf:.3f}")
    if fused[2]:
        sep = fused[0] + fused[1]
        print(f"fusion: union(dist)={fused[0]} union(nee)={fused[1]} "
              f"union(both)={fused[2]}  fused/sep={fused[2] / sep:.2f} "
              f"(win if < 0.59)")


if __name__ == "__main__":
    main()
