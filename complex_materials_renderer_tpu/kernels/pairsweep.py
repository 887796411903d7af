"""Pair-expanded cluster-major traversal — per-(lane, cluster) work
scheduling at full wavefront width.

WHY (the round-4 structural-performance attack): the fused megakernel's
block-shared walk visits the UNION of the clusters any of a block's 1024
lanes needs — a 5-44x arithmetic dilution on incoherent wavefronts
(NOTES round 3b) that the reference never pays because its hardware BVH
is per-ray (volpath.comp.glsl:612-627, main.cpp:176-203). The binned
round engine (kernels/binned_trace.py) tried to close it with per-round
head regrouping and lost to fragmentation: serving lists in rounds
leaves ~28 useful lanes per 1024-lane visit.

Pair expansion removes rounds entirely:

1. LIST (reused binned listing kernel): each lane walks the cluster
   AABBs once and keeps its L nearest-entry candidate clusters.
2. EXPAND + SORT (XLA): one (lane, cluster) PAIR per list entry, packed
   into one int32 key [cluster id << 16 | lane]; ONE global sort groups
   the whole wavefront's pairs cluster-major (~0.5 ms at 2^19 keys —
   tools/study_sweepglue.py). At wavefront scale each cluster's pairs
   form a LONG run (65536 lanes / a few hundred clusters >> 1024), so a
   1024-pair block spans only ~1-4 distinct clusters — visit count
   collapses from the per-block union to ~pairs/1024 (measured 7x fewer
   visits on cup at 64 blocks, tools/study_pairs.py scaled to width).
3. SWEEP (Pallas): blocks of 1024 pairs; a scalar serve-loop visits each
   distinct cluster id in the block (cross-lane min reduce) against all
   1024 pair-rays with the SAME statically-unrolled 128-slot tester the
   megakernel uses (kernels/cluster_test.py), so intersection semantics
   are identical by construction. Closest-hit payloads may accept hits
   from block-mates' clusters (idempotent and sound: a triangle hit
   inside [t_min, bound] implies the segment crosses that cluster's
   AABB, so the lane listed it too); the non-idempotent NEE K-list
   insert is masked to each pair's own cluster (exactly-once).
4. REDUCE (XLA): results ride a sort back to (lane, slot) order (the
   sort carries the original flat index) and fold per lane with a
   min/select chain — no scatters (TPU scatter-min measured 2.2 ms vs
   0.4 ms for the sort+fold at the same shapes).

Overflowing lanes (more than L candidate clusters) resume exactly like
the binned engine: the listing's strict t_lo relisting reruns LIST+SWEEP
for unresolved lanes only (generation loop), so L is a performance knob,
never a correctness cap.

Payload contract ('full'/'dist'/'nee'/'occl') matches megakernel.traverse
and trace_binned: t == per-lane bound on miss, slot/mat == -1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binned_trace import (
    BLOCK,
    EMPTY,
    ID_BITS,
    ID_MASK,
    _entry_of,
    _make_listing_kernel,
)
from .cluster_test import (
    make_cluster_tester,
    nee_list_len,
    nee_unpack_mat,
    nee_unpack_t,
    payload_state0,
)
from .pallas_trace import DeviceClusterGrid

_INF = np.float32(3e38)
_T_MIN = 1e-4
_T_MAX = 1e4
LANE_BITS = 16  # flat pair key = [cluster id << 16 | lane]; caps a trace
MAX_LANES = 1 << LANE_BITS  # at 65536 lanes (= the render pass width)
BIGC = np.int32(1 << 20)  # served / padding cluster sentinel


def _merged_state0(payload: str, eff, K_NEE: int):
    """Per-LANE accumulated state across generations. 'full' reduces as
    (t, slot) — the shading payload is derived once per lane at the end
    (12 gathers at N beat carrying 11 tiles per PAIR through the sweep
    and the sort-back)."""
    if payload in ("full", "dist"):
        return payload_state0("dist", eff, K_NEE)
    return payload_state0(payload, eff, K_NEE)


def _merged_bound(payload: str, state, K_NEE: int):
    """Listing bound from the merged per-lane state: t_best for closest
    payloads, min(K-th boundary, nearest opaque) for the NEE sweep."""
    if payload == "nee":
        kth = nee_unpack_t(state[K_NEE - 1], _INF)
        return jnp.minimum(kth, state[K_NEE])
    return state[0]


def _pair_init(payload: str, state, K_NEE: int):
    """Per-lane value seeding each PAIR's sweep state: the current best t
    (closest payloads) or the current nearest-opaque t (NEE) — pairs then
    only report results that can still matter."""
    if payload == "nee":
        return state[K_NEE]
    return state[0]


def _make_sweep_kernel(payload: str, subs: int, run: int, K_NEE: int,
                       M: int, t_min: float, cb: int):
    """Sweep kernel over 1024-pair blocks, ``cb`` blocks per grid step.

    Inputs per step (VMEM tiles, auto-pipelined by the grid BlockSpecs):
    gathered pair rays (ox..dz), per-pair state seed (bnd), per-pair
    cluster id (cid; BIGC for padding). A scalar serve-loop visits the
    block's distinct cluster ids smallest-first; all-padding blocks cost
    one reduce. Outputs: the per-pair payload state tiles."""
    spayload = "dist" if payload == "full" else payload
    ns = {"dist": 2, "occl": 1}.get(spayload, K_NEE + 1)
    t_min = np.float32(t_min)

    def kernel(media_ref, runs_ref,
               ox, oy, oz, dx, dy, dz, bnd, cid, *outs):
        med_ids = [media_ref[mi, 0] for mi in range(M)]
        tc = make_cluster_tester(
            runs_ref, subs, run, spayload, K_NEE, med_ids, t_min,
            bitcast=pltpu.bitcast,
        )

        def block_body(b, _):
            sl = pl.ds(b * 8, 8)
            CID = cid[sl, :]
            rays = (ox[sl, :], oy[sl, :], oz[sl, :],
                    dx[sl, :], dy[sl, :], dz[sl, :])
            seed = bnd[sl, :]
            if spayload == "nee":
                empty = jnp.full((8, 128), EMPTY, jnp.int32)
                state0 = tuple([empty] * K_NEE) + (seed,)
            elif spayload == "occl":
                state0 = (seed,)
            else:
                state0 = (seed, jnp.full((8, 128), -1.0, jnp.float32))

            def cond(carry):
                cidv, _ = carry
                return jnp.min(cidv) < BIGC

            def body(carry):
                cidv, state = carry
                c = jnp.min(cidv)
                mine = cidv == c
                state = tc(
                    c, rays, state,
                    mask=(mine if spayload == "nee" else None),
                )
                cidv = jnp.where(mine, BIGC, cidv)
                return cidv, state

            _, state = jax.lax.while_loop(cond, body, (CID, state0))
            for i in range(ns):
                outs[i][sl, :] = state[i]
            return 0

        jax.lax.fori_loop(0, cb, block_body, 0)

    return kernel, ns, spayload


@partial(
    jax.jit,
    static_argnames=(
        "payload", "nee_max_media", "list_len", "max_gens", "chunk_blocks",
    ),
)
def trace_pairs(
    grid: DeviceClusterGrid,
    media9: jnp.ndarray,
    o: jnp.ndarray,  # (R, 3)
    d: jnp.ndarray,  # (R, 3)
    bound: jnp.ndarray,  # (R,) per-lane TMAX; <= t_min means inactive
    payload: str,
    world_lo=None,
    world_hi=None,
    nee_max_media: int = 4,
    list_len: int = 12,
    max_gens: int = 64,
    chunk_blocks: int = 8,
):
    """Cluster-major pair-sweep trace; same payload contract as the
    megakernel's traverse and trace_binned (t == per-lane bound on miss,
    slot/mat == -1). ``list_len`` bounds candidates per generation (a
    perf knob: overflow relists, never truncates); ``chunk_blocks`` is
    the sweep's grid granularity (VMEM per step ~ 10 * cb * 4 KB)."""
    L = list_len
    K_NEE = nee_list_len(nee_max_media)
    C = grid.num_clusters
    S = grid.num_supers
    subs = grid.runs_per_cluster
    run = grid.run_size
    M = media9.shape[0]
    if C > (1 << ID_BITS):
        # The listing kernel is shared with trace_binned, whose packed
        # keys carry the cluster id in ID_BITS (14) bits — the looser
        # 31-LANE_BITS pair-key bound would let C in (16384, 32768]
        # silently corrupt listing keys (id bleeding into the entry-t
        # bits) and let the top pair key collide with the EMPTY
        # sentinel. Match trace_binned's guard exactly.
        raise ValueError(
            f"{C} clusters exceed the listing kernel's {ID_BITS}-bit id "
            "field (shared with the binned tracer)"
        )

    r = o.shape[0]
    blocks = -(-r // BLOCK)
    rp = blocks * BLOCK
    if rp > MAX_LANES:
        raise ValueError(
            f"pair trace pass width {rp} exceeds {MAX_LANES} lanes (the "
            "flat key's 16-bit lane field); chunk the pass"
        )

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    eff = jnp.where(bound > _T_MIN, bound, 0.0)

    if payload in ("full", "dist") and world_lo is not None:
        # Scene-box exit clamp (megakernel.traverse / trace_binned
        # parity): a miss lane must not list every cluster to t = 1e4.
        tiny = jnp.float32(1e-12)

        def axis_exit(lo_v, hi_v, O, D):
            inv = 1.0 / jnp.where(
                jnp.abs(D) < tiny, jnp.where(D < 0, -tiny, tiny), D
            )
            return jnp.maximum((lo_v - O) * inv, (hi_v - O) * inv)

        tf = jnp.minimum(
            jnp.minimum(
                axis_exit(world_lo[0], world_hi[0], ox, dx),
                axis_exit(world_lo[1], world_hi[1], oy, dy),
            ),
            axis_exit(world_lo[2], world_hi[2], oz, dz),
        )
        eff = jnp.minimum(
            eff, jnp.maximum(tf, 0.0) * 1.0001 + 10.0 * np.float32(_T_MIN)
        )

    if rp != r:
        padz = lambda x: jnp.concatenate([x, jnp.zeros((rp - r,), x.dtype)])
        ox, oy, oz, eff = padz(ox), padz(oy), padz(oz), padz(eff)
        dx = jnp.concatenate([dx, jnp.ones((rp - r,), jnp.float32)])
        dy, dz = padz(dy), padz(dz)

    state = _merged_state0(payload, eff, K_NEE)
    ns_m = len(state)
    tlo = jnp.where(eff > _T_MIN, jnp.int32(-1), EMPTY)
    lane_iota = jnp.arange(rp, dtype=jnp.int32)

    # Pair-space geometry: rp*L flat slots, padded to whole sweep steps.
    P = rp * L
    step_pairs = chunk_blocks * BLOCK
    steps = -(-P // step_pairs)
    Ppad = steps * step_pairs

    listing_kernel = _make_listing_kernel(
        C, S, blocks, _T_MIN, L, grid.super_factor
    )
    sweep_kernel, ns_p, spayload = _make_sweep_kernel(
        payload, subs, run, K_NEE, M, _T_MIN, chunk_blocks
    )

    smem = lambda shape: pl.BlockSpec(
        shape, lambda *a: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    vmem_all = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    i32s = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.int32)

    def call_listing(bnd_l, tlo_v):
        outs = pl.pallas_call(
            listing_kernel,
            in_specs=[smem((C, 8)), smem((S, 8))] + [vmem_all()] * 8,
            out_specs=[vmem_all()] * (L + 1),
            out_shape=[i32s] * (L + 1),
            interpret=grid.interpret,
        )(
            grid.bounds, grid.super_bounds,
            *(x.reshape(blocks * 8, 128)
              for x in (ox, oy, oz, dx, dy, dz)),
            bnd_l.reshape(blocks * 8, 128),
            tlo_v.reshape(blocks * 8, 128),
        )
        return tuple(x.reshape(rp) for x in outs[:L]), outs[L].reshape(rp)

    # Ray state packed (rp, 8) so the per-pair fetch is ONE row gather:
    # [ox oy oz dx dy dz seed 0] (seed column re-filled per generation).
    def sweep(keys_L, seed_lane):
        lanes = lane_iota
        pks = [
            jnp.where(
                k == EMPTY, EMPTY, ((k & ID_MASK) << LANE_BITS) | lanes
            )
            for k in keys_L
        ]
        flat = jnp.concatenate(pks)  # (P,) slot-major: f = i_L * rp + lane
        if Ppad != P:
            flat = jnp.concatenate(
                [flat, jnp.full((Ppad - P,), EMPTY, jnp.int32)]
            )
        skey, orig = jax.lax.sort(
            (flat, jnp.arange(Ppad, dtype=jnp.int32)),
            dimension=0, num_keys=1,
        )
        lane_p = skey & jnp.int32(MAX_LANES - 1)
        cid_p = jnp.where(skey == EMPTY, BIGC, skey >> LANE_BITS)

        state8 = jnp.stack(
            [ox, oy, oz, dx, dy, dz, seed_lane, jnp.zeros_like(ox)],
            axis=-1,
        )
        g = state8[lane_p]  # (Ppad, 8) row gather
        tiles = [
            g[:, i].reshape(steps * chunk_blocks * 8, 128) for i in range(7)
        ]
        cid_t = cid_p.reshape(steps * chunk_blocks * 8, 128)

        step_spec = pl.BlockSpec(
            (chunk_blocks * 8, 128), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
        out_dtypes = (
            [jnp.int32] * K_NEE + [jnp.float32]
            if spayload == "nee"
            else [jnp.float32] * ns_p
        )
        runs_spec = pl.BlockSpec(
            grid.run_rows.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        outs = pl.pallas_call(
            sweep_kernel,
            grid=(steps,),
            in_specs=[smem((M, 9)), runs_spec] + [step_spec] * 8,
            out_specs=[step_spec] * ns_p,
            out_shape=[
                jax.ShapeDtypeStruct((steps * chunk_blocks * 8, 128), dt)
                for dt in out_dtypes
            ],
            interpret=grid.interpret,
        )(media9, grid.run_rows, *tiles, cid_t)

        # Sort results back to flat (slot-major) order via the carried
        # original index, then fold per lane (reshape (L, rp)).
        back = jax.lax.sort(
            tuple([orig] + [x.reshape(Ppad) for x in outs]),
            dimension=0, num_keys=1,
        )
        return tuple(b[:P].reshape(L, rp) for b in back[1:])

    def fold(state, keys_L, results):
        valid = [k != EMPTY for k in keys_L]
        if spayload == "nee":
            keys = list(state[:K_NEE])
            topq = state[K_NEE]
            for i in range(L):
                topq = jnp.minimum(
                    topq, jnp.where(valid[i], results[K_NEE][i], _INF)
                )
                for kk in range(K_NEE):
                    cand = jnp.where(valid[i], results[kk][i], EMPTY)
                    for j in range(K_NEE):
                        s = keys[j]
                        keys[j] = jnp.minimum(cand, s)
                        cand = jnp.maximum(cand, s)
            return tuple(keys) + (topq,)
        if spayload == "occl":
            t = state[0]
            for i in range(L):
                t = jnp.minimum(t, jnp.where(valid[i], results[0][i], _INF))
            return (t,)
        t, slot = state
        for i in range(L):
            better = valid[i] & (results[0][i] < t)
            t = jnp.where(better, results[0][i], t)
            slot = jnp.where(better, results[1][i], slot)
        return (t, slot)

    def gen_cond(carry):
        _st, tlo_v, gen = carry
        return (gen < max_gens) & jnp.any(tlo_v < EMPTY)

    def gen_body(carry):
        st, tlo_v, gen = carry
        bnd_l = _merged_bound(payload, st, K_NEE)
        keys_L, tlim = call_listing(bnd_l, tlo_v)
        results = sweep(keys_L, _pair_init(payload, st, K_NEE))
        st = fold(st, keys_L, results)
        bnd2 = _merged_bound(payload, st, K_NEE)
        unresolved = (tlim < EMPTY) & (_entry_of(tlim) < bnd2)
        tlo_v = jnp.where(unresolved, tlim, EMPTY)
        return st, tlo_v, gen + 1

    state, _tlo, _g = jax.lax.while_loop(
        gen_cond, gen_body, (state, tlo, jnp.int32(0))
    )

    if payload == "full":
        return tuple(
            x[:r] for x in _derive_full(grid, state, ox, oy, oz, dx, dy, dz)
        )
    result = tuple(s[:r] for s in state)
    if payload == "nee":
        eff_r = eff[:r]
        ts = tuple(nee_unpack_t(k, eff_r) for k in result[:K_NEE])
        ms = tuple(nee_unpack_mat(k) for k in result[:K_NEE])
        result = ts + ms + (result[K_NEE],)
    return result


def _derive_full(grid: DeviceClusterGrid, state, ox, oy, oz, dx, dy, dz):
    """Per-lane shading payload from the winning (t, slot): 12 flat
    gathers of the slot's primitive data plus one Moller-Trumbore
    recompute — the arithmetic is cluster_test.tri_step's, so u/v/normal/
    position match the in-kernel 'full' payload bit-for-bit (same ops,
    same order)."""
    t, slot_f = state
    hit = slot_f >= 0.0
    slot = jnp.maximum(slot_f, 0.0).astype(jnp.int32)

    flat = lambda a: jnp.reshape(a, (-1,))
    ax = flat(grid.v0x)[slot]
    ay = flat(grid.v0y)[slot]
    az = flat(grid.v0z)[slot]
    e1x = flat(grid.e1x)[slot]
    e1y = flat(grid.e1y)[slot]
    e1z = flat(grid.e1z)[slot]
    e2x = flat(grid.e2x)[slot]
    e2y = flat(grid.e2y)[slot]
    e2z = flat(grid.e2z)[slot]
    mat = flat(grid.mat)[slot]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, jnp.float32(1e30))
    sx = ox - ax
    sy = oy - ay
    sz = oz - az
    uu = (sx * px + sy * py + sz * pz) * inv_det
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    vv = (dx * qx + dy * qy + dz * qz) * inv_det

    neg1 = jnp.full_like(t, -1.0)
    zero = jnp.zeros_like(t)
    return (
        t,
        jnp.where(hit, slot_f, neg1),
        jnp.where(hit, uu, zero),
        jnp.where(hit, vv, zero),
        jnp.where(hit, e1y * e2z - e1z * e2y, zero),
        jnp.where(hit, e1z * e2x - e1x * e2z, zero),
        jnp.where(hit, e1x * e2y - e1y * e2x, jnp.ones_like(t)),
        jnp.where(hit, mat, neg1),
        jnp.where(hit, ax + uu * e1x + vv * e2x, zero),
        jnp.where(hit, ay + uu * e1y + vv * e2y, zero),
        jnp.where(hit, az + uu * e1z + vv * e2z, zero),
    )
