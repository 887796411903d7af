"""Binned per-lane traversal: work-proportional tracing for incoherent
wavefronts.

WHY (measured, tools/study_*.py + NOTES.md round 3): the fused
megakernel's block-shared walk visits the UNION of clusters any of a
block's 1024 lanes needs. Per-lane the ideal is 2-4 cluster visits, but
interior (deep-bounce / dense-media) wavefronts union to 11-168 visits
per block — a 5-44x arithmetic dilution that NO lane sort key can close
(sorting by predicted first clusters moved cup's interior union only
230 -> 208: first clusters are position-determined while full visit
lists are direction-dependent). The reference pays nothing here — its
hardware BVH is per-ray (volpath.comp.glsl:612-627).

This module escapes the union by CROSS-BLOCK work sharing in three
steps, all inside one jit:

1. LISTING kernel: each lane walks the cluster AABBs once (supers
   scalar-gated) and keeps its L nearest-entry candidate clusters as a
   sorted list of packed int32 keys [entry-f32-bits | cluster-id]: the
   f32 bit pattern of a positive float is order-isomorphic to its value,
   so one integer min/max chain both sorts by entry and breaks ties by
   cluster id (total order -> exact overflow resume, see below).
2. ROUND loop (XLA): lanes are re-sorted by their head key each round
   (a 65k-lane variadic ``lax.sort`` costs ~0.3 ms on-chip — measured
   in tools/profile_glue.py — vs the ~20 ms of union arithmetic it
   saves), so each 1024-lane kernel block holds lanes that NEED the
   same few clusters. The ROUND kernel then processes each block's
   distinct head clusters (typically 1-3), pops matching heads, and
   culls list entries whose AABB entry can no longer beat the lane's
   current bound.
3. OVERFLOW generations: a lane whose list overflowed (more than L
   candidate clusters) and whose bound still exceeds the L-th kept
   entry re-lists with a strict key lower-bound t_lo = its last kept
   key. Keys are unique (id tiebreak), so resume neither re-collects a
   processed cluster (would corrupt the NEE multi-hit list) nor skips a
   dropped tie.

Payload semantics ('full'/'dist'/'nee'/'occl') are IDENTICAL to the
megakernel's traverse: both build on kernels/cluster_test.py, and
closest-hit / sorted-K-insertion results are visit-order independent.
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cluster_test import (
    make_cluster_tester,
    nee_list_len,
    nee_state_size,
    nee_unpack_mat,
    nee_unpack_t,
    payload_bound,
    payload_state0,
)
from .pallas_trace import DeviceClusterGrid

BLOCK = 1024
_INF = np.float32(3e38)
EMPTY = np.int32(2147483647)  # empty list slot / resolved-lane t_lo
ID_BITS = 14  # cluster id field; megakernel caps S<=1024 => C<=16384
ID_MASK = np.int32((1 << ID_BITS) - 1)
_T_MIN = 1e-4
_T_MAX = 1e4


def _n_state(payload: str, K_NEE: int) -> int:
    return {"full": 11, "dist": 2, "occl": 1}.get(
        payload, nee_state_size(K_NEE)
    )


def _state_dtypes(payload: str, K_NEE: int):
    """Per-field dtypes of the payload state ('nee' carries packed int32
    boundary keys + one f32 t_opq; every other payload is all-f32)."""
    if payload == "nee":
        return [jnp.int32] * K_NEE + [jnp.float32]
    return [jnp.float32] * _n_state(payload, K_NEE)


def _make_listing_kernel(C, S, num_blocks, t_min, L, SUPER_FACTOR=16):
    """Per-lane candidate-cluster listing. For every lane, the L smallest
    packed keys (entry bits | cluster id) with key > per-lane t_lo,
    among clusters whose AABB intersects [t_min, bound]."""
    t_min = np.float32(t_min)

    def kernel(
        cb_ref,  # SMEM (C, 8) cluster AABBs
        sb_ref,  # SMEM (S, 8) super AABBs
        ox, oy, oz, dx, dy, dz,  # VMEM (B8,128) rays
        bound_ref,  # VMEM f32 per-lane walk bound (<= t_min: list nothing)
        tlo_ref,  # VMEM int32 strict lower key filter (EMPTY: resolved)
        *outs,  # L key outputs + tlim output (VMEM int32)
    ):
        key_outs = outs[:L]
        tlim_out = outs[L]

        def block_body(b, _):
            sl = pl.ds(b * 8, 8)
            TLO = tlo_ref[sl, :]
            # Self-gating: unresolved lanes can sit in ANY block
            # (generation-2 relists, scattered dist-trace actives), so
            # the gate is the block's own lane state, not a leading-
            # blocks bound.
            any_work = jnp.min(TLO) < EMPTY

            @pl.when(any_work)
            def _():
                OX, OY, OZ = ox[sl, :], oy[sl, :], oz[sl, :]
                DX, DY, DZ = dx[sl, :], dy[sl, :], dz[sl, :]
                BND = bound_ref[sl, :]
                tiny = jnp.float32(1e-12)
                IX = 1.0 / jnp.where(
                    jnp.abs(DX) < tiny, jnp.where(DX < 0, -tiny, tiny), DX
                )
                IY = 1.0 / jnp.where(
                    jnp.abs(DY) < tiny, jnp.where(DY < 0, -tiny, tiny), DY
                )
                IZ = 1.0 / jnp.where(
                    jnp.abs(DZ) < tiny, jnp.where(DZ < 0, -tiny, tiny), DZ
                )

                def entry_lanes(ref, idx, TMAX):
                    """Per-lane slab entry in [t_min, TMAX]; hit mask."""
                    s0 = (ref[idx, 0] - OX) * IX
                    s1 = (ref[idx, 3] - OX) * IX
                    tn = jnp.minimum(s0, s1)
                    tf = jnp.maximum(s0, s1)
                    s0 = (ref[idx, 1] - OY) * IY
                    s1 = (ref[idx, 4] - OY) * IY
                    tn = jnp.maximum(tn, jnp.minimum(s0, s1))
                    tf = jnp.minimum(tf, jnp.maximum(s0, s1))
                    s0 = (ref[idx, 2] - OZ) * IZ
                    s1 = (ref[idx, 5] - OZ) * IZ
                    tn = jnp.maximum(tn, jnp.minimum(s0, s1))
                    tf = jnp.minimum(tf, jnp.maximum(s0, s1))
                    tn = jnp.maximum(tn, t_min)
                    tf = jnp.minimum(tf, TMAX)
                    return tn, tn <= tf

                def visit_cluster(c, slots):
                    tn, hit = entry_lanes(cb_ref, c, BND)
                    ebits = pltpu.bitcast(tn, jnp.int32)
                    key = jnp.where(
                        hit,
                        (ebits & ~ID_MASK) | c,
                        EMPTY,
                    )
                    key = jnp.where(key > TLO, key, EMPTY)
                    # Sorted insertion: integer min/max chain keeps the L
                    # smallest keys (entry-ordered, id tiebreak).
                    out = []
                    for i in range(L):
                        s = slots[i]
                        out.append(jnp.minimum(key, s))
                        key = jnp.maximum(key, s)
                    return tuple(out)

                def visit_super(sp, slots):
                    lo = sp * SUPER_FACTOR
                    hi = jnp.minimum(lo + SUPER_FACTOR, C)
                    tn, hit = entry_lanes(sb_ref, sp, BND)
                    any_hit = jnp.min(jnp.where(hit, tn, _INF)) < _INF
                    return jax.lax.cond(
                        any_hit,
                        lambda s: jax.lax.fori_loop(lo, hi, visit_cluster, s),
                        lambda s: s,
                        slots,
                    )

                slots0 = tuple(
                    jnp.full((8, 128), EMPTY, jnp.int32) for _ in range(L)
                )
                slots = jax.lax.fori_loop(0, S, visit_super, slots0)
                for i in range(L):
                    key_outs[i][sl, :] = slots[i]
                tlim_out[sl, :] = slots[L - 1]

            @pl.when(jnp.logical_not(any_work))
            def _():
                for i in range(L):
                    key_outs[i][sl, :] = jnp.full((8, 128), EMPTY, jnp.int32)
                tlim_out[sl, :] = jnp.full((8, 128), EMPTY, jnp.int32)

            return 0

        jax.lax.fori_loop(0, num_blocks, block_body, 0)

    return kernel


def _make_round_kernel(
    payload, C, num_blocks, subs, run, K_NEE, M, t_min, L, cap_iters
):
    """Process up to ``cap_iters`` distinct head clusters per block:
    pick the smallest active head cluster id across the block's lanes,
    run the shared 128-triangle test for every lane, pop matching heads,
    and pop (without visiting) heads whose AABB entry can no longer beat
    the lane's current payload bound."""
    t_min = np.float32(t_min)
    ns = _n_state(payload, K_NEE)
    BIGC = np.int32(1 << 20)

    def kernel(media_ref, lb_ref, runs_ref, *refs):
        ox, oy, oz, dx, dy, dz = refs[:6]
        key_refs = refs[6 : 6 + L]
        state_refs = refs[6 + L : 6 + L + ns]
        key_outs = refs[6 + L + ns : 6 + 2 * L + ns]
        state_outs = refs[6 + 2 * L + ns : 6 + 2 * L + 2 * ns]
        iters_out = refs[6 + 2 * L + 2 * ns]

        med_ids = [media_ref[mi, 0] for mi in range(M)]
        tc = make_cluster_tester(
            runs_ref, subs, run, payload, K_NEE, med_ids, t_min,
            bitcast=pltpu.bitcast,
        )

        def block_body(b, _):
            sl = pl.ds(b * 8, 8)
            keys0 = tuple(key_refs[i][sl, :] for i in range(L))
            state0 = tuple(state_refs[i][sl, :] for i in range(ns))
            rays = (
                ox[sl, :], oy[sl, :], oz[sl, :],
                dx[sl, :], dy[sl, :], dz[sl, :],
            )

            @pl.when(b < lb_ref[0])
            def _():
                def cond(carry):
                    keys, _state, it = carry
                    return (it < cap_iters) & (jnp.min(keys[0]) < EMPTY)

                def body(carry):
                    keys, state, it = carry
                    head = keys[0]
                    has = head < EMPTY
                    hent = pltpu.bitcast(head & ~ID_MASK, jnp.float32)
                    bnd = payload_bound(
                        payload, state, K_NEE, bitcast=pltpu.bitcast
                    )
                    # Entries are entry-ASCENDING per lane, so a culled
                    # head means every remaining entry is cullable:
                    # clear the lane's whole list in one shot. (One-pop-
                    # per-iteration culling measured 7.3 live rounds per
                    # lane — stale entries kept blocks alive while other
                    # lanes' visits piled up to 5x the needed work.)
                    clear = has & (hent >= bnd)
                    keys = tuple(
                        jnp.where(clear, jnp.full_like(k, EMPTY), k)
                        for k in keys
                    )
                    head = keys[0]
                    active = head < EMPTY
                    hid = head & ID_MASK
                    c = jnp.min(jnp.where(active, hid, BIGC))
                    # ANY-SLOT matching: serve every lane whose list
                    # CONTAINS c, not just head matches. Group sizes are
                    # the binned scheme's whole economics (head-only
                    # matching measured 28 lanes per 1024-lane visit on
                    # incoherent wavefronts = 2% SIMD efficiency), and a
                    # lane holds each cluster at most once, so mid-list
                    # removal keeps the entry-ascending invariant the
                    # clear-on-cull above relies on.
                    match = [
                        (k < EMPTY) & ((k & ID_MASK) == c) for k in keys
                    ]
                    has_c = match[0]
                    for m in match[1:]:
                        has_c = has_c | m
                    # Closest-hit payloads are idempotent under re-tests;
                    # the NEE K-list insert is not, so it accepts hits
                    # only on the serving that REMOVES the lane's slot
                    # (exactly once per listed cluster; relist
                    # strictness prevents cross-generation repeats).
                    mask = has_c if payload == "nee" else None
                    state = jax.lax.cond(
                        c < BIGC,
                        lambda s: tc(jnp.minimum(c, C - 1), rays, s, mask),
                        lambda s: s,
                        state,
                    )
                    # Remove the matched slot per lane (shift-compact).
                    shift = jnp.zeros_like(has_c)
                    nk = []
                    for i in range(L):
                        shift = shift | match[i]
                        nxt = (
                            keys[i + 1]
                            if i + 1 < L
                            else jnp.full_like(head, EMPTY)
                        )
                        nk.append(jnp.where(shift, nxt, keys[i]))
                    return tuple(nk), state, it + 1

                keys_f, state_f, it_f = jax.lax.while_loop(
                    cond, body, (keys0, state0, jnp.int32(0))
                )
                for i in range(L):
                    key_outs[i][sl, :] = keys_f[i]
                for i in range(ns):
                    state_outs[i][sl, :] = state_f[i]
                iters_out[sl, :] = jnp.full((8, 128), it_f, jnp.int32)

            @pl.when(b >= lb_ref[0])
            def _():
                # Explicit pass-through for skipped blocks (aliased
                # outputs are separate VMEM windows; see megakernel).
                for i in range(L):
                    key_outs[i][sl, :] = keys0[i]
                for i in range(ns):
                    state_outs[i][sl, :] = state0[i]
                iters_out[sl, :] = jnp.zeros((8, 128), jnp.int32)

            return 0

        jax.lax.fori_loop(0, num_blocks, block_body, 0)

    return kernel


def _pack(x, blocks, fill=None):
    r = x.shape[0]
    pad = blocks * BLOCK - r
    if pad:
        tail = (
            jnp.broadcast_to(x[:1], (pad,))
            if fill is None
            else jnp.full((pad,), fill, x.dtype)
        )
        x = jnp.concatenate([x, tail])
    return x.reshape(blocks * 8, 128)


def _entry_of(key):
    """Unpack the (conservatively rounded-down) AABB entry of a key."""
    return jax.lax.bitcast_convert_type(
        key & jnp.int32(~ID_MASK), jnp.float32
    )


@partial(
    jax.jit,
    static_argnames=(
        "payload", "nee_max_media", "list_len", "cap_iters", "max_gens",
        "debug_stats",
    ),
)
def trace_binned(
    grid: DeviceClusterGrid,
    media9: jnp.ndarray,
    o: jnp.ndarray,  # (R, 3)
    d: jnp.ndarray,  # (R, 3)
    bound: jnp.ndarray,  # (R,) per-lane TMAX; <= t_min means inactive
    payload: str,
    world_lo=None,
    world_hi=None,
    nee_max_media: int = 4,
    list_len: int = 8,
    cap_iters: int = 12,
    max_gens: int = 64,
    debug_stats: bool = False,
):
    """Per-lane-work-proportional trace; same payload contract as the
    megakernel's traverse (t == per-lane bound on miss, slot/mat == -1).

    ``world_lo/hi`` clamp 'full'/'dist' walks to the scene-box exit
    (identical to megakernel.traverse); 'nee'/'occl' bounds stay the
    caller's light distance. ``max_gens`` bounds the overflow-resume
    loop (each generation is a full listing; it terminates in practice
    after 1-2 — the bound only guards against degenerate scenes).
    """
    L = list_len
    K_NEE = nee_list_len(nee_max_media)
    C = grid.num_clusters
    S = grid.num_supers
    subs = grid.runs_per_cluster
    run = grid.run_size
    M = media9.shape[0]
    ns = _n_state(payload, K_NEE)
    if C > (1 << ID_BITS):
        raise ValueError(
            f"{C} clusters exceed the binned tracer's {ID_BITS}-bit id field"
        )

    r = o.shape[0]
    blocks = -(-r // BLOCK)
    rp = blocks * BLOCK

    ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    eff = jnp.where(bound > _T_MIN, bound, 0.0)

    if payload in ("full", "dist"):
        # Scene-box exit clamp (megakernel.traverse parity).
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
        padz = lambda x: jnp.concatenate(
            [x, jnp.zeros((rp - r,), x.dtype)]
        )
        ox, oy, oz, eff = padz(ox), padz(oy), padz(oz), padz(eff)
        dx, dy, dz = (
            jnp.concatenate([dx, jnp.ones((rp - r,), jnp.float32)]),
            padz(dy), padz(dz),
        )
    # Pad lanes carry eff == 0, so state0 marks them missed and listing
    # yields no keys for them.
    state = payload_state0(payload, eff, K_NEE)

    lane = jnp.arange(rp, dtype=jnp.int32)
    # Inactive lanes start resolved (EMPTY): listing blocks whose lanes
    # are all resolved self-skip.
    tlo = jnp.where(eff > _T_MIN, jnp.int32(-1), EMPTY)

    smem = lambda shape: pl.BlockSpec(
        shape, lambda: (0,) * len(shape), memory_space=pltpu.SMEM
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    f32s = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32)
    i32s = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.int32)

    listing_kernel = _make_listing_kernel(C, S, blocks, _T_MIN, L,
                                          grid.super_factor)
    round_kernel = _make_round_kernel(
        payload, C, blocks, subs, run, K_NEE, M, _T_MIN, L, cap_iters
    )

    def call_listing(o6, bnd, tlo_v):
        outs = pl.pallas_call(
            listing_kernel,
            in_specs=[smem((C, 8)), smem((S, 8))] + [vmem()] * 8,
            out_specs=[vmem()] * (L + 1),
            out_shape=[i32s] * (L + 1),
            interpret=grid.interpret,
        )(
            grid.bounds, grid.super_bounds,
            *(x.reshape(blocks * 8, 128) for x in o6),
            bnd.reshape(blocks * 8, 128),
            tlo_v.reshape(blocks * 8, 128),
        )
        return tuple(x.reshape(rp) for x in outs[:L]), outs[L].reshape(rp)

    state_shapes = [
        jax.ShapeDtypeStruct((blocks * 8, 128), dt)
        for dt in _state_dtypes(payload, K_NEE)
    ]

    def call_round(o6, keys, st, lb):
        outs = pl.pallas_call(
            round_kernel,
            in_specs=[smem((M, 9)), smem((1,)), vmem()]
            + [vmem()] * (6 + L + ns),
            out_specs=[vmem()] * (L + ns + 1),
            out_shape=[i32s] * L + state_shapes + [i32s],
            input_output_aliases={
                3 + 6 + i: i for i in range(L + ns)
            },
            interpret=grid.interpret,
        )(
            media9, lb, grid.run_rows,
            *(x.reshape(blocks * 8, 128) for x in o6),
            *(k.reshape(blocks * 8, 128) for k in keys),
            *(s.reshape(blocks * 8, 128) for s in st),
        )
        visits = jnp.sum(outs[L + ns][::8, 0])
        return (
            tuple(x.reshape(rp) for x in outs[:L]),
            tuple(x.reshape(rp) for x in outs[L : L + ns]),
            visits,
        )

    def gen_cond(carry):
        _o6, _st, tlo_v, _lane, _stats, gen = carry
        return (gen < max_gens) & jnp.any(tlo_v < EMPTY)

    def gen_body(carry):
        o6, st, tlo_v, lane_v, stats, gen = carry
        bnd = payload_bound(payload, st, K_NEE)
        keys, tlim = call_listing(o6, bnd, tlo_v)
        stats = stats + jnp.array([1, 0, 0, 0], jnp.int32)

        def round_cond(carry2):
            _a, keys2, _c, _d, _e = carry2
            return jnp.any(keys2[0] < EMPTY)

        def round_body(carry2):
            o6b, keys2, st2, tlo2, extra = carry2
            tlim2, lane2, stats2 = extra
            # Regroup lanes by head CLUSTER ID — NOT by the packed key:
            # its high bits are the AABB entry distance, and an entry-
            # major sort scatters same-cluster lanes across blocks (the
            # measured failure mode: ~1024 distinct heads per block, one
            # pop per 4.7k-cycle visit). Lanes with empty lists sort
            # last via the sentinel.
            head = keys2[0]
            gkey = jnp.where(head < EMPTY, head & ID_MASK, jnp.int32(1 << 20))
            ops = (
                [gkey] + list(keys2) + list(o6b) + list(st2)
                + [tlo2, tlim2, lane2]
            )
            sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
            g0 = sorted_ops[0]
            keys2 = tuple(sorted_ops[1 : 1 + L])
            o6b = tuple(sorted_ops[1 + L : 1 + L + 6])
            st2 = tuple(sorted_ops[1 + L + 6 : 1 + L + 6 + ns])
            tlo2, tlim2, lane2 = sorted_ops[1 + L + 6 + ns :]
            live2 = jnp.sum((g0 < (1 << 20)).astype(jnp.int32))
            lb2 = ((live2 + BLOCK - 1) // BLOCK).reshape(1)
            keys2, st2, visits = call_round(o6b, keys2, st2, lb2)
            stats2 = stats2 + jnp.array([0, 1, 0, 0], jnp.int32) \
                + jnp.array([0, 0, 1, 0], jnp.int32) * visits \
                + jnp.array([0, 0, 0, 1], jnp.int32) * live2
            return o6b, keys2, st2, tlo2, (tlim2, lane2, stats2)

        o6, _keys, st, tlo_v, (tlim, lane_v, stats) = jax.lax.while_loop(
            round_cond, round_body, (o6, keys, st, tlo_v, (tlim, lane_v, stats))
        )

        bnd2 = payload_bound(payload, st, K_NEE)
        unresolved = (tlim < EMPTY) & (_entry_of(tlim) < bnd2)
        tlo_v = jnp.where(unresolved, tlim, EMPTY)
        return o6, st, tlo_v, lane_v, stats, gen + 1

    o6 = (ox, oy, oz, dx, dy, dz)
    stats0 = jnp.zeros((4,), jnp.int32)  # [gens, rounds, visits, live-lane-rounds]
    o6, state, _tlo, lane, stats, _g = jax.lax.while_loop(
        gen_cond, gen_body, (o6, state, tlo, lane, stats0, jnp.int32(0))
    )

    # Restore the caller's lane order with ONE variadic sort by the lane
    # index (per-field jnp.take gathers cost ~0.4 ms/field at 65k lanes;
    # the payload-carrying sort is ~0.3 ms total — tools/profile_glue.py).
    restored = jax.lax.sort([lane] + list(state), dimension=0, num_keys=1)
    result = tuple(s[:r] for s in restored[1:])
    if payload == "nee":
        # Unpack the packed boundary keys back to the traverse contract
        # (K ascending ts + K mats + t_opq); empty slots read as the
        # per-lane eff, the miss sentinel.
        eff_r = eff[:r]
        ts = tuple(nee_unpack_t(k, eff_r) for k in result[:K_NEE])
        ms = tuple(nee_unpack_mat(k) for k in result[:K_NEE])
        result = ts + ms + (result[K_NEE],)
    if debug_stats:
        return result, stats
    return result
