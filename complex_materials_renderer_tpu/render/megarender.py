"""Beauty-pass driver for the fused megakernel (kernels/megakernel.py).

Mirrors render/integrator.py's render_beauty contract (same RNG modes,
chunk-carry state, tile offsets for sharding) but runs the bounce loop as
a short PHASE SCHEDULE of fused kernel calls instead of an XLA wavefront
loop of many trace dispatches:

- phase 1 advances every lane up to a few bounces in one kernel call;
- between phases the wavefront is compacted (live lanes packed first by a
  stable cumsum partition — no sort) and statically SHRUNK to a quarter
  of the lanes, banking the dropped dead lanes' radiance/RNG;
- the final phase runs the stragglers to termination on a few blocks.

This fixes the fused kernel's tail pathology (a 1024-lane block used to
run until its LAST lane died, so a handful of deep survivors kept every
block alive) while keeping the kernel's per-bounce fusion: one dispatch
per phase instead of ~10 trace dispatches per bounce. Lanes are permuted
into 32x32 pixel tiles at ray generation so each 1024-lane kernel block
traces a compact, direction-coherent pixel footprint.

Per-lane RNG streams are identical to the wavefront engine's (same masked
PCG draws), so both engines sample the same decision streams; images
differ only by float-associativity noise.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.megakernel import (
    BLOCK,
    MegaState,
    fresh_state,
    pack_media,
    pack_misc,
    trace_paths_mega,
)
from ..kernels.pallas_trace import DeviceClusterGrid
from ..ops import rng as rng_ops

# Widest kernel wave one in-device scan step runs (see the ``step``
# comment in render_beauty_mega). Read once at import — it shapes traces.
STEP_LANES = int(os.environ.get("CMR_STEP_LANES", 1 << 16))
from ..ops.camera import Camera, generate_rays
from .hitinfo import SceneArrays
from .integrator import Lights

TILE = 32  # pixels per tile side; 32x32 = one 1024-lane kernel block


@lru_cache(maxsize=32)
def _tile_perm(width: int, height: int):
    """Static lane order: row-major pixels regrouped into 32x32 tiles.
    Returns (perm, inv) index arrays of length width*height."""
    idx = np.arange(width * height, dtype=np.int32).reshape(height, width)
    parts = []
    for ty in range(0, height, TILE):
        for tx in range(0, width, TILE):
            parts.append(idx[ty : ty + TILE, tx : tx + TILE].reshape(-1))
    perm = np.concatenate(parts)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def _phase_schedule(rp: int, max_depth: int, schedule: str = ""):
    """(lane_width, bounce_cap) pairs. Widths follow the measured wavefront
    decay (NOTES.md: ~45% of lanes die per early bounce), and the swept
    optimum sorts/shrinks EVERY bounce while the wavefront is wide — the
    coherence restored by each sort is worth more than the sort costs
    (showcase 256^2@8: 1.37 vs 1.07 Mpaths/s for 3-bounce phases). The
    last phase runs to termination (cap = max_depth — depth grows every
    iteration, so that equals 'until dead').

    ``schedule`` = "div:cap,div:cap,..." overrides for tuning runs
    (div = lane-width divisor; callers read CMR_MEGA_SCHED for it)."""
    if schedule:
        raw = [
            (rp // int(d), int(c))
            for d, c in (p.split(":") for p in schedule.split(","))
        ]
    else:
        raw = [
            (rp, 1), (rp // 2, 1), (rp // 4, 1), (rp // 8, 1),
            (rp // 16, 2), (rp // 32, 2), (rp // 64, max_depth),
        ]
    sched = []
    for w, cap in raw:
        w = max(BLOCK, -(-w // BLOCK) * BLOCK)
        w = min(w, rp)
        if sched and w >= sched[-1][0]:
            continue
        sched.append((w, cap))
    if not sched:
        sched = [(rp, max_depth)]
    sched[-1] = (sched[-1][0], max_depth)
    return sched


def _spread3(v):
    """Interleave 10-bit ints for Morton codes (classic bit smear)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _partition_live(state: MegaState, lane: jnp.ndarray, scene,
                    sortkey: str = "dir"):
    """Compact + re-sort the wavefront: dead lanes last, live lanes
    ordered by (direction octant, Morton cell of origin) — the same
    coherence key the wavefront engine re-sorts with every bounce
    (integrator._compact). Inside the kernel a block's cluster culls
    reduce over all 1024 lanes, so traversal cost tracks the block's
    spatial FOOTPRINT, not its lane count; after 2-3 bounces the initial
    pixel-tile assignment has decayed and re-sorting at each phase
    boundary restores it."""
    extent = jnp.maximum(scene.world_hi - scene.world_lo, 1e-6)
    rel = (state.org - scene.world_lo) / extent
    q = jnp.clip(rel * 32.0, 0.0, 31.0).astype(jnp.uint32)
    cell = (
        (_spread3(q[:, 0]) << jnp.uint32(2))
        | (_spread3(q[:, 1]) << jnp.uint32(1))
        | _spread3(q[:, 2])
    )
    octant = (
        (state.dir[:, 0] > 0).astype(jnp.uint32) * jnp.uint32(4)
        + (state.dir[:, 1] > 0).astype(jnp.uint32) * jnp.uint32(2)
        + (state.dir[:, 2] > 0).astype(jnp.uint32)
    )
    if sortkey == "pos":
        # Position-major: a block's lanes share a spatial cell (mixed
        # directions). Wins when expected hit distances are short (dense
        # interiors), where the block's cluster footprint is the cost.
        key = (cell << jnp.uint32(3)) | octant
    else:
        key = (octant << jnp.uint32(15)) | cell
    key = jnp.where(state.alive, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key)
    take = lambda x: jnp.take(x, perm, axis=0)
    return MegaState(*(take(x) for x in state)), take(lane)


def _resolve_dynamic(schedule_mode: str, grid) -> str:
    """off = static per-width phase schedule (fastest steady-state on
    typical scenes — showcase 1.37 vs 0.89/0.69 Mpaths/s — but one
    Mosaic compile per width, ~7x the compile time); hybrid = dynamic
    live_blocks with 8 per-bounce sorts then a to-death tail (2
    compiles); all = sort every bounce to death (1 compile — and the
    fastest measured mode on large deep-path scenes: cup 0.117 vs
    0.095). auto picks by scene size."""
    dynamic = schedule_mode
    if dynamic == "1":
        dynamic = "all"
    if dynamic == "auto":
        dynamic = "all" if grid.num_clusters > 128 else "off"
    return dynamic


def _make_kern(
    grid, scene, lights, media9, misc, *, trace_engine, max_depth, rr_depth,
    nee_max_media, tir, direct, rng_mode, binned_list, binned_cap, debug,
):
    """Build the per-pass bounce kernel for the selected trace engine."""
    if trace_engine == "binned":
        # Per-lane-work-proportional traces with XLA physics — the
        # engine for incoherent/large-scene wavefronts where the fused
        # kernel's block-union traversal dilutes 5-44x (binnedrender).
        from .binnedrender import make_binned_kern

        return make_binned_kern(
            grid, scene, lights, media9,
            max_depth=max_depth, rr_depth=rr_depth,
            nee_max_media=nee_max_media, tir=tir,
            list_len=binned_list, cap_iters=binned_cap, direct=direct,
            ld=(rng_mode == "ld"),
        )
    if trace_engine == "pair":
        # Cluster-major pair sweep with XLA physics — one global sort
        # groups every (lane, cluster) pair cluster-major per trace, so
        # visit count tracks listed pairs instead of block unions
        # (pairrender / kernels/pairsweep.py).
        from .pairrender import make_pair_kern

        return make_pair_kern(
            grid, scene, lights, media9,
            max_depth=max_depth, rr_depth=rr_depth,
            nee_max_media=nee_max_media, tir=tir, direct=direct,
            ld=(rng_mode == "ld"),
        )
    return partial(
        trace_paths_mega,
        grid,
        media9,
        misc,
        background=scene.background,
        max_depth=max_depth,
        rr_depth=rr_depth,
        nee_max_media=nee_max_media,
        tir_kill=(tir == "kill"),
        analytic_direct=(direct == "analytic"),
        ld=(rng_mode == "ld"),
        debug=debug,
    )


def _make_advance(kern, dynamic, sched, scene, sortkey, max_depth):
    """Build the wavefront advance: run ``state`` to termination (dynamic
    or static phase schedule) and return (radiance, rng) banked by lane
    id — ``bank_rows`` real rows plus one spill row for pad lanes.

    ``dim0`` (traced int32 scalar): ld-mode Sobol dimension base.
    Alive lanes run EXACTLY max_iters bounce iterations per kernel
    call (the in-kernel while_loop only stops early when every lane
    is dead), so the base advances deterministically by
    8 * max_iters per call and threads through the traced loops as
    a carry."""

    def _advance(state, lane, bank_rows, dim0=jnp.int32(0)):
        rad_bank = jnp.zeros((bank_rows + 1, 3), jnp.float32)
        rng_bank = jnp.zeros((bank_rows + 1,), jnp.uint32)

        if dynamic != "off":
            # Dynamic-width modes: lane arrays keep their full shape and
            # the kernel is bounded to the live leading blocks by a traced
            # scalar (live_blocks), so only 1-2 kernels compile instead of
            # one per static phase width (minutes of Mosaic compile each
            # through the tunnel).
            def live_blocks_of(st):
                return (
                    jnp.sum(st.alive.astype(jnp.int32)) + (BLOCK - 1)
                ) // BLOCK

            def sorted_bounce(c):
                st, lane, d0 = c
                st, lane = _partition_live(st, lane, scene, sortkey)
                st = kern(
                    st, max_iters=1, live_blocks=live_blocks_of(st), dim0=d0
                )
                return st, lane, d0 + 8

            if dynamic == "all":
                # Sort + single bounce until every lane dies.
                state, lane, dim0 = jax.lax.while_loop(
                    lambda c: jnp.any(c[0].alive),
                    sorted_bounce,
                    (state, lane, dim0),
                )
            else:  # "hybrid"
                # Sort every bounce while the wavefront is wide (the
                # measured optimum), then run the straggler tail to
                # termination inside one kernel call.
                for _ in range(8):
                    state, lane, dim0 = jax.lax.cond(
                        jnp.any(state.alive),
                        sorted_bounce,
                        lambda c: c,
                        (state, lane, dim0),
                    )
                state, lane = _partition_live(state, lane, scene, sortkey)
                state = kern(
                    state,
                    max_iters=max_depth,
                    live_blocks=live_blocks_of(state),
                    dim0=dim0,
                )
            rad_bank = rad_bank.at[lane].set(state.rad)
            rng_bank = rng_bank.at[lane].set(state.rng)
            return rad_bank[:bank_rows], rng_bank[:bank_rows]

        for i, (w, cap) in enumerate(sched):
            if i == 0:
                state = kern(state, max_iters=cap, dim0=dim0)
                dim0 = dim0 + 8 * cap
            else:
                # Shrink to this phase's width: pack live lanes first, bank
                # the dropped tail (all dead — the guard loop below ensures
                # live <= w before we get here).
                state, lane = _partition_live(state, lane, scene, sortkey)
                drop_lane = lane[w:]
                rad_bank = rad_bank.at[drop_lane].set(state.rad[w:])
                rng_bank = rng_bank.at[drop_lane].set(state.rng[w:])
                state = MegaState(*(x[:w] for x in state))
                lane = lane[:w]
                state = kern(state, max_iters=cap, dim0=dim0)
                dim0 = dim0 + 8 * cap
            if i + 1 < len(sched):
                next_w = sched[i + 1][0]

                def spill_cond(c):
                    s, _l, _d = c
                    return jnp.sum(s.alive.astype(jnp.int32)) > next_w

                def spill_body(c):
                    s, l, d0 = c
                    return kern(s, max_iters=cap, dim0=d0), l, d0 + 8 * cap

                # Decay slower than the schedule assumes? Keep bouncing at
                # this width until the survivors fit the next one.
                state, lane, dim0 = jax.lax.while_loop(
                    spill_cond, spill_body, (state, lane, dim0)
                )

        rad_bank = rad_bank.at[lane].set(state.rad)
        rng_bank = rng_bank.at[lane].set(state.rng)
        return rad_bank[:bank_rows], rng_bank[:bank_rows]

    return _advance


@partial(
    jax.jit,
    static_argnames=(
        "resolution",
        "num_samples",
        "max_depth",
        "rr_depth",
        "nee_max_media",
        "rng_mode",
        "full_resolution",
        "return_rng",
        "tir",
        "schedule_mode",
        "schedule",
        "sortkey",
        "debug",
        "trace_engine",
        "binned_list",
        "binned_cap",
        "direct",
    ),
)
def render_beauty_mega(
    camera: Camera,
    scene: SceneArrays,
    grid: DeviceClusterGrid,
    lights: Lights,
    resolution,
    num_samples: int,
    max_depth: int = 32,
    rr_depth: int = 16,
    nee_max_media: int = 4,
    rng_mode: str = "parity",
    pixel_offset=0,
    row_offset=0,
    full_resolution=None,
    sample_offset=0,
    rng_state=None,
    return_rng=False,
    tir: str = "reflect",
    schedule_mode: str = "auto",
    schedule: str = "",
    sortkey: str = "dir",
    debug: str = "",
    trace_engine: str = "mega",
    binned_list: int = 8,
    binned_cap: int = 12,
    direct: str = "scatter",
):
    """Render an (H, W, 3) tile of the beauty pass with the megakernel.

    Same interface/semantics as integrator.render_beauty (see its
    docstring for the chunk/shard contract); ``rng_state`` is carried in
    row-major pixel order. ``schedule_mode``: auto (default; by scene
    size) | off (static phase schedule) | hybrid | all (dynamic
    live_blocks modes) — see the mode comment below.

    ``schedule`` / ``sortkey`` / ``debug`` are the tuning knobs
    (static, so they participate in the jit cache key — env vars read at
    trace time would be invisible to a cached trace). The CLI/bench layer
    reads CMR_MEGA_SCHED / CMR_MEGA_SORTKEY / CMR_MEGA_DEBUG /
    CMR_MEGA_DYN once per render and passes them here.
    """
    width, height = resolution
    full_w, full_h = full_resolution if full_resolution else (width, height)
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    pixel_xy = jnp.stack(
        [xs.reshape(-1) + pixel_offset, ys.reshape(-1) + row_offset], axis=-1
    )
    linear = pixel_xy[:, 1] * full_w + pixel_xy[:, 0]
    r = pixel_xy.shape[0]
    rp = -(-r // BLOCK) * BLOCK  # lanes padded to whole kernel blocks
    # Step wavefront width. For the stateless RNG modes the in-device
    # scan walks (pixel-group, sample-chunk) steps, so a tile WIDER than
    # one wave still runs STEP_LANES-wide kernel passes — per-bounce
    # sorts stay small (they are the O(n log n) term) and one host call
    # covers the whole tile (round-5 probe: 512^2@16 as one 262144-lane
    # wave 1.97 Mpaths/s vs 65536-lane waves 2.2). Parity mode carries a
    # sequential per-pixel stream across samples and keeps step == tile.
    step = min(rp, STEP_LANES) if rng_mode in ("counter", "ld") else rp

    perm, inv = _tile_perm(width, height)
    perm = jnp.asarray(perm)
    inv = jnp.asarray(inv)
    pixel_xy_t = jnp.take(pixel_xy, perm, axis=0)
    linear_t = jnp.take(linear, perm, axis=0)

    media9 = pack_media(scene.media, scene.scale)
    misc = pack_misc(lights, scene.world_lo, scene.world_hi)
    dynamic = _resolve_dynamic(schedule_mode, grid)
    sched = _phase_schedule(step, max_depth, schedule)
    kern = _make_kern(
        grid, scene, lights, media9, misc,
        trace_engine=trace_engine, max_depth=max_depth, rr_depth=rr_depth,
        nee_max_media=nee_max_media, tir=tir, direct=direct,
        rng_mode=rng_mode, binned_list=binned_list, binned_cap=binned_cap,
        debug=debug,
    )
    _advance = _make_advance(kern, dynamic, sched, scene, sortkey, max_depth)

    if rng_mode in ("counter", "ld"):
        # SAMPLE-PACKED LANES: the counter/ld RNG derives each (pixel,
        # sample) stream independently, so lanes need not be one sample
        # of every pixel. Packing SG sample-lanes per pixel shrinks a
        # 1024-lane kernel block's pixel footprint from a 32x32 tile to
        # BLOCK/SG pixels — primary rays in a block become near-parallel
        # and the widest (first-bounce) traversals cull much harder.
        # Each scan step covers PG pixels x SG samples = the same lane
        # count as before; total steps are unchanged.
        SG = 1
        for cand_sg in (16, 8, 4, 2):
            if num_samples % cand_sg == 0 and step % cand_sg == 0:
                SG = cand_sg
                break
        PG = step // SG  # pixels per step
        n_groups = -(-r // PG)
        k = num_samples // SG  # sample chunks per pixel group
        pad_px = n_groups * PG - r
        if pad_px:
            pix_pad = jnp.concatenate(
                [pixel_xy_t, jnp.zeros((pad_px, 2), pixel_xy_t.dtype)]
            )
            lin_pad = jnp.concatenate(
                [linear_t, jnp.zeros((pad_px,), linear_t.dtype)]
            )
            val_pad = jnp.concatenate(
                [jnp.ones((r,), bool), jnp.zeros((pad_px,), bool)]
            )
        else:
            pix_pad, lin_pad = pixel_xy_t, linear_t
            val_pad = jnp.ones((r,), bool)

        def one_step(acc, t):
            g = t // k
            c = t % k
            base = g * PG
            pixg = jax.lax.dynamic_slice(pix_pad, (base, 0), (PG, 2))
            ling = jax.lax.dynamic_slice(lin_pad, (base,), (PG,))
            valg = jax.lax.dynamic_slice(val_pad, (base,), (PG,))
            pix_lane = jnp.repeat(pixg, SG, axis=0)
            lin_lane = jnp.repeat(ling, SG, axis=0)
            val_lane = jnp.repeat(valg, SG, axis=0)
            s_lane = (
                jnp.tile(jnp.arange(SG, dtype=jnp.uint32), PG)
                + jnp.uint32(c * SG)
                + jnp.asarray(sample_offset, jnp.uint32)
            )
            if rng_mode == "ld":
                # Camera jitter = Sobol dims 0, 1; bounce draws start at
                # dim 2 (see ops/rng.py).
                st3 = rng_ops.seed_ld(lin_lane, s_lane)
                st3, j1 = rng_ops.next_float(st3)
                st3, j2 = rng_ops.next_float(st3)
                rng0, aux0 = st3[:, 0], st3[:, 1]
                d0 = jnp.int32(2)
            else:
                rng0 = rng_ops.seed_counter(lin_lane, s_lane)
                rng0, j1 = rng_ops.next_float(rng0)
                rng0, j2 = rng_ops.next_float(rng0)
                aux0 = None
                d0 = jnp.int32(0)
            org, direction = generate_rays(
                camera, pix_lane, jnp.stack([j1, j2], -1), (full_w, full_h)
            )
            state = fresh_state(org, direction, rng0, aux=aux0)
            state = state._replace(alive=state.alive & val_lane)
            lane = jnp.arange(step, dtype=jnp.int32)
            rad_step, _ = _advance(state, lane, step, dim0=d0)
            per_px = rad_step.reshape(PG, SG, 3).sum(axis=1)
            per_px = jnp.where(valg[:, None], per_px, 0.0)
            cur = jax.lax.dynamic_slice(acc, (base, 0), (PG, 3))
            return (
                jax.lax.dynamic_update_slice(acc, cur + per_px, (base, 0)),
                None,
            )

        acc0 = jnp.zeros((n_groups * PG, 3), jnp.float32)
        acc, _ = jax.lax.scan(
            one_step, acc0, jnp.arange(n_groups * k, dtype=jnp.int32)
        )
        acc = acc[:r]
        # Counter streams are re-derived per (pixel, sample); the carried
        # rng is never consumed on resume — return the next chunk's seed
        # position as a deterministic placeholder.
        final_rng = rng_ops.seed_counter(
            linear_t,
            jnp.asarray(sample_offset, jnp.uint32) + jnp.uint32(num_samples),
        )
    else:

        def one_sample(carry, _sample_idx):
            rng_state, acc = carry
            rng_state, j1 = rng_ops.next_float(rng_state)
            rng_state, j2 = rng_ops.next_float(rng_state)
            jitter = jnp.stack([j1, j2], axis=-1)
            org, direction = generate_rays(
                camera, pixel_xy_t, jitter, (full_w, full_h)
            )
            state = fresh_state(org, direction, rng_state)
            if rp != r:
                padn = rp - r
                state = MegaState(
                    org=jnp.concatenate([state.org, jnp.zeros((padn, 3))]),
                    dir=jnp.concatenate(
                        [state.dir, jnp.ones((padn, 3), jnp.float32)]
                    ),
                    thr=jnp.concatenate([state.thr, jnp.zeros((padn, 3))]),
                    rad=jnp.concatenate([state.rad, jnp.zeros((padn, 3))]),
                    rng=jnp.concatenate(
                        [state.rng, jnp.zeros((padn,), jnp.uint32)]
                    ),
                    depth=jnp.concatenate(
                        [state.depth, jnp.zeros((padn,), jnp.int32)]
                    ),
                    alive=jnp.concatenate(
                        [state.alive, jnp.zeros((padn,), bool)]
                    ),
                    aux=jnp.concatenate(
                        [state.aux, jnp.zeros((padn,), jnp.uint32)]
                    ),
                )
            # Pad lanes point at the bank's spill row r.
            lane = jnp.concatenate(
                [
                    jnp.arange(r, dtype=jnp.int32),
                    jnp.full((rp - r,), r, jnp.int32),
                ]
            )
            rad_t, rng_t = _advance(state, lane, r)
            return (rng_t, acc + rad_t), None

        seed0 = (
            jnp.take(rng_state, perm, axis=0)
            if rng_state is not None
            else rng_ops.seed_from_pixel(linear_t)
        )
        (final_rng, acc), _ = jax.lax.scan(
            one_sample,
            (seed0, jnp.zeros((r, 3), jnp.float32)),
            jnp.arange(num_samples, dtype=jnp.uint32),
        )

    img = jnp.take(acc, inv, axis=0).reshape(height, width, 3) / jnp.float32(
        num_samples
    )
    if return_rng:
        return img, jnp.take(final_rng, inv, axis=0)
    return img


@partial(
    jax.jit,
    static_argnames=(
        "full_resolution",
        "max_depth",
        "rr_depth",
        "nee_max_media",
        "rng_mode",
        "tir",
        "schedule_mode",
        "schedule",
        "sortkey",
        "debug",
        "trace_engine",
        "binned_list",
        "binned_cap",
        "direct",
        "chunk_lanes",
    ),
)
def render_samples_mega(
    camera: Camera,
    scene: SceneArrays,
    grid: DeviceClusterGrid,
    lights: Lights,
    pixel_xy,
    sample_idx,
    valid,
    full_resolution,
    max_depth: int = 32,
    rr_depth: int = 16,
    nee_max_media: int = 4,
    rng_mode: str = "counter",
    tir: str = "reflect",
    schedule_mode: str = "auto",
    schedule: str = "",
    sortkey: str = "dir",
    debug: str = "",
    trace_engine: str = "mega",
    binned_list: int = 8,
    binned_cap: int = 12,
    direct: str = "scatter",
    chunk_lanes: int = 1 << 16,
):
    """Per-LANE render: one camera sample per lane at caller-chosen
    (pixel, sample-index) pairs — the adaptive-allocation entry point
    (renderer._render_adaptive).

    ``pixel_xy`` (L, 2) int32 full-image pixel coordinates, ``sample_idx``
    (L,) uint32 per-pixel sample numbers, ``valid`` (L,) bool (invalid
    lanes trace nothing and return zero). All three are TRACED, so every
    round of an adaptive render reuses one compiled executable as long as
    L is unchanged. Returns (L, 3) per-lane radiance.

    Only the stateless RNG modes make sense here (each (pixel, sample)
    stream is derived independently — the same property the uniform
    path's sample-packed lanes rely on); parity mode raises. Lanes are
    processed in ``chunk_lanes``-wide device waves via lax.scan, same
    bound as the uniform path's passes."""
    if rng_mode not in ("counter", "ld"):
        raise ValueError(
            "render_samples_mega requires a stateless RNG mode "
            f"(counter | ld), got {rng_mode!r}"
        )
    full_w, full_h = full_resolution
    L = pixel_xy.shape[0]
    CH = min(chunk_lanes, -(-L // BLOCK) * BLOCK)
    CH = max(BLOCK, (CH // BLOCK) * BLOCK)
    n_steps = -(-L // CH)
    pad = n_steps * CH - L
    if pad:
        pixel_xy = jnp.concatenate(
            [pixel_xy, jnp.zeros((pad, 2), pixel_xy.dtype)]
        )
        sample_idx = jnp.concatenate(
            [sample_idx, jnp.zeros((pad,), sample_idx.dtype)]
        )
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    media9 = pack_media(scene.media, scene.scale)
    misc = pack_misc(lights, scene.world_lo, scene.world_hi)
    dynamic = _resolve_dynamic(schedule_mode, grid)
    sched = _phase_schedule(CH, max_depth, schedule)
    kern = _make_kern(
        grid, scene, lights, media9, misc,
        trace_engine=trace_engine, max_depth=max_depth, rr_depth=rr_depth,
        nee_max_media=nee_max_media, tir=tir, direct=direct,
        rng_mode=rng_mode, binned_list=binned_list, binned_cap=binned_cap,
        debug=debug,
    )
    advance = _make_advance(kern, dynamic, sched, scene, sortkey, max_depth)

    def one_chunk(acc, t):
        base = t * CH
        pix = jax.lax.dynamic_slice(pixel_xy, (base, 0), (CH, 2))
        s_lane = jax.lax.dynamic_slice(sample_idx, (base,), (CH,))
        val = jax.lax.dynamic_slice(valid, (base,), (CH,))
        lin = pix[:, 1] * full_w + pix[:, 0]
        if rng_mode == "ld":
            # Camera jitter = Sobol dims 0, 1; bounce draws from dim 2
            # (ops/rng.py) — identical stream to the uniform path for the
            # same (pixel, sample) pair.
            st3 = rng_ops.seed_ld(lin, s_lane.astype(jnp.uint32))
            st3, j1 = rng_ops.next_float(st3)
            st3, j2 = rng_ops.next_float(st3)
            rng0, aux0 = st3[:, 0], st3[:, 1]
            d0 = jnp.int32(2)
        else:
            rng0 = rng_ops.seed_counter(lin, s_lane.astype(jnp.uint32))
            rng0, j1 = rng_ops.next_float(rng0)
            rng0, j2 = rng_ops.next_float(rng0)
            aux0 = None
            d0 = jnp.int32(0)
        org, direction = generate_rays(
            camera, pix, jnp.stack([j1, j2], -1), (full_w, full_h)
        )
        state = fresh_state(org, direction, rng0, aux=aux0)
        state = state._replace(alive=state.alive & val)
        lane = jnp.arange(CH, dtype=jnp.int32)
        rad, _ = advance(state, lane, CH, dim0=d0)
        rad = jnp.where(val[:, None], rad, 0.0)
        return jax.lax.dynamic_update_slice(acc, rad, (base, 0)), None

    acc0 = jnp.zeros((n_steps * CH, 3), jnp.float32)
    acc, _ = jax.lax.scan(
        one_chunk, acc0, jnp.arange(n_steps, dtype=jnp.int32)
    )
    return acc[:L]
