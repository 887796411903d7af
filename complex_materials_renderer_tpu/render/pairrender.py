"""Pair-sweep engine: the wavefront bounce with cluster-major pair
traversal (kernels/pairsweep.py).

Why a fourth engine: the fused megakernel's block-shared walk pays the
UNION of the clusters a block's 1024 lanes need — the whole remaining
performance gap to the reference's per-ray hardware BVH on dense-media
scenes (VERDICT round 3 #1; reference volpath.comp.glsl:612-627). The
binned round engine attacked it with per-round regrouping and lost to
~28-lane visit fragmentation; pair expansion schedules each (lane,
cluster) pair exactly once after ONE global cluster-major sort at full
wavefront width, where runs are long and visits collapse to
~pairs/1024 (see kernels/pairsweep.py).

Physics runs in XLA (render/integrator.py — the parity reference, so
RNG streams match by construction); all three traces go through
trace_pairs. The NEE K-list is marched here in XLA exactly like the
megakernel's in-kernel march (binnedrender._march_klist — shared).

The driver is megarender's: render_beauty_mega(trace_engine="pair")
swaps the per-pass kernel for make_pair_kern's bounce loop and keeps
the banking/sample-packing/chunk contract unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.cluster_test import nee_list_len
from ..kernels.megakernel import MegaState
from ..kernels.pairsweep import trace_pairs
from ..kernels.pallas_trace import (
    DeviceClusterGrid,
    ShadedHit,
    trace_shaded_clusters,
)
from ..ops import rng as rng_ops
from ..ops.medium import LN_CLAMP, free_flight_candidate
from .binnedrender import _march_klist
from .hitinfo import SceneArrays
from .integrator import T_MAX, T_MIN, Lights, Tracer, _State, _bounce


def make_pair_tracer(
    grid: DeviceClusterGrid,
    scene: SceneArrays,
    lights: Lights,
    media9,
    nee_max_media: int,
    list_len: int = 12,
    chunk_blocks: int = 8,
    closest_mode: str = "shared",
    direct_mode: str = "scatter",
) -> Tracer:
    """HYBRID trace set (the measured optimum): the main closest-hit
    trace keeps the BLOCK-SHARED cluster walk — camera/bounce rays ride
    the engine's coherence sort, so block unions sit near the per-lane
    ideal and the walk has zero scheduling glue — while the distance and
    NEE traces go through the pair sweep, where the dilution actually
    lives: interior free-flight segments and shadow lines list 1-3
    clusters per lane against 30-50-cluster block unions (a 14-20x
    arithmetic dilution at full width, tools/study_pairs.py). The
    pair-everything variant (closest_mode='pair') measured 19 ms per
    full-payload trace at 65k lanes — the expansion glue scales with
    lanes x list_len and loses exactly where block sharing wins."""
    wlo, whi = scene.world_lo, scene.world_hi
    K = nee_list_len(nee_max_media)

    def closest(org, direction, alive):
        bound = jnp.where(alive, T_MAX, 0.0)
        if closest_mode == "pair":
            (t, slot, u, v, nx, ny, nz, mat, px, py, pz) = trace_pairs(
                grid, media9, org, direction, bound, "full",
                world_lo=wlo, world_hi=whi,
                list_len=list_len, chunk_blocks=chunk_blocks,
            )
            hit = slot >= 0.0
            n = jnp.stack([nx, ny, nz], axis=-1)
            n = n / jnp.maximum(
                jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20
            )
            return ShadedHit(
                t=jnp.where(hit, t, T_MAX),
                hit=hit,
                u=u,
                v=v,
                normal=n,
                mat_id=jnp.where(hit, mat, -1.0).astype(jnp.int32),
                position=jnp.stack([px, py, pz], axis=-1),
            )
        # Scene-box exit clamp (the round-3 mega fix): a miss lane must
        # not carry t_best = 1e4 and force every cluster along its ray.
        tiny = jnp.float32(1e-12)

        def axis_exit(lo_v, hi_v, O, D):
            inv = 1.0 / jnp.where(
                jnp.abs(D) < tiny, jnp.where(D < 0, -tiny, tiny), D
            )
            return jnp.maximum((lo_v - O) * inv, (hi_v - O) * inv)

        tf = jnp.minimum(
            jnp.minimum(
                axis_exit(wlo[0], whi[0], org[:, 0], direction[:, 0]),
                axis_exit(wlo[1], whi[1], org[:, 1], direction[:, 1]),
            ),
            axis_exit(wlo[2], whi[2], org[:, 2], direction[:, 2]),
        )
        clamp = jnp.minimum(
            jnp.float32(T_MAX),
            jnp.maximum(tf, 0.0) * 1.0001 + 10.0 * jnp.float32(T_MIN),
        )
        return trace_shaded_clusters(
            org, direction, grid, T_MIN, jnp.where(alive, clamp, 0.0)
        )

    def distance(position, dir_after, transmitted, rngs, med):
        def run(_):
            # PEEK the free-flight draw (ops/rng.py streams are
            # deterministic; sample_distance consumes the same value
            # later) to bound the walk by the exponential candidate:
            # success only compares sampled < dist, so any boundary
            # beyond the candidate is equivalent to a miss.
            _ns, rand_d = rng_ops.next_float_masked(rngs, transmitted)
            cand = free_flight_candidate(rand_d, med.sigma_s, med.sigma_a)
            bound = jnp.minimum(cand * 1.00001 + 10.0 * T_MIN, T_MAX)
            if direct_mode == "analytic":
                # The analytic in-scatter integral needs the TRUE
                # boundary up to the transmittance-clamp depth
                # t* = ln(1e4)/density: raise the bound to max(cand, t*)
                # (invisible otherwise — a farther boundary changes only
                # seg_len where the lane scatters, which only the
                # analytic term reads). See kernels/megakernel.py.
                ext = med.sigma_s + med.sigma_a
                density = jnp.min(ext, axis=-1)
                t_star = jnp.where(
                    density > 0.0,
                    LN_CLAMP / jnp.maximum(density, 1e-30) * 1.00001
                    + 10.0 * T_MIN,
                    0.0,
                )
                bound = jnp.minimum(jnp.maximum(bound, t_star), T_MAX)
            bound = jnp.where(transmitted, bound, 0.0)
            dt, dslot = trace_pairs(
                grid, media9, position, dir_after, bound, "dist",
                world_lo=wlo, world_hi=whi,
                # Candidate-bounded interior segments list 1-3 clusters;
                # glue scales with list_len and gens measured free.
                list_len=4,
                chunk_blocks=chunk_blocks,
            )
            return jnp.where(dslot >= 0.0, dt, T_MAX)

        return jax.lax.cond(
            jnp.any(transmitted),
            run,
            lambda _: jnp.full(position.shape[:1], T_MAX, jnp.float32),
            None,
        )

    def direct(position, active):
        to_light = lights.position[None, :] - position
        ldist = jnp.linalg.norm(to_light, axis=-1)
        inv = 1.0 / jnp.maximum(ldist, 1e-20)
        light_value = lights.intensity[None, :] * (inv * inv)[:, None]
        ldir = to_light * inv[:, None]
        eff = jnp.where(active, ldist, 0.0)

        def run(_):
            out = trace_pairs(
                grid, media9, position, ldir, eff, "nee",
                nee_max_media=nee_max_media,
                # L=6 measured 5.4 ms vs 11.2 at L=12 at 65k lanes; the
                # overflow-generation cost measured ~zero (the K-list
                # bound resolves most lanes in one generation).
                list_len=4,
                chunk_blocks=chunk_blocks,
            )
            ts = out[:K]
            ms = out[K : 2 * K]
            t_opq = out[2 * K]
            return _march_klist(
                ts, ms, t_opq, ldist, eff, active, scene.media, scene.scale
            )

        tr = jax.lax.cond(
            jnp.any(active),
            run,
            lambda _: jnp.ones((position.shape[0], 3), jnp.float32),
            None,
        )
        return light_value * tr

    return Tracer(closest=closest, distance=distance, direct=direct)


def make_pair_kern(
    grid: DeviceClusterGrid,
    scene: SceneArrays,
    lights: Lights,
    media9,
    max_depth: int,
    rr_depth: int,
    nee_max_media: int,
    tir: str,
    list_len: int = 12,
    chunk_blocks: int = 8,
    direct: str = "scatter",
    ld: bool = False,
):
    """A drop-in for megarender's per-pass kernel: advance every live
    lane up to ``max_iters`` bounces (``live_blocks`` is accepted for
    interface parity and unused — the pair sweep's work scales with
    listed pairs, and dead lanes list nothing)."""
    tracer = make_pair_tracer(
        grid, scene, lights, media9, nee_max_media, list_len, chunk_blocks,
        direct_mode=direct,
    )

    def kern(state: MegaState, max_iters: int = 1, live_blocks=None,
             dim0=0):
        del live_blocks
        n = state.org.shape[0]
        if ld:
            # ld rng state rows: [shuffled sample, pixel hash, dim]
            # (ops/rng.py); dim re-enters as the driver's scalar base.
            rng = jnp.stack(
                [
                    state.rng,
                    state.aux,
                    jnp.broadcast_to(
                        jnp.asarray(dim0, jnp.int32).astype(jnp.uint32), (n,)
                    ),
                ],
                axis=-1,
            )
        else:
            rng = state.rng
        st = _State(
            org=state.org, dir=state.dir, thr=state.thr, rad=state.rad,
            rng=rng, depth=state.depth, alive=state.alive,
            lane=jnp.arange(n, dtype=jnp.int32),
        )

        def bounce_at(s):
            return _bounce(
                s, scene, None, lights, max_depth, rr_depth,
                nee_max_media, tir, tracer=tracer, direct=direct,
            )

        # TWO-WIDTH bounce: the pair machinery's glue (flat key sorts,
        # pair gathers, sort-backs) is sized by lanes x list_len
        # statically, so the deep-path tail — a few hundred survivors —
        # would pay full-wavefront glue every iteration. The megarender
        # driver compacts live lanes first before every kern call, so
        # when the live count fits n/8 a static slice is exact: bounce
        # the narrow head (1/8 the glue), splice it back over the
        # unchanged dead tail. Same trick as the wavefront engine's
        # two-phase loop (integrator.render_beauty).
        widths = [w for w in (n // 64, n // 8) if w >= 1024]

        def head_bounce(w):
            def run(s):
                head = _State(*(x[:w] for x in s))
                head = bounce_at(head)
                return _State(
                    *(
                        jnp.concatenate([h, x[w:]])
                        for h, x in zip(head, s)
                    )
                )
            return run

        def cond(c):
            s, it = c
            return (it < max_iters) & jnp.any(s.alive)

        def body(c):
            s, it = c
            # Exact safety test per tier (not a live-count heuristic):
            # a head slice is sound iff no lane beyond it is alive —
            # true right after a driver compaction, and detected
            # directly so un-repartitioned loops (static/hybrid
            # schedules) stay wide until the tail really is confined.
            run = bounce_at
            for w in reversed(widths):
                run = (lambda run, w: lambda s: jax.lax.cond(
                    ~jnp.any(s.alive[w:]), head_bounce(w), run, s
                ))(run, w)
            s = run(s)
            return s, it + 1

        st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
        return MegaState(
            org=st.org, dir=st.dir, thr=st.thr, rad=st.rad,
            rng=st.rng[:, 0] if ld else st.rng,
            depth=st.depth, alive=st.alive,
            aux=state.aux,
        )

    return kern
