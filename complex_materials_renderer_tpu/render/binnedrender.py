"""Binned-trace engine: the wavefront bounce with per-lane-work-
proportional traversal (kernels/binned_trace.py).

Why a third engine: the fused megakernel's block-shared walk pays the
UNION of the clusters a block's 1024 lanes need — measured 5-44x the
per-lane ideal on incoherent wavefronts (dense media interiors, large
scenes; tools/study_order.py). This engine runs the bounce physics in
XLA (render/integrator.py — the parity reference, so RNG streams match
by construction) and replaces all three traces with binned rounds that
regroup lanes ACROSS blocks by the cluster they need next.

Per bounce: one 'full' closest-hit trace, one candidate-bounded 'dist'
trace (the free-flight draw is PEEKED from the deterministic RNG stream
before its consumption — same value, same stream, tighter walk), and one
'nee' multi-hit sweep whose K-list is marched here in XLA exactly like
the megakernel's in-kernel march (megakernel.nee_march; volpath:337-426
leg logic over the sorted list, 0.9 per-boundary fudge volpath:408,
fail-dark on exhaustion).

The driver is megarender's: render_beauty_mega(trace_engine="binned")
swaps its per-pass kernel for make_binned_kern's bounce loop and keeps
the banking/sample-packing/chunk contract unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..kernels.binned_trace import trace_binned
from ..kernels.cluster_test import NEE_DUP_SPARE, nee_list_len
from ..kernels.megakernel import MegaState
from ..kernels.pallas_trace import DeviceClusterGrid, ShadedHit
from ..ops import rng as rng_ops
from ..ops.medium import LN_CLAMP, free_flight_candidate, lookup_index
from .hitinfo import SceneArrays
from .integrator import T_MAX, T_MIN, Lights, Tracer, _State, _bounce


def _march_klist(ts, ms, t_opq, ldist, eff, active, media, scale):
    """XLA transcription of the megakernel's unrolled K-list march
    (megakernel.nee_march): returns (R, 3) transmittance. Enter legs get
    the 0.999 light-distance epsilon (volpath:361), exit legs the T_MIN
    floor; duplicates within T_MIN are skipped; the separately-tracked
    nearest opaque hit occludes when it falls inside a leg's window;
    exhausted marches fail dark."""
    K = len(ts)
    R = ldist.shape[0]
    tr = jnp.ones((R, 3), jnp.float32)
    running = active
    in_med = jnp.zeros_like(active)
    ex = jnp.zeros((R, 3), jnp.float32)
    last_t = jnp.zeros((R,), jnp.float32)
    # Real-crossing budget (megakernel.nee_resolve): the NEE_DUP_SPARE
    # extra list slots absorb duplicates only.
    n_real = jnp.zeros((R,), jnp.float32)
    real_cap = jnp.float32(K - NEE_DUP_SPARE)

    for i in range(K):
        t_i = ts[i]
        m_i = ms[i]
        rem = ldist - last_t
        dup = t_i <= last_t + T_MIN
        cut = jnp.where(
            in_med,
            last_t + jnp.maximum(rem, T_MIN),
            last_t + 0.999 * rem,
        )
        window = jnp.minimum(cut, eff)
        opq = (
            running
            & (t_opq > last_t + T_MIN)
            & (t_opq < window)
            & (t_opq < t_i)
        )
        tr = jnp.where(opq[:, None], 0.0, tr)
        running = running & ~opq
        consider = running & ~dup
        real = consider & (t_i < window)
        ended = consider & ~real  # miss: march resolves, trans kept

        med_i = lookup_index(m_i.astype(jnp.int32), media, scale)

        exitl = real & in_med
        seg = jnp.minimum(t_i - last_t, rem)
        att = 0.9 * jnp.exp(-ex * seg[:, None])
        tr = jnp.where(exitl[:, None], tr * att, tr)

        enterl = real & ~in_med
        ex = jnp.where(
            enterl[:, None], med_i.sigma_s + med_i.sigma_a, ex
        )
        last_t = jnp.where(real, t_i, last_t)
        in_med = in_med ^ real
        n_real = n_real + jnp.where(real, 1.0, 0.0)
        running = running & ~ended

    # Unresolved march (list exhausted mid-march, or the real-crossing
    # budget consumed): fail dark, like the bounded per-leg march.
    dark = running | (n_real >= real_cap)
    return jnp.where(dark[:, None], 0.0, tr)


def make_binned_tracer(
    grid: DeviceClusterGrid,
    scene: SceneArrays,
    lights: Lights,
    media9,
    nee_max_media: int,
    list_len: int = 8,
    cap_iters: int = 12,
    direct_mode: str = "scatter",
) -> Tracer:
    wlo, whi = scene.world_lo, scene.world_hi
    K = nee_list_len(nee_max_media)

    def closest(org, direction, alive):
        bound = jnp.where(alive, T_MAX, 0.0)
        (t, slot, u, v, nx, ny, nz, mat, px, py, pz) = trace_binned(
            grid, media9, org, direction, bound, "full",
            world_lo=wlo, world_hi=whi,
            list_len=list_len, cap_iters=cap_iters,
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

    def distance(position, dir_after, transmitted, rngs, med):
        def run(_):
            # PEEK the free-flight draw (consumed later by
            # sample_distance — identical value, ops/rng.py streams are
            # deterministic) to bound the walk by the candidate:
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
            dt, dslot = trace_binned(
                grid, media9, position, dir_after, bound, "dist",
                world_lo=wlo, world_hi=whi,
                list_len=list_len, cap_iters=cap_iters,
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
            out = trace_binned(
                grid, media9, position, ldir, eff, "nee",
                nee_max_media=nee_max_media,
                list_len=list_len, cap_iters=cap_iters,
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


def make_binned_kern(
    grid: DeviceClusterGrid,
    scene: SceneArrays,
    lights: Lights,
    media9,
    max_depth: int,
    rr_depth: int,
    nee_max_media: int,
    tir: str,
    list_len: int = 8,
    cap_iters: int = 12,
    direct: str = "scatter",
    ld: bool = False,
):
    """A drop-in for megarender's per-pass kernel: advance every live
    lane up to ``max_iters`` bounces (``live_blocks`` is accepted for
    interface parity and unused — the binned tracer compacts internally
    by sorting lanes with work first)."""
    tracer = make_binned_tracer(
        grid, scene, lights, media9, nee_max_media, list_len, cap_iters,
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

        def cond(c):
            s, it = c
            return (it < max_iters) & jnp.any(s.alive)

        def body(c):
            s, it = c
            s = _bounce(
                s, scene, None, lights, max_depth, rr_depth,
                nee_max_media, tir, tracer=tracer, direct=direct,
            )
            return s, it + 1

        st, _ = jax.lax.while_loop(cond, body, (st, jnp.int32(0)))
        return MegaState(
            org=st.org, dir=st.dir, thr=st.thr, rad=st.rad,
            rng=st.rng[:, 0] if ld else st.rng,
            depth=st.depth, alive=st.alive,
            aux=state.aux,
        )

    return kern
