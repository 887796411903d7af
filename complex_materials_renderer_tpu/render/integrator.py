"""Wavefront volumetric path-tracing integrator.

The TPU-native restructuring of the reference's GLSL compute megakernel
(reference volpath.comp.glsl:564-805). Where the reference runs one GPU
thread per pixel through a divergent ``while(depth < 32)`` loop, this
integrator advances a whole batch of (pixel, sample) lanes in lock-step
under a single ``lax.while_loop``; per-lane branch membership is tracked
with boolean masks and every physics op runs masked. RNG draws are gated
by the same masks so each lane consumes its PCG stream in exactly the
order the reference's thread would (see ops/rng.py).

Control-flow map (reference line numbers):
- closest-hit trace                                volpath:612-629
- medium boundary event: Fresnel reflect/refract    volpath:633-670
- distance-to-boundary trace                        volpath:675-688
- free-flight sampling                              volpath:691
- scatter branch: NEE + HG                          volpath:693-710
- pass-through branch: transmittance + boundary #2  volpath:713-756
  (the second boundary event reuses the *stale* entry normal — a
  reference quirk preserved for parity)
- diffuse branch                                    volpath:758-779
- russian roulette after rr_depth                   volpath:787-797

Documented parity quirks preserved: NEE phase weight evaluated at
outDir=0 (volpath:698-699), scatter origin advanced along the *new*
direction (volpath:708-709), diffuse local-frame direction used as world
(volpath:766-777), per-boundary 0.9 shadow fudge (volpath:408).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernels.traverse import DeviceBVH, trace_shaded
from ..ops import rng as rng_ops
from ..ops.camera import Camera, generate_rays
from ..ops.diffuse import REFLECTANCE, diffuse_eval, diffuse_sample
from ..ops.fresnel import fresnel_r, reflect, refract
from ..ops.medium import (
    analytic_direct_scale,
    eval_transmittance,
    lookup,
    sample_distance,
)
from ..ops.phase import g_mean, hg_eval_zero, hg_sample
from .hitinfo import SceneArrays, shade_color

T_MIN = 1e-4  # volpath:617
T_MAX = 1e4  # volpath:619


class Lights(NamedTuple):
    position: jnp.ndarray  # (3,)
    intensity: jnp.ndarray  # (3,) = color * intensity (volpath:115)


def _norm(v):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)


def _boundary_event(direction, normal, medium_ior):
    """Fresnel boundary quantities shared by both boundary events
    (volpath:635-667 and :723-753): IOR pair by travel side, reflected and
    refracted directions, reflectance (0 under TIR so ``rand < r`` is
    false, like the reference's ``rand < NaN``, and control always takes
    the refract branch).

    TIR divergence (see ops/fresnel.py module docstring): the reference
    normalizes the zero TIR sentinel into a NaN direction and the path
    dies on the next (miss) traversal. Default behavior here continues
    with the physical reflection (``transmitted_dir = refl`` under TIR);
    the returned ``tir`` mask lets the ``tir='kill'`` parity mode
    terminate those lanes like the reference instead."""
    going_out = jnp.sum(direction * normal, axis=-1) > 0.0
    air = jnp.ones_like(medium_ior)
    from_ior = jnp.where(going_out, medium_ior, air)
    to_ior = jnp.where(going_out, air, medium_ior)
    refr, tir = refract(direction, normal, from_ior, to_ior)
    refr = _norm(jnp.where(tir[:, None], normal, refr))  # placeholder under TIR
    refl = _norm(reflect(direction, normal))
    r = fresnel_r(from_ior, to_ior, direction, normal)
    transmitted_dir = jnp.where(tir[:, None], refl, refr)
    return refl, transmitted_dir, r, tir


def sample_direct_light(
    position,
    scene: SceneArrays,
    bvh: DeviceBVH,
    lights: Lights,
    active,
    max_media: int,
):
    """Next-event estimation toward the point light, marching through a
    bounded number of media boundary pairs (volpath:337-426).

    The reference's while-loop is unbounded; we unroll ``max_media``
    iterations (each handles one enter/exit pair with two traces), which
    covers the shipped scenes' worst case. Draws no RNG, like the
    reference. A hit on a medium-less surface fully occludes; each medium
    segment multiplies Beer-Lambert transmittance and the 0.9 per-boundary
    fudge (volpath:408).
    """
    to_light = lights.position[None, :] - position
    light_dist = jnp.linalg.norm(to_light, axis=-1)
    inv = 1.0 / jnp.maximum(light_dist, 1e-20)
    light_value = lights.intensity[None, :] * (inv * inv)[:, None]
    ldir = to_light * inv[:, None]

    trans = jnp.ones_like(position)
    remaining = jnp.where(active, light_dist, 0.0)
    origin = position

    def shaded(o, t_max, act):
        return trace_shaded(
            o, ldir, bvh, scene.v0, scene.v1, scene.v2, scene.mat_ids,
            T_MIN, t_max, active=act,
        )

    def march_step(carry):
        trans, origin, remaining = carry
        run = active & (remaining > 0.0)
        h1 = shaded(origin, remaining * 0.999, run)
        med1 = lookup(h1.mat_id, scene.media, scene.scale)

        occluded = run & h1.hit & ~med1.has_medium
        trans = jnp.where(occluded[:, None], 0.0, trans)

        enter = run & h1.hit & med1.has_medium
        pos1 = h1.position
        rem_after_enter = remaining - h1.t

        h2 = shaded(pos1, jnp.maximum(rem_after_enter, T_MIN), enter)
        med2 = lookup(h2.mat_id, scene.media, scene.scale)

        occluded2 = enter & h2.hit & ~med2.has_medium
        trans = jnp.where(occluded2[:, None], 0.0, trans)

        pair = enter & h2.hit & med2.has_medium
        seg = jnp.minimum(h2.t, rem_after_enter)
        seg_tr = eval_transmittance(seg, med1.sigma_s, med1.sigma_a)
        trans = jnp.where(pair[:, None], trans * 0.9 * seg_tr, trans)

        origin = jnp.where(pair[:, None], h2.position, origin)
        # Loop bookkeeping: miss or exhausted path ends the march; an
        # enter-without-exit also ends it with transmittance kept
        # (volpath:414-421).
        remaining = jnp.where(pair, rem_after_enter - h2.t, 0.0)
        return trans, origin, remaining

    carry = (trans, origin, remaining)
    for _ in range(max_media):
        # Most bounces cross zero or one media pair; skip whole march
        # iterations when no lane still has distance to cover (real branch
        # on TPU: lax.cond with a scalar predicate).
        carry = jax.lax.cond(
            jnp.any(active & (carry[2] > 0.0)),
            march_step,
            lambda c: c,
            carry,
        )
    trans, _, remaining = carry
    # A lane still mid-march after max_media pairs is unresolved: the
    # reference's unbounded loop (volpath:350) would keep attenuating and
    # could still find an opaque occluder, so truncation must fail dark,
    # not bright (shipped scenes need <= 3 pairs; this only fires when the
    # bound is genuinely exceeded).
    trans = jnp.where((remaining > 0.0)[:, None], 0.0, trans)

    return light_value * trans


class Tracer(NamedTuple):
    """Pluggable trace backend for _bounce. The default (built from the
    BVH/cluster tracer) reproduces the historical wavefront engine; the
    binned engine (render/binnedrender.py) swaps in per-lane-work-
    proportional traces. All three hooks draw no RNG, so engines sharing
    a hook set sample identical per-lane decision streams.

    closest(org, dir, active) -> ShadedHit
    distance(position, dir, transmitted, rngs, med) -> seg_len (R,)
        ``rngs``/``med`` let implementations PEEK the upcoming free-
        flight draw (ops/rng.py streams are deterministic) to bound the
        walk by the exponential candidate — semantically invisible,
        because success only compares sampled < dist.
    direct(position, active) -> (R, 3) incident light after occlusion
        and media transmittance (the NEE march).
    """

    closest: object
    distance: object
    direct: object


def default_tracer(scene: SceneArrays, bvh, lights: Lights,
                   nee_max_media: int) -> Tracer:
    """The historical trace set: closest/dist via trace_shaded, NEE via
    the per-leg chained march (sample_direct_light)."""

    def closest(org, direction, alive):
        return trace_shaded(
            org, direction, bvh, scene.v0, scene.v1, scene.v2,
            scene.mat_ids, T_MIN, T_MAX, active=alive,
        )

    def distance(position, dir_after, transmitted, _rngs, _med):
        # Only medium-transmitted lanes need it; skip the trace entirely
        # on all-surface bounces (scalar lax.cond branch).
        def dist_trace(_):
            h = trace_shaded(
                position, dir_after, bvh, scene.v0, scene.v1, scene.v2,
                scene.mat_ids, T_MIN, T_MAX, active=transmitted,
            )
            return jnp.where(h.hit, h.t, T_MAX)

        return jax.lax.cond(
            jnp.any(transmitted),
            dist_trace,
            lambda _: jnp.full(position.shape[:1], T_MAX, jnp.float32),
            None,
        )

    def direct(position, active):
        return sample_direct_light(
            position, scene, bvh, lights, active, nee_max_media
        )

    return Tracer(closest=closest, distance=distance, direct=direct)


class _State(NamedTuple):
    org: jnp.ndarray  # (R, 3)
    dir: jnp.ndarray  # (R, 3)
    thr: jnp.ndarray  # (R, 3)
    rad: jnp.ndarray  # (R, 3)
    rng: jnp.ndarray  # (R,) uint32
    depth: jnp.ndarray  # (R,) int32
    alive: jnp.ndarray  # (R,) bool
    lane: jnp.ndarray  # (R,) int32 original lane id (compaction permutes)


def _spread3(v):
    """Interleave 10-bit ints for Morton codes (classic bit smear)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    v = (v | (v << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    v = (v | (v << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    v = (v | (v << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return v


def _compact(state: _State, scene: SceneArrays) -> _State:
    """Repack the wavefront: dead lanes last, live lanes sorted for ray
    coherence.

    The GLSL megakernel leaves dead threads idling in their warps; here
    dead lanes would occupy kernel blocks, so each bounce re-sorts. The
    key is (direction octant, Morton cell of the origin), so scattered
    bounce rays that start near each other and head the same way land in
    the same 1024-ray kernel block and share cluster culls — the stream-
    compaction / ray-sorting stage of a wavefront tracer. Dead lanes sort
    to the tail, where all-dead blocks are skipped by the tracer's scalar
    predicate at near-zero cost. Radiance/RNG are scattered back through
    ``lane`` at the end of the sample.
    """
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
    key = (octant << jnp.uint32(15)) | cell
    key = jnp.where(state.alive, key, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(key)
    return _State(*(jnp.take(x, order, axis=0) for x in state))


def _bounce(
    state: _State,
    scene: SceneArrays,
    bvh: DeviceBVH,
    lights: Lights,
    max_depth: int,
    rr_depth: int,
    nee_max_media: int,
    tir: str = "reflect",
    tracer: Tracer | None = None,
    direct: str = "scatter",
) -> _State:
    org, direction, thr, rad, rngs, depth, alive, lane_id = state
    if tracer is None:
        tracer = default_tracer(scene, bvh, lights, nee_max_media)

    sh = tracer.closest(org, direction, alive)
    got_hit = alive & sh.hit
    position = sh.position  # barycentric reconstruction (volpath:158-181)
    normal = sh.normal
    med = lookup(sh.mat_id, scene.media, scene.scale)
    color = shade_color(position, normal, scene.background)

    has_med = got_hit & med.has_medium

    # --- boundary event #1 (volpath:633-670) ---
    refl1, trans_dir1, r1, tir1 = _boundary_event(direction, normal, med.ior)
    rngs, rand_fresnel = rng_ops.next_float_masked(rngs, has_med)
    do_reflect = has_med & (rand_fresnel < r1)
    transmitted = has_med & ~do_reflect

    dir_after = jnp.where(
        do_reflect[:, None], refl1, jnp.where(transmitted[:, None], trans_dir1, direction)
    )
    # Reflect lanes: origin to hit point, depth+1, continue (volpath:651-654).
    org = jnp.where(do_reflect[:, None], position, org)
    depth = depth + jnp.where(has_med, 1, 0)  # volpath:669 (also hit by :653)

    # --- distance-to-boundary trace (volpath:675-688) ---
    seg_len = tracer.distance(position, dir_after, transmitted, rngs, med)

    # --- free-flight sampling (volpath:691) ---
    rngs, rand_dist = rng_ops.next_float_masked(rngs, transmitted)
    ms = sample_distance(rand_dist, med.sigma_s, med.sigma_a, seg_len)
    # tir='kill' parity mode: the reference's TIR lanes carry a NaN
    # direction here, whose NaN comparisons force the no-scatter branch;
    # they still consume the sampleDistance and boundary-#2 draws before
    # dying on the next (miss) traversal (volpath:691,:737).
    kill_tir = tir == "kill"
    scatter = transmitted & ms.success
    if kill_tir:
        scatter = scatter & ~tir1
    pass_med = transmitted & ~scatter

    # --- diffuse gate (volpath:758-764) ---
    diffuse = got_hit & ~has_med
    backface = diffuse & (jnp.sum(direction * normal, axis=-1) > 0.0)
    shade = diffuse & ~backface

    # --- shared NEE (volpath:697 for scatter, :773 for diffuse; draws no
    # randoms; the medium argument is dead in the reference).
    # direct='analytic': the NEE point is the BOUNDARY hit either way
    # (reference quirk), so the direct term's free-flight factor
    # sigma_s*T(t)/p(t) is replaced by its closed-form expectation and
    # credited on EVERY transmitted segment in a scatterable medium —
    # same converged image, no extra RNG (ops/medium.py
    # analytic_direct_scale). Under tir='kill' the reference's TIR lanes
    # never reach the scatter branch, so they are excluded to keep the
    # estimand identical. ---
    analytic = direct == "analytic"
    if analytic:
        ad_gate, ad_scale = analytic_direct_scale(
            med.sigma_s, med.sigma_a, seg_len
        )
        ad_gate = transmitted & ad_gate
        if kill_tir:
            ad_gate = ad_gate & ~tir1
        light = tracer.direct(position, ad_gate | shade)
    else:
        light = tracer.direct(position, scatter | shade)

    g = g_mean(med.g)
    phase_nee = hg_eval_zero(g)  # outDir still vec3(0) at eval time
    if analytic:
        rad = rad + jnp.where(
            ad_gate[:, None],
            thr * ad_scale * light * phase_nee[:, None],
            0.0,
        )

    # --- scatter branch (volpath:693-710) ---
    safe_ps = jnp.where(ms.prob_success > 0.0, ms.prob_success, 1.0)
    scatter_scale = med.sigma_s * ms.transmittance / safe_ps[:, None]
    scatter_scale = jnp.where((ms.prob_success > 0.0)[:, None], scatter_scale, 0.0)
    thr = jnp.where(scatter[:, None], thr * scatter_scale, thr)

    if not analytic:
        rad = rad + jnp.where(
            scatter[:, None], thr * light * phase_nee[:, None], 0.0
        )

    rngs, r_ph1 = rng_ops.next_float_masked(rngs, scatter)
    rngs, r_ph2 = rng_ops.next_float_masked(rngs, scatter)
    hg_dir, _ = hg_sample(-dir_after, g, r_ph1, r_ph2)
    # New origin advanced along the *scattered* direction (volpath:708-709).
    org = jnp.where(scatter[:, None], position + hg_dir * ms.t[:, None], org)
    new_dir = jnp.where(scatter[:, None], hg_dir, dir_after)

    # --- pass-through branch (volpath:713-756) ---
    safe_pf = jnp.where(ms.prob_fail > 0.0, ms.prob_fail, 1.0)
    pass_scale = ms.transmittance / safe_pf[:, None]
    pass_scale = jnp.where((ms.prob_fail > 0.0)[:, None], pass_scale, 0.0)
    thr = jnp.where(pass_med[:, None], thr * pass_scale, thr)

    pass_org = position + dir_after * ms.t[:, None]
    # Boundary event #2 with the stale entry normal (volpath:723-753).
    refl2, trans_dir2, r2, tir2 = _boundary_event(dir_after, normal, med.ior)
    rngs, rand_fresnel2 = rng_ops.next_float_masked(rngs, pass_med)
    pass_dir = jnp.where((rand_fresnel2 < r2)[:, None], refl2, trans_dir2)
    org = jnp.where(pass_med[:, None], pass_org, org)
    new_dir = jnp.where(pass_med[:, None], pass_dir, new_dir)

    # --- diffuse branch (volpath:758-779) ---
    rngs, r_d1 = rng_ops.next_float_masked(rngs, shade)
    rngs, r_d2 = rng_ops.next_float_masked(rngs, shade)
    wo_local, _bsdf = diffuse_sample(-direction, normal, r_d1, r_d2)
    thr = jnp.where(shade[:, None], thr * REFLECTANCE, thr)
    deval = diffuse_eval(-direction, wo_local, normal)
    rad = rad + jnp.where(shade[:, None], thr * light * deval * color, 0.0)

    wo_world = _norm(wo_local)  # the local->world quirk (volpath:777)
    org = jnp.where(shade[:, None], position + wo_world * T_MIN, org)
    new_dir = jnp.where(shade[:, None], wo_world, new_dir)

    # new_dir's base value is dir_after, which is refl1 on reflect lanes, so
    # one select covers every branch that redirects the ray.
    redirected = do_reflect | scatter | pass_med | shade
    direction = jnp.where(redirected[:, None], new_dir, direction)

    # --- end-of-iteration depth + russian roulette (volpath:786-797) ---
    # Depth so far: +1 for every medium hit (volpath:669 / :653). The
    # pass-through continue adds its :754 increment; lanes reaching the
    # loop tail (scatter, diffuse) add the :786 increment.
    enders = scatter | shade
    depth = depth + jnp.where(enders | pass_med, 1, 0)

    rr = enders & (depth > rr_depth)
    rngs, rand_rr = rng_ops.next_float_masked(rngs, rr)
    q = jnp.minimum(jnp.max(thr, axis=-1), 0.95)
    survive = rand_rr <= q
    thr = jnp.where(
        (rr & survive)[:, None], thr / jnp.maximum(q, 1e-20)[:, None], thr
    )

    continuing = do_reflect | pass_med | (enders & (~rr | survive))
    alive = continuing & (depth < max_depth)
    if kill_tir:
        # Reference parity: a NaN-direction lane dies on its next (miss)
        # traversal with its accumulated radiance kept. TIR at event #1
        # kills the lane after its forced pass-through draws; TIR at
        # event #2 (always the refract branch, rand < NaN being false)
        # kills it too (volpath:658-667,:743-753).
        alive = alive & ~((transmitted & tir1) | (pass_med & tir2))

    return _State(org, direction, thr, rad, rngs, depth, alive, lane_id)


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
        "compact",
        "tir",
        "direct",
    ),
)
def render_beauty(
    camera: Camera,
    scene: SceneArrays,
    bvh: DeviceBVH,
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
    compact: bool = True,
    tir: str = "reflect",
    direct: str = "scatter",
):
    """Render an (H, W, 3) tile of the beauty pass.

    ``rng_state``/``return_rng``: for chunked parity rendering — the
    per-pixel PCG stream continues across sample chunks (the reference
    consumes one stream per pixel across all samples, volpath:575-580), so
    callers carry the state between passes. The returned image is the
    *mean over this pass's samples* (combine chunks by weighted average).

    For sharded tiles, ``pixel_offset``/``row_offset`` place this tile in
    the full framebuffer and ``full_resolution`` is the full image size:
    camera rays and per-pixel seeds (the reference seeds with the linear
    pixel index, volpath:575) both use *global* pixel coordinates, so a
    sharded render is bit-identical to a single-device render.

    ``rng_mode='parity'``: samples run sequentially, consuming one stream
    per pixel exactly like the reference thread does.
    ``rng_mode='counter'``: decorrelated per-(pixel, sample) seeds —
    order-independent, the mode sample-parallel sharding uses.
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

    def one_sample(carry, sample_idx):
        rng_state, acc = carry
        if rng_mode == "counter":
            rng_state = rng_ops.seed_counter(
                linear, sample_idx + jnp.asarray(sample_offset, jnp.uint32)
            )
        elif rng_mode == "ld":
            rng_state = rng_ops.seed_ld(
                linear, sample_idx + jnp.asarray(sample_offset, jnp.uint32)
            )
        rng_state, j1 = rng_ops.next_float(rng_state)
        rng_state, j2 = rng_ops.next_float(rng_state)
        jitter = jnp.stack([j1, j2], axis=-1)
        org, direction = generate_rays(camera, pixel_xy, jitter, (full_w, full_h))

        state = _State(
            org=org,
            dir=direction,
            thr=jnp.ones((r, 3), jnp.float32),
            rad=jnp.zeros((r, 3), jnp.float32),
            rng=rng_state,
            depth=jnp.zeros((r,), jnp.int32),
            alive=jnp.ones((r,), bool),
            lane=jnp.arange(r, dtype=jnp.int32),
        )

        def step(s):
            s = _bounce(
                s, scene, bvh, lights, max_depth, rr_depth, nee_max_media,
                tir, direct=direct,
            )
            # Measured: re-sorting every bounce beats both never sorting
            # and threshold-gated sorting (the lax.cond materialization
            # costs more than skipped sorts save).
            return _compact(s, scene) if compact else s

        # Two-phase bounce loop. Every trace pays a fixed per-block cost
        # (~18us x R/1024 blocks, even when the block is skipped), so the
        # deep-path tail — a few hundred survivors looping to depth 32 —
        # was dominated by dispatch overhead at full wavefront width.
        # Phase A runs at full width until the live set fits in R/8
        # (compaction keeps live lanes first, so a static slice is exact),
        # then phase B finishes on the narrow state. Identical math,
        # 8x cheaper tail.
        shrink = compact and r >= 8 * 1024
        if shrink:
            r2 = max(1024, r // 8)
            phase_a_iters = 8

            def cond_a(carry):
                s, it = carry
                live = jnp.sum(s.alive.astype(jnp.int32))
                return jnp.any(s.alive) & (
                    (it < phase_a_iters) | (live > r2)
                )

            (state, _) = jax.lax.while_loop(
                cond_a, lambda c: (step(c[0]), c[1] + 1), (state, jnp.int32(0))
            )
            rad = jnp.zeros((r, 3), jnp.float32).at[state.lane].set(state.rad)
            rng_out = jnp.zeros((r,) + state.rng.shape[1:], jnp.uint32).at[
                state.lane
            ].set(state.rng)

            narrow = _State(*(x[:r2] for x in state))
            narrow = jax.lax.while_loop(
                lambda s: jnp.any(s.alive), step, narrow
            )
            # Narrow-state lanes carry their phase-A prefix: overwrite.
            rad = rad.at[narrow.lane].set(narrow.rad)
            rng_out = rng_out.at[narrow.lane].set(narrow.rng)
        else:
            state = jax.lax.while_loop(lambda s: jnp.any(s.alive), step, state)
            rad = jnp.zeros((r, 3), jnp.float32).at[state.lane].set(state.rad)
            rng_out = jnp.zeros((r,) + state.rng.shape[1:], jnp.uint32).at[
                state.lane
            ].set(state.rng)
        return (rng_out, acc + rad), None

    if rng_state is not None:
        seed0 = rng_state
    elif rng_mode == "ld":
        seed0 = rng_ops.seed_ld(linear, 0)  # re-seeded per sample; dtype anchor
    else:
        seed0 = rng_ops.seed_from_pixel(linear)
    (final_rng, acc), _ = jax.lax.scan(
        one_sample,
        (seed0, jnp.zeros((r, 3), jnp.float32)),
        jnp.arange(num_samples, dtype=jnp.uint32),
    )
    img = (acc / jnp.float32(num_samples)).reshape(height, width, 3)
    if return_rng:
        return img, final_rng
    return img
