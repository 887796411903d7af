"""Participating-medium ops: table lookup, transmittance, free-flight sampling.

Re-derivations of reference volpath.comp.glsl:
- medium lookup by material id with sigma_s/sigma_a scaled by the scene
  scale and g/ior unscaled (volpath:137-145);
- homogeneous Beer-Lambert transmittance (volpath:248-253);
- analog single-scatter distance sampling with min-extinction density and
  max-single-channel-albedo sample weight clamped to >= 0.5
  (volpath:482-543), including the 500000 no-interaction sentinel and the
  < 1e-4 transmittance zero-clamp.

The media table layout mirrors the packed buffer contract of the
reference scene loader (model.cpp:49: ``count, (matID, sigma_s.rgb,
sigma_a.rgb, g.rgb, ior)*count``) but as SoA arrays, which is what the
VPU wants.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NO_INTERACTION = 500000.0  # volpath:513


class MediaTable(NamedTuple):
    """SoA media definitions. ``mat_id`` uses -1 padding for empty slots."""

    mat_id: jnp.ndarray  # (M,) int32
    sigma_s: jnp.ndarray  # (M, 3) float32, unscaled
    sigma_a: jnp.ndarray  # (M, 3) float32, unscaled
    g: jnp.ndarray  # (M, 3) float32
    ior: jnp.ndarray  # (M,) float32


class MediumLanes(NamedTuple):
    """Per-lane medium properties after lookup (scaled like volpath:141)."""

    has_medium: jnp.ndarray  # (R,) bool
    sigma_s: jnp.ndarray  # (R, 3) scaled
    sigma_a: jnp.ndarray  # (R, 3) scaled
    g: jnp.ndarray  # (R, 3)
    ior: jnp.ndarray  # (R,)


def lookup(mat_id: jnp.ndarray, table: MediaTable, scale) -> MediumLanes:
    """First-match medium lookup for a batch of material ids (volpath:137-145).

    The reference scans the table linearly and takes the first row whose
    matID matches; we vectorize as a masked argmax over the (small) table.
    Lanes with no match get the ``none`` medium (zeros, ior=1,
    volpath:107).
    """
    m = table.mat_id.shape[0]
    matches = mat_id[:, None] == table.mat_id[None, :]  # (R, M)
    has = jnp.any(matches, axis=1)
    # argmax returns the first True, matching the linear-scan break.
    idx = jnp.argmax(matches, axis=1)
    idx = jnp.where(has, idx, 0)
    scale = jnp.asarray(scale, jnp.float32)
    sel = lambda a: jnp.take(a, idx, axis=0)
    zero3 = jnp.zeros((mat_id.shape[0], 3), jnp.float32)
    return MediumLanes(
        has_medium=has,
        sigma_s=jnp.where(has[:, None], sel(table.sigma_s) * scale, zero3),
        sigma_a=jnp.where(has[:, None], sel(table.sigma_a) * scale, zero3),
        g=jnp.where(has[:, None], sel(table.g), zero3),
        ior=jnp.where(has, sel(table.ior), 1.0),
    )


def lookup_index(row_idx: jnp.ndarray, table: MediaTable, scale) -> MediumLanes:
    """Medium lookup by media-TABLE ROW INDEX (-1 = no medium).

    The NEE sweep's packed boundary keys carry the media row index
    (kernels/cluster_test.media_index) rather than the raw material id,
    so material ids are unbounded; this selects the row directly."""
    has = row_idx >= 0
    idx = jnp.maximum(row_idx, 0).astype(jnp.int32)
    scale = jnp.asarray(scale, jnp.float32)
    sel = lambda a: jnp.take(a, idx, axis=0)
    zero3 = jnp.zeros((row_idx.shape[0], 3), jnp.float32)
    return MediumLanes(
        has_medium=has,
        sigma_s=jnp.where(has[:, None], sel(table.sigma_s) * scale, zero3),
        sigma_a=jnp.where(has[:, None], sel(table.sigma_a) * scale, zero3),
        g=jnp.where(has[:, None], sel(table.g), zero3),
        ior=jnp.where(has, sel(table.ior), 1.0),
    )


def eval_transmittance(dist, sigma_s, sigma_a):
    """Homogeneous Beer-Lambert transmittance (volpath:248-253)."""
    extinction = sigma_a + sigma_s
    d = jnp.asarray(dist)
    if d.ndim == extinction.ndim - 1:
        d = d[..., None]
    return jnp.exp(-extinction * d)


def free_flight_candidate(rand, sigma_s, sigma_a):
    """The segment-length-independent half of sample_distance: the
    exponential candidate collision distance (NO_INTERACTION when the
    single-scatter draw declines). Exactly the ``sampled`` value below,
    so callers may PRE-draw it (same RNG value) to BOUND the
    distance-to-boundary trace — success only compares sampled < dist,
    so a walk clamped just past the candidate returns identical results
    (the megakernel has used this bound since round 2)."""
    extinction = sigma_s + sigma_a
    density = jnp.min(extinction, axis=-1)
    albedo = jnp.where(
        extinction > 0.0, sigma_s / jnp.maximum(extinction, 1e-30), -1.0
    )
    weight = jnp.max(albedo, axis=-1)
    weight = jnp.maximum(weight, -1.0)
    weight = jnp.where(weight > 0.0, jnp.maximum(weight, 0.5), weight)
    draw = rand < weight
    r_scaled = jnp.where(draw, rand / jnp.where(draw, weight, 1.0), 0.0)
    exp_sample = -jnp.log(jnp.maximum(1.0 - r_scaled, 1e-37)) / jnp.maximum(
        density, 1e-30
    )
    return jnp.where(draw & (density > 0.0), exp_sample, NO_INTERACTION)


LN_CLAMP = 9.210340371976184  # ln(1e4): the <1e-4 transmittance clamp depth


def analytic_direct_scale(sigma_s, sigma_a, dist):
    """Closed-form expectation of the scatter branch's direct-light
    throughput factor: ``E[sigma_s * T(t) / p_success(t)]`` over the
    free-flight draw, per channel.

    The reference evaluates NEE from the BOUNDARY hit point
    (volpath:697), not the scatter point, so the sampled depth ``t``
    enters the direct term only through ``sigma_s * T(t)/p(t)`` — whose
    expectation over sample_distance's min-channel exponential is the
    analytic in-scatter integral

        A_c = sigma_s_c * (1 - exp(-sigma_t_c * t_cap)) / sigma_t_c,
        t_cap = min(dist, ln(1e4)/density),

    where ``t_cap`` reproduces the reference's transmittance zero-clamp
    (max-channel T < 1e-4 <=> t > ln(1e4)/density, volpath:250-253 via
    sample_distance above). Replacing the stochastic factor with A and
    crediting EVERY transmitted segment (not only scatter events)
    estimates the identical image — quirks included — with the
    scatter-or-not Bernoulli and the t-jitter removed from the direct
    term, and draws NO RNG. Lanes whose min extinction channel is zero
    can never scatter in the reference (volpath:487-513) and get 0.

    Returns ``(gate, scale3)``: gate = density > 0, scale3 = A.
    """
    extinction = sigma_s + sigma_a
    density = jnp.min(extinction, axis=-1)
    gate = density > 0.0
    t_cap = jnp.minimum(
        jnp.asarray(dist), LN_CLAMP / jnp.maximum(density, 1e-30)
    )
    a = (
        sigma_s
        * (1.0 - jnp.exp(-extinction * t_cap[..., None]))
        / jnp.maximum(extinction, 1e-30)
    )
    return gate, jnp.where(gate[..., None], a, 0.0)


class DistanceSample(NamedTuple):
    success: jnp.ndarray  # (R,) bool — scatter event inside the segment
    t: jnp.ndarray  # (R,) sampled depth (== dist on failure)
    prob_fail: jnp.ndarray  # (R,)
    prob_success: jnp.ndarray  # (R,)
    transmittance: jnp.ndarray  # (R, 3)


def sample_distance(rand, sigma_s, sigma_a, dist) -> DistanceSample:
    """Free-flight distance sampling (volpath:482-543).

    Density is the minimum extinction channel (volpath:487); the sample
    weight is the maximum single-channel albedo, clamped to >= 0.5 when
    positive (volpath:492-504). Failure probability folds the
    no-interaction branch: ``w * e^{-sigma d} + (1 - w)`` (volpath:535).
    Channels with zero extinction contribute no albedo candidate (the GLSL
    0/0 NaN compares false against the running max, volpath:494-498).
    """
    extinction = sigma_s + sigma_a
    density = jnp.min(extinction, axis=-1)

    albedo = jnp.where(extinction > 0.0, sigma_s / jnp.maximum(extinction, 1e-30), -1.0)
    weight = jnp.max(albedo, axis=-1)
    weight = jnp.maximum(weight, -1.0)
    weight = jnp.where(weight > 0.0, jnp.maximum(weight, 0.5), weight)

    draw = rand < weight
    # rand / weight < 1 whenever draw, so log(1 - r) is finite (volpath:508-509).
    r_scaled = jnp.where(draw, rand / jnp.where(draw, weight, 1.0), 0.0)
    exp_sample = -jnp.log(jnp.maximum(1.0 - r_scaled, 1e-37)) / jnp.maximum(
        density, 1e-30
    )
    sampled = jnp.where(draw & (density > 0.0), exp_sample, NO_INTERACTION)

    success = sampled < dist
    t = jnp.where(success, sampled, dist)

    prob_fail = jnp.exp(-density * t)
    prob_success = density * prob_fail * weight
    prob_fail = weight * prob_fail + (1.0 - weight)

    transmittance = jnp.exp(-extinction * t[..., None])
    transmittance = jnp.where(
        (jnp.max(transmittance, axis=-1) < 1e-4)[..., None], 0.0, transmittance
    )

    return DistanceSample(
        success=success,
        t=t,
        prob_fail=prob_fail,
        prob_success=prob_success,
        transmittance=transmittance,
    )
