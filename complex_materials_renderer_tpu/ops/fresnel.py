"""Fresnel reflectance and reflection/refraction directions.

Re-derivation of reference volpath.comp.glsl:312-335 (getFresnelR),
:545-548 (reflectRay) and :550-562 (refractRay) as batched lane ops.

Divergence notes (deliberate, documented for the parity gate):
- Under total internal reflection the reference computes
  ``asin(x>1) -> NaN`` so ``rand < NaN`` is always false and control falls
  into the refract branch — where the refract vector has ALREADY been
  normalized (``normalize(refractRay(...))``, volpath:642/:730), turning
  the vec3(0) TIR sentinel into NaN. The ``== vec3(0)`` check at
  volpath:658/:743 therefore never fires and the reference propagates a
  NaN direction: the next traversal misses everything and the path
  terminates, keeping only the radiance accumulated so far. In other
  words the reference effectively KILLS TIR paths. We return reflectance
  0 for TIR so the refract branch resolves to a physical reflection and
  the path continues — TIR-heavy scenes (gems, ior 1.5-1.77) render
  measurably brighter than the reference. ``render_beauty(tir='kill')``
  reproduces the reference's terminate-on-TIR behavior (without the
  NaNs) for parity comparisons.
- acos/asin arguments are clamped to valid domains (GLSL leaves out-of-range
  values undefined; on-TPU NaNs would poison masked lanes).
"""

from __future__ import annotations

import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def reflect(direction: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (volpath:545-548)."""
    return direction - 2.0 * _dot(direction, normal) * normal


def refract(direction: jnp.ndarray, normal: jnp.ndarray, n1, n2):
    """Snell refraction (volpath:550-562).

    Returns (refracted_direction, tir_mask). Where ``tir_mask`` is True the
    direction is zero, mirroring the reference's sentinel return.
    """
    eta = jnp.asarray(n1, jnp.float32) / jnp.asarray(n2, jnp.float32)
    eta = jnp.broadcast_to(eta, direction.shape[:-1])[..., None]
    cos_i = -_dot(direction, normal)
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    out = eta * direction + (eta * cos_i - cos_t) * normal
    out = jnp.where(tir, 0.0, out)
    return out, tir[..., 0]


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def fresnel_r(n1, n2, in_dir: jnp.ndarray, normal: jnp.ndarray, fast: bool = False):
    """Unpolarized Fresnel reflectance (volpath:312-335).

    ``fast=True`` is the Schlick approximation branch (volpath:314-318); the
    reference megakernel always uses the full rs/rp form (volpath:645,:733).
    Under TIR the full form returns 0 (see module docstring).
    """
    n1 = jnp.asarray(n1, jnp.float32)
    n2 = jnp.asarray(n2, jnp.float32)
    if n1.ndim == in_dir.ndim - 1:
        n1 = n1[..., None]
    if n2.ndim == in_dir.ndim - 1:
        n2 = n2[..., None]

    d = _normalize(in_dir)
    n = _normalize(normal)

    if fast:
        ratio = n1 / n2
        f = ((1.0 - ratio) ** 2) / ((1.0 + ratio) ** 2)
        cosine = jnp.abs(_dot(d, n))
        r = f + (1.0 - f) * (1.0 - cosine) ** 5
        return r[..., 0]

    # theta1 = acos(dot) flipped to the front-facing normal (volpath:321-324)
    # is equivalent to acos(|dot|).
    cos1 = jnp.clip(jnp.abs(_dot(d, n)), 0.0, 1.0)
    theta1 = jnp.arccos(cos1)
    sin_t2 = n1 / n2 * jnp.sin(theta1)
    tir = sin_t2 >= 1.0
    theta2 = jnp.arcsin(jnp.clip(sin_t2, -1.0, 1.0))

    c1 = jnp.cos(theta1)
    c2 = jnp.cos(theta2)
    rs = (n1 * c1 - n2 * c2) / (n1 * c1 + n2 * c2)
    rp = (n1 * c2 - n2 * c1) / (n1 * c2 + n2 * c1)
    r = (rs * rs + rp * rp) * 0.5
    r = jnp.where(tir, 0.0, r)
    return r[..., 0]
