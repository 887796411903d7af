"""Henyey-Greenstein phase function.

Re-derivation of reference volpath.comp.glsl:428-479 (eval + inverse-CDF
sampling in a frame built off the negated incident direction). The
reference collapses the per-RGB anisotropy to its channel mean
(volpath:438,:446) — preserved here.

Divergence note: the reference divides by ``2g`` with no isotropic guard,
so exactly-isotropic media (g == 0) produce NaN directions in the GLSL
(volpath:451-452). We add the standard |g| < eps fallback
``cos_theta = 1 - 2x`` (the uniform-sphere inverse CDF), which the
Mitsuba implementation the reference credits also uses.
"""

from __future__ import annotations

import jax.numpy as jnp

INV_FOURPI = 0.07957747154594767  # volpath:98
TWOPI = 6.28318530718  # volpath:101
_ISO_EPS = 1e-4


def g_mean(anisotropy: jnp.ndarray) -> jnp.ndarray:
    """Mean of the RGB anisotropy channels (volpath:438)."""
    return jnp.mean(anisotropy, axis=-1)


def hg_eval(in_dir: jnp.ndarray, out_dir: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """HG phase value for the (in, out) direction pair (volpath:435-442)."""
    cos_theta = jnp.sum(in_dir * out_dir, axis=-1)
    tmp = 1.0 + g * g + 2.0 * g * cos_theta
    tmp = jnp.maximum(tmp, 1e-12)
    return INV_FOURPI * (1.0 - g * g) / (tmp * jnp.sqrt(tmp))


def hg_eval_zero(g: jnp.ndarray) -> jnp.ndarray:
    """HG eval with a zero out-direction, i.e. cos_theta = 0.

    The reference evaluates the phase for next-event estimation *before*
    sampling an out direction, so outDir is still vec3(0)
    (volpath:698-699) and the dot product is 0. Faithful parity requires
    this constant-per-medium weight rather than the light direction.
    """
    tmp = 1.0 + g * g
    return INV_FOURPI * (1.0 - g * g) / (tmp * jnp.sqrt(tmp))


def _ortho_frame(normal: jnp.ndarray):
    """Tangent frame used by the reference sampler (volpath:461-472)."""
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-20))
    t_a = jnp.stack([nz * inv_a, jnp.zeros_like(nx), -nx * inv_a], axis=-1)
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-20))
    t_b = jnp.stack([jnp.zeros_like(nx), nz * inv_b, -ny * inv_b], axis=-1)
    t = jnp.where(use_x[..., None], t_a, t_b)
    s = jnp.cross(t, normal)
    return s, t


def hg_sample(in_dir: jnp.ndarray, g: jnp.ndarray, r1: jnp.ndarray, r2: jnp.ndarray):
    """Sample an outgoing direction from HG (volpath:444-479).

    ``in_dir`` is the direction *toward* the collision (the reference passes
    ``-rayDirection`` as phase.inDir and builds the frame around
    ``normal = -inDir``, volpath:464). Returns (out_dir, weight=1.0).
    """
    safe_g = jnp.where(jnp.abs(g) < _ISO_EPS, 1.0, g)
    tmp = (1.0 - g * g) / (1.0 - g + 2.0 * g * r1)
    cos_aniso = (1.0 + g * g - tmp * tmp) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * r1
    cos_theta = jnp.where(jnp.abs(g) < _ISO_EPS, cos_iso, cos_aniso)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWOPI * r2
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )

    normal = -in_dir
    s, t = _ortho_frame(normal)
    out = (
        s * local[..., 0:1]
        + t * local[..., 1:2]
        + normal * local[..., 2:3]
    )
    return out, jnp.ones_like(g)
