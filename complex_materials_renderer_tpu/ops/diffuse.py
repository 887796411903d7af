"""Lambertian BSDF with the reference's concentric-disk cosine sampling.

Re-derivation of reference volpath.comp.glsl:255-310.

Parity notes (behavioral quirks preserved deliberately — see SURVEY §2/C6j):
- ``diffuse_sample`` returns the sampled direction in the *local* shading
  frame (z-up), and the reference megakernel uses it directly as a world
  direction (volpath:766-777). The integrator replicates that.
- ``diffuse_eval`` mixes a world-space visibility test (dot against the
  world normal) with the local wo.z cosine term (volpath:257-262).
- Albedo is the constant 0.8 grey (volpath:109).
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265359  # volpath:99
INV_PI = 0.31830988618  # volpath:100
REFLECTANCE = 0.8  # volpath:109


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def concentric_disk(r1: jnp.ndarray, r2: jnp.ndarray):
    """Cline/Mitsuba concentric square-to-disk map (volpath:272-297).

    Inputs are uniforms in [0,1]; internally remapped to [-1,1].
    """
    u = 2.0 * r1 - 1.0
    v = 2.0 * r2 - 1.0
    zero = (u == 0.0) & (v == 0.0)
    use_u = u * u > v * v
    r = jnp.where(use_u, u, v)
    phi = jnp.where(
        use_u,
        (PI / 4.0) * (v / jnp.where(use_u, u, 1.0)),
        (PI / 2.0) - (u / jnp.where(use_u, 1.0, jnp.where(v == 0.0, 1.0, v))) * (PI / 4.0),
    )
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def diffuse_sample(wi: jnp.ndarray, normal: jnp.ndarray, r1, r2):
    """Sample a cosine-weighted local direction (volpath:265-310).

    Returns (wo_local, bsdf_value(R,3)). The bsdf value is 0 where
    dot(wi, normal) <= 0 and the constant reflectance otherwise.
    """
    dx, dy = concentric_disk(r1, r2)
    temp = 1.0 - dx * dx - dy * dy
    z = jnp.where(temp <= 0.0, 1e-10, jnp.sqrt(jnp.maximum(temp, 0.0)))
    wo = jnp.stack([dx, dy, z], axis=-1)
    valid = _dot(wi, normal) > 0.0
    value = jnp.where(valid[..., None], REFLECTANCE, 0.0) * jnp.ones_like(wi)
    return wo, value


def diffuse_eval(wi: jnp.ndarray, wo_local: jnp.ndarray, normal: jnp.ndarray):
    """Lambert eval with the reference's frame-mixing quirk (volpath:255-263).

    Visibility uses world-space dots of wi and the *local-frame* wo against
    the world normal; the cosine term is the local wo.z.
    """
    visible = (_dot(wi, normal) > 0.0) & (_dot(wo_local, normal) > 0.0)
    val = REFLECTANCE * INV_PI * wo_local[..., 2]
    return jnp.where(visible[..., None], val[..., None], 0.0) * jnp.ones_like(wi)
