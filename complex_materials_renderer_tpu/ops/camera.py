"""Pinhole camera ray generation.

Re-derivation of reference volpath.comp.glsl:575-601: look-at basis from a
world-up cross product, aspect-preserving screen UV with flipped y, and the
reference's non-standard field-of-view mapping ``fovRad = 2*pi -
radians(fov)`` used as a forward-vector scale (volpath:599-600) — required
as-is for image parity.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

TWOPI = 6.28318530718


class Camera(NamedTuple):
    origin: jnp.ndarray  # (3,)
    forward: jnp.ndarray  # (3,)
    right: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    fov_scale: jnp.ndarray  # scalar: 2*pi - radians(fov)


def make_camera(position, look_at, fov_degrees) -> Camera:
    origin = jnp.asarray(position, jnp.float32)
    look_at = jnp.asarray(look_at, jnp.float32)
    forward = look_at - origin
    forward = forward / jnp.linalg.norm(forward)
    world_up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    right = jnp.cross(forward, world_up)
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, forward)
    up = up / jnp.linalg.norm(up)
    fov_scale = jnp.float32(TWOPI) - jnp.deg2rad(jnp.float32(fov_degrees))
    return Camera(origin, forward, right, up, fov_scale)


def generate_rays(
    camera: Camera,
    pixel_xy: jnp.ndarray,  # (R, 2) integer pixel coordinates (x, y)
    jitter: jnp.ndarray,  # (R, 2) uniforms in [0, 1]
    resolution: Tuple[int, int],  # (width, height)
):
    """Primary ray origins/directions for jittered pixel samples.

    Screen mapping and y flip per volpath:593-601.
    """
    width, height = resolution
    px = pixel_xy[..., 0].astype(jnp.float32) + jitter[..., 0]
    py = pixel_xy[..., 1].astype(jnp.float32) + jitter[..., 1]
    u = (2.0 * px - width) / height
    v = -(2.0 * py - height) / height
    direction = (
        u[..., None] * camera.right
        + v[..., None] * camera.up
        + camera.fov_scale * camera.forward
    )
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = jnp.broadcast_to(camera.origin, direction.shape)
    return origin, direction
