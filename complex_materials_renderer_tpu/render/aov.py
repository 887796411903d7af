"""Debug AOV passes: depth, face normal, barycentric topology.

Re-exposes the reference's three standalone debug kernels
(depth.comp.glsl:94-99, normal.comp.glsl:129-141, topology.comp.glsl:95-111)
as first-class render modes. The reference compiled these but never wired
them to the host (SURVEY §1/L5); here they share the scene camera and the
production traversal, which also makes them the natural unit-test oracles
for the BVH + intersection stack:

- depth:    greyscale t/10; misses show tMax/10 (the committed-t of a miss
            is the ray's tMax under VK ray-query semantics).
- normal:   0.5 + 0.5 * normalize(cross(v1-v0, v2-v0)); sky = (0, 0, 0.5).
- topology: (1-u-v, u, v) barycentrics; sky = (0, 0, 0.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.traverse import DeviceBVH, trace_closest
from ..ops.camera import Camera, generate_rays

_SKY = np.array([0.0, 0.0, 0.5], np.float32)
T_MAX = 1e4  # main loop tMax (volpath:619); debug kernels use the same bound


@partial(jax.jit, static_argnames=("resolution", "kind"))
def _aov_pass(camera: Camera, bvh: DeviceBVH, v0, v1, v2, resolution, kind: str):
    width, height = resolution
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.int32),
        jnp.arange(width, dtype=jnp.int32),
        indexing="ij",
    )
    pixel_xy = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    # Debug kernels trace the exact pixel center (no jitter, they draw no
    # randoms — depth/normal/topology use a deterministic camera ray).
    jitter = jnp.full((pixel_xy.shape[0], 2), 0.5, jnp.float32)
    o, d = generate_rays(camera, pixel_xy, jitter, resolution)

    hit = trace_closest(o, d, bvh, 1e-4, T_MAX)
    miss = hit.prim < 0

    if kind == "depth":
        t = jnp.where(miss, T_MAX, hit.t)
        img = jnp.repeat((t / 10.0)[:, None], 3, axis=1)
    elif kind == "normal":
        p = jnp.maximum(hit.prim, 0)
        n = jnp.cross(v1[p] - v0[p], v2[p] - v0[p])
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        img = jnp.where(miss[:, None], _SKY, 0.5 + 0.5 * n)
    elif kind == "topology":
        bary = jnp.stack([1.0 - hit.u - hit.v, hit.u, hit.v], axis=-1)
        img = jnp.where(miss[:, None], _SKY, bary)
    else:
        raise ValueError(f"unknown AOV kind: {kind}")
    return img.reshape(height, width, 3)


def render_aov(scene_tris, camera: Camera, bvh: DeviceBVH, resolution, kind: str):
    """Render one AOV image of shape (height, width, 3).

    ``scene_tris``: (T, 3, 3) in original order (normals/barycentrics are
    reported against the reference's primitive indexing, volpath:127).
    """
    tris = jnp.asarray(scene_tris, jnp.float32)
    return _aov_pass(
        camera, bvh, tris[:, 0], tris[:, 1], tris[:, 2], tuple(resolution), kind
    )
