"""Beauty-pass driver for the fused megakernel (kernels/megakernel.py).

Mirrors render/integrator.py's render_beauty contract (same RNG modes,
chunk-carry state, tile offsets for sharding) but runs each sample pass
as ONE Pallas kernel instead of an XLA wavefront loop of many trace
dispatches. Ray generation, per-pixel seeding and the jitter draws stay
outside (cheap XLA, and they keep the per-lane PCG stream position
identical to the wavefront engine), so both engines consume the same
decision streams; images differ only by float-associativity noise.

Lanes are permuted into 32x32 pixel tiles so each 1024-lane kernel block
traces a compact, direction-coherent pixel footprint (replaces the
wavefront engine's per-bounce Morton re-sort — inside one kernel, block
residency is fixed, so coherence is decided once at ray generation).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.megakernel import pack_media, pack_misc, trace_paths_mega
from ..kernels.pallas_trace import DeviceClusterGrid
from ..ops import rng as rng_ops
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
):
    """Render an (H, W, 3) tile of the beauty pass with the megakernel.

    Same interface/semantics as integrator.render_beauty (see its
    docstring for the chunk/shard contract); ``rng_state`` is carried in
    row-major pixel order.
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

    perm, inv = _tile_perm(width, height)
    perm = jnp.asarray(perm)
    inv = jnp.asarray(inv)
    pixel_xy_t = jnp.take(pixel_xy, perm, axis=0)
    linear_t = jnp.take(linear, perm, axis=0)

    media9 = pack_media(scene.media, scene.scale)
    misc = pack_misc(lights)

    def one_sample(carry, sample_idx):
        rng_state, acc = carry
        if rng_mode == "counter":
            rng_state = rng_ops.seed_counter(
                linear_t, sample_idx + jnp.asarray(sample_offset, jnp.uint32)
            )
        rng_state, j1 = rng_ops.next_float(rng_state)
        rng_state, j2 = rng_ops.next_float(rng_state)
        jitter = jnp.stack([j1, j2], axis=-1)
        org, direction = generate_rays(
            camera, pixel_xy_t, jitter, (full_w, full_h)
        )
        rad, rng_out = trace_paths_mega(
            grid,
            media9,
            misc,
            org,
            direction,
            rng_state,
            background=scene.background,
            max_depth=max_depth,
            rr_depth=rr_depth,
            nee_max_media=nee_max_media,
            tir_kill=(tir == "kill"),
        )
        return (rng_out, acc + rad), None

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
