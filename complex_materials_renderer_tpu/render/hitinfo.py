"""Hit-information derivation: position, geometric normal, material id,
medium lookup, and the procedural surface color.

Re-derivation of reference getObjectHitInfo (volpath.comp.glsl:119-229):
- barycentric world position (the reference's object-to-world transform is
  the identity, model.cpp:136);
- geometric normal from the un-normalized edge cross product, normalized
  (volpath:184-196);
- base color 0.8 grey (volpath:198), overridden by a checkerboard on the
  floor-parity of x/y for background 1 (volpath:200-212) or Cornell paint
  by the normal's +-x alignment for background 2 (volpath:213-226).
"""

from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp

from ..ops.medium import MediaTable


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["v0", "v1", "v2", "mat_ids", "media", "scale", "world_lo", "world_hi"],
    meta_fields=["background"],
)
@dataclasses.dataclass(frozen=True)
class SceneArrays:
    """Device-resident scene tables used by hit shading.

    ``background`` is pytree metadata (static under jit) — it selects the
    procedural shading branch at trace time like the reference's
    pcBackgroundSelect push constant selects shader branches.
    ``world_lo``/``world_hi`` bound the scene for the integrator's ray
    coherence sort.
    """

    v0: jnp.ndarray  # (T, 3) triangle vertices in ORIGINAL order
    v1: jnp.ndarray
    v2: jnp.ndarray
    mat_ids: jnp.ndarray  # (T,) int32
    media: MediaTable
    scale: jnp.ndarray  # scalar float32
    world_lo: jnp.ndarray  # (3,)
    world_hi: jnp.ndarray  # (3,)
    background: int  # static: 0 none, 1 checkerboard, 2 cornell


def make_scene_arrays(triangles, mat_ids, media: MediaTable, scale, background: int) -> SceneArrays:
    """Assemble device scene tables from host arrays."""
    t = jnp.asarray(triangles, jnp.float32)
    import numpy as np

    host = np.asarray(triangles, np.float32)
    lo = host.min(axis=(0, 1))
    hi = host.max(axis=(0, 1))
    return SceneArrays(
        v0=t[:, 0],
        v1=t[:, 1],
        v2=t[:, 2],
        mat_ids=jnp.asarray(mat_ids),
        media=MediaTable(*(jnp.asarray(a) for a in media)),
        scale=jnp.float32(scale),
        world_lo=jnp.asarray(lo),
        world_hi=jnp.asarray(hi),
        background=int(background),
    )


def shade_color(position, normal, background: int):
    """Procedural base color (volpath:198-226). ``background`` is static."""
    r = position.shape[0]
    base = jnp.full((r, 3), 0.8, jnp.float32)
    if background == 1:
        fx = jnp.floor(position[:, 0])
        fy = jnp.floor(position[:, 1])
        even = (jnp.mod(fx, 2.0) == 0.0) == (jnp.mod(fy, 2.0) == 0.0)
        color = jnp.where(even[:, None], 0.8, 0.3) * jnp.ones((r, 3), jnp.float32)
        return color
    if background == 2:
        dot_x = normal[:, 0]
        red = jnp.broadcast_to(jnp.array([0.8, 0.0, 0.0], jnp.float32), (r, 3))
        green = jnp.broadcast_to(jnp.array([0.0, 0.8, 0.0], jnp.float32), (r, 3))
        color = jnp.where(
            (dot_x > 0.99)[:, None], red, jnp.where((dot_x < -0.99)[:, None], green, base)
        )
        return color
    return base
