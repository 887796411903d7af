"""Counter/stream random number generation.

``parity`` mode reimplements the reference's PCG32 RXS-M-XS hash stream
(reference volpath.comp.glsl:231-246: LCG step ``*747796405+1`` then the
RXS-M-XS output permutation) as per-lane uint32 state. Each wavefront lane
owns one (pixel, sample) path and consumes its stream sequentially, exactly
like one GPU thread in the reference; masked draws keep streams aligned
across divergent branches.

``counter`` mode seeds each (pixel, sample) lane independently via a hash,
which is what order-independent sample-parallel rendering on a sharded
mesh requires (reference seeds per pixel only, volpath:575).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalars: module-level jnp constants would initialize
# the XLA backend at import time, which breaks multi-host programs that
# must import libraries before jax.distributed.initialize().
_MULT = np.uint32(747796405)
_INC = np.uint32(1)
_OUT_MULT = np.uint32(277803737)
# float(0xFFFFFFFF) rounds to 2^32 in fp32, same as the GLSL literal.
_INV_U32 = np.float32(1.0) / np.float32(4294967295.0)


def step(state: jnp.ndarray) -> jnp.ndarray:
    """One LCG step of the pcg32i stream (volpath:233-236)."""
    return state * _MULT + _INC


def _output(state: jnp.ndarray) -> jnp.ndarray:
    """RXS-M-XS output permutation (volpath:239-246)."""
    shift = (state >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((state >> shift) ^ state) * _OUT_MULT
    return (word >> jnp.uint32(22)) ^ word


def next_float(state: jnp.ndarray):
    """Step the stream and return (new_state, uniform float32 in [0, 1]).

    Matches stepAndOutputRNGFloat (volpath:239-246) bit-for-bit in the
    integer domain; the float conversion uses the same fp32 constant.
    """
    state = step(state)
    word = _output(state)
    return state, word.astype(jnp.float32) * _INV_U32


def next_float_masked(state: jnp.ndarray, mask: jnp.ndarray):
    """Draw only on lanes where ``mask`` is True.

    Lanes outside the mask keep their state (their stream position is
    unchanged), so per-lane draw order matches the reference's divergent
    control flow exactly.
    """
    new_state, value = next_float(state)
    return jnp.where(mask, new_state, state), value


def seed_from_pixel(pixel_linear_index: jnp.ndarray) -> jnp.ndarray:
    """Reference seeding: rngState = width*y + x (volpath:575)."""
    return pixel_linear_index.astype(jnp.uint32)


def seed_counter(pixel_linear_index: jnp.ndarray, sample_index) -> jnp.ndarray:
    """Order-independent per-(pixel, sample) seed for sample-parallel mode.

    Decorrelates lanes by pushing (pixel, sample) through two rounds of the
    same PCG output hash; any good integer hash works, this one keeps the
    module self-contained.
    """
    s = pixel_linear_index.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
    s = s + jnp.asarray(sample_index, jnp.uint32) * jnp.uint32(0x85EBCA6B) + jnp.uint32(1)
    s = _output(step(s))
    s = _output(step(s))
    return s
