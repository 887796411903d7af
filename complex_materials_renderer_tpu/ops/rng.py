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

``ld`` mode is the variance-reduction sampler: per-pixel Owen-scrambled
Sobol' sampling (the sampler class of production renderers; Burley,
"Practical Hash-based Owen Scrambling", JCGT 2020). The d-th draw of
pixel p, sample s is Sobol' dimension d of index s, Owen-scrambled by a
hash keyed on (p, d):

- every (pixel, dimension) projection over the pixel's samples is a
  scrambled (0,1)-sequence — stratified for any prefix, fully stratified
  at powers of two — which is where the variance reduction comes from;
- JOINT uniformity across dimensions comes from the Sobol' direction
  matrices themselves (extracted once from torch's Joe-Kuo table). This
  matters: padding a single radical inverse with per-dimension scrambles
  was measured here to leave 0.7-0.9 cross-dimension correlation (the
  Laine-Karras hash mixes low index bits weakly), which would corrupt
  every 2D warp (phase/diffuse direction sampling) and bias the render;
  distinct direction matrices remove that structurally.
- the Owen scramble (nested uniform scramble in the bit-reversed
  domain) decorrelates pixels and keeps the estimator unbiased in
  expectation over the per-(pixel, dim) keys.

Dimension assignment is LOCKSTEP: ``next_float`` advances the dimension
counter on EVERY call (masked or not), so all lanes sit at the same
dimension at every draw site — each lane consumes a sparse, strictly
increasing subset of the dimension grid, and equal decision prefixes
across samples map to equal dimensions. (This also keeps the dimension a
traced SCALAR, so kernels can fetch direction-matrix rows without
per-lane gathers.) Same estimand as ``counter``; order-independent and
shard-safe like ``counter``.

LD state is (R, 3) uint32 rows ``[sample_index, pixel_hash, dim]``;
``next_float``/``next_float_masked`` dispatch on state rank so all call
sites work for every mode.
"""

from __future__ import annotations

import jax
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
    Rank-2 states dispatch to the ``ld`` sampler (see module docstring).
    """
    if state.ndim == 2:
        return _next_float_ld(state)
    state = step(state)
    word = _output(state)
    return state, word.astype(jnp.float32) * _INV_U32


def next_float_masked(state: jnp.ndarray, mask: jnp.ndarray):
    """Draw only on lanes where ``mask`` is True.

    PCG modes: lanes outside the mask keep their state (their stream
    position is unchanged), so per-lane draw order matches the
    reference's divergent control flow exactly.

    ``ld`` mode: the dimension counter advances on EVERY lane regardless
    of the mask — draw sites are lockstep dimensions (module docstring),
    and a masked-out lane simply never uses the value. The mask is
    accepted (and ignored) so call sites stay mode-agnostic.
    """
    new_state, value = next_float(state)
    if state.ndim == 2:
        return new_state, value
    return jnp.where(mask, new_state, state), value


def seed_from_pixel(pixel_linear_index: jnp.ndarray) -> jnp.ndarray:
    """Reference seeding: rngState = width*y + x (volpath:575)."""
    return pixel_linear_index.astype(jnp.uint32)


def _reverse_bits32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-reverse each uint32 lane (5 swap stages)."""
    x = ((x & jnp.uint32(0x55555555)) << jnp.uint32(1)) | (
        (x >> jnp.uint32(1)) & jnp.uint32(0x55555555)
    )
    x = ((x & jnp.uint32(0x33333333)) << jnp.uint32(2)) | (
        (x >> jnp.uint32(2)) & jnp.uint32(0x33333333)
    )
    x = ((x & jnp.uint32(0x0F0F0F0F)) << jnp.uint32(4)) | (
        (x >> jnp.uint32(4)) & jnp.uint32(0x0F0F0F0F)
    )
    x = ((x & jnp.uint32(0x00FF00FF)) << jnp.uint32(8)) | (
        (x >> jnp.uint32(8)) & jnp.uint32(0x00FF00FF)
    )
    return (x << jnp.uint32(16)) | (x >> jnp.uint32(16))


def _lk_hash(x: jnp.ndarray, seed: jnp.ndarray) -> jnp.ndarray:
    """Laine-Karras-style hash: a random permutation of uint32 in which
    bit i depends only on bits <= i (plus the seed) — exactly the class
    of permutations that implements Owen scrambling when applied in the
    bit-REVERSED domain (Burley 2020, listing 3). Operating on the raw
    sample index (== the bit-reversed first-dimension Sobol value), its
    bit-reversed output is an Owen-scrambled radical inverse.

    Constants are Burley's improved variant (JCGT 2020 §3.3): every
    ``x ^= x * c`` multiplier is EVEN (so each stage is an invertible
    upper-triangular map over GF(2) — bit i depends only on bits <= i),
    ``+ seed``/"* odd" likewise only carry information upward."""
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> jnp.uint32(16)) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


SOBOL_DIMS = 1024  # >= 2 camera dims + 8 draw sites x 32 bounces; the
# slack absorbs over-scheduled phases advancing the dim base past the
# point where any lane can still be alive (megarender static schedules
# keep calling capped kernels on mostly-dead wavefronts)
_SOBOL_BITS = 30  # torch's Joe-Kuo table resolution (plenty for f32)
_sobol_mat = None


def sobol_matrices() -> np.ndarray:
    """(SOBOL_DIMS, 30) uint32 direction numbers, top-aligned to 32 bits.

    Extracted once from torch.quasirandom.SobolEngine (the Joe-Kuo D6
    table, CPU-only, no torch tensors escape). v(s, d) = XOR of column j
    for every set bit j of s; dimension 0 is the plain radical inverse."""
    global _sobol_mat
    if _sobol_mat is None:
        import torch

        st = torch.quasirandom.SobolEngine(dimension=SOBOL_DIMS).sobolstate
        _sobol_mat = (st.numpy().astype(np.uint32)) << np.uint32(2)
    return _sobol_mat


def _next_float_ld(state: jnp.ndarray):
    """One Owen-scrambled Sobol draw. ``state`` rows are
    ``[sample_index, pixel_hash, dim]``; all lanes share the dim (see
    module docstring), so the direction row is a scalar dynamic slice."""
    s, ph, d = state[:, 0], state[:, 1], state[:, 2]
    mat = jnp.asarray(sobol_matrices())
    # Lanes advance dims in lockstep; reduce to a scalar for the row
    # fetch (max over a padded/compacted batch is safe: every lane holds
    # the same value by construction).
    d_row = jnp.max(d) % jnp.uint32(SOBOL_DIMS)
    row = jax.lax.dynamic_slice(mat, (d_row.astype(jnp.int32), 0),
                                (1, _SOBOL_BITS))[0]
    v = jnp.zeros_like(s)
    for j in range(_SOBOL_BITS):
        bit = (s >> jnp.uint32(j)) & jnp.uint32(1)
        v = v ^ jnp.where(bit != 0, row[j], jnp.uint32(0))
    # Owen scramble = LK hash in the bit-reversed (tree) domain, keyed
    # per (pixel, dim).
    key = _output(step(ph ^ (d * jnp.uint32(0x9E3779B9))))
    word = _reverse_bits32(_lk_hash(_reverse_bits32(v), key))
    value = word.astype(jnp.float32) * _INV_U32
    new_state = jnp.stack([s, ph, d + jnp.uint32(1)], axis=-1)
    return new_state, value


def seed_ld(pixel_linear_index: jnp.ndarray, sample_index) -> jnp.ndarray:
    """Fresh ld-mode state at dimension 0 for each (pixel, sample) lane.

    The stored sample index is OWEN-SHUFFLED by a per-pixel key (the LK
    hash applied in the bit-REVERSED index domain): bit i of the
    shuffled index depends only on bits >= i, so the first 2^k samples
    of any pixel map exactly onto an ALIGNED DYADIC BLOCK of indices
    visited in a per-pixel order — and any aligned dyadic block of a
    (t,s)-sequence is a (t,m,s)-net, so per-pixel stratification is
    preserved exactly. The shuffle must be this nonlinear permutation,
    not a plain XOR: Sobol evaluation is GF(2)-LINEAR in the index, so
    ``sobol(s ^ c) = sobol(s) ^ sobol(c)`` and an XOR offset leaves all
    pixels sharing one value sequence up to constants (measured:
    same-dim cross-pixel correlation 0.56-0.89 under XOR, ~0 under the
    Owen shuffle — the LK hash's ``+key``/``*odd`` stages carry
    information across bits, breaking the linearity)."""
    p = pixel_linear_index.astype(jnp.uint32)
    ph = _output(step(p * jnp.uint32(0x9E3779B9) + jnp.uint32(1)))
    shuffle = _output(step(p * jnp.uint32(0x85EBCA6B) + jnp.uint32(2)))
    s = jnp.broadcast_to(
        jnp.asarray(sample_index, jnp.uint32), p.shape
    ).astype(jnp.uint32)
    s = _reverse_bits32(_lk_hash(_reverse_bits32(s), shuffle))
    return jnp.stack([s, ph, jnp.zeros_like(p)], axis=-1)


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
