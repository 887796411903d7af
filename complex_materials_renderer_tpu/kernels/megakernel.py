"""Single-kernel wavefront path tracer — the TPU fast path.

Round 1 ran the bounce loop in XLA with ~10 ``pallas_call`` trace
dispatches per bounce (main + distance + 2x4 NEE march segments), paying
a fixed ~18us per ray block per dispatch plus compaction-sort glue
between bounces; that fixed cost dominated the profile (NOTES.md). This
kernel fuses the ENTIRE per-sample path loop — traversal, medium physics,
Fresnel boundaries, free-flight sampling, HG scattering, the NEE march,
diffuse shading, russian roulette, and the PCG32 RNG itself — into one
``pallas_call`` per sample pass, mirroring the reference's GLSL
megakernel structure (volpath.comp.glsl:564-805) but vectorized over
1024-ray blocks instead of one thread per pixel.

Structure:
- grid=(1,): all ray/RNG arrays live in VMEM; an outer ``fori_loop``
  walks 1024-lane blocks (one (8, 128) register tile per quantity), so a
  "block dispatch" costs a loop iteration, not a pipeline step.
- per block, a ``while_loop`` advances the bounce state machine until
  every lane dies — a block whose paths all terminate early exits early
  (the round-1 two-phase-tail trick is unnecessary).
- traversal is a LINEAR CULLED walk: supers and clusters in tree order,
  each gated by a scalar slab test against the per-lane bound (walks are
  additionally clamped to the scene-box exit, and the dist walk to the
  free-flight candidate). This replaces the driver's hardware traversal
  (reference main.cpp:180-182, volpath:612-627); a nearest-first ordered
  walk exists as the CMR_MEGA_DEBUG=ordered ablation but measured slower
  (its scalar selection machinery exceeds what early exit saves).
- the NEE march through media boundaries (volpath:337-426) is ONE
  multi-hit traversal (sorted insertion of the K nearest boundaries per
  triangle hit) followed by a static unrolled march over the hit list —
  instead of 2x4 chained per-leg ``pallas_call``s.
- PCG32 (LCG * 747796405 + 1, RXS-M-XS output — volpath:231-246) is
  evaluated in-kernel on uint32 lanes; the uint->float conversion uses
  an exact hi/lo 16-bit split (Mosaic lacks the direct cast) that is
  bit-identical to XLA's single-rounding convert, so per-lane streams
  match ops/rng.py exactly in the integer domain.

Physics semantics (including every documented reference quirk: stale
second-boundary normal, NEE phase at outDir=0, local-frame diffuse
direction, 0.9 per-boundary shadow fudge, min-density/max-albedo
free-flight) are transcribed from render/integrator.py, which remains
the portable/XLA reference implementation; see that module for the
volpath line map. RNG draw masks and order are identical, so both
engines sample the same per-lane decision streams.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.clusters import SUPER_FACTOR
from .cluster_test import (
    make_cluster_tester,
    nee_list_len,
    nee_unpack_mat,
    nee_unpack_t,
    payload_bound,
    payload_state0,
)
from .pallas_trace import DeviceClusterGrid

BLOCK = 1024  # lanes per (8, 128) register tile
_INF = np.float32(3e38)

# PCG32 constants (volpath:233-246; ops/rng.py). numpy scalars, not jnp:
# jnp scalars are traced arrays and would be captured as kernel constants.
_MULT = np.uint32(747796405)
_INC = np.uint32(1)
_OUT_MULT = np.uint32(277803737)
_INV_U32 = np.float32(np.float32(1.0) / np.float32(4294967295.0))

INV_FOURPI = np.float32(0.07957747154594767)
LN_CLAMP = np.float32(9.210340371976184)  # ln(1e4): the <1e-4 transmittance clamp depth (ops/medium.py)
INV_PI = np.float32(0.31830988618)
PI = np.float32(3.14159265359)
TWOPI = np.float32(6.28318530718)
REFLECTANCE = np.float32(0.8)
NO_INTERACTION = np.float32(500000.0)
_ISO_EPS = 1e-4


def _u32_to_f32(word):
    """Exact uint32 -> float32 (value) conversion.

    hi*65536 is exact in f32, lo is exact, and the final add rounds once:
    bit-identical to XLA's round-to-nearest uint32->f32 convert, which
    ops/rng.py relies on for reference parity.
    """
    hi = pltpu.bitcast(word >> jnp.uint32(16), jnp.int32).astype(jnp.float32)
    lo = pltpu.bitcast(word & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    return hi * jnp.float32(65536.0) + lo


def _rng_next(state, mask):
    """Masked PCG32 draw: lanes outside ``mask`` keep their stream position
    (ops/rng.py next_float_masked)."""
    ns = state * _MULT + _INC
    shift = (ns >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((ns >> shift) ^ ns) * _OUT_MULT
    word = (word >> jnp.uint32(22)) ^ word
    value = _u32_to_f32(word) * _INV_U32
    return jnp.where(mask, ns, state), value


# --- ld mode: Owen-scrambled Sobol draws (ops/rng.py, same constructions
# bit-for-bit; see its module docstring for the sampler design) ---

_GOLD = np.uint32(0x9E3779B9)
DRAWS_PER_BOUNCE = 8  # rng draw sites per bounce iteration (sites 0-7)


def _pcg_hash(x):
    """One PCG step+output as a hash (ops/rng.py _output(step(x)))."""
    ns = x * _MULT + _INC
    shift = (ns >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((ns >> shift) ^ ns) * _OUT_MULT
    return (word >> jnp.uint32(22)) ^ word


def _reverse_bits32(x):
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


def _lk_hash(x, seed):
    """Owen-class permutation (ops/rng.py _lk_hash, Burley JCGT 2020)."""
    x = x ^ (x * jnp.uint32(0x3D20ADEA))
    x = x + seed
    x = x * ((seed >> jnp.uint32(16)) | jnp.uint32(1))
    x = x ^ (x * jnp.uint32(0x05526C56))
    x = x ^ (x * jnp.uint32(0x53A22864))
    return x


def _norm3(x, y, z):
    n = jnp.sqrt(x * x + y * y + z * z)
    inv = 1.0 / jnp.maximum(n, 1e-20)
    return x * inv, y * inv, z * inv


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _max3(a, b, c):
    return jnp.maximum(a, jnp.maximum(b, c))


def _min3(a, b, c):
    return jnp.minimum(a, jnp.minimum(b, c))


def _safe_inv(v):
    tiny = jnp.float32(1e-12)
    return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)


def _fresnel_r(n1, n2, dx, dy, dz, nx, ny, nz):
    """Full rs/rp Fresnel (ops/fresnel.py fresnel_r, volpath:321-334).

    Trig-free: Mosaic lacks acos/asin lowerings, so sin(theta1) =
    sqrt(1 - cos1^2) and cos(theta2) = sqrt(1 - sin_t2^2) — algebraically
    identical to the reference's acos/asin round trip. Directions must be
    normalized. Returns (r, tir)."""
    cos1 = jnp.clip(jnp.abs(_dot3(dx, dy, dz, nx, ny, nz)), 0.0, 1.0)
    sin1 = jnp.sqrt(jnp.maximum(1.0 - cos1 * cos1, 0.0))
    sin_t2 = n1 / n2 * sin1
    tir = sin_t2 >= 1.0
    s2 = jnp.clip(sin_t2, -1.0, 1.0)
    c2 = jnp.sqrt(jnp.maximum(1.0 - s2 * s2, 0.0))
    c1 = cos1
    rs = (n1 * c1 - n2 * c2) / (n1 * c1 + n2 * c2)
    rp = (n1 * c2 - n2 * c1) / (n1 * c2 + n2 * c1)
    r = (rs * rs + rp * rp) * 0.5
    return jnp.where(tir, 0.0, r), tir


def _boundary_event(dx, dy, dz, nx, ny, nz, ior):
    """Componentwise transcription of integrator._boundary_event
    (volpath:635-667/:723-753). Returns reflected dir, transmitted dir
    (reflection under TIR), reflectance, tir mask."""
    d_dot_n = _dot3(dx, dy, dz, nx, ny, nz)
    going_out = d_dot_n > 0.0
    one = jnp.ones_like(ior)
    from_ior = jnp.where(going_out, ior, one)
    to_ior = jnp.where(going_out, one, ior)

    # refract (ops/fresnel.py refract, volpath:550-562)
    eta = from_ior / to_ior
    cos_i = -d_dot_n
    sin2_t = eta * eta * (1.0 - cos_i * cos_i)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
    k = eta * cos_i - cos_t
    fx = eta * dx + k * nx
    fy = eta * dy + k * ny
    fz = eta * dz + k * nz
    # placeholder normal under TIR, then normalize (integrator parity)
    fx = jnp.where(tir, nx, fx)
    fy = jnp.where(tir, ny, fy)
    fz = jnp.where(tir, nz, fz)
    fx, fy, fz = _norm3(fx, fy, fz)

    # reflect (volpath:545-548)
    two_d = 2.0 * d_dot_n
    rx, ry, rz = _norm3(dx - two_d * nx, dy - two_d * ny, dz - two_d * nz)

    r, _ = _fresnel_r(from_ior, to_ior, dx, dy, dz, nx, ny, nz)

    tx = jnp.where(tir, rx, fx)
    ty = jnp.where(tir, ry, fy)
    tz = jnp.where(tir, rz, fz)
    return rx, ry, rz, tx, ty, tz, r, tir


def _free_flight_candidate(rand, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b):
    """The segment-length-independent half of free-flight sampling: the
    exponential candidate collision distance (NO_INTERACTION when the
    single-scatter draw declines). Exactly the ``sampled`` value of
    _sample_distance — callers may use it to BOUND the boundary trace,
    since success only compares ``sampled < dist``."""
    er = ss_r + sa_r
    eg = ss_g + sa_g
    eb = ss_b + sa_b
    density = _min3(er, eg, eb)

    def albedo(ss, ext):
        return jnp.where(ext > 0.0, ss / jnp.maximum(ext, 1e-30), -1.0)

    weight = _max3(albedo(ss_r, er), albedo(ss_g, eg), albedo(ss_b, eb))
    weight = jnp.maximum(weight, -1.0)
    weight = jnp.where(weight > 0.0, jnp.maximum(weight, 0.5), weight)

    draw = rand < weight
    r_scaled = jnp.where(draw, rand / jnp.where(draw, weight, 1.0), 0.0)
    exp_sample = -jnp.log(jnp.maximum(1.0 - r_scaled, 1e-37)) / jnp.maximum(
        density, 1e-30
    )
    return jnp.where(draw & (density > 0.0), exp_sample, NO_INTERACTION)


def _sample_distance(rand, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b, dist):
    """Free-flight sampling (ops/medium.py sample_distance, volpath:482-543).
    Returns (success, t, prob_fail, prob_success, tr_r, tr_g, tr_b)."""
    er = ss_r + sa_r
    eg = ss_g + sa_g
    eb = ss_b + sa_b
    density = _min3(er, eg, eb)

    def albedo(ss, ext):
        return jnp.where(ext > 0.0, ss / jnp.maximum(ext, 1e-30), -1.0)

    weight = _max3(albedo(ss_r, er), albedo(ss_g, eg), albedo(ss_b, eb))
    weight = jnp.maximum(weight, -1.0)
    weight = jnp.where(weight > 0.0, jnp.maximum(weight, 0.5), weight)

    draw = rand < weight
    sampled = _free_flight_candidate(rand, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b)

    success = sampled < dist
    t = jnp.where(success, sampled, dist)

    pf0 = jnp.exp(-density * t)
    prob_success = density * pf0 * weight
    prob_fail = weight * pf0 + (1.0 - weight)

    tr_r = jnp.exp(-er * t)
    tr_g = jnp.exp(-eg * t)
    tr_b = jnp.exp(-eb * t)
    zero = _max3(tr_r, tr_g, tr_b) < 1e-4
    tr_r = jnp.where(zero, 0.0, tr_r)
    tr_g = jnp.where(zero, 0.0, tr_g)
    tr_b = jnp.where(zero, 0.0, tr_b)
    return success, t, prob_fail, prob_success, tr_r, tr_g, tr_b


def _hg_sample(ix, iy, iz, g, r1, r2):
    """HG direction sampling (ops/phase.py hg_sample, volpath:444-479).
    ``i`` is the direction toward the collision (-ray dir)."""
    safe_g = jnp.where(jnp.abs(g) < _ISO_EPS, 1.0, g)
    tmp = (1.0 - g * g) / (1.0 - g + 2.0 * g * r1)
    cos_aniso = (1.0 + g * g - tmp * tmp) / (2.0 * safe_g)
    cos_iso = 1.0 - 2.0 * r1
    cos_theta = jnp.where(jnp.abs(g) < _ISO_EPS, cos_iso, cos_aniso)

    sin_theta = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_theta * cos_theta))
    phi = TWOPI * r2
    lx = sin_theta * jnp.cos(phi)
    ly = sin_theta * jnp.sin(phi)
    lz = cos_theta

    # frame off normal = -inDir (volpath:461-472)
    nx, ny, nz = -ix, -iy, -iz
    use_x = jnp.abs(nx) > jnp.abs(ny)
    inv_a = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + nz * nz, 1e-20))
    inv_b = 1.0 / jnp.sqrt(jnp.maximum(ny * ny + nz * nz, 1e-20))
    tax, tay, taz = nz * inv_a, jnp.zeros_like(nx), -nx * inv_a
    tbx, tby, tbz = jnp.zeros_like(nx), nz * inv_b, -ny * inv_b
    tx = jnp.where(use_x, tax, tbx)
    ty = jnp.where(use_x, tay, tby)
    tz = jnp.where(use_x, taz, tbz)
    # s = cross(t, normal)
    sx = ty * nz - tz * ny
    sy = tz * nx - tx * nz
    sz = tx * ny - ty * nx
    ox = sx * lx + tx * ly + nx * lz
    oy = sy * lx + ty * ly + ny * lz
    oz = sz * lx + tz * ly + nz * lz
    return ox, oy, oz


def _concentric_disk(r1, r2):
    """Concentric square-to-disk map (ops/diffuse.py, volpath:272-297)."""
    u = 2.0 * r1 - 1.0
    v = 2.0 * r2 - 1.0
    zero = (u == 0.0) & (v == 0.0)
    use_u = u * u > v * v
    r = jnp.where(use_u, u, v)
    phi = jnp.where(
        use_u,
        (PI / 4.0) * (v / jnp.where(use_u, u, 1.0)),
        (PI / 2.0)
        - (u / jnp.where(use_u, 1.0, jnp.where(v == 0.0, 1.0, v))) * (PI / 4.0),
    )
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _make_kernel(
    C: int,
    S: int,
    width: int,
    subs: int,
    run: int,
    M: int,
    num_blocks: int,
    background: int,
    max_depth: int,
    rr_depth: int,
    nee_max_media: int,
    tir_kill: bool,
    t_min: float,
    t_max: float,
    max_iters: int,
    S_OPQ: int = 0,
    debug: str = "",
    SF: int = SUPER_FACTOR,
    analytic_direct: bool = False,
    ld: bool = False,
):
    """Build the megakernel body. All sizes static.

    ``ld``: draw randoms from the Owen-scrambled Sobol sampler instead
    of the per-lane PCG stream (ops/rng.py 'ld' mode). The rng tile then
    carries the owen-shuffled SAMPLE INDEX (constant), the aux tile the
    per-lane pixel hash, and the dimension is the lockstep draw-site
    counter ``dim0 + iteration*DRAWS_PER_BOUNCE + site`` — a traced
    SCALAR, so direction rows come from SMEM without per-lane gathers.

    ``max_iters`` caps the per-block bounce loop: each block advances its
    lanes at most that many bounce iterations (or until all die). The
    full path state streams in and out, so the caller can compact the
    wavefront between capped kernel invocations (render/megarender.py's
    phase schedule) — in-kernel cross-block compaction would need
    dynamic lane scatters Mosaic doesn't have.

    ``subs``/``run``: runs per cluster and triangles per run of the
    run-major triangle table (pallas_trace.device_cluster_grid). The
    inner triangle loop walks a TRACED contiguous run range instead of
    statically unrolling the whole cluster — see test_cluster.
    """
    t_min = np.float32(t_min)
    t_max_f = np.float32(t_max)
    # Fused dist+NEE walk (DEFAULT; CMR_MEGA_DEBUG token 'nofuse' for
    # the separate-walks ablation): collapses the per-bounce dist trace
    # + occlusion walk + NEE sweep into ONE 'dnee' traversal from the
    # shared hit-point origin. Requires the scratch-ref walk (not the
    # ordered/carrywalk ablations) and both traces enabled.
    _dbg_tokens = set(debug.split(","))
    fused = not (
        {"nofuse", "ordered", "carrywalk", "nonee", "nodist"} & _dbg_tokens
    )

    def kernel(
        cb_ref,  # SMEM (C, 8) cluster AABBs
        sb_ref,  # SMEM (S, 8) super AABBs
        media_ref,  # SMEM (max(M,1), 9): matid, ss rgb (scaled), sa rgb (scaled), g_mean, ior
        misc_ref,  # SMEM (16,): light pos/intensity, pads, scene AABB lo/hi
        lb_ref,  # SMEM (1,) int32: number of leading blocks to process
        dim_ref,  # SMEM (1,) int32: ld-mode dimension base (0 when not ld)
        sob_ref,  # SMEM (max_iters*8 | 1, 30) int32 Sobol direction rows
        runs_ref,  # VMEM (C*subs, row_w) run-major triangle rows
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # VMEM (B*8, 128)
        th_r_ref, th_g_ref, th_b_ref,  # VMEM throughput
        ra_r_ref, ra_g_ref, ra_b_ref,  # VMEM radiance
        rng_ref,  # VMEM (B*8, 128) uint32 (ld: owen-shuffled sample index)
        depth_ref,  # VMEM int32
        alive_ref,  # VMEM int32 (0/1)
        aux_ref,  # VMEM uint32: ld-mode pixel hash (constant; zeros otherwise)
        ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,  # VMEM out: ray state
        th_r_o, th_g_o, th_b_o,  # VMEM out
        rad_r_ref, rad_g_ref, rad_b_ref,  # VMEM out
        rng_out_ref,  # VMEM out uint32
        depth_o,  # VMEM out int32
        alive_o,  # VMEM out int32
        *scratch,  # VMEM (8,128) traversal-state tiles: 11 f32 + K_NEE i32
    ):
        # Scratch-ref walk state pool (see traverse): the 'full' payload
        # borrows the 11 f32 tiles, 'dist'/'occl' the first 2/1, 'nee'
        # the K_NEE i32 tiles + f32 tile 0 for t_opq. Sequential
        # traversals reuse the pool (each re-initializes it).
        sc_f32 = scratch[:11]
        sc_i32 = scratch[11:]
        # Entry tables for the ordered traversal live in vector registers
        # ((8,128) holds up to 1024 supers), updated by iota-mask selects:
        # dynamic-index SMEM *writes* crash the Mosaic compiler, and the
        # vector form costs ~1 op per update anyway.
        flat_iota = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        )

        def pick_min(entries):
            """(value, index) of the smallest entry; ties -> lowest index."""
            e = jnp.min(entries)
            idx = jnp.min(
                jnp.where(entries == e, flat_iota, jnp.int32(1 << 30))
            )
            return e, idx

        lx = misc_ref[0]
        ly = misc_ref[1]
        lz = misc_ref[2]
        lir = misc_ref[3]
        lig = misc_ref[4]
        lib = misc_ref[5]
        # Loop-invariant media mat-ids (scalars) for the NEE sweep's
        # per-triangle opaque/media split; -1 rows never match.
        med_ids = [media_ref[mi, 0] for mi in range(M)]

        def slab_entry_scalars(
            bx0, by0, bz0, bx1, by1, bz1, OX, OY, OZ, IX, IY, IZ, TMAX
        ):
            """Min-over-lanes ray/AABB entry distance (scalar); _INF when no
            live lane's segment [t_min, TMAX] intersects the box."""
            s0 = (bx0 - OX) * IX
            s1 = (bx1 - OX) * IX
            tn = jnp.minimum(s0, s1)
            tf = jnp.maximum(s0, s1)
            s0 = (by0 - OY) * IY
            s1 = (by1 - OY) * IY
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
            s0 = (bz0 - OZ) * IZ
            s1 = (bz1 - OZ) * IZ
            tn = jnp.maximum(tn, jnp.minimum(s0, s1))
            tf = jnp.minimum(tf, jnp.maximum(s0, s1))
            tn = jnp.maximum(tn, t_min)
            tf = jnp.minimum(tf, TMAX)
            return jnp.min(jnp.where(tn <= tf, tn, _INF))

        def slab_entry_min(ref, idx, OX, OY, OZ, IX, IY, IZ, TMAX):
            return slab_entry_scalars(
                ref[idx, 0], ref[idx, 1], ref[idx, 2],
                ref[idx, 3], ref[idx, 4], ref[idx, 5],
                OX, OY, OZ, IX, IY, IZ, TMAX,
            )

        # Tracked hits in the NEE multi-hit sweep: enter+exit per media
        # pair plus duplicate-absorbing spares (cluster_test.nee_list_len).
        K_NEE = nee_list_len(nee_max_media)

        def traverse(OX, OY, OZ, DX, DY, DZ, TMAX, payload: str,
                     s_lo: int = 0, s_hi: int | None = None,
                     DB=None, TMAXB=None):
            """Ordered early-terminating traversal over supers
            [``s_lo``, ``s_hi``) — the full scene by default; the NEE
            sweep passes the opaque/media sub-ranges of a partitioned
            grid.

            payload: 'full' -> closest hit (t, slot, u, v, nx, ny, nz,
                               mat, px, py, pz)
                     'nee'  -> K_NEE nearest MEDIA boundaries as packed
                               int32 keys (ascending [t-bits | mat],
                               cluster_test.nee_unpack_*) plus t_opq,
                               the nearest OPAQUE hit: ONE
                               sweep collects every boundary the shadow
                               march needs, replacing the reference's
                               chain of per-leg ray queries
                               (volpath:353-412) with a sorted insertion
                               per media-triangle hit. Opaque triangles
                               bypass the list (a per-leg query would
                               only ever surface the nearest one, which
                               occludes) and instead shrink t_opq —
                               which doubles as a closest-hit-style
                               early-termination bound for the walk:
                               min(t_opq, K-th tracked) is the live
                               bound, so opaque-heavy scenes cull like
                               a closest-hit trace instead of walking
                               everything toward the light.
                     'dist' -> closest hit (t, slot)
                     'occl' -> closest hit distance only (t,)
                     'dnee' -> ONE fused walk serving the distance trace
                               (set A: O/D/TMAX as usual) AND the NEE
                               boundary sweep (set B: directions ``DB``,
                               bound ``TMAXB``) from the SHARED origin
                               — returns (t, slot) + K_NEE keys + t_opq.
                               Each cluster is culled against the MIN of
                               the two sets' slab entries under their
                               own bounds; the fused triangle test
                               (cluster_test 'dnee') pays the scalar
                               extracts and the origin-only algebra
                               once for both. Scratch-walk only.
            t == per-lane TMAX on miss; slot/mat == -1. Dead lanes are
            encoded as TMAX <= t_min and never match.
            """
            if s_hi is None:
                s_hi = S
            IX, IY, IZ = _safe_inv(DX), _safe_inv(DY), _safe_inv(DZ)
            if payload == "dnee":
                assert "ordered" not in debug and "carrywalk" not in debug
                DXB, DYB, DZB = DB
                IXB = _safe_inv(DXB)
                IYB = _safe_inv(DYB)
                IZB = _safe_inv(DZB)

            if payload in ("full", "dist", "dnee"):
                # Clamp the walk bound to the scene-box exit: all geometry
                # lives inside it, so a lane that misses everything stops
                # forcing cluster visits at the box boundary instead of
                # carrying t_best = 1e4 along its whole ray. (The NEE
                # sweep's and occlusion walk's miss sentinels must stay
                # == the caller's eff, and their bound is already the
                # light distance — for 'dnee' the clamp applies to set A
                # only; set B's TMAXB stays the caller's eff.)
                def axis_exit(lo_i, hi_i, O, INV):
                    return jnp.maximum(
                        (misc_ref[lo_i] - O) * INV, (misc_ref[hi_i] - O) * INV
                    )

                tf = _min3(
                    axis_exit(8, 11, OX, IX),
                    axis_exit(9, 12, OY, IY),
                    axis_exit(10, 13, OZ, IZ),
                )
                TMAX = jnp.minimum(
                    TMAX, jnp.maximum(tf, 0.0) * 1.0001 + 10.0 * t_min
                )

            state0 = payload_state0(payload, TMAX, K_NEE, TMAX_B=TMAXB)

            def bound_of(state):
                """Early-exit bound (see cluster_test.payload_bound)."""
                return payload_bound(
                    payload, state, K_NEE, bitcast=pltpu.bitcast
                )

            tc = make_cluster_tester(
                runs_ref, subs, run, payload, K_NEE, med_ids, t_min,
                bitcast=pltpu.bitcast,
            )

            rays = (
                (OX, OY, OZ, DX, DY, DZ, DXB, DYB, DZB)
                if payload == "dnee"
                else (OX, OY, OZ, DX, DY, DZ)
            )

            def test_cluster(c, state):
                """Shared statically-unrolled 128-triangle cluster test
                (kernels/cluster_test.py — one source of truth for both
                the fused megakernel and the binned tracer)."""
                if "cullonly" in debug:
                    # Timing ablation: identity body — the walk keeps
                    # its full cull/cond scaffolding but skips the
                    # triangle arithmetic (see the bounce()'s cullonly
                    # fabrication).
                    return state
                return tc(c, rays, state)

            def visit_super(sp, state):
                lo = sp * SF

                def c_entry(k, entries):
                    c = lo + k
                    cc = jnp.minimum(c, C - 1)
                    e = slab_entry_min(cb_ref, cc, OX, OY, OZ, IX, IY, IZ,
                                       bound_of(state))
                    e = jnp.where(c < C, e, _INF)
                    return jnp.where(flat_iota == k, e, entries)

                centries = jax.lax.fori_loop(
                    0, SF, c_entry, jnp.full((8, 128), _INF)
                )

                def ccond(carry):
                    st, entries = carry
                    return jnp.min(entries) < jnp.max(bound_of(st))

                def cbody(carry):
                    st, entries = carry
                    _e, k = pick_min(entries)
                    entries = jnp.where(flat_iota == k, _INF, entries)
                    st = test_cluster(lo + k, st)
                    return st, entries

                state, _ = jax.lax.while_loop(ccond, cbody, (state, centries))
                return state

            if "ordered" not in debug and "carrywalk" not in debug:
                # DEFAULT: linear tree-order walk with the traversal state
                # in VMEM SCRATCH REFS instead of loop-carried registers.
                # A scalar lax.cond that carries the hit state costs ~500
                # cycles in phi/copy traffic regardless of which side runs
                # (measured: +7 per-run conds per visit = +4.6 ms/bounce,
                # NOTES round 3) — on small scenes the per-cluster cull
                # gates alone were ~40% of walk time. With state in refs,
                # the pl.when bodies mutate refs and the loops carry
                # NOTHING: a culled cluster costs just the slab test +
                # branch, and a visited one adds only the tile
                # loads/stores around the unrolled triangle test.
                if payload == "nee":
                    regs = sc_i32[:K_NEE] + (sc_f32[0],)
                elif payload == "dnee":
                    # (t, slot) f32 + K_NEE packed keys i32 + t_opq f32
                    regs = tuple(sc_f32[:2]) + tuple(sc_i32[:K_NEE]) + (
                        sc_f32[2],
                    )
                else:
                    regs = sc_f32[: len(state0)]
                for r, v in zip(regs, state0):
                    r[...] = v

                def bound_ref():
                    if payload == "nee":
                        kth = nee_unpack_t(
                            regs[K_NEE - 1][...], _INF, bitcast=pltpu.bitcast
                        )
                        return jnp.minimum(kth, regs[K_NEE][...])
                    return regs[0][...]

                def bound_ref_b():
                    """Set-B (NEE) bound of the fused 'dnee' walk."""
                    kth = nee_unpack_t(
                        regs[2 + K_NEE - 1][...], _INF, bitcast=pltpu.bitcast
                    )
                    return jnp.minimum(kth, regs[2 + K_NEE][...])

                def entry_min(ref, idx):
                    """Min slab entry over the walk's ray set(s): a
                    cluster survives the cull if EITHER set still needs
                    it under its own early-exit bound."""
                    e = slab_entry_min(ref, idx, OX, OY, OZ, IX, IY, IZ,
                                       bound_ref())
                    if payload == "dnee":
                        e = jnp.minimum(
                            e,
                            slab_entry_min(ref, idx, OX, OY, OZ,
                                           IXB, IYB, IZB, bound_ref_b()),
                        )
                    return e

                def cluster_lin(c, carry):
                    e = entry_min(cb_ref, c)

                    @pl.when(e < _INF)
                    def _():
                        st = test_cluster(c, tuple(r[...] for r in regs))
                        for r, v in zip(regs, st):
                            r[...] = v

                    return carry

                def super_lin(sp, carry):
                    lo = sp * SF
                    hi = jnp.minimum(lo + SF, C)
                    e = entry_min(sb_ref, sp)

                    @pl.when(e < _INF)
                    def _():
                        jax.lax.fori_loop(lo, hi, cluster_lin, 0)

                    return carry

                jax.lax.fori_loop(s_lo, s_hi, super_lin, 0)
                return tuple(r[...] for r in regs)

            if "ordered" not in debug:
                # CMR_MEGA_DEBUG=carrywalk ablation: the pre-round-3c
                # register-carried walk (state threaded through lax.cond
                # gates). Kept for the scratch-vs-carry A/B.
                def cluster_lin(c, st):
                    e = slab_entry_min(cb_ref, c, OX, OY, OZ, IX, IY, IZ,
                                       bound_of(st))
                    return jax.lax.cond(
                        e < _INF, lambda s: test_cluster(c, s), lambda s: s, st
                    )

                def super_lin(sp, st):
                    lo = sp * SF
                    hi = jnp.minimum(lo + SF, C)
                    e = slab_entry_min(sb_ref, sp, OX, OY, OZ, IX, IY, IZ,
                                       bound_of(st))
                    return jax.lax.cond(
                        e < _INF,
                        lambda s: jax.lax.fori_loop(lo, hi, cluster_lin, s),
                        lambda s: s,
                        st,
                    )

                return jax.lax.fori_loop(s_lo, s_hi, super_lin, state0)

            def s_entry(sp, entries):
                e = slab_entry_min(sb_ref, sp, OX, OY, OZ, IX, IY, IZ, TMAX)
                return jnp.where(flat_iota == sp, e, entries)

            sentries = jax.lax.fori_loop(
                s_lo, s_hi, s_entry, jnp.full((8, 128), _INF)
            )

            def scond(carry):
                st, entries = carry
                return jnp.min(entries) < jnp.max(bound_of(st))

            def sbody(carry):
                st, entries = carry
                _e, sp = pick_min(entries)
                entries = jnp.where(flat_iota == sp, _INF, entries)
                st = visit_super(sp, st)
                return st, entries

            state, _ = jax.lax.while_loop(scond, sbody, (state0, sentries))
            return state

        def media_scan_idx(idx):
            """Media row selection by TABLE INDEX (the NEE packed keys
            carry the media-table row index, cluster_test.media_index;
            -1 = no medium). Same payload as media_scan."""
            zeros = jnp.zeros_like(idx)
            out = [zeros] * 7 + [jnp.ones_like(idx)]
            for mi in range(M):
                m = idx == jnp.float32(mi)
                for f in range(8):
                    out[f] = jnp.where(m, media_ref[mi, 1 + f], out[f])
            has = idx >= 0.0
            return (has, *out)

        def media_scan(mat):
            """First-match linear scan of the media table (volpath:137-145).
            sigma rows are pre-scaled by the scene scale; g is the channel
            mean the reference collapses to (volpath:438)."""
            zeros = jnp.zeros_like(mat)
            has = jnp.zeros_like(mat, dtype=jnp.bool_)
            ss_r = zeros
            ss_g = zeros
            ss_b = zeros
            sa_r = zeros
            sa_g = zeros
            sa_b = zeros
            g = zeros
            ior = jnp.ones_like(mat)
            for mi in range(M):
                mid = media_ref[mi, 0]
                m = (mat == mid) & (mid >= 0.0) & ~has
                ss_r = jnp.where(m, media_ref[mi, 1], ss_r)
                ss_g = jnp.where(m, media_ref[mi, 2], ss_g)
                ss_b = jnp.where(m, media_ref[mi, 3], ss_b)
                sa_r = jnp.where(m, media_ref[mi, 4], sa_r)
                sa_g = jnp.where(m, media_ref[mi, 5], sa_g)
                sa_b = jnp.where(m, media_ref[mi, 6], sa_b)
                g = jnp.where(m, media_ref[mi, 7], g)
                ior = jnp.where(m, media_ref[mi, 8], ior)
                has = has | m
            return has, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b, g, ior

        def shade_color(px, py, nx):
            """Procedural base color (volpath:198-226), componentwise."""
            base = jnp.full_like(px, 0.8)
            if background == 1:
                fx = jnp.floor(px)
                fy = jnp.floor(py)
                even = (jnp.mod(fx, 2.0) == 0.0) == (jnp.mod(fy, 2.0) == 0.0)
                c = jnp.where(even, 0.8, 0.3)
                return c, c, c
            if background == 2:
                is_red = nx > 0.99
                is_green = nx < -0.99
                cr = jnp.where(is_red, 0.8, jnp.where(is_green, 0.0, 0.8))
                cg = jnp.where(is_red, 0.0, jnp.where(is_green, 0.8, 0.8))
                cb = jnp.where(is_red, 0.0, jnp.where(is_green, 0.0, 0.8))
                return cr, cg, cb
            return base, base, base

        def nee_setup(px, py, pz, active):
            """Light direction/distance and inverse-square falloff
            (volpath:342-345); ``eff`` is the per-lane walk bound (0 for
            inactive lanes — they never match)."""
            tlx = lx - px
            tly = ly - py
            tlz = lz - pz
            ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
            inv = 1.0 / jnp.maximum(ldist, 1e-20)
            ldx = tlx * inv
            ldy = tly * inv
            ldz = tlz * inv
            lv_r = lir * inv * inv
            lv_g = lig * inv * inv
            lv_b = lib * inv * inv
            eff = jnp.where(active, ldist, 0.0)
            return ldx, ldy, ldz, ldist, eff, lv_r, lv_g, lv_b

        def nee_march(px, py, pz, active):
            """Direct light through media boundaries (volpath:337-426;
            integrator.sample_direct_light). ONE multi-hit traversal
            collects the K = 2*nee_max_media nearest boundaries along the
            shadow line; a static unrolled march then replays the
            reference's leg logic over the sorted hit list — enter legs
            get the 0.999 light-distance epsilon (volpath:361), exit legs
            the T_MIN floor, duplicate boundaries within T_MIN of the
            previous one are skipped by the leg logic like per-leg
            queries with a T_MIN ray offset would skip them. Opaque hits
            never consume list slots (the sweep routes them to a
            separate nearest-opaque track, like per-leg queries which
            only ever surface the nearest one). A skipped duplicate
            MEDIA boundary still occupies a list slot (the reference's
            per-leg ray offset never surfaces it); the list carries
            NEE_DUP_SPARE spare slots so coincident/double-faced shells
            no longer exhaust it early (cluster_test.nee_list_len;
            regression-tested in test_megakernel). Stacks deeper than
            the spares still need --nee-bound. Draws no RNG. Unresolved
            marches (every list entry consumed as a boundary) fail dark,
            matching the wavefront engine's bounded-march semantics."""
            (ldx, ldy, ldz, ldist, eff, lv_r, lv_g, lv_b) = nee_setup(
                px, py, pz, active
            )
            if S_OPQ > 0:
                # Partitioned grid: nearest opaque occluder from a cheap
                # closest-hit walk over the opaque supers; the K-list
                # sweep only collects boundaries from the media supers
                # (plus any opaque strays living in mixed clusters, via
                # its own t_opq track).
                (t_op_w,) = traverse(
                    px, py, pz, ldx, ldy, ldz, eff, "occl", 0, S_OPQ
                )
                hits = traverse(
                    px, py, pz, ldx, ldy, ldz, eff, "nee", S_OPQ, S
                )
                t_op = jnp.minimum(t_op_w, hits[K_NEE])
            else:
                hits = traverse(px, py, pz, ldx, ldy, ldz, eff, "nee")
                t_op = hits[K_NEE]
            return nee_resolve(
                hits[:K_NEE], t_op, eff, ldist, lv_r, lv_g, lv_b, active
            )

        def nee_resolve(keys, t_op, eff, ldist, lv_r, lv_g, lv_b, active):
            """Replay the reference's per-leg shadow-march logic over the
            K collected boundary keys (see nee_march's docstring for the
            semantics and the one known per-leg divergence)."""
            # Unpack the K packed boundary keys once per trace; empty
            # slots read as the per-lane eff (the pre-packing slot init),
            # so the march's resolve/fail-dark behavior is unchanged.
            ts = [nee_unpack_t(k, eff, bitcast=pltpu.bitcast)
                  for k in keys]
            ms = [nee_unpack_mat(k) for k in keys]

            px = eff  # shape donor for the ones/zeros below
            ones = jnp.ones_like(px)
            tr_r = ones
            tr_g = ones
            tr_b = ones
            running = active
            in_med = jnp.zeros_like(active)
            ex_r = jnp.zeros_like(px)
            ex_g = jnp.zeros_like(px)
            ex_b = jnp.zeros_like(px)
            last_t = jnp.zeros_like(px)
            # Real (non-duplicate) boundaries consumed: the march's
            # crossing budget stays 2*nee_max_media — the NEE_DUP_SPARE
            # extra list slots absorb DUPLICATES only, so the bound
            # semantics (and wavefront-engine equivalence) are unchanged.
            n_real = jnp.zeros_like(px)
            real_cap = jnp.float32(2 * nee_max_media)

            for i in range(K_NEE):
                t_i = ts[i]
                m_i = ms[i]
                rem = ldist - last_t
                dup = t_i <= last_t + t_min
                cut = jnp.where(
                    in_med,
                    last_t + jnp.maximum(rem, t_min),
                    last_t + 0.999 * rem,
                )
                window = jnp.minimum(cut, eff)
                # The sweep tracks the nearest opaque hit separately: it
                # occludes when it falls inside this leg's window before
                # the next media boundary (the per-leg query would have
                # returned it as the closest hit — volpath:372).
                opq = (
                    running
                    & (t_op > last_t + t_min)
                    & (t_op < window)
                    & (t_op < t_i)
                )
                tr_r = jnp.where(opq, 0.0, tr_r)
                tr_g = jnp.where(opq, 0.0, tr_g)
                tr_b = jnp.where(opq, 0.0, tr_b)
                running = running & ~opq
                consider = running & ~dup
                real = consider & (t_i < window)
                n_real = n_real + jnp.where(real, 1.0, 0.0)
                ended = consider & ~real  # miss: march resolves, trans kept
                (_has, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b, _g2, _i2) = (
                    media_scan_idx(m_i)
                )

                # Every real list entry IS a media boundary (opaque hits
                # bypass the list in the sweep).
                boundary = real
                exitl = boundary & in_med
                seg = jnp.minimum(t_i - last_t, rem)
                a_r = 0.9 * jnp.exp(-ex_r * seg)
                a_g = 0.9 * jnp.exp(-ex_g * seg)
                a_b = 0.9 * jnp.exp(-ex_b * seg)
                tr_r = jnp.where(exitl, tr_r * a_r, tr_r)
                tr_g = jnp.where(exitl, tr_g * a_g, tr_g)
                tr_b = jnp.where(exitl, tr_b * a_b, tr_b)

                enterl = boundary & ~in_med
                ex_r = jnp.where(enterl, ss_r + sa_r, ex_r)
                ex_g = jnp.where(enterl, ss_g + sa_g, ex_g)
                ex_b = jnp.where(enterl, ss_b + sa_b, ex_b)
                last_t = jnp.where(boundary, t_i, last_t)
                in_med = in_med ^ boundary  # toggle enter<->exit
                running = running & ~ended

            # Fail dark when the march is left unresolved: list exhausted
            # mid-march, or the real-crossing budget consumed (the
            # bounded wavefront march cannot verify the tail after
            # max_media pairs and truncates identically — matching it
            # keeps the engines' images equal; only DUPLICATES ride the
            # spare slots for free).
            dark = running | (n_real >= real_cap)
            tr_r = jnp.where(dark, 0.0, tr_r)
            tr_g = jnp.where(dark, 0.0, tr_g)
            tr_b = jnp.where(dark, 0.0, tr_b)
            return lv_r * tr_r, lv_g * tr_g, lv_b * tr_b

        def make_draw(it, PH):
            """Per-iteration rng draw: masked PCG (default) or lockstep
            Owen-scrambled Sobol (ld — see module helpers / ops/rng.py).
            Sites are numbered 0-7 in draw order; ld values ignore the
            mask (the dimension advances lockstep, unused values are
            simply never consumed)."""
            if not ld:
                return lambda rng, mask, site: _rng_next(rng, mask)

            def draw(s_idx, mask, site):
                rbase = it * DRAWS_PER_BOUNCE + site
                v = jnp.zeros_like(s_idx)
                for j in range(30):
                    cj = sob_ref[rbase, j].astype(jnp.uint32)  # wrap == bitcast
                    bit = (s_idx >> jnp.uint32(j)) & jnp.uint32(1)
                    v = v ^ jnp.where(bit != 0, cj, jnp.uint32(0))
                dim_abs = (dim_ref[0] + rbase).astype(jnp.uint32)
                key = _pcg_hash(PH ^ (dim_abs * _GOLD))
                word = _reverse_bits32(_lk_hash(_reverse_bits32(v), key))
                return s_idx, _u32_to_f32(word) * _INV_U32

            return draw

        def bounce(st, it, PH):
            (ox, oy, oz, dx, dy, dz, th_r, th_g, th_b,
             ra_r, ra_g, ra_b, rng, depth, alive_i) = st
            alive = alive_i > 0
            draw = make_draw(it, PH)

            eff = jnp.where(alive, t_max_f, 0.0)
            if "notrace" in debug:
                # Timing ablation: fabricate a hit payload.
                t = jnp.full_like(ox, 2.0)
                slot = jnp.zeros_like(ox)
                u = jnp.full_like(ox, 0.3)
                v = jnp.full_like(ox, 0.3)
                gnx = jnp.zeros_like(ox)
                gny = jnp.ones_like(ox)
                gnz = jnp.zeros_like(ox)
                mat = jnp.zeros_like(ox)
                px = ox + 2.0 * dx
                py = oy + 2.0 * dy
                pz = oz + 2.0 * dz
            else:
                (t, slot, u, v, gnx, gny, gnz, mat, px, py, pz) = traverse(
                    ox, oy, oz, dx, dy, dz, eff, "full"
                )
                if "cullonly" in debug:
                    # Timing ablation: the walk above RAN with identity
                    # cluster bodies (all culls/conds, no triangle
                    # arithmetic — see test_cluster), so every lane
                    # missed; fabricate the notrace hit payload, with a
                    # data dependence on the walk's t so the compiler
                    # cannot eliminate the walk. full-vs-cullonly-vs-
                    # notrace decomposes walk cost into visit arithmetic
                    # vs cull scaffolding.
                    t = jnp.full_like(ox, 2.0) + t * 1e-30
                    slot = jnp.zeros_like(ox)
                    u = jnp.full_like(ox, 0.3)
                    v = jnp.full_like(ox, 0.3)
                    gnx = jnp.zeros_like(ox)
                    gny = jnp.ones_like(ox)
                    gnz = jnp.zeros_like(ox)
                    mat = jnp.zeros_like(ox)
                    px = ox + t * dx
                    py = oy + t * dy
                    pz = oz + t * dz
            hit = slot >= 0.0
            if "nophys" in debug:
                # Timing ablation: bounce = mirror the ray at the hit.
                got_hit = alive & hit
                depth = depth + 1
                na = got_hit & (depth < max_depth)
                return (
                    jnp.where(got_hit, px, ox), jnp.where(got_hit, py, oy),
                    jnp.where(got_hit, pz, oz), -dx, -dy, -dz,
                    th_r, th_g, th_b, ra_r + 0.01, ra_g, ra_b,
                    rng, depth, na.astype(jnp.int32),
                )
            got_hit = alive & hit
            nx, ny, nz = _norm3(gnx, gny, gnz)
            has0, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b, g, ior = media_scan(mat)
            col_r, col_g, col_b = shade_color(px, py, nx)
            has_med = got_hit & has0

            # --- boundary event #1 (volpath:633-670) ---
            (rf1x, rf1y, rf1z, td1x, td1y, td1z, r1, tir1) = _boundary_event(
                dx, dy, dz, nx, ny, nz, ior
            )
            rng, rand_f = draw(rng, has_med, 0)
            do_reflect = has_med & (rand_f < r1)
            transmitted = has_med & ~do_reflect

            dax = jnp.where(do_reflect, rf1x, jnp.where(transmitted, td1x, dx))
            day = jnp.where(do_reflect, rf1y, jnp.where(transmitted, td1y, dy))
            daz = jnp.where(do_reflect, rf1z, jnp.where(transmitted, td1z, dz))
            ox = jnp.where(do_reflect, px, ox)
            oy = jnp.where(do_reflect, py, oy)
            oz = jnp.where(do_reflect, pz, oz)
            depth = depth + jnp.where(has_med, 1, 0)

            # --- free-flight draw BEFORE the boundary trace ---
            # Same single masked PCG draw as the reference (volpath:691),
            # just evaluated early: the exponential candidate distance
            # does not depend on the segment length, so it can BOUND the
            # distance-to-boundary trace below. A lane that scatters well
            # inside a dense medium then barely traverses — if no boundary
            # exists within the candidate, the sampled collision stands
            # (succ = cand < seg_len is true for any farther boundary).
            rng, rand_d = draw(rng, transmitted, 1)
            cand = _free_flight_candidate(
                rand_d, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b
            )

            diffuse = got_hit & ~has_med
            backface = diffuse & (_dot3(dx, dy, dz, nx, ny, nz) > 0.0)
            shade = diffuse & ~backface

            if analytic_direct:
                # The analytic direct term credits EVERY transmitted
                # segment in a scatterable medium (min extinction channel
                # > 0). Glass-like zero-extinction media stay excluded
                # (can never scatter in the reference, volpath:487-513);
                # under tir='kill' the reference's TIR lanes never reach
                # the scatter branch, so they are excluded to keep the
                # estimand identical.
                density0 = _min3(ss_r + sa_r, ss_g + sa_g, ss_b + sa_b)
                ad_gate = transmitted & (density0 > 0.0)
                if tir_kill:
                    ad_gate = ad_gate & ~tir1

            # --- distance-to-boundary trace (volpath:675-688) ---
            # NB a medium-shell-AABB clamp on entering lanes was tried
            # and REVERTED: it assumes closed shells, but the reference
            # scenes use open/partial media meshes (cup's coffee surface)
            # where the nearest boundary can lie beyond the medium's own
            # AABB — it changed cup's image (mean 0.0467 vs 0.0525) for
            # only +5%. The only sound per-lane bounds are the
            # free-flight candidate and the scene box.
            if fused:
                # --- fused dist+NEE walk ('dnee') ---
                # ONE traversal serves the distance trace (set A:
                # transmitted lanes along the post-boundary direction,
                # bounded by the free-flight candidate) and the NEE
                # boundary sweep (set B: lanes that may need direct
                # light, along the light direction) from the SHARED
                # hit-point origin: per-visit scalar extracts and the
                # origin-only Moller-Trumbore algebra (s, q, t-numerator)
                # are paid once for both, and the walk visits the UNION
                # of the two footprints instead of their sum. NEE
                # activity must be decided BEFORE the scatter draw, so
                # set B uses a superset of the scatter lanes: scatter
                # requires succ = cand < seg_len <= t_max (see
                # _sample_distance), so a transmitted lane with
                # cand >= t_max can NEVER scatter and its li_* would be
                # discarded below — exclude it pre-walk. This matters
                # enormously for zero-extinction (glass-like) media,
                # whose declined free-flight draw returns the 500000
                # NO_INTERACTION sentinel (volpath:513): without the
                # test every glass pass-through lane drags its light
                # path into the walk's set-B footprint (measured -45%
                # on vessel, where paths cross the vessel wall
                # repeatedly). Included lanes that end up not
                # scattering compute li_* that the scatter gates below
                # discard — they draw no RNG and alter no state, so
                # images are bit-identical to the separate walks.
                may_scatter = transmitted & (cand < t_max_f)
                # Under the analytic direct term every gated lane joins
                # set B (declined-draw lanes in real media are spatially
                # co-located with accepted ones, so the union footprint
                # barely grows; zero-extinction glass stays excluded —
                # the vessel -45% lesson above).
                need_light = ad_gate if analytic_direct else may_scatter
                (ldx, ldy, ldz, ldist, eff_b, lv_r, lv_g, lv_b) = nee_setup(
                    px, py, pz, need_light | shade
                )
                bound = jnp.minimum(cand * 1.00001 + 10.0 * t_min, t_max_f)
                if analytic_direct:
                    # The analytic in-scatter integral runs to the TRUE
                    # boundary (capped at the transmittance-clamp depth
                    # t* = ln(1e4)/density), so the candidate bound alone
                    # is too short on scatter lanes. Raising the walk
                    # bound to max(cand, t*) is semantically invisible
                    # otherwise: a farther-found boundary changes only
                    # seg_len's value where the lane scatters, which
                    # only the analytic term reads.
                    t_star = jnp.where(
                        ad_gate,
                        LN_CLAMP / jnp.maximum(density0, 1e-30) * 1.00001
                        + 10.0 * t_min,
                        0.0,
                    )
                    bound = jnp.minimum(
                        jnp.maximum(bound, t_star), t_max_f
                    )
                dn = traverse(
                    px, py, pz, dax, day, daz,
                    jnp.where(transmitted, bound, 0.0), "dnee",
                    DB=(ldx, ldy, ldz), TMAXB=eff_b,
                )
                seg_len = jnp.where(dn[1] >= 0.0, dn[0], t_max_f)
            else:
                def dist_trace(_):
                    bound = jnp.minimum(
                        cand * 1.00001 + 10.0 * t_min, t_max_f
                    )
                    if analytic_direct:
                        t_star = jnp.where(
                            ad_gate,
                            LN_CLAMP / jnp.maximum(density0, 1e-30)
                            * 1.00001 + 10.0 * t_min,
                            0.0,
                        )
                        bound = jnp.minimum(
                            jnp.maximum(bound, t_star), t_max_f
                        )
                    dt, dslot = traverse(
                        px, py, pz, dax, day, daz,
                        jnp.where(transmitted, bound, 0.0), "dist"
                    )
                    return jnp.where(dslot >= 0.0, dt, t_max_f)

                if "nodist" in debug:
                    seg_len = jnp.full_like(px, t_max_f)
                else:
                    seg_len = jax.lax.cond(
                        jnp.any(transmitted),
                        dist_trace,
                        lambda _: jnp.full_like(px, t_max_f),
                        None,
                    )

            # --- free-flight sampling (volpath:691) ---
            (succ, ms_t, prob_fail, prob_success, tr_r, tr_g, tr_b) = (
                _sample_distance(rand_d, ss_r, ss_g, ss_b, sa_r, sa_g, sa_b,
                                 seg_len)
            )
            scatter = transmitted & succ
            if tir_kill:
                scatter = scatter & ~tir1
            pass_med = transmitted & ~scatter

            # --- NEE (volpath:697/:773; no RNG draws) ---
            if "nonee" in debug:
                li_r = li_g = li_b = jnp.ones_like(px)
            elif fused:
                li_r, li_g, li_b = nee_resolve(
                    dn[2:2 + K_NEE], dn[2 + K_NEE], eff_b, ldist,
                    lv_r, lv_g, lv_b, need_light | shade,
                )
            elif analytic_direct:
                li_r, li_g, li_b = nee_march(px, py, pz, ad_gate | shade)
            else:
                li_r, li_g, li_b = nee_march(px, py, pz, scatter | shade)

            # NEE phase weight at outDir = 0 (volpath:698-699)
            tmp_g = 1.0 + g * g
            phase_nee = INV_FOURPI * (1.0 - g * g) / (tmp_g * jnp.sqrt(tmp_g))
            if analytic_direct:
                # Closed-form expectation of sigma_s*T(t)/p(t) over the
                # free-flight draw, credited on every gated segment —
                # same converged image as the scatter-event estimator
                # (the NEE point is the boundary hit either way), no new
                # RNG (ops/medium.analytic_direct_scale; the t_cap term
                # reproduces the reference's <1e-4 transmittance clamp,
                # volpath:250-253).
                t_cap = jnp.minimum(
                    seg_len, LN_CLAMP / jnp.maximum(density0, 1e-30)
                )

                def _ad(ss, sa):
                    ext = ss + sa
                    return (
                        ss
                        * (1.0 - jnp.exp(-ext * t_cap))
                        / jnp.maximum(ext, 1e-30)
                    )

                w_ad = phase_nee
                ra_r = ra_r + jnp.where(
                    ad_gate, th_r * _ad(ss_r, sa_r) * li_r * w_ad, 0.0
                )
                ra_g = ra_g + jnp.where(
                    ad_gate, th_g * _ad(ss_g, sa_g) * li_g * w_ad, 0.0
                )
                ra_b = ra_b + jnp.where(
                    ad_gate, th_b * _ad(ss_b, sa_b) * li_b * w_ad, 0.0
                )

            # --- scatter branch (volpath:693-710) ---
            safe_ps = jnp.where(prob_success > 0.0, prob_success, 1.0)
            ps_pos = prob_success > 0.0
            sc_r = jnp.where(ps_pos, ss_r * tr_r / safe_ps, 0.0)
            sc_g = jnp.where(ps_pos, ss_g * tr_g / safe_ps, 0.0)
            sc_b = jnp.where(ps_pos, ss_b * tr_b / safe_ps, 0.0)
            th_r = jnp.where(scatter, th_r * sc_r, th_r)
            th_g = jnp.where(scatter, th_g * sc_g, th_g)
            th_b = jnp.where(scatter, th_b * sc_b, th_b)

            if not analytic_direct:
                ra_r = ra_r + jnp.where(scatter, th_r * li_r * phase_nee, 0.0)
                ra_g = ra_g + jnp.where(scatter, th_g * li_g * phase_nee, 0.0)
                ra_b = ra_b + jnp.where(scatter, th_b * li_b * phase_nee, 0.0)

            rng, r_ph1 = draw(rng, scatter, 2)
            rng, r_ph2 = draw(rng, scatter, 3)
            hgx, hgy, hgz = _hg_sample(-dax, -day, -daz, g, r_ph1, r_ph2)
            # origin advanced along the *scattered* direction (volpath:708-709)
            ox = jnp.where(scatter, px + hgx * ms_t, ox)
            oy = jnp.where(scatter, py + hgy * ms_t, oy)
            oz = jnp.where(scatter, pz + hgz * ms_t, oz)
            ndx = jnp.where(scatter, hgx, dax)
            ndy = jnp.where(scatter, hgy, day)
            ndz = jnp.where(scatter, hgz, daz)

            # --- pass-through branch (volpath:713-756) ---
            safe_pf = jnp.where(prob_fail > 0.0, prob_fail, 1.0)
            pf_pos = prob_fail > 0.0
            pp_r = jnp.where(pf_pos, tr_r / safe_pf, 0.0)
            pp_g = jnp.where(pf_pos, tr_g / safe_pf, 0.0)
            pp_b = jnp.where(pf_pos, tr_b / safe_pf, 0.0)
            th_r = jnp.where(pass_med, th_r * pp_r, th_r)
            th_g = jnp.where(pass_med, th_g * pp_g, th_g)
            th_b = jnp.where(pass_med, th_b * pp_b, th_b)

            pox = px + dax * ms_t
            poy = py + day * ms_t
            poz = pz + daz * ms_t
            # boundary event #2 with the stale entry normal (volpath:723-753)
            (rf2x, rf2y, rf2z, td2x, td2y, td2z, r2, tir2) = _boundary_event(
                dax, day, daz, nx, ny, nz, ior
            )
            rng, rand_f2 = draw(rng, pass_med, 4)
            pd_reflect = rand_f2 < r2
            pdx = jnp.where(pd_reflect, rf2x, td2x)
            pdy = jnp.where(pd_reflect, rf2y, td2y)
            pdz = jnp.where(pd_reflect, rf2z, td2z)
            ox = jnp.where(pass_med, pox, ox)
            oy = jnp.where(pass_med, poy, oy)
            oz = jnp.where(pass_med, poz, oz)
            ndx = jnp.where(pass_med, pdx, ndx)
            ndy = jnp.where(pass_med, pdy, ndy)
            ndz = jnp.where(pass_med, pdz, ndz)

            # --- diffuse branch (volpath:758-779) ---
            rng, r_d1 = draw(rng, shade, 5)
            rng, r_d2 = draw(rng, shade, 6)
            ddx, ddy = _concentric_disk(r_d1, r_d2)
            temp = 1.0 - ddx * ddx - ddy * ddy
            ddz = jnp.where(
                temp <= 0.0, jnp.float32(1e-10),
                jnp.sqrt(jnp.maximum(temp, 0.0)),
            )
            th_r = jnp.where(shade, th_r * REFLECTANCE, th_r)
            th_g = jnp.where(shade, th_g * REFLECTANCE, th_g)
            th_b = jnp.where(shade, th_b * REFLECTANCE, th_b)
            # diffuse_eval with the frame-mixing quirk (volpath:255-263):
            # wi = -direction; visibility dots wi and local wo against the
            # WORLD normal; the cosine term is local wo.z.
            visible = (
                (_dot3(-dx, -dy, -dz, nx, ny, nz) > 0.0)
                & (_dot3(ddx, ddy, ddz, nx, ny, nz) > 0.0)
            )
            deval = jnp.where(visible, REFLECTANCE * INV_PI * ddz, 0.0)
            ra_r = ra_r + jnp.where(shade, th_r * li_r * deval * col_r, 0.0)
            ra_g = ra_g + jnp.where(shade, th_g * li_g * deval * col_g, 0.0)
            ra_b = ra_b + jnp.where(shade, th_b * li_b * deval * col_b, 0.0)

            # local direction used as world (volpath:777)
            wox, woy, woz = _norm3(ddx, ddy, ddz)
            ox = jnp.where(shade, px + wox * t_min, ox)
            oy = jnp.where(shade, py + woy * t_min, oy)
            oz = jnp.where(shade, pz + woz * t_min, oz)
            ndx = jnp.where(shade, wox, ndx)
            ndy = jnp.where(shade, woy, ndy)
            ndz = jnp.where(shade, woz, ndz)

            redirected = do_reflect | scatter | pass_med | shade
            dx = jnp.where(redirected, ndx, dx)
            dy = jnp.where(redirected, ndy, dy)
            dz = jnp.where(redirected, ndz, dz)

            # --- depth + russian roulette (volpath:786-797) ---
            enders = scatter | shade
            depth = depth + jnp.where(enders | pass_med, 1, 0)
            rr = enders & (depth > rr_depth)
            rng, rand_rr = draw(rng, rr, 7)
            q = jnp.minimum(_max3(th_r, th_g, th_b), 0.95)
            survive = rand_rr <= q
            boost = 1.0 / jnp.maximum(q, 1e-20)
            rs = rr & survive
            th_r = jnp.where(rs, th_r * boost, th_r)
            th_g = jnp.where(rs, th_g * boost, th_g)
            th_b = jnp.where(rs, th_b * boost, th_b)

            continuing = do_reflect | pass_med | (enders & (~rr | survive))
            alive = continuing & (depth < max_depth)
            if tir_kill:
                alive = alive & ~((transmitted & tir1) | (pass_med & tir2))

            return (ox, oy, oz, dx, dy, dz, th_r, th_g, th_b,
                    ra_r, ra_g, ra_b, rng, depth, alive.astype(jnp.int32))

        def block_body(b, _):
            sl = pl.ds(b * 8, 8)
            st = (
                ox_ref[sl, :], oy_ref[sl, :], oz_ref[sl, :],
                dx_ref[sl, :], dy_ref[sl, :], dz_ref[sl, :],
                th_r_ref[sl, :], th_g_ref[sl, :], th_b_ref[sl, :],
                ra_r_ref[sl, :], ra_g_ref[sl, :], ra_b_ref[sl, :],
                rng_ref[sl, :],
                depth_ref[sl, :],
                alive_ref[sl, :],
            )

            PH = aux_ref[sl, :] if ld else None

            @pl.when(b < lb_ref[0])
            def _():
                def step(carry):
                    s, it = carry
                    return bounce(s, it, PH), it + 1

                (stf, _) = jax.lax.while_loop(
                    lambda c: (c[1] < max_iters) & jnp.any(c[0][14] > 0),
                    step,
                    (st, jnp.int32(0)),
                )
                ox_o[sl, :] = stf[0]
                oy_o[sl, :] = stf[1]
                oz_o[sl, :] = stf[2]
                dx_o[sl, :] = stf[3]
                dy_o[sl, :] = stf[4]
                dz_o[sl, :] = stf[5]
                th_r_o[sl, :] = stf[6]
                th_g_o[sl, :] = stf[7]
                th_b_o[sl, :] = stf[8]
                rad_r_ref[sl, :] = stf[9]
                rad_g_ref[sl, :] = stf[10]
                rad_b_ref[sl, :] = stf[11]
                rng_out_ref[sl, :] = stf[12]
                depth_o[sl, :] = stf[13]
                alive_o[sl, :] = stf[14]

            @pl.when(b >= lb_ref[0])
            def _():
                # Skipped (all-dead) blocks pass through EXPLICITLY.
                # Pallas TPU does not document that unwritten regions of
                # an aliased output survive (output VMEM windows are
                # separate buffers DMA'd back), so relying on
                # input_output_aliases alone would leave these lanes'
                # banked radiance/RNG undefined on some backends.
                outs = (ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,
                        th_r_o, th_g_o, th_b_o,
                        rad_r_ref, rad_g_ref, rad_b_ref,
                        rng_out_ref, depth_o, alive_o)
                for ref, val in zip(outs, st):
                    ref[sl, :] = val

            return 0

        # Only the leading lb_ref[0] blocks run the bounce loop — the
        # caller keeps live lanes sorted first; the rest copy through.
        jax.lax.fori_loop(0, num_blocks, block_body, 0)

    return kernel


class MegaState(NamedTuple):
    """Full per-lane path state, streamed through capped kernel calls."""

    org: jnp.ndarray  # (R, 3)
    dir: jnp.ndarray  # (R, 3)
    thr: jnp.ndarray  # (R, 3) throughput
    rad: jnp.ndarray  # (R, 3) accumulated radiance
    rng: jnp.ndarray  # (R,) uint32 PCG32 state (ld: shuffled sample index)
    depth: jnp.ndarray  # (R,) int32
    alive: jnp.ndarray  # (R,) bool
    aux: jnp.ndarray  # (R,) uint32: ld-mode pixel hash; zeros otherwise


def fresh_state(
    o: jnp.ndarray, d: jnp.ndarray, rng: jnp.ndarray, aux=None
) -> MegaState:
    """Path state for freshly generated camera rays (post-jitter RNG)."""
    r = o.shape[0]
    return MegaState(
        org=o,
        dir=d,
        thr=jnp.ones((r, 3), jnp.float32),
        rad=jnp.zeros((r, 3), jnp.float32),
        rng=rng,
        depth=jnp.zeros((r,), jnp.int32),
        alive=jnp.ones((r,), bool),
        aux=aux if aux is not None else jnp.zeros((r,), jnp.uint32),
    )


@partial(
    jax.jit,
    static_argnames=(
        "background", "max_depth", "rr_depth", "nee_max_media", "tir_kill",
        "analytic_direct", "ld",
        "max_iters", "debug",
    ),
)
def trace_paths_mega(
    grid: DeviceClusterGrid,
    media9: jnp.ndarray,  # (max(M,1), 9) pre-scaled media table (pack_media)
    misc: jnp.ndarray,  # (16,): light xyz, intensity rgb, 2 pads,
    #                      world AABB lo xyz, hi xyz, 2 pads (pack_misc)
    state: MegaState,
    background: int = 1,
    max_depth: int = 32,
    rr_depth: int = 16,
    nee_max_media: int = 4,
    tir_kill: bool = False,
    max_iters: int | None = None,
    live_blocks: jnp.ndarray | None = None,
    debug: str = "",
    analytic_direct: bool = False,
    ld: bool = False,
    dim0=0,
) -> MegaState:
    """Advance R paths up to ``max_iters`` bounce iterations in ONE kernel.

    With ``max_iters=None`` (= max_depth — every continuing lane's depth
    grows at least 1 per iteration) paths run to termination, like the
    reference's per-thread loop. A smaller cap returns the mid-flight
    state so the caller can compact the wavefront and continue on a
    narrower lane set (megarender's phase schedule).

    ``live_blocks`` (traced int32 scalar) bounds the kernel to the
    leading blocks; lanes beyond pass through untouched (state I/O is
    aliased). With live lanes sorted first this gives dynamic-width
    phases from ONE compiled kernel — shrinking the lane arrays instead
    would compile a separate kernel per width.

    Lanes should arrive spatially sorted (the caller tiles pixels into
    32x32 blocks) so each 1024-lane block shares traversal work. R is
    padded to a multiple of 1024 (pad lanes arrive dead and are dropped).
    """
    if max_iters is None:
        max_iters = max_depth
    r = state.org.shape[0]
    pad = (-r) % BLOCK
    rp = r + pad
    blocks = rp // BLOCK

    def pack(x, fill=None):
        if pad:
            tail = (
                jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])
                if fill is None
                else jnp.full((pad,) + x.shape[1:], fill, x.dtype)
            )
            x = jnp.concatenate([x, tail])
        return x.reshape(blocks * 8, 128)

    o, d = state.org, state.dir
    ins = (
        pack(o[:, 0]), pack(o[:, 1]), pack(o[:, 2]),
        pack(d[:, 0]), pack(d[:, 1]), pack(d[:, 2]),
        pack(state.thr[:, 0]), pack(state.thr[:, 1]), pack(state.thr[:, 2]),
        pack(state.rad[:, 0]), pack(state.rad[:, 1]), pack(state.rad[:, 2]),
        pack(state.rng),
        pack(state.depth),
        pack(state.alive.astype(jnp.int32), fill=0),
    )
    aux_in = pack(state.aux)

    # ld mode: slice this call's direction-number rows (one row per
    # (iteration, site) draw) out of the full table by the traced dim
    # base — the kernel then reads scalar rows from SMEM. The clip only
    # binds far beyond any live lane's dim (alive lanes never pass
    # 2 + 8*max_depth dims; over-scheduled phases on dead lanes may).
    if ld:
        from ..ops.rng import SOBOL_DIMS, sobol_matrices

        nrows = max_iters * DRAWS_PER_BOUNCE
        full = jnp.asarray(sobol_matrices().view(np.int32))
        start = jnp.clip(jnp.asarray(dim0, jnp.int32), 0, SOBOL_DIMS - nrows)
        sob = jax.lax.dynamic_slice(full, (start, jnp.int32(0)), (nrows, 30))
        dimv = start.reshape(1)
    else:
        nrows = 1
        sob = jnp.zeros((1, 30), jnp.int32)
        dimv = jnp.zeros((1,), jnp.int32)

    C = grid.num_clusters
    S = grid.num_supers
    width = grid.v0x.shape[1]
    M = media9.shape[0]
    if S > BLOCK:
        raise ValueError(
            f"{S} super-clusters exceed the (8,128) entry table; "
            "scene too large for the megakernel (max ~2M triangles)"
        )

    # ``debug`` (ablation switches) is an explicit STATIC argument so it
    # participates in the jit cache key — an env var read here would be
    # invisible to a cached trace (callers read CMR_MEGA_DEBUG once at
    # CLI/bench level and pass it down).
    subs = grid.runs_per_cluster
    run = grid.run_size
    kernel = _make_kernel(
        C, S, width, subs, run, M, blocks, background, max_depth, rr_depth,
        nee_max_media, tir_kill, 1e-4, 1e4, max_iters,
        S_OPQ=grid.num_opaque_supers,
        debug=debug,
        SF=grid.super_factor,
        analytic_direct=analytic_direct,
        ld=ld,
    )
    smem = lambda shape: pl.BlockSpec(shape, lambda: (0,) * len(shape), memory_space=pltpu.SMEM)
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32)
    u32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.uint32)
    i32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.int32)

    if live_blocks is None:
        lb = jnp.full((1,), blocks, jnp.int32)
    else:
        lb = jnp.asarray(live_blocks, jnp.int32).reshape(1)

    outs = pl.pallas_call(
        kernel,
        in_specs=[
            smem((C, 8)),
            smem((S, 8)),
            smem((M, 9)),
            smem((16,)),
            smem((1,)),
            smem((1,)),  # ld dim base
            smem((nrows, 30)),  # ld Sobol direction rows
            vmem(),  # run-major triangle rows
        ] + [vmem()] * 16,
        out_specs=[vmem()] * 15,
        out_shape=[f32] * 12 + [u32, i32, i32],
        # State streams through; blocks beyond live_blocks keep their
        # input values in place. (aux, the last input, is read-only.)
        input_output_aliases={8 + i: i for i in range(15)},
        # Traversal-state pool for the scratch-ref walk: 11 f32 tiles
        # (the 'full' payload's worst case; 'dist'/'occl' borrow a
        # prefix) + K_NEE i32 tiles (the NEE sweep's packed keys).
        scratch_shapes=(
            [pltpu.VMEM((8, 128), jnp.float32)] * 11
            + [pltpu.VMEM((8, 128), jnp.int32)] * nee_list_len(nee_max_media)
        ),
        interpret=grid.interpret,
    )(
        grid.bounds, grid.super_bounds, media9, misc, lb, dimv, sob,
        grid.run_rows,
        *ins, aux_in,
    )

    def unpack(x):
        return x.reshape(rp)[:r]

    (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr_, rg, rb, rng_o, depth_o,
     alive_o) = (unpack(x) for x in outs)
    return MegaState(
        org=jnp.stack([ox, oy, oz], axis=-1),
        dir=jnp.stack([dx, dy, dz], axis=-1),
        thr=jnp.stack([tr, tg, tb], axis=-1),
        rad=jnp.stack([rr_, rg, rb], axis=-1),
        rng=rng_o,
        depth=depth_o,
        alive=alive_o > 0,
        aux=state.aux,  # constant through the kernel (read-only input)
    )


def pack_media(media, scale) -> jnp.ndarray:
    """Build the kernel's (max(M,1), 9) media rows from a MediaTable:
    [mat_id, sigma_s*scale rgb, sigma_a*scale rgb, mean(g), ior].
    sigma scaling and g collapse follow volpath:141 and :438."""
    mat_id = jnp.asarray(media.mat_id, jnp.float32)
    m = mat_id.shape[0]
    if m == 0:
        return jnp.full((1, 9), -1.0, jnp.float32)
    if m > 63:
        # The NEE sweep packs the media-table ROW INDEX into 6 bits of
        # its int32 boundary keys (cluster_test.NEE_MAT_BITS). Material
        # ids themselves are unbounded.
        raise ValueError(f"{m} media rows exceed the 63-medium key field")
    scale = jnp.asarray(scale, jnp.float32)
    rows = jnp.concatenate(
        [
            mat_id[:, None],
            jnp.asarray(media.sigma_s, jnp.float32) * scale,
            jnp.asarray(media.sigma_a, jnp.float32) * scale,
            jnp.mean(jnp.asarray(media.g, jnp.float32), axis=-1, keepdims=True),
            jnp.asarray(media.ior, jnp.float32)[:, None],
        ],
        axis=-1,
    )
    return rows


def pack_misc(lights, world_lo, world_hi) -> jnp.ndarray:
    """Light position + intensity + scene AABB as the kernel's (16,) SMEM
    row: [light xyz, intensity rgb, pad, pad, lo xyz, hi xyz, pad, pad]."""
    return jnp.concatenate(
        [
            jnp.asarray(lights.position, jnp.float32),
            jnp.asarray(lights.intensity, jnp.float32),
            jnp.zeros(2, jnp.float32),
            jnp.asarray(world_lo, jnp.float32),
            jnp.asarray(world_hi, jnp.float32),
            jnp.zeros(2, jnp.float32),
        ]
    )
