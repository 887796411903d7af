"""Shared per-cluster triangle tester for the Pallas traversal kernels.

ONE source of truth for the hot inner loop: the statically-unrolled
128-triangle intersection over run-major rows, including every payload
variant ('full' closest hit with shading payload, 'dist'/'occl'
distance-only, and the 'nee' multi-hit K-list sweep with the opaque
early-exit track). Both the fused megakernel (kernels/megakernel.py) and
the binned per-lane tracer (kernels/binned_trace.py) build their
traversals from these factories, so the two engines' intersection
semantics are identical by construction.

Replaces the reference's hardware ray-query triangle stage
(volpath.comp.glsl:612-629).

One measured arithmetic choice (round 3):

- PACKED NEE K-LIST. The sweep's sorted insertion keeps the K nearest
  media boundaries; as separate (t, medium) pairs that costs 5 vector
  ops per slot per triangle. Packing both into one int32 key
  [t-bits & ~63 | media_index] (positive-float bit order == value
  order; the 6-bit field quantizes t DOWN by <= 63 ulps ~ 7.5e-6
  relative, two orders below the T_MIN=1e-4 the march's dup/window
  logic works at) makes insertion a 2-op integer min/max chain and
  HALVES the carried state (K keys + t_opq vs K ts + K mats + t_opq).
  The field holds the MEDIA-TABLE ROW INDEX, not the raw material id
  (computed scalar-side from the loop-invariant med_ids — it co-issues),
  so material ids are unbounded; only the media-table row count must
  fit 6 bits (<= 63 media — the reference's dictionary has 12).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_INF = np.float32(3e38)

NEE_MAT_BITS = 6
NEE_MAT_MASK = np.int32((1 << NEE_MAT_BITS) - 1)
KEY_EMPTY = np.int32(2147483647)

# Spare K-list slots beyond the 2*nee_max_media boundaries the march can
# consume. A DUPLICATE media boundary (within T_MIN of the previous one —
# coincident/double-faced shells) is correctly SKIPPED by the march's leg
# logic but still occupies a list slot in the sweep, so without spares a
# scene with coincident shells exhausts the list early and fails dark
# where the reference's per-leg queries (whose T_MIN ray offset never
# surfaces the duplicate) resolve — the round-2/3 advisor finding,
# confirmed on chip (--nee-bound 2 visibly darkened cup). Two spares
# absorb two duplicate crossings per shadow ray at +2 min/max chain ops
# per media triangle; deeper coincident stacks still need --nee-bound.
NEE_DUP_SPARE = 2


def nee_list_len(nee_max_media: int) -> int:
    """K-list length for the NEE sweep: enter+exit per media pair, plus
    the duplicate-absorbing spares."""
    return 2 * nee_max_media + NEE_DUP_SPARE


def nee_state_size(K_NEE: int) -> int:
    """'nee' payload state: K packed boundary keys + t_opq."""
    return K_NEE + 1


def nee_unpack_t(key, miss, bitcast=jax.lax.bitcast_convert_type):
    """Boundary distance of a packed key (quantized down <= 63 ulps);
    ``miss`` for empty slots."""
    t = bitcast(key & ~NEE_MAT_MASK, jnp.float32)
    return jnp.where(key == KEY_EMPTY, miss, t)


def nee_unpack_mat(key):
    """Media-table row index of a packed key; -1.0 for empty slots."""
    m = (key & NEE_MAT_MASK).astype(jnp.float32)
    return jnp.where(key == KEY_EMPTY, jnp.float32(-1.0), m)


def payload_state0(payload: str, TMAX, K_NEE: int = 0, TMAX_B=None):
    """Initial traversal state for a payload kind.

    'full' -> (t, slot, u, v, nx, ny, nz, mat, px, py, pz)
    'nee'  -> K_NEE packed boundary keys (int32) + t_opq
    'dist' -> (t, slot);  'occl' -> (t,)
    'dnee' -> (t, slot) for ray set A + K_NEE keys + t_opq for set B
              (the fused dist+NEE sweep; TMAX_B bounds set B)
    t == per-lane TMAX on miss; slot/mat == -1.
    """
    zeros = jnp.zeros_like(TMAX)
    neg1 = jnp.full_like(TMAX, -1.0)
    if payload == "full":
        return (TMAX, neg1, zeros, zeros, zeros, zeros,
                jnp.ones_like(TMAX), neg1, zeros, zeros, zeros)
    if payload == "nee":
        empty = jnp.full(TMAX.shape, KEY_EMPTY, jnp.int32)
        return tuple([empty] * K_NEE) + (TMAX,)
    if payload == "dnee":
        empty = jnp.full(TMAX.shape, KEY_EMPTY, jnp.int32)
        return (TMAX, neg1) + tuple([empty] * K_NEE) + (TMAX_B,)
    if payload == "occl":
        return (TMAX,)
    return (TMAX, neg1)


def payload_bound(payload: str, state, K_NEE: int = 0,
                  bitcast=jax.lax.bitcast_convert_type):
    """Early-exit bound: the worst tracked hit — t_best for closest-hit
    payloads; min(K-th smallest media boundary, nearest opaque hit) for
    the multi-hit sweep (nothing beyond the nearest opaque occluder can
    matter). ``bitcast`` lets Pallas kernels pass pltpu.bitcast (Mosaic
    lacks the XLA bitcast lowering)."""
    if payload == "nee":
        kth = nee_unpack_t(state[K_NEE - 1], _INF, bitcast)
        return jnp.minimum(kth, state[K_NEE])
    return state[0]


def make_cluster_tester(
    runs_ref,
    subs: int,
    run: int,
    payload: str,
    K_NEE: int,
    med_ids,
    t_min,
    bitcast=jax.lax.bitcast_convert_type,
):
    """Build ``test_cluster(c, rays, state) -> state`` over run-major rows.

    ``rays`` = (OX, OY, OZ, DX, DY, DZ) lane tiles; ``c`` is a (traced)
    cluster index; ``med_ids`` the loop-invariant media material-id
    scalars for the 'nee' payload's per-triangle opaque/media split;
    ``bitcast`` as in payload_bound.

    The run-major table (one row per SUB_SIZE-triangle run) replaces 10+
    per-cluster dynamic row reads with one per run and keeps every
    extract static — measured 5.38 vs 5.90 ms/bounce (NOTES.md round 3).
    FINER-GRAINED CULLING IS A MEASURED DEAD END on this hardware: a
    traced-trip-count fori_loop over entering runs costs 8.66 vs 5.38
    ms/bounce and a per-run scalar lax.cond 10.0 vs 5.4 (each cond ~500
    cycles at this carried-state size). Only cluster granularity (128
    triangles ~ 4.3k cycles) amortizes a branch; below that,
    straight-line arithmetic wins.
    """
    eps = jnp.float32(1e-6)

    def media_index(mat_scalar):
        """Scalar media-table row index for a material id (-1 = none;
        first matching row wins, mirroring the reference's first-match
        linear scan volpath:137-145). Pure scalar ops over the
        loop-invariant med_ids — they co-issue with the vector pipe."""
        idx = jnp.float32(-1.0)
        for i in reversed(range(len(med_ids))):
            mid = med_ids[i]
            idx = jnp.where(
                (mat_scalar == mid) & (mid >= 0.0), jnp.float32(i), idx
            )
        return idx

    def test_cluster(c, rays, state, mask=None):
        """``mask`` (lane tile of bool) restricts which lanes may ACCEPT
        hits from this visit. Closest-hit payloads never need it (a
        repeated test is idempotent under the strict tt < t_best), but
        the 'nee' K-list insert is NOT idempotent: a caller that can
        test the same cluster against a lane more than once (the binned
        round kernel re-tests a cluster whenever it is any block-mate's
        head) must mask insertions to exactly-once lanes or boundaries
        duplicate in the list.

        'dnee' fuses the distance trace (ray set A) and the NEE sweep
        (ray set B) over a SHARED ORIGIN — both start at the bounce's
        hit point, so s = O - v0, q = s x e1 and the t numerator
        e2 . q are computed once and the per-triangle scalar extracts
        (the inner loop's real margin on this machine) are paid once
        for both traces. ``rays`` is then (O..., D_A..., D_B...).
        Results are bit-identical to separate walks: each set's accepts
        are gated by its own geometry tests, extra visits are invisible
        to strict closest-hit updates, and K-list inserts beyond the
        K-th kept key or the opaque bound fall off the chain exactly as
        an unvisited-because-culled cluster's would."""
        if payload == "dnee":
            OX, OY, OZ, DX, DY, DZ, DXB, DYB, DZB = rays
        else:
            OX, OY, OZ, DX, DY, DZ = rays

        def tri_step(row, r_off, j, state):
            ax = row[0 * run + j]
            ay = row[1 * run + j]
            az = row[2 * run + j]
            e1xj = row[3 * run + j]
            e1yj = row[4 * run + j]
            e1zj = row[5 * run + j]
            e2xj = row[6 * run + j]
            e2yj = row[7 * run + j]
            e2zj = row[8 * run + j]
            mat_j = row[9 * run + j]
            # Quad far-corner coefficients (accel/clusters.py): the slot
            # accepts the planar convex quad {u,v >= 0, qb*u+(1-qa)*v <=
            # qb, (1-qb)*u+qa*v <= qa}; a plain triangle carries
            # qa = qb = 0.5 (both tests == u+v <= 1). The complements
            # are SCALAR ops — they co-issue with the vector pipe.
            qa_j = row[10 * run + j]
            qb_j = row[11 * run + j]
            qa1_j = 1.0 - qa_j
            qb1_j = 1.0 - qb_j

            def inside(uu, vv):
                """Quad-generalized barycentric acceptance.

                The edge tolerance scales with the test's threshold
                (``qb*(1+eps)``, not ``qb+eps``): with the raw ``+eps``
                form a plain triangle (qa=qb=0.5) accepted u+v <=
                1+2*eps — double the historical triangle tolerance, so
                an unpaired build was NOT decision-identical to the
                pre-quad kernel (knife-edge hits could flip vs the bvh
                backend). Scaled, the triangle case is bit-equivalent
                to ``u+v <= 1+eps``: multiplying both sides of an fp
                comparison by the exact power of two 0.5 commutes with
                rounding, so fl(0.5u+0.5v) <= 0.5*fl(1+eps) iff
                fl(u+v) <= fl(1+eps).
                """
                return (
                    (uu >= -eps)
                    & (vv >= -eps)
                    & (uu * qb_j + vv * qa1_j <= qb_j * (1.0 + eps))
                    & (uu * qb1_j + vv * qa_j <= qa_j * (1.0 + eps))
                )

            # Classic Moller-Trumbore: one triangle vs 1024 rays. Two
            # REJECTED variants, both measured SLOWER end-to-end despite
            # fewer vector ops: approx-reciprocal + Newton for the
            # divide (Mosaic's f32 divide is already cheap), and a
            # stored-normal reformulation sharing one cross m = s x D
            # (saves ~5-11 arithmetic ops/tri but costs 3 more scalar
    # extracts from the run row — showcase 1.23 vs 1.45, cup
            # 0.132 vs 0.157 Mpaths/s; extract/broadcast cost, not
            # flops, is the margin on this machine).
            px = DY * e2zj - DZ * e2yj
            py = DZ * e2xj - DX * e2zj
            pz = DX * e2yj - DY * e2xj
            det = e1xj * px + e1yj * py + e1zj * pz
            inv_det = 1.0 / jnp.where(
                jnp.abs(det) > 1e-12, det, jnp.float32(1e30)
            )
            sx = OX - ax
            sy = OY - ay
            sz = OZ - az
            uu = (sx * px + sy * py + sz * pz) * inv_det
            qx = sy * e1zj - sz * e1yj
            qy = sz * e1xj - sx * e1zj
            qz = sx * e1yj - sy * e1xj
            vv = (DX * qx + DY * qy + DZ * qz) * inv_det
            t_num = e2xj * qx + e2yj * qy + e2zj * qz
            tt = t_num * inv_det
            if payload == "dnee":
                # Set A (distance trace): closest hit as in 'dist'.
                t_best, slot = state[0], state[1]
                improved = inside(uu, vv) & (tt > t_min) & (tt < t_best)
                t_best = jnp.where(improved, tt, t_best)
                slot = jnp.where(improved, r_off + j, slot)
                # Set B (NEE sweep): s/q/t_num reuse; only p/det and the
                # dot products against D_B are per-set.
                pbx = DYB * e2zj - DZB * e2yj
                pby = DZB * e2xj - DXB * e2zj
                pbz = DXB * e2yj - DYB * e2xj
                detb = e1xj * pbx + e1yj * pby + e1zj * pbz
                inv_b = 1.0 / jnp.where(
                    jnp.abs(detb) > 1e-12, detb, jnp.float32(1e30)
                )
                ub = (sx * pbx + sy * pby + sz * pbz) * inv_b
                vb = (DXB * qx + DYB * qy + DZB * qz) * inv_b
                tb = t_num * inv_b
                keys = list(state[2 : 2 + K_NEE])
                t_opq = state[2 + K_NEE]
                midx = media_index(mat_j)
                med = midx >= 0.0
                valid_geom = inside(ub, vb) & (tb > t_min)
                t_opq = jnp.where(
                    valid_geom & ~med & (tb < t_opq), tb, t_opq
                )
                valid = valid_geom & med & (tb < t_opq)
                mat_i = jnp.maximum(midx, 0.0).astype(jnp.int32)
                cand = jnp.where(
                    valid,
                    (bitcast(tb, jnp.int32) & ~NEE_MAT_MASK) | mat_i,
                    KEY_EMPTY,
                )
                for i in range(K_NEE):
                    s = keys[i]
                    keys[i] = jnp.minimum(cand, s)
                    cand = jnp.maximum(cand, s)
                return (t_best, slot) + tuple(keys) + (t_opq,)
            if payload == "nee":
                # Opaque/media split at the TRIANGLE level: the material
                # id is a per-run scalar, so the media check costs ~2
                # scalar ops. Media boundaries bubble into the K packed
                # key slots; opaque hits only shrink t_opq (per-leg
                # queries would never surface more than the nearest
                # opaque hit — it occludes), which both frees list slots
                # and tightens payload_bound.
                keys = list(state[:K_NEE])
                t_opq = state[K_NEE]
                midx = media_index(mat_j)
                med = midx >= 0.0
                valid_geom = inside(uu, vv) & (tt > t_min)
                if mask is not None:
                    valid_geom = valid_geom & mask
                t_opq = jnp.where(
                    valid_geom & ~med & (tt < t_opq), tt, t_opq
                )
                valid = valid_geom & med & (tt < t_opq)
                mat_i = jnp.maximum(midx, 0.0).astype(jnp.int32)
                cand = jnp.where(
                    valid,
                    (bitcast(tt, jnp.int32) & ~NEE_MAT_MASK) | mat_i,
                    KEY_EMPTY,
                )
                # 2-op sorted insertion; a candidate beyond the K-th
                # kept key falls off the end of the min/max chain.
                for i in range(K_NEE):
                    s = keys[i]
                    keys[i] = jnp.minimum(cand, s)
                    cand = jnp.maximum(cand, s)
                return tuple(keys) + (t_opq,)
            t_best = state[0]
            improved = inside(uu, vv) & (tt > t_min) & (tt < t_best)
            t_best = jnp.where(improved, tt, t_best)
            if payload == "full":
                (_, slot, ub, vb, nxb, nyb, nzb, mb, pxb, pyb, pzb) = state
                slot = jnp.where(improved, r_off + j, slot)
                ub = jnp.where(improved, uu, ub)
                vb = jnp.where(improved, vv, vb)
                nxb = jnp.where(improved, e1yj * e2zj - e1zj * e2yj, nxb)
                nyb = jnp.where(improved, e1zj * e2xj - e1xj * e2zj, nyb)
                nzb = jnp.where(improved, e1xj * e2yj - e1yj * e2xj, nzb)
                mb = jnp.where(improved, mat_j, mb)
                pxb = jnp.where(improved, ax + uu * e1xj + vv * e2xj, pxb)
                pyb = jnp.where(improved, ay + uu * e1yj + vv * e2yj, pyb)
                pzb = jnp.where(improved, az + uu * e1zj + vv * e2zj, pzb)
                return (t_best, slot, ub, vb, nxb, nyb, nzb, mb,
                        pxb, pyb, pzb)
            if payload == "occl":
                return (t_best,)
            (_, slot) = state
            slot = jnp.where(improved, r_off + j, slot)
            return (t_best, slot)

        for rr_s in range(subs):
            row = runs_ref[c * subs + rr_s]
            r_off = ((c * subs + rr_s) * run).astype(jnp.float32)
            for j in range(run):
                state = tri_step(row, r_off, j, state)
        return state

    return test_cluster
