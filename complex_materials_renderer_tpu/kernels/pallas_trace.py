"""Pallas TPU closest-hit tracer over Morton triangle clusters.

The hot traversal kernel (replaces the reference's hardware ray queries,
volpath.comp.glsl:612-627) designed around what the TPU is actually fast
at — see accel/clusters.py for the structure rationale. Shape discipline:

- 1024 rays per grid block; every ray quantity is one natural (8, 128)
  VPU tile. No transposes, no cross-lane reductions, no per-lane gathers.
- triangle data dense in the lane dimension: (C, 128) per component; one
  dynamic *row* read per cluster (dynamic indexing never touches lanes).
- the inner loop is statically unrolled over the cluster's 128 triangle
  slots: each step splats one triangle's 9 scalars from the row (static
  lane extract) and runs Moller-Trumbore for all 1024 rays as pure
  elementwise (8, 128) ops, updating best-hit state held in fori-loop
  carries (registers).
- cluster AABBs live in SMEM; culling is a *scalar* branch (lax.cond on a
  reduce), so skipped clusters cost a handful of cycles — the
  control-flow sparsity XLA's select-based cond cannot express.
- blocks whose rays are all inactive (t_max <= t_min) skip everything —
  compacted wavefront dead lanes are near-free.

The kernel returns the full shading payload (barycentric position,
geometric normal, material id) so the integrator never touches XLA
gathers on the hot path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

BLOCK_RAYS = 1024  # 8 sublanes x 128 lanes


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "v0x", "v0y", "v0z", "e1x", "e1y", "e1z", "e2x", "e2y", "e2z",
        "bounds", "super_bounds", "tri_index", "mat",
        "qa", "qb",
        "run_rows",
    ],
    meta_fields=[
        "num_clusters", "num_supers", "num_opaque_supers",
        "runs_per_cluster", "run_size", "super_factor", "interpret",
    ],
)
@dataclasses.dataclass(frozen=True)
class DeviceClusterGrid:
    v0x: jnp.ndarray  # (C, 128)
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    e1x: jnp.ndarray  # precomputed v1 - v0
    e1y: jnp.ndarray
    e1z: jnp.ndarray
    e2x: jnp.ndarray  # precomputed v2 - v0
    e2y: jnp.ndarray
    e2z: jnp.ndarray
    bounds: jnp.ndarray  # (C, 8) SMEM-bound cluster AABBs
    super_bounds: jnp.ndarray  # (S, 8) SMEM-bound super-cluster AABBs
    tri_index: jnp.ndarray  # (C*128,) slot -> original triangle id
    mat: jnp.ndarray  # (C, 128) per-slot material id (float32 on device)
    # Per-slot quad far-corner coefficients (accel/clusters.py): a slot
    # accepts {u,v >= 0, qb*u + (1-qa)*v <= qb, (1-qb)*u + qa*v <= qa};
    # triangles carry (0.5, 0.5) — that is exactly u+v <= 1.
    qa: jnp.ndarray  # (C, 128)
    qb: jnp.ndarray  # (C, 128)
    # Run-major primitive rows — the megakernel's triangle table: one row
    # per SUB_SIZE-slot run, 12 components strided by run_size —
    # [v0x*r, v0y*r, v0z*r, e1x*r, e1y*r, e1z*r, e2x*r, e2y*r, e2z*r,
    # mat*r, qa*r, qb*r], lane-padded to a multiple of 128. One dynamic
    # ROW read fetches a whole run (vs 10+ per-component reads per
    # cluster); extracts within the row are static. Measured 5.38 vs
    # 5.90 ms/bounce against the per-component layout (NOTES.md round 3).
    run_rows: jnp.ndarray  # (C * runs_per_cluster, row_width)
    num_clusters: int
    num_supers: int
    num_opaque_supers: int  # supers [0, this) hold only opaque triangles
    runs_per_cluster: int
    run_size: int
    super_factor: int  # clusters per super (accel/clusters.py)
    interpret: bool  # run the kernel interpreted (CPU tests)


def device_cluster_grid(grid, interpret: bool | None = None) -> DeviceClusterGrid:
    """Upload a host ClusterGrid. ``interpret`` defaults to True off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Slot ids and material ids ride through the kernel as float32; above
    # 2^24 slots (~16.7M triangles) slot identity would silently lose
    # integer precision and corrupt prim/material lookups.
    num_slots = int(grid.bounds.shape[0]) * int(grid.v0x.shape[1])
    if num_slots >= 1 << 24:
        raise ValueError(
            f"cluster grid has {num_slots} triangle slots; the kernel's "
            "float32 slot ids are exact only below 2^24 (16.7M triangles)"
        )

    import numpy as np

    from ..accel.clusters import SUB_SIZE

    c = int(grid.bounds.shape[0])
    width = int(grid.v0x.shape[1])
    subs = max(1, width // SUB_SIZE)
    if width % subs:
        raise ValueError(f"cluster width {width} not divisible into runs")
    run = width // subs
    # 12 components: v0, e1, e2, material id, quad (qa, qb). (A
    # 13-component layout with a precomputed normal was measured SLOWER:
    # the reformulated test saved vector flops but paid 3 extra scalar
    # extracts per triangle — see cluster_test.py. The quad coefficients
    # are different: +2 extracts per slot BUY a merged second triangle
    # on quad-tessellated meshes.)
    row_w = -(-(12 * run) // 128) * 128
    # Material ids are unbounded below 2^24 (they ride as exact f32):
    # the NEE packed keys carry the MEDIA-TABLE ROW INDEX, not the raw
    # id (cluster_test.media_index) — only the media-table row count is
    # capped (megakernel.pack_media).
    qa = grid.qa if grid.qa is not None else np.full_like(
        np.asarray(grid.v0x, np.float32), 0.5
    )
    qb = grid.qb if grid.qb is not None else np.full_like(
        np.asarray(grid.v0x, np.float32), 0.5
    )
    comps = [
        grid.v0x, grid.v0y, grid.v0z,
        grid.e1x, grid.e1y, grid.e1z,
        grid.e2x, grid.e2y, grid.e2z,
        np.asarray(grid.mat_id, np.float32),
        qa, qb,
    ]
    run_rows = np.zeros((c * subs, row_w), np.float32)
    for k, arr in enumerate(comps):
        run_rows[:, k * run : (k + 1) * run] = np.asarray(
            arr, np.float32
        ).reshape(c * subs, run)

    return DeviceClusterGrid(
        v0x=jnp.asarray(grid.v0x), v0y=jnp.asarray(grid.v0y), v0z=jnp.asarray(grid.v0z),
        e1x=jnp.asarray(grid.e1x), e1y=jnp.asarray(grid.e1y), e1z=jnp.asarray(grid.e1z),
        e2x=jnp.asarray(grid.e2x), e2y=jnp.asarray(grid.e2y), e2z=jnp.asarray(grid.e2z),
        bounds=jnp.asarray(grid.bounds),
        super_bounds=jnp.asarray(grid.super_bounds),
        tri_index=jnp.asarray(grid.tri_index),
        # Material ids ride as float32 so every update is a same-type
        # vector select; ids are small ints, exactly representable.
        mat=jnp.asarray(grid.mat_id, jnp.float32),
        qa=jnp.asarray(qa, jnp.float32),
        qb=jnp.asarray(qb, jnp.float32),
        run_rows=jnp.asarray(run_rows),
        num_clusters=int(grid.bounds.shape[0]),
        num_supers=int(grid.super_bounds.shape[0]),
        num_opaque_supers=int(getattr(grid, "num_opaque_supers", 0)),
        runs_per_cluster=subs,
        run_size=run,
        super_factor=int(getattr(grid, "super_factor", 16)),
        interpret=bool(interpret),
    )


def _trace_kernel(num_clusters: int, num_supers: int, width: int,
                  t_min: float, super_factor: int = 16):
    SUPER_FACTOR = super_factor

    def kernel(
        cb_ref,  # SMEM (C, 8)
        sb_ref,  # SMEM (S, 8)
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # (8,128)
        v0x_ref, v0y_ref, v0z_ref, e1x_ref, e1y_ref, e1z_ref,
        e2x_ref, e2y_ref, e2z_ref, mat_ref, qa_ref, qb_ref,  # (C,128)
        t_out, slot_out, u_out, v_out, nx_out, ny_out, nz_out, mat_out,
        px_out, py_out, pz_out,  # (8,128)
    ):
        TMAX = tmax_ref[:]

        # Miss defaults; the active branch overwrites them.
        t_out[:] = TMAX
        slot_out[:] = jnp.full((8, 128), -1.0, jnp.float32)
        u_out[:] = jnp.zeros((8, 128), jnp.float32)
        v_out[:] = jnp.zeros((8, 128), jnp.float32)
        nx_out[:] = jnp.zeros((8, 128), jnp.float32)
        ny_out[:] = jnp.zeros((8, 128), jnp.float32)
        nz_out[:] = jnp.ones((8, 128), jnp.float32)
        mat_out[:] = jnp.full((8, 128), -1.0, jnp.float32)
        px_out[:] = jnp.zeros((8, 128), jnp.float32)
        py_out[:] = jnp.zeros((8, 128), jnp.float32)
        pz_out[:] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(jnp.max(TMAX) > t_min)
        def _():
            OX, OY, OZ = ox_ref[:], oy_ref[:], oz_ref[:]
            DX, DY, DZ = dx_ref[:], dy_ref[:], dz_ref[:]

            tiny = jnp.float32(1e-12)

            def safe_inv(v):
                return 1.0 / jnp.where(
                    jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v
                )

            IX, IY, IZ = safe_inv(DX), safe_inv(DY), safe_inv(DZ)

            zeros = jnp.zeros((8, 128), jnp.float32)
            state0 = (
                TMAX,  # t_best
                jnp.full((8, 128), -1.0, jnp.float32),  # slot
                zeros,  # u
                zeros,  # v
                zeros, zeros, jnp.ones((8, 128), jnp.float32),  # normal
                jnp.full((8, 128), -1.0, jnp.float32),  # mat
                zeros, zeros, zeros,  # position
            )

            def slab_any(ref, idx, t_best):
                """Scalar: does any lane's ray enter this AABB within
                [t_min, its live t_best]?"""
                bx0 = ref[idx, 0]
                by0 = ref[idx, 1]
                bz0 = ref[idx, 2]
                bx1 = ref[idx, 3]
                by1 = ref[idx, 4]
                bz1 = ref[idx, 5]
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
                tf = jnp.minimum(tf, t_best)
                return jnp.any(tn <= tf)

            def cluster_body(c, state):
                t_best = state[0]

                def test_cluster(state):
                    (t_best, slot, ub, vb, nxb, nyb, nzb, mb, pxb, pyb, pzb) = state
                    a_x = v0x_ref[c]
                    a_y = v0y_ref[c]
                    a_z = v0z_ref[c]
                    g1x = e1x_ref[c]
                    g1y = e1y_ref[c]
                    g1z = e1z_ref[c]
                    g2x = e2x_ref[c]
                    g2y = e2y_ref[c]
                    g2z = e2z_ref[c]
                    m_row = mat_ref[c]
                    qa_row = qa_ref[c]
                    qb_row = qb_ref[c]
                    base_slot = (c * width).astype(jnp.float32)

                    eps = jnp.float32(1e-6)
                    for j in range(width):
                        ax = a_x[j]
                        ay = a_y[j]
                        az = a_z[j]
                        e1x = g1x[j]
                        e1y = g1y[j]
                        e1z = g1z[j]
                        e2x = g2x[j]
                        e2y = g2y[j]
                        e2z = g2z[j]
                        qa_j = qa_row[j]
                        qb_j = qb_row[j]

                        # Moller-Trumbore, one triangle vs 1024 rays.
                        px = DY * e2z - DZ * e2y
                        py = DZ * e2x - DX * e2z
                        pz = DX * e2y - DY * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        inv_det = 1.0 / jnp.where(
                            jnp.abs(det) > 1e-12, det, jnp.float32(1e30)
                        )
                        sx = OX - ax
                        sy = OY - ay
                        sz = OZ - az
                        uu = (sx * px + sy * py + sz * pz) * inv_det
                        qx = sy * e1z - sz * e1y
                        qy = sz * e1x - sx * e1z
                        qz = sx * e1y - sy * e1x
                        vv = (DX * qx + DY * qy + DZ * qz) * inv_det
                        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        # Quad-generalized acceptance (triangles carry
                        # qa = qb = 0.5, reducing both far-edge tests to
                        # (u+v)/2 <= 1/2): see accel/clusters.ClusterGrid.
                        improved = (
                            (uu >= -eps)
                            & (vv >= -eps)
                            & (uu * qb_j + vv * (1.0 - qa_j) <= qb_j + eps)
                            & (uu * (1.0 - qb_j) + vv * qa_j <= qa_j + eps)
                            & (tt > t_min)
                            & (tt < t_best)
                        )
                        t_best = jnp.where(improved, tt, t_best)
                        slot = jnp.where(improved, base_slot + j, slot)
                        ub = jnp.where(improved, uu, ub)
                        vb = jnp.where(improved, vv, vb)
                        nxb = jnp.where(improved, e1y * e2z - e1z * e2y, nxb)
                        nyb = jnp.where(improved, e1z * e2x - e1x * e2z, nyb)
                        nzb = jnp.where(improved, e1x * e2y - e1y * e2x, nzb)
                        mb = jnp.where(improved, m_row[j], mb)
                        # Barycentric position (volpath:158-181).
                        pxb = jnp.where(improved, ax + uu * e1x + vv * e2x, pxb)
                        pyb = jnp.where(improved, ay + uu * e1y + vv * e2y, pyb)
                        pzb = jnp.where(improved, az + uu * e1z + vv * e2z, pzb)

                    return (t_best, slot, ub, vb, nxb, nyb, nzb, mb, pxb, pyb, pzb)

                return jax.lax.cond(
                    slab_any(cb_ref, c, t_best), test_cluster, lambda s: s, state
                )

            def super_body(sp, state):
                lo = sp * SUPER_FACTOR
                hi = jnp.minimum(lo + SUPER_FACTOR, num_clusters)
                return jax.lax.cond(
                    slab_any(sb_ref, sp, state[0]),
                    lambda st: jax.lax.fori_loop(lo, hi, cluster_body, st),
                    lambda st: st,
                    state,
                )

            state = jax.lax.fori_loop(0, num_supers, super_body, state0)
            (t_best, slot, ub, vb, nxb, nyb, nzb, mb, pxb, pyb, pzb) = state

            t_out[:] = t_best
            slot_out[:] = slot
            u_out[:] = ub
            v_out[:] = vb
            nx_out[:] = nxb
            ny_out[:] = nyb
            nz_out[:] = nzb
            mat_out[:] = mb
            px_out[:] = pxb
            py_out[:] = pyb
            pz_out[:] = pzb

    return kernel


class ShadedHit(NamedTuple):
    """Hit plus shading payload straight from the kernel (no gathers)."""

    t: jnp.ndarray
    hit: jnp.ndarray  # (R,) bool
    u: jnp.ndarray
    v: jnp.ndarray
    normal: jnp.ndarray  # (R, 3) normalized geometric normal
    mat_id: jnp.ndarray  # (R,) int32; -1 on miss
    position: jnp.ndarray  # (R, 3) barycentric hit position (volpath:170)


def trace_shaded_clusters(o, d, grid: DeviceClusterGrid, t_min, t_max, active=None) -> ShadedHit:
    """Closest-hit trace returning shading payload (normal, material id,
    position) computed in-kernel — the integrator's hot path."""
    t_raw, slot, u, v, nx, ny, nz, mat, px, py, pz, t_max_arr = _trace_core(
        o, d, grid, t_min, t_max, active
    )
    hit = slot >= 0
    t = jnp.where(hit, t_raw, t_max_arr)
    n = jnp.stack([nx, ny, nz], axis=-1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    pos = jnp.stack([px, py, pz], axis=-1)
    return ShadedHit(
        t=t, hit=hit, u=u, v=v, normal=n,
        mat_id=jnp.where(hit, mat, -1), position=pos,
    )


def trace_closest_clusters(o, d, grid: DeviceClusterGrid, t_min, t_max, active=None) -> Hit:
    """Closest-hit trace via the cluster kernel. Same contract as
    traverse.trace_closest: t == t_max on miss, prim indexes the original
    triangle order. Inactive lanes are encoded as t_max = 0, which the
    kernel's block predicate turns into skipped work."""
    t_raw, slot, u, v, *_rest, t_max_arr = _trace_core(
        o, d, grid, t_min, t_max, active
    )
    hit = slot >= 0
    prim = jnp.where(hit, grid.tri_index[jnp.maximum(slot, 0)], -1)
    t = jnp.where(hit, t_raw, t_max_arr)
    return Hit(t=t, prim=prim, u=u, v=v)


def _trace_core(o, d, grid: DeviceClusterGrid, t_min, t_max, active=None):
    r = o.shape[0]
    t_max_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    t_min = float(t_min)

    eff_tmax = t_max_arr
    if active is not None:
        eff_tmax = jnp.where(active, t_max_arr, 0.0)

    pad = (-r) % BLOCK_RAYS
    rp = r + pad
    blocks = rp // BLOCK_RAYS

    def pack(x, fill=0.0):
        x = jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)]) if pad else x
        return x.reshape(blocks * 8, 128)

    ox = pack(o[:, 0])
    oy = pack(o[:, 1])
    oz = pack(o[:, 2])
    dx = pack(d[:, 0], 1.0)
    dy = pack(d[:, 1], 1.0)
    dz = pack(d[:, 2], 1.0)
    tm = pack(eff_tmax)

    c = grid.num_clusters
    width = grid.v0x.shape[1]
    ray_spec = pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((c, width), lambda b: (0, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32)
    out_shape = [f32] * 11

    s_count = grid.num_supers
    outs = pl.pallas_call(
        _trace_kernel(c, s_count, width, t_min, grid.super_factor),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((c, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((s_count, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            tri_spec, tri_spec, tri_spec, tri_spec, tri_spec, tri_spec,
            tri_spec, tri_spec, tri_spec, tri_spec, tri_spec, tri_spec,
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ] * 11,
        out_shape=out_shape,
        interpret=grid.interpret,
    )(
        grid.bounds,
        grid.super_bounds,
        ox, oy, oz, dx, dy, dz, tm,
        grid.v0x, grid.v0y, grid.v0z,
        grid.e1x, grid.e1y, grid.e1z,
        grid.e2x, grid.e2y, grid.e2z,
        grid.mat, grid.qa, grid.qb,
    )

    (t_o, slot_f, u_o, v_o, nx_o, ny_o, nz_o, mat_f, px_o, py_o, pz_o) = (
        x.reshape(rp)[:r] for x in outs
    )
    slot_o = slot_f.astype(jnp.int32)
    mat_o = mat_f.astype(jnp.int32)
    return (
        t_o, slot_o, u_o, v_o, nx_o, ny_o, nz_o, mat_o,
        px_o, py_o, pz_o, t_max_arr,
    )
