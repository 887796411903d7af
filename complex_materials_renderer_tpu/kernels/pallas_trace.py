"""Pallas TPU closest-hit tracer over Morton triangle clusters.

The hot traversal kernel (replaces the reference's hardware ray queries,
volpath.comp.glsl:612-627) designed around what the TPU is actually fast
at — see accel/clusters.py for the structure rationale. Shape discipline:

- 1024 rays per grid block, components as one (8, 128) VPU tile each;
- triangle data dense in the lane dimension: (C, 128) per component, one
  dynamic *row* read per cluster (dynamic indexing never touches lanes);
- rays re-grouped into 8-ray octets via an in-kernel transpose to
  (128, 8) scratch, so the inner Moller-Trumbore runs as full
  (8 rays x 128 triangles) vector ops. Octet o is exactly lane column o
  of the block, so the cluster's per-lane slab mask reduces over sublanes
  straight into per-octet work flags — the octet loop is then a ~5-cycle
  scalar check per skipped octet, not a 25-op vector pre-test;
- cluster AABBs live in SMEM; culling is a *scalar* branch (pl.when), so
  skipped clusters cost a handful of cycles — the control-flow sparsity
  XLA's select-based cond cannot express;
- blocks whose rays are all inactive (t_max <= t_min) skip everything —
  compacted wavefront dead lanes are near-free.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

BLOCK_RAYS = 1024  # 8 sublanes x 128 lanes


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "v0x", "v0y", "v0z", "v1x", "v1y", "v1z", "v2x", "v2y", "v2z",
        "bounds", "tri_index", "mat",
    ],
    meta_fields=["num_clusters", "interpret"],
)
@dataclasses.dataclass(frozen=True)
class DeviceClusterGrid:
    v0x: jnp.ndarray  # (C, 128)
    v0y: jnp.ndarray
    v0z: jnp.ndarray
    v1x: jnp.ndarray
    v1y: jnp.ndarray
    v1z: jnp.ndarray
    v2x: jnp.ndarray
    v2y: jnp.ndarray
    v2z: jnp.ndarray
    bounds: jnp.ndarray  # (C, 8) SMEM-bound cluster AABBs
    tri_index: jnp.ndarray  # (C*128,) slot -> original triangle id
    mat: jnp.ndarray  # (C, 128) per-slot material id
    num_clusters: int
    interpret: bool  # run the kernel interpreted (CPU tests)


def device_cluster_grid(grid, interpret: bool | None = None) -> DeviceClusterGrid:
    """Upload a host ClusterGrid. ``interpret`` defaults to True off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return DeviceClusterGrid(
        v0x=jnp.asarray(grid.v0x), v0y=jnp.asarray(grid.v0y), v0z=jnp.asarray(grid.v0z),
        v1x=jnp.asarray(grid.v1x), v1y=jnp.asarray(grid.v1y), v1z=jnp.asarray(grid.v1z),
        v2x=jnp.asarray(grid.v2x), v2y=jnp.asarray(grid.v2y), v2z=jnp.asarray(grid.v2z),
        bounds=jnp.asarray(grid.bounds),
        tri_index=jnp.asarray(grid.tri_index),
        mat=jnp.asarray(grid.mat_id),
        num_clusters=int(grid.bounds.shape[0]),
        interpret=bool(interpret),
    )


def _trace_kernel(num_clusters: int, t_min: float):
    def kernel(
        cb_ref,  # SMEM (C, 8)
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # (8,128)
        v0x_ref, v0y_ref, v0z_ref, v1x_ref, v1y_ref, v1z_ref,
        v2x_ref, v2y_ref, v2z_ref, mat_ref,  # (C,128)
        t_out, slot_out, u_out, v_out, nx_out, ny_out, nz_out, mat_out,
        px_out, py_out, pz_out,  # (8,128)
        # scratch: transposed per-octet ray state (128, 8) + per-cluster
        # octet flags/entry (128, 1)
        tox, toy, toz, tdx, tdy, tdz,
        tbT, uT, vT, slotT, nxT, nyT, nzT, matT, pxT, pyT, pzT, flagT, tnT,
    ):
        TMAX = tmax_ref[:]

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        # Miss defaults — the active branch overwrites from scratch below,
        # so all-dead blocks pay only these four stores.
        t_out[:] = TMAX
        slot_out[:] = jnp.full((8, 128), -1, jnp.int32)
        u_out[:] = jnp.zeros((8, 128), jnp.float32)
        v_out[:] = jnp.zeros((8, 128), jnp.float32)
        nx_out[:] = jnp.zeros((8, 128), jnp.float32)
        ny_out[:] = jnp.zeros((8, 128), jnp.float32)
        nz_out[:] = jnp.ones((8, 128), jnp.float32)
        mat_out[:] = jnp.full((8, 128), -1, jnp.int32)
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

            # Octet o == lane column o of the (8, 128) block (the transpose
            # maps [s, l] -> [l, s]).
            tox[:] = OX.T
            toy[:] = OY.T
            toz[:] = OZ.T
            tdx[:] = DX.T
            tdy[:] = DY.T
            tdz[:] = DZ.T
            tbT[:] = TMAX.T
            uT[:] = jnp.zeros_like(uT)
            vT[:] = jnp.zeros_like(vT)
            slotT[:] = jnp.full_like(slotT, -1)
            nxT[:] = jnp.zeros_like(nxT)
            nyT[:] = jnp.zeros_like(nyT)
            nzT[:] = jnp.ones_like(nzT)
            matT[:] = jnp.full_like(matT, -1)
            pxT[:] = jnp.zeros_like(pxT)
            pyT[:] = jnp.zeros_like(pyT)
            pzT[:] = jnp.zeros_like(pzT)

            def cluster_body(c, carry):
                bx0 = cb_ref[c, 0]
                by0 = cb_ref[c, 1]
                bz0 = cb_ref[c, 2]
                bx1 = cb_ref[c, 3]
                by1 = cb_ref[c, 4]
                bz1 = cb_ref[c, 5]

                # Per-lane slab test (live per-lane t_best pruning happens
                # in the triangle hit test; octet skip below uses max t).
                t0 = (bx0 - OX) * IX
                t1 = (bx1 - OX) * IX
                tn = jnp.minimum(t0, t1)
                tf = jnp.maximum(t0, t1)
                t0 = (by0 - OY) * IY
                t1 = (by1 - OY) * IY
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                t0 = (bz0 - OZ) * IZ
                t1 = (bz1 - OZ) * IZ
                tn = jnp.maximum(tn, jnp.minimum(t0, t1))
                tf = jnp.minimum(tf, jnp.maximum(t0, t1))
                tn = jnp.maximum(tn, t_min)
                tf = jnp.minimum(tf, TMAX)
                hit_lane = tn <= tf

                @pl.when(jnp.any(hit_lane))
                def _():
                    # Per-octet flags + conservative entry distance,
                    # transposed so each octet reads one scalar.
                    flagT[:] = (
                        jnp.any(hit_lane, axis=0)
                        .astype(jnp.int32)
                        .reshape(1, 128)
                        .T
                    )
                    tnT[:] = (
                        jnp.min(
                            jnp.where(hit_lane, tn, jnp.float32(3.4e38)), axis=0
                        )
                        .reshape(1, 128)
                        .T
                    )

                    # Cluster triangle rows: (1, 128) each.
                    ax = v0x_ref[c].reshape(1, 128)
                    ay = v0y_ref[c].reshape(1, 128)
                    az = v0z_ref[c].reshape(1, 128)
                    e1x = v1x_ref[c].reshape(1, 128) - ax
                    e1y = v1y_ref[c].reshape(1, 128) - ay
                    e1z = v1z_ref[c].reshape(1, 128) - az
                    e2x = v2x_ref[c].reshape(1, 128) - ax
                    e2y = v2y_ref[c].reshape(1, 128) - ay
                    e2z = v2z_ref[c].reshape(1, 128) - az
                    # Geometric normals per triangle (the reference's
                    # cross(v1-v0, v2-v0), volpath:184; normalized by the
                    # caller) and material ids, selected at the winning
                    # lane so the integrator needs no per-lane gathers.
                    nrx = e1y * e2z - e1z * e2y
                    nry = e1z * e2x - e1x * e2z
                    nrz = e1x * e2y - e1y * e2x
                    mat_row = mat_ref[c].reshape(1, 128)

                    def octet_body(r8, _):
                        tb8 = tbT[r8].reshape(8, 1)
                        work = (flagT[r8, 0] > 0) & (tnT[r8, 0] < jnp.max(tb8))

                        @pl.when(work)
                        def _():
                            o8x = tox[r8].reshape(8, 1)
                            o8y = toy[r8].reshape(8, 1)
                            o8z = toz[r8].reshape(8, 1)
                            d8x = tdx[r8].reshape(8, 1)
                            d8y = tdy[r8].reshape(8, 1)
                            d8z = tdz[r8].reshape(8, 1)

                            # Moller-Trumbore: 8 rays x 128 triangles.
                            px = d8y * e2z - d8z * e2y
                            py = d8z * e2x - d8x * e2z
                            pz = d8x * e2y - d8y * e2x
                            det = e1x * px + e1y * py + e1z * pz
                            valid = jnp.abs(det) > 1e-12
                            inv_det = 1.0 / jnp.where(valid, det, 1.0)
                            sx = o8x - ax
                            sy = o8y - ay
                            sz = o8z - az
                            uu = (sx * px + sy * py + sz * pz) * inv_det
                            qx = sy * e1z - sz * e1y
                            qy = sz * e1x - sx * e1z
                            qz = sx * e1y - sy * e1x
                            vv = (d8x * qx + d8y * qy + d8z * qz) * inv_det
                            tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                            eps = jnp.float32(1e-6)
                            hit = (
                                valid
                                & (uu >= -eps)
                                & (vv >= -eps)
                                & (uu + vv <= 1.0 + eps)
                                & (tt > t_min)
                                & (tt < tb8)
                            )
                            tm = jnp.where(hit, tt, jnp.float32(jnp.inf))
                            best = jnp.min(tm, axis=1)  # (8,)
                            j = jnp.argmin(tm, axis=1).astype(jnp.int32)
                            improved = best < tbT[r8]
                            sel = lane == j[:, None]
                            u_at = jnp.sum(jnp.where(sel, uu, 0.0), axis=1)
                            v_at = jnp.sum(jnp.where(sel, vv, 0.0), axis=1)
                            # Barycentric hit position (the reference's
                            # reconstruction, volpath:158-181):
                            # p = v0 + u*e1 + v*e2.
                            hx = ax + uu * e1x + vv * e2x
                            hy = ay + uu * e1y + vv * e2y
                            hz = az + uu * e1z + vv * e2z
                            p_x = jnp.sum(jnp.where(sel, hx, 0.0), axis=1)
                            p_y = jnp.sum(jnp.where(sel, hy, 0.0), axis=1)
                            p_z = jnp.sum(jnp.where(sel, hz, 0.0), axis=1)
                            n_x = jnp.sum(jnp.where(sel, nrx, 0.0), axis=1)
                            n_y = jnp.sum(jnp.where(sel, nry, 0.0), axis=1)
                            n_z = jnp.sum(jnp.where(sel, nrz, 0.0), axis=1)
                            m_at = jnp.sum(jnp.where(sel, mat_row, 0), axis=1)
                            tbT[r8] = jnp.where(improved, best, tbT[r8])
                            slotT[r8] = jnp.where(improved, c * 128 + j, slotT[r8])
                            uT[r8] = jnp.where(improved, u_at, uT[r8])
                            vT[r8] = jnp.where(improved, v_at, vT[r8])
                            nxT[r8] = jnp.where(improved, n_x, nxT[r8])
                            nyT[r8] = jnp.where(improved, n_y, nyT[r8])
                            nzT[r8] = jnp.where(improved, n_z, nzT[r8])
                            matT[r8] = jnp.where(improved, m_at, matT[r8])
                            pxT[r8] = jnp.where(improved, p_x, pxT[r8])
                            pyT[r8] = jnp.where(improved, p_y, pyT[r8])
                            pzT[r8] = jnp.where(improved, p_z, pzT[r8])

                    jax.lax.fori_loop(0, 128, octet_body, None, unroll=False)

                return carry

            jax.lax.fori_loop(0, num_clusters, cluster_body, None, unroll=False)

            t_out[:] = tbT[:].T
            slot_out[:] = slotT[:].T
            u_out[:] = uT[:].T
            v_out[:] = vT[:].T
            nx_out[:] = nxT[:].T
            ny_out[:] = nyT[:].T
            nz_out[:] = nzT[:].T
            mat_out[:] = matT[:].T
            px_out[:] = pxT[:].T
            py_out[:] = pyT[:].T
            pz_out[:] = pzT[:].T

    return kernel


from typing import NamedTuple


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
    """Closest-hit trace returning shading payload (normal, material id)
    computed in-kernel — the integrator's hot path, zero XLA gathers."""
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
    kernel's block/octet predicates turn into skipped work."""
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
    ray_spec = pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((c, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    f32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32)
    i32 = jax.ShapeDtypeStruct((blocks * 8, 128), jnp.int32)
    out_shape = [f32, i32, f32, f32, f32, f32, f32, i32, f32, f32, f32]

    outs = pl.pallas_call(
        _trace_kernel(c, t_min),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((c, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            tri_spec, tri_spec, tri_spec, tri_spec, tri_spec, tri_spec,
            tri_spec, tri_spec, tri_spec, tri_spec,
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ] * 11,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((128, 8), jnp.float32)] * 9
        + [pltpu.VMEM((128, 8), jnp.int32)]
        + [pltpu.VMEM((128, 8), jnp.float32)] * 3
        + [pltpu.VMEM((128, 8), jnp.int32)]
        + [pltpu.VMEM((128, 8), jnp.float32)] * 3
        + [pltpu.VMEM((128, 1), jnp.int32), pltpu.VMEM((128, 1), jnp.float32)],
        interpret=grid.interpret,
    )(
        grid.bounds,
        ox, oy, oz, dx, dy, dz, tm,
        grid.v0x, grid.v0y, grid.v0z,
        grid.v1x, grid.v1y, grid.v1z,
        grid.v2x, grid.v2y, grid.v2z,
        grid.mat,
    )

    (t_o, slot_o, u_o, v_o, nx_o, ny_o, nz_o, mat_o, px_o, py_o, pz_o) = (
        x.reshape(rp)[:r] for x in outs
    )
    return (
        t_o, slot_o, u_o, v_o, nx_o, ny_o, nz_o, mat_o,
        px_o, py_o, pz_o, t_max_arr,
    )
