"""Pallas TPU closest-hit tracer over Morton triangle clusters.

The hot traversal kernel (replaces the reference's hardware ray queries,
volpath.comp.glsl:612-627) designed around what the TPU is actually fast
at — see accel/clusters.py for the structure rationale. Shape discipline:

- 1024 rays per grid block, components as one (8, 128) VPU tile each;
- triangle data dense in the lane dimension: (C, 128) per component, one
  dynamic *row* read per cluster (dynamic indexing never touches lanes);
- rays re-grouped into 8-ray octets via an in-kernel transpose to
  (128, 8) scratch, so the inner Moller-Trumbore runs as full
  (8 rays x 128 triangles) vector ops;
- cluster AABBs live in SMEM; culling is a *scalar* branch (pl.when), so
  skipped clusters cost a handful of cycles — the control-flow sparsity
  XLA's select-based cond cannot express;
- octet-level AABB pre-test prunes against the live per-ray t_best;
- blocks whose rays are all inactive (t_max <= t_min) skip everything —
  wavefront dead lanes are near-free.
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
_T_EPS = 0.0  # t_min is passed explicitly


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "v0x", "v0y", "v0z", "v1x", "v1y", "v1z", "v2x", "v2y", "v2z",
        "bounds", "tri_index",
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
        num_clusters=int(grid.bounds.shape[0]),
        interpret=bool(interpret),
    )


def _trace_kernel(num_clusters: int, t_min: float):
    def kernel(
        cb_ref,  # SMEM (C, 8)
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,  # (8,128)
        v0x_ref, v0y_ref, v0z_ref, v1x_ref, v1y_ref, v1z_ref,
        v2x_ref, v2y_ref, v2z_ref,  # (C,128)
        t_out, slot_out, u_out, v_out,  # (8,128)
        # scratch: transposed per-octet ray state, all (128, 8)
        tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz,
        tbT, uT, vT, slotT,
    ):
        OX, OY, OZ = ox_ref[:], oy_ref[:], oz_ref[:]
        DX, DY, DZ = dx_ref[:], dy_ref[:], dz_ref[:]
        TMAX = tmax_ref[:]

        tiny = jnp.float32(1e-12)

        def safe_inv(v):
            return 1.0 / jnp.where(jnp.abs(v) < tiny, jnp.where(v < 0, -tiny, tiny), v)

        IX, IY, IZ = safe_inv(DX), safe_inv(DY), safe_inv(DZ)

        tox[:] = OX.T
        toy[:] = OY.T
        toz[:] = OZ.T
        tdx[:] = DX.T
        tdy[:] = DY.T
        tdz[:] = DZ.T
        tix[:] = IX.T
        tiy[:] = IY.T
        tiz[:] = IZ.T
        tbT[:] = TMAX.T
        uT[:] = jnp.zeros_like(uT)
        vT[:] = jnp.zeros_like(vT)
        slotT[:] = jnp.full_like(slotT, -1)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

        @pl.when(jnp.max(TMAX) > t_min)
        def _():
            def cluster_body(c, carry):
                bx0 = cb_ref[c, 0]
                by0 = cb_ref[c, 1]
                bz0 = cb_ref[c, 2]
                bx1 = cb_ref[c, 3]
                by1 = cb_ref[c, 4]
                bz1 = cb_ref[c, 5]

                # Conservative block-level cull against the *initial* t_max
                # (live t_best lives transposed; octet test below prunes
                # against it exactly).
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

                @pl.when(jnp.any(tn <= tf))
                def _():
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

                    def octet_body(r8, _):
                        tb8 = tbT[r8].reshape(8, 1)
                        o8x = tox[r8].reshape(8, 1)
                        o8y = toy[r8].reshape(8, 1)
                        o8z = toz[r8].reshape(8, 1)
                        i8x = tix[r8].reshape(8, 1)
                        i8y = tiy[r8].reshape(8, 1)
                        i8z = tiz[r8].reshape(8, 1)

                        # Octet AABB pre-test against live t_best.
                        s0 = (bx0 - o8x) * i8x
                        s1 = (bx1 - o8x) * i8x
                        on = jnp.minimum(s0, s1)
                        of = jnp.maximum(s0, s1)
                        s0 = (by0 - o8y) * i8y
                        s1 = (by1 - o8y) * i8y
                        on = jnp.maximum(on, jnp.minimum(s0, s1))
                        of = jnp.minimum(of, jnp.maximum(s0, s1))
                        s0 = (bz0 - o8z) * i8z
                        s1 = (bz1 - o8z) * i8z
                        on = jnp.maximum(on, jnp.minimum(s0, s1))
                        of = jnp.minimum(of, jnp.maximum(s0, s1))
                        on = jnp.maximum(on, t_min)
                        of = jnp.minimum(of, tb8)

                        @pl.when(jnp.any(on <= of))
                        def _():
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
                            tbT[r8] = jnp.where(improved, best, tbT[r8])
                            slotT[r8] = jnp.where(
                                improved, c * 128 + j, slotT[r8]
                            )
                            uT[r8] = jnp.where(improved, u_at, uT[r8])
                            vT[r8] = jnp.where(improved, v_at, vT[r8])

                    jax.lax.fori_loop(0, 128, octet_body, None, unroll=False)

                return carry

            jax.lax.fori_loop(0, num_clusters, cluster_body, None, unroll=False)

        t_out[:] = tbT[:].T
        slot_out[:] = slotT[:].T
        u_out[:] = uT[:].T
        v_out[:] = vT[:].T

    return kernel


def trace_closest_clusters(o, d, grid: DeviceClusterGrid, t_min, t_max, active=None) -> Hit:
    """Closest-hit trace via the cluster kernel. Same contract as
    traverse.trace_closest: t == t_max on miss, prim indexes the original
    triangle order."""
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
        return x

    ox = pack(o[:, 0]).reshape(blocks * 8, 128)
    oy = pack(o[:, 1]).reshape(blocks * 8, 128)
    oz = pack(o[:, 2]).reshape(blocks * 8, 128)
    dx = pack(d[:, 0], 1.0).reshape(blocks * 8, 128)
    dy = pack(d[:, 1], 1.0).reshape(blocks * 8, 128)
    dz = pack(d[:, 2], 1.0).reshape(blocks * 8, 128)
    tm = pack(eff_tmax).reshape(blocks * 8, 128)

    c = grid.num_clusters
    ray_spec = pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec((c, 128), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((blocks * 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((blocks * 8, 128), jnp.float32),
    ]

    t_o, slot_o, u_o, v_o = pl.pallas_call(
        _trace_kernel(c, t_min),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((c, 8), lambda b: (0, 0), memory_space=pltpu.SMEM),
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
            tri_spec, tri_spec, tri_spec, tri_spec, tri_spec, tri_spec,
            tri_spec, tri_spec, tri_spec,
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda b: (b, 0), memory_space=pltpu.VMEM)
        ] * 4,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((128, 8), jnp.float32)] * 12
        + [pltpu.VMEM((128, 8), jnp.int32)],
        interpret=grid.interpret,
    )(
        grid.bounds,
        ox, oy, oz, dx, dy, dz, tm,
        grid.v0x, grid.v0y, grid.v0z,
        grid.v1x, grid.v1y, grid.v1z,
        grid.v2x, grid.v2y, grid.v2z,
    )

    slot = slot_o.reshape(rp)[:r]
    t = t_o.reshape(rp)[:r]
    u = u_o.reshape(rp)[:r]
    v = v_o.reshape(rp)[:r]

    hit_mask = slot >= 0
    prim = jnp.where(hit_mask, grid.tri_index[jnp.maximum(slot, 0)], -1)
    t = jnp.where(hit_mask, t, t_max_arr)
    return Hit(t=t, prim=prim, u=u, v=v)
