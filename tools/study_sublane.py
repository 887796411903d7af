"""Chip A/B: ray-major vs triangle-on-sublane inner-loop formulations.

The production cluster tester (kernels/cluster_test.py) is ray-major:
one (8,128) vector op processes 1024 rays x 1 triangle, and every
triangle costs 10 scalar extract+broadcasts from its run row — the
measured margin of the inner loop (NOTES: the stored-normal variant
LOST because it added 3 extracts despite saving 5-11 vector flops).

The alternative measured here puts TRIANGLES ON THE SUBLANE AXIS:
a row holds 8 groups x 8 triangles (sublane = triangle-in-group,
lanes = group*16 + quantity), and one (8,128) op processes
8 triangles x 128 rays — the same 1024 (ray, tri) pairs per op, so
arithmetic throughput is identical, but the triangle constants enter
via ONE lane-broadcast per (group, quantity) reused across all 8
ray-groups: 10 broadcasts per 8 triangles (~1.25/tri) instead of
10 extracts per triangle. Ray components are sublane-broadcast once
per walk (48 ops, amortized).

The price: hit state becomes per-(ray-group) tiles whose sublanes
track sublane-local bests, folded across sublanes once at walk end
(min + tie-select), and slot ids come from a sublane iota.

Usage: python tools/study_sublane.py [n_tris] [repeat]
Prints per-formulation walk time and ns per (tri x 1024 rays).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from complex_materials_renderer_tpu.kernels.cluster_test import (  # noqa: E402
    make_cluster_tester,
    payload_state0,
)

RUN = 16        # ray-major: triangles per run row
SUBS = 6        # ray-major: runs per "cluster" (96 tris, matches B rows)
GROUPS = 8      # sublane-major: 8-triangle groups per row
GSTRIDE = 16    # lanes per group (10 quantities + 6 pad)
ROW_TRIS = GROUPS * 8  # 64 triangles per sublane-major row
T_MIN = np.float32(1e-4)
TMAX0 = np.float32(1e4)
EPS = np.float32(1e-6)


def make_tris(n: int, seed: int) -> np.ndarray:
    """(n, 10) float32 [ax ay az e1xyz e2xyz mat] small random tris."""
    r = np.random.default_rng(seed)
    a = r.uniform(-4, 4, (n, 3)).astype(np.float32)
    e1 = r.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    e2 = r.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    mat = r.integers(0, 5, (n, 1)).astype(np.float32)
    return np.concatenate([a, e1, e2, mat], axis=1)


def make_rays(seed: int):
    r = np.random.default_rng(seed)
    o = r.uniform(-5, 5, (3, 8, 128)).astype(np.float32)
    d = r.normal(size=(3, 8, 128)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return np.concatenate([o, d], axis=0)  # (6, 8, 128)


def pack_ray_major(tris: np.ndarray) -> np.ndarray:
    """(rows, 160): run-major rows exactly like the production grid."""
    n = tris.shape[0]
    rows = n // RUN
    out = np.zeros((rows, 10 * RUN), np.float32)
    for rr in range(rows):
        for j in range(RUN):
            for k in range(10):
                out[rr, k * RUN + j] = tris[rr * RUN + j, k]
    return out


def pack_sublane(tris: np.ndarray) -> np.ndarray:
    """(rows, 8, 128): sublane s / lane g*16+k = quantity k of triangle
    (row*8 + g)*8 + s."""
    n = tris.shape[0]
    rows = n // ROW_TRIS
    out = np.zeros((rows, 8, 128), np.float32)
    for rr in range(rows):
        for g in range(GROUPS):
            for s in range(8):
                tid = (rr * GROUPS + g) * 8 + s
                out[rr, s, g * GSTRIDE : g * GSTRIDE + 10] = tris[tid]
    return out


def ray_major_kernel(nrows_c: int, repeat: int):
    """Production formulation: cluster_test 'dist' over run-major rows."""

    def kernel(tab_ref, ray_ref, eps_ref, out_ref, t_ref, s_ref):
        tc = make_cluster_tester(
            tab_ref, SUBS, RUN, "dist", 0, [], T_MIN, bitcast=pltpu.bitcast
        )
        tmax = jnp.full((8, 128), TMAX0)
        st0 = payload_state0("dist", tmax)

        e0 = eps_ref[0, 0, 0]  # runtime zero

        def rep(i, carry):
            # "Reset" the state THROUGH the previous rep's values with a
            # runtime-zero coefficient: every rep is data-dependent on
            # the last, so the repeat loop cannot be collapsed (a plain
            # reset makes reps 0..n-2 dead stores, which Mosaic removes).
            rays = tuple(ray_ref[k] for k in range(6))
            t_ref[...] = st0[0] + e0 * t_ref[...]
            s_ref[...] = st0[1] + e0 * s_ref[...]

            def body(c, carry2):
                st = tc(c, rays, (t_ref[...], s_ref[...]))
                t_ref[...] = st[0]
                s_ref[...] = st[1]
                return carry2

            jax.lax.fori_loop(0, nrows_c, body, 0)
            return carry

        jax.lax.fori_loop(0, repeat, rep, 0)
        out_ref[0] = t_ref[...]
        out_ref[1] = s_ref[...]

    return kernel


def sublane_kernel(nrows: int, repeat: int):
    """Triangle-on-sublane formulation ('dist' payload)."""

    def kernel(tab_ref, ray_ref, eps_ref, out_ref, t_ref, s_ref):
        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(
            jnp.float32
        )

        e0 = eps_ref[0, 0, 0]  # runtime zero

        def rep(i, carry):
            # Sublane-broadcast each ray component per ray-group, once
            # per walk (48 ops, amortized over the row loop).
            rb = []
            for rg in range(8):
                comps = tuple(
                    jnp.broadcast_to(ray_ref[k, rg : rg + 1, :], (8, 128))
                    for k in range(6)
                )
                rb.append(comps)
            # Data-dependent reset (see ray_major_kernel).
            t_ref[...] = jnp.full((8, 8, 128), TMAX0) + e0 * t_ref[...]
            s_ref[...] = jnp.full((8, 8, 128), -1.0) + e0 * s_ref[...]

            def body(rr, carry2):
                row = tab_ref[rr]  # (8, 128) tile
                base = (rr * GROUPS).astype(jnp.float32)
                for g in range(GROUPS):
                    q = [
                        jnp.broadcast_to(
                            row[:, g * GSTRIDE + k : g * GSTRIDE + k + 1],
                            (8, 128),
                        )
                        for k in range(9)
                    ]
                    ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z = q
                    slot = (base + jnp.float32(g)) * 8.0 + sub_iota
                    for rg in range(8):
                        OX, OY, OZ, DX, DY, DZ = rb[rg]
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
                        t_best = t_ref[rg]
                        improved = (
                            (uu >= -EPS)
                            & (vv >= -EPS)
                            & (uu + vv <= 1.0 + EPS)
                            & (tt > T_MIN)
                            & (tt < t_best)
                        )
                        t_ref[rg] = jnp.where(improved, tt, t_best)
                        s_ref[rg] = jnp.where(improved, slot, s_ref[rg])
                return carry2

            jax.lax.fori_loop(0, nrows, body, 0)
            return carry

        jax.lax.fori_loop(0, repeat, rep, 0)

        # Fold sublane-local bests per ray-group into ray-major rows.
        for rg in range(8):
            t = t_ref[rg]
            s = s_ref[rg]
            tmin = jnp.min(t, axis=0, keepdims=True)
            smin = jnp.min(
                jnp.where(t == jnp.broadcast_to(tmin, (8, 128)), s, 3e38),
                axis=0,
                keepdims=True,
            )
            out_ref[0, rg : rg + 1, :] = tmin
            out_ref[1, rg : rg + 1, :] = jnp.where(
                tmin >= TMAX0, -1.0, smin
            )

    return kernel


def run(make_kernel, nrows, tab, rays, scratch, label, n_tris, repeat):
    """Times the kernel at `repeat` and `repeat // 2` inner walks and
    reports the SLOPE, cancelling dispatch/readback fixed costs."""
    eps = jnp.zeros((6, 8, 128), jnp.float32)

    def timed(rep):
        f = pl.pallas_call(
            make_kernel(nrows, rep),
            out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        g = jax.jit(lambda a, b, c: f(a, b, c))
        out = jax.block_until_ready(g(tab, rays, eps))
        # The axon tunnel memoizes identical-input executions, so every
        # timed call gets a DISTINCT (jittered) ray array.
        r = np.random.default_rng(23)
        variants = [
            jnp.asarray(
                np.asarray(rays) + r.normal(0, 1e-6, (6, 8, 128))
                .astype(np.float32)
            )
            for _ in range(5)
        ]
        ts = []
        for v in variants:
            t0 = time.perf_counter()
            jax.block_until_ready(g(tab, v, eps))
            ts.append(time.perf_counter() - t0)
        print(f"    rep={rep:4d}: " + " ".join(f"{t*1e3:8.3f}" for t in ts))
        return np.asarray(out), min(ts)

    out, t_full = timed(repeat)
    _, t_half = timed(repeat // 2)
    slope = (t_full - t_half) / (repeat - repeat // 2)
    per = slope / n_tris * 1e9
    print(
        f"{label:24s} {slope * 1e3:9.4f} ms/walk  "
        f"{per:7.2f} ns/(tri x 1024 rays)"
    )
    return out, slope


def main():
    n_tris = int(sys.argv[1]) if len(sys.argv) > 1 else 6144
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    assert n_tris % (SUBS * RUN) == 0 and n_tris % ROW_TRIS == 0
    tris = make_tris(n_tris, 7)
    rays = jnp.asarray(make_rays(11))

    tab_a = jnp.asarray(pack_ray_major(tris))
    tab_b = jnp.asarray(pack_sublane(tris))
    nclus_a = n_tris // (SUBS * RUN)
    nrows_b = n_tris // ROW_TRIS
    print(f"tris={n_tris} repeat={repeat} "
          f"(A: {nclus_a} x {SUBS * RUN}-tri clusters, B: {nrows_b} x "
          f"{ROW_TRIS}-tri rows)")

    out_a, t_a = run(
        ray_major_kernel, nclus_a, tab_a, rays,
        [pltpu.VMEM((8, 128), jnp.float32)] * 2,
        "A ray-major (prod)", n_tris, repeat,
    )
    out_b, t_b = run(
        sublane_kernel, nrows_b, tab_b, rays,
        [pltpu.VMEM((8, 8, 128), jnp.float32)] * 2,
        "B tri-on-sublane", n_tris, repeat,
    )

    t_match = np.allclose(out_a[0], out_b[0], rtol=1e-5, atol=1e-5)
    s_match = np.mean(out_a[1] == out_b[1])
    hits = np.mean(out_a[0] < TMAX0)
    print(f"hit rate {hits:.3f}  t match: {t_match}  slot agree: {s_match:.4f}")
    print(f"B/A time ratio: {t_b / t_a:.3f}  (speedup x{t_a / t_b:.2f})")


if __name__ == "__main__":
    main()
