"""Measure XLA 'glue' primitive costs on the real chip: argsort, take
(gather/permute), scatter-min — the building blocks a binned
(sort-by-cluster) traversal would pay per trace.

Slope method: N state-chained iterations inside one jit (lax.scan), with
the carry genuinely data-dependent on each iteration's result so XLA
cannot hoist the body out of the loop. The axon tunnel costs ~26 ms per
Python call, so only in-jit slopes measure device time.

Usage: PYTHONPATH=/root/repo python tools/profile_glue.py
"""

from __future__ import annotations

import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)

    def slope(label, fn, state0, n=32):
        f = jax.jit(
            lambda s: jax.lax.scan(lambda c, _: (fn(c), None), s,
                                   None, length=n)[0]
        )
        out = f(state0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(state0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"  {label:44s} {dt:8.3f} ms/iter")
        return dt

    MASK = np.uint32((1 << 20) - 1)

    for R in (65536, 262144):
        print(f"R = {R}:")
        keys = jnp.asarray(rng.integers(0, 1 << 20, R, np.uint32))

        # argsort, keys evolved from the result each iteration
        def arg_only(k):
            p = jnp.argsort(k)
            return (k * jnp.uint32(747796405) + p.astype(jnp.uint32)) & MASK

        slope("argsort u32 (chained)", arg_only, keys)

        # argsort + permute 12 f32 fields by the result
        fields = jnp.asarray(rng.random((R, 12), np.float32))

        def sort_permute(c):
            k, f = c
            p = jnp.argsort(k)
            f2 = jnp.take(f, p, axis=0)
            k2 = (k * jnp.uint32(747796405) + p.astype(jnp.uint32)) & MASK
            return k2, f2

        slope("argsort + take (R,12) f32", sort_permute, (keys, fields))

        # take alone: permutation evolved from data
        perm = jnp.asarray(rng.permutation(R).astype(np.int32))

        def take_only(c):
            p, f = c
            f2 = jnp.take(f, p, axis=0)
            p2 = jnp.take(p, p, axis=0)  # compose permutation: data-dep
            return p2, f2

        slope("take (R,12) f32 + take perm", take_only, (perm, fields))

        # scatter-min: R items -> R lanes table (chained via values)
        lane_ids = jnp.asarray(rng.integers(0, R, R).astype(np.int32))
        vals = jnp.asarray(rng.random(R, np.float32))

        def seg_min(c):
            ids, v = c
            out = jnp.full(R, 1e30, jnp.float32).at[ids].min(v)
            return ids, out * 0.999 + 1e-7

        slope("scatter-min R items -> R lanes", seg_min, (lane_ids, vals))

        # sort values only (keys+carry same array)
        def sort_f32(v):
            return jnp.sort(v)[::-1]  # reversed so it's never pre-sorted

        slope("sort f32 (chained, reversed)", sort_f32, vals)


if __name__ == "__main__":
    main()
