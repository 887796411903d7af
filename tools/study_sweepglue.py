"""Chip microbench: glue-primitive costs for the pair-sweep engine.

The cluster-major (pair-expanded) traversal replaces the megakernel's
per-block union walk with: slab-mask listing -> per-lane bounded lists
-> flatten -> sort pairs by cluster -> gather ray state per pair ->
Pallas sweep over 1024-pair blocks -> segment-min back per lane. Its
visit count is ~5-7x lower on dense-media scenes (tools/study_pairs at
wavefront scale), but every step above is new XLA glue that runs every
bounce. This measures each primitive at the real shapes so the engine
is built (or abandoned) on numbers.

Measurement traps defeated (extends the round-3g list):
- the tunnel's fixed dispatch cost is large and variable -> every op is
  timed as a SLOPE across chained in-jit repeat counts;
- repeats are chained through runtime values so XLA cannot fold them;
- inputs are fresh random arrays per call so the tunnel cannot memoize;
- NEW (round 4): jax.block_until_ready does NOT actually wait through
  the axon tunnel (a 64x-heavier chain "completed" in the same 0.1 ms).
  Every timed call must fetch a (device-reduced) scalar to the host.

Run: python tools/study_sweepglue.py  (real chip)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

N = 65536  # wavefront lanes
REPS = 4


def timed(f, args):
    """Wall time of f(*args) synchronized by fetching a scalar result."""
    t0 = time.perf_counter()
    out = f(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return time.perf_counter() - t0


def slope(make_chain, inputs, ks=(2, 18)):
    """Device ms per repeat: time jit(chain_k) at two k, take the slope.
    chain_k must return a SCALAR (device-side reduce)."""
    rng = np.random.default_rng(7)
    times = []
    for k in ks:
        f = jax.jit(make_chain(k))
        timed(f, inputs(rng))  # compile + first run
        best = 1e9
        for _ in range(REPS):
            best = min(best, timed(f, inputs(rng)))
        times.append(best)
    return (times[1] - times[0]) / (ks[1] - ks[0]) * 1e3


def main():
    results = {}

    # 1) u32 key sort at pair-buffer sizes.
    for P in (131072, 524288, 2097152):
        def make(k, P=P):
            def chain(x):
                def body(i, x):
                    s = jnp.sort(x)
                    return s * jnp.uint32(2654435761) + jnp.uint32(i)
                return jax.lax.fori_loop(0, k, body, x).max()
            return chain
        def ins(rng, P=P):
            return (jax.device_put(
                rng.integers(0, 2**31, P, dtype=np.uint32)),)
        t = slope(make, ins)
        results[f"sort_u32_{P}"] = t
        print(f"sort u32 {P:>8}: {t:7.3f} ms/op  ({t/P*1e6:5.2f} ns/elem)",
              flush=True)

    # 2) two-operand sort (key + payload).
    for P in (131072, 524288):
        def make(k, P=P):
            def chain(key, val):
                def body(i, kv):
                    key, val = kv
                    sk, sv = jax.lax.sort((key, val), dimension=0, num_keys=1)
                    return (sk * jnp.uint32(2654435761) + jnp.uint32(i), sv)
                kk, vv = jax.lax.fori_loop(0, k, body, (key, val))
                return kk.max() + vv.max()
            return chain
        def ins(rng, P=P):
            return (
                jax.device_put(rng.integers(0, 2**31, P, dtype=np.uint32)),
                jax.device_put(rng.integers(0, 2**31, P, dtype=np.uint32)),
            )
        t = slope(make, ins)
        results[f"sort2_u32_{P}"] = t
        print(f"sort kv  {P:>8}: {t:7.3f} ms/op", flush=True)

    # 3) gather (P, 8) f32 rows by pair lane index (serial chain).
    for P in (131072, 524288):
        def make(k, P=P):
            def chain(state, idx):
                def body(i, c):
                    _, idx = c
                    g = state[idx]  # (P, 8)
                    idx2 = (idx + g[:, 0].astype(jnp.int32) + i) % N
                    return (g, idx2)
                g, _ = jax.lax.fori_loop(0, k, body, (state[idx], idx))
                return g.sum()
            return chain
        def ins(rng, P=P):
            return (
                jax.device_put(
                    (rng.integers(0, 3, (N, 8))).astype(np.float32)),
                jax.device_put(rng.integers(0, N, P, dtype=np.int32)),
            )
        t = slope(make, ins)
        results[f"gather8_{P}"] = t
        print(f"gather (P,8) {P:>8}: {t:7.3f} ms/op", flush=True)

    # 4) segment-min P -> N (scatter-min by lane id).
    for P in (131072, 524288):
        def make(k, P=P):
            def chain(v, seg):
                def body(i, c):
                    v, seg = c
                    m = jax.ops.segment_min(v, seg, num_segments=N)
                    v2 = v + m[seg % N] * 1e-6
                    return (v2, seg)
                v, _ = jax.lax.fori_loop(0, k, body, (v, seg))
                return v.sum()
            return chain
        def ins(rng, P=P):
            return (
                jax.device_put(rng.standard_normal(P).astype(np.float32)),
                jax.device_put(np.sort(rng.integers(0, N, P)).astype(np.int32)),
            )
        t = slope(make, ins)
        results[f"segmin_{P}"] = t
        print(f"segment_min {P:>8}->{N}: {t:7.3f} ms/op", flush=True)

    # 5) slab-mask listing pipeline in pure XLA:
    #    (N, C) segment-vs-AABB mask -> packed (N, W) u32 bitmask
    #    -> (N, L) cluster-id lists via L lowest-set-bit passes.
    rng0 = np.random.default_rng(3)
    for C, L in ((323, 32), (171, 24), (11, 8)):
        W = (C + 31) // 32
        lo = jax.device_put(rng0.uniform(-2, 0, (C, 3)).astype(np.float32))
        hi = jax.device_put(rng0.uniform(0, 2, (C, 3)).astype(np.float32))

        def listing(o, d, bound, lo=lo, hi=hi, C=C, W=W, L=L):
            inv = 1.0 / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            s0 = (lo[None] - o[:, None]) * inv[:, None]
            s1 = (hi[None] - o[:, None]) * inv[:, None]
            tn = jnp.maximum(jnp.minimum(s0, s1).max(-1), 1e-4)
            tf = jnp.minimum(jnp.maximum(s0, s1).min(-1), bound[:, None])
            m = tn <= tf  # (N, C)
            pad = W * 32 - C
            mp = jnp.pad(m, ((0, 0), (0, pad)))
            bits = mp.reshape(N, W, 32).astype(jnp.uint32) << jnp.arange(
                32, dtype=jnp.uint32
            )
            words = bits.sum(-1, dtype=jnp.uint32)  # (N, W)
            ids = []
            w = words
            for _ in range(L):
                nz = w != 0
                first_w = jnp.argmax(nz, axis=1)  # (N,)
                row = jnp.take_along_axis(w, first_w[:, None], axis=1)[:, 0]
                low = row & (~row + 1)
                bit = jax.lax.population_count(low - 1)
                has = row != 0
                cid = jnp.where(has, first_w * 32 + bit, 0xFFFF).astype(
                    jnp.uint32
                )
                ids.append(cid)
                roww = row & ~low
                w = jnp.where(
                    (jnp.arange(W)[None] == first_w[:, None]) & has[:, None],
                    roww[:, None],
                    w,
                )
            return jnp.stack(ids, -1)

        def make(k, listing=listing):
            def chain(o, d, bound):
                def body(i, c):
                    o, d, bound = c
                    ids = listing(o, d, bound)
                    o2 = o + (ids[:, :1] == 0).astype(jnp.float32) * 1e-5
                    return (o2, d, bound)
                o, _, _ = jax.lax.fori_loop(0, k, body, (o, d, bound))
                return o.sum()
            return chain

        def ins(rng):
            return (
                jax.device_put(rng.uniform(-1, 1, (N, 3)).astype(np.float32)),
                jax.device_put(rng.standard_normal((N, 3)).astype(np.float32)),
                jax.device_put(rng.uniform(1, 10, N).astype(np.float32)),
            )
        t = slope(make, ins, ks=(1, 5))
        results[f"listing_C{C}_L{L}"] = t
        print(f"listing C={C:3d} L={L}: {t:7.3f} ms/op", flush=True)

    # 6) per-lane merge sort (N, 48) along last axis (dist K-list merge).
    def make_rowsort(k):
        def chain(x):
            def body(i, x):
                s = jnp.sort(x, axis=-1)
                return s[:, ::-1] + jnp.float32(1e-6) * jnp.float32(i)
            return jax.lax.fori_loop(0, k, body, x).sum()
        return chain
    t = slope(
        make_rowsort,
        lambda rng: (jax.device_put(
            rng.standard_normal((N, 48)).astype(np.float32)),),
    )
    results["rowsort_48"] = t
    print(f"row-sort (N,48): {t:7.3f} ms/op", flush=True)

    # 7) full-wavefront permutation gather of 15-f32 state.
    def make_perm(k):
        def chain(s, idx):
            def body(i, c):
                s, idx = c
                g = s[idx]
                idx2 = (idx + i) % N
                return (g, idx2)
            s, _ = jax.lax.fori_loop(0, k, body, (s, idx))
            return s.sum()
        return chain
    t = slope(
        make_perm,
        lambda rng: (
            jax.device_put((rng.integers(0, 3, (N, 15))).astype(np.float32)),
            jax.device_put(rng.permutation(N).astype(np.int32)),
        ),
    )
    results["perm15"] = t
    print(f"perm gather (N,15): {t:7.3f} ms/op", flush=True)

    print("\nJSON:", {k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
