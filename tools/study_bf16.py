"""Chip microbenchmark: does bf16 elementwise arithmetic run FASTER per
element than f32 on the v5e VPU under Mosaic?

Why it matters: the megakernel's per-visit cost is ~35 cycles/triangle of
f32 vector arithmetic at the measured VPU floor (NOTES round 3g). If the
VPU retires bf16 ops on packed (16,128) registers at the same op rate
(2x elements/op), a reduced-precision traversal prefilter could halve
per-visit cost; if bf16 lowers to unpacked 32-bit ALU ops (or worse,
convert-wrapped f32), the direction is dead. This measures the raw ALU
rate question in isolation, with the round-3g measurement traps defeated
(state chained through runtime values so repeats stay live; jittered
inputs so the axon tunnel cannot memoize; slopes across chain lengths so
the ~26 ms dispatch cost cancels).

Run: python tools/study_bf16.py  (real chip)
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 2048  # (ROWS, 128) working set per operand, both dtypes
OPS = 24    # fused mul/add/min/max chain per repeat, ~an MT triangle test


def make_kernel(dtype, repeats):
    def kernel(a_ref, b_ref, c_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        c = c_ref[...]
        x = a

        def body(i, x):
            # ~OPS dependent-ish elementwise ops; constants vary with i
            # via a traced scalar so Mosaic cannot hoist or fold the
            # repeats together.
            s = (i % 7 + 1).astype(dtype)
            x = x * b + c
            x = jnp.maximum(x, a * s)
            x = jnp.minimum(x, b + x * c)
            x = x * a + b
            x = jnp.maximum(x, c - x)
            x = x * x + a
            x = jnp.minimum(x, b * s + c)
            x = x * b - a
            # keep magnitudes bounded so neither dtype saturates
            x = jnp.clip(x, -4.0, 4.0)
            return x

        x = jax.lax.fori_loop(0, repeats, body, x)
        o_ref[...] = x

    return kernel


def bench(dtype, repeats, seed):
    rng = np.random.default_rng(seed)
    shape = (ROWS, 128)
    mk = lambda: jnp.asarray(
        rng.uniform(0.25, 1.0, shape).astype(np.float32)
    ).astype(dtype)
    a, b, c = mk(), mk(), mk()

    inner = pl.pallas_call(
        make_kernel(dtype, repeats),
        out_shape=jax.ShapeDtypeStruct(shape, dtype),
    )

    @jax.jit
    def fn(a, b, c):
        # Reduce to a scalar ON DEVICE so the timing fetch is one float:
        # block_until_ready does NOT wait through the axon tunnel (NOTES
        # round 4c) — every timed chip call must fetch a value.
        return jnp.sum(inner(a, b, c).astype(jnp.float32))

    float(fn(a, b, c))  # compile + warm
    best = 1e9
    for _ in range(10):
        # fresh jittered inputs each call: the axon tunnel memoizes
        # identical-input executions
        a2 = a + jnp.asarray(float(rng.uniform(0, 1e-3)), dtype)
        t0 = time.perf_counter()
        float(fn(a2, b, c))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"working set: ({ROWS}, 128) x3 operands, ~9 vector ops/repeat")
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        lo, hi = 2048, 16384
        t_lo = bench(dtype, lo, seed=1)
        t_hi = bench(dtype, hi, seed=2)
        slope = (t_hi - t_lo) / (hi - lo)  # s per repeat
        elems = ROWS * 128
        ns_per_elem_op = slope / (9 * elems) * 1e9
        print(
            f"{name:5s} chain {lo}->{hi}: {t_lo*1e3:7.2f} -> {t_hi*1e3:7.2f} ms"
            f"  slope {slope*1e6:7.2f} us/repeat"
            f"  {ns_per_elem_op*1000:7.3f} ps/(elem*op)"
        )


if __name__ == "__main__":
    main()
