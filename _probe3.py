import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def u32_to_f32(word):
    hi = pltpu.bitcast(word >> jnp.uint32(16), jnp.int32).astype(jnp.float32)
    lo = pltpu.bitcast(word & jnp.uint32(0xFFFF), jnp.int32).astype(jnp.float32)
    return hi * 65536.0 + lo

def pcg_kernel(s_ref, out_ref, f_ref):
    s = s_ref[:]
    ns = s * jnp.uint32(747796405) + jnp.uint32(1)
    shift = (ns >> jnp.uint32(28)) + jnp.uint32(4)
    word = ((ns >> shift) ^ ns) * jnp.uint32(277803737)
    out = (word >> jnp.uint32(22)) ^ word
    out_ref[:] = out
    f_ref[:] = u32_to_f32(out) * (jnp.float32(1.0) / jnp.float32(4294967295.0))

s = (jnp.arange(1024, dtype=jnp.uint32) * jnp.uint32(2654435761)).reshape(8, 128)
out, f = pl.pallas_call(
    pcg_kernel,
    out_shape=(jax.ShapeDtypeStruct((8,128), jnp.uint32), jax.ShapeDtypeStruct((8,128), jnp.float32)),
)(s)
from complex_materials_renderer_tpu.ops import rng as R
s2, f2 = R.next_float(s)
w2 = R._output(R.step(s))
print("pcg int match:", bool(jnp.all(out == w2)), "float bit match:", bool(jnp.all(f == f2)))

# SMEM scratch mutation + while + selection (writes result to SMEM-backed out then to vmem row at end)
def sel_kernel(x_ref, out_ref, entry_ref, order_ref):
    n = 16
    def initb(i, _):
        entry_ref[i] = x_ref[0, i]
        return 0
    jax.lax.fori_loop(0, n, initb, 0)
    def pick():
        def b(i, c):
            best, idx = c
            e = entry_ref[i]
            take = e < best
            return (jnp.where(take, e, best), jnp.where(take, i, idx))
        return jax.lax.fori_loop(0, n, b, (jnp.float32(1e30), jnp.int32(-1)))
    def cond(c):
        k, e, idx = c
        return e < jnp.float32(1e29)
    def body(c):
        k, e, idx = c
        order_ref[k] = e
        entry_ref[idx] = jnp.float32(1e30)
        e2, i2 = pick()
        return (k + 1, e2, i2)
    e0, i0 = pick()
    k, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), e0, i0))
    # copy SMEM order back out as a vector
    row = jnp.zeros((1, 128), jnp.float32)
    vals = [order_ref[i] for i in range(n)]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1,128), 1)
    for i, v in enumerate(vals):
        row = jnp.where(iota == i, v, row)
    out_ref[:] = row

x = jnp.array(np.random.RandomState(0).rand(1, 128), jnp.float32)
out = pl.pallas_call(
    sel_kernel,
    out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SMEM((16,), jnp.float32), pltpu.SMEM((16,), jnp.float32)],
)(x)
print("selection-sort in kernel ok:", bool(np.all(np.diff(np.asarray(out)[0, :16]) >= 0)))

def t_kernel(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = (jnp.arccos(jnp.clip(x,0,1)) + jnp.arcsin(jnp.clip(x,0,1)) + jnp.exp(-x)
        + jnp.log(jnp.maximum(1.0-x*0.5,1e-37)) + jnp.sqrt(x) + jnp.cos(x) + jnp.sin(x)
        + jnp.floor(x*3) + jnp.mod(jnp.floor(x*7), 2.0))
x = jnp.array(np.random.RandomState(1).rand(8,128), jnp.float32)
o = pl.pallas_call(t_kernel, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))(x)
xo = np.asarray(x)
ref = (np.arccos(np.clip(xo,0,1))+np.arcsin(np.clip(xo,0,1))+np.exp(-xo)
    +np.log(np.maximum(1-xo*0.5,1e-37))+np.sqrt(xo)+np.cos(xo)+np.sin(xo)
    +np.floor(xo*3)+np.mod(np.floor(xo*7),2.0))
print("transcendental max err:", float(np.abs(np.asarray(o)-ref).max()))

def blk_kernel(x_ref, o_ref):
    def body(b, _):
        o_ref[pl.ds(b*8, 8), :] = x_ref[pl.ds(b*8, 8), :] * 2.0 + b
        return 0
    jax.lax.fori_loop(0, x_ref.shape[0] // 8, body, 0)
x = jnp.array(np.random.RandomState(2).rand(64, 128), jnp.float32)
o = pl.pallas_call(blk_kernel, out_shape=jax.ShapeDtypeStruct((64,128), jnp.float32))(x)
exp = np.asarray(x)*2 + np.repeat(np.arange(8), 8)[:,None]
print("dyn sublane slice ok:", float(np.abs(np.asarray(o)-exp).max()))
