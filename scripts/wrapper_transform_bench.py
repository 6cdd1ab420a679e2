"""Isolate the decode-wrapper transform costs (the cut=1 8.6 ms floor):
byte->word conversion, row<->column-major transposes, epilogue, and whether
Mosaic can transpose in-kernel instead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/wrapper_transform_bench.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import functools
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpucomp.utils import bits

print("devices", jax.devices(), flush=True)
B, LW = 256, 640  # matches _DLayout l_inw for 64KB partitions
SUB = 32
N = LW * SUB * 4  # bytes per partition
rng = np.random.default_rng(0)
comp = jnp.asarray(rng.integers(0, 256, (B, N), np.uint8))
words_rm = jnp.asarray(rng.integers(0, 2**31, (B, LW, SUB), np.int64).astype(np.int32))
out_cm = jnp.asarray(rng.integers(0, 2**31, (B, SUB, LW), np.int64).astype(np.int32))
mb = B * N / 1e6


def timeit(name, fn, *a, reps=8):
    out = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"W {name}: {dt*1e3:7.2f} ms  ({mb/1e3/dt:6.2f} GB/s)", flush=True)
    return dt


# 1. byte->u32 via shifts (current bits.bytes_to_units_le)
timeit("b2u shifts", jax.jit(lambda c: bits.bytes_to_units_le(c, 4)), comp)

# 2. byte->u32 via bitcast_convert_type
timeit("b2u bitcast", jax.jit(lambda c: jax.lax.bitcast_convert_type(c.reshape(B, -1, 4), jnp.uint32)), comp)

# 3. the row->column transpose alone
timeit("transpose rm->cm", jax.jit(lambda w: w.transpose(0, 2, 1)), words_rm)

# 4. full current prep: bytes -> words -> transpose
def prep(c):
    w = bits.bytes_to_units_le(c, 4).astype(jnp.uint32)
    return w.reshape(B, 1, LW, SUB).transpose(0, 3, 1, 2).reshape(B, SUB, LW)
timeit("prep full", jax.jit(prep), comp)

# 5. epilogue: cm -> rm transpose + u32 -> bytes
def epi(o):
    elems = o.transpose(0, 2, 1).reshape(B, -1)
    u = elems.astype(jnp.uint32)
    return bits.units_to_bytes_le(u)
timeit("epilogue full", jax.jit(epi), out_cm)

# 6. in-kernel transpose probe: block [1, LW, SUB] -> store [1, SUB, LW]
def ktr(x_ref, o_ref):
    o_ref[0] = jnp.transpose(x_ref[0], (1, 0))

try:
    f = pl.pallas_call(
        ktr,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, LW, SUB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SUB, LW), jnp.int32),
    )
    timeit("pallas in-kernel transpose", jax.jit(f), words_rm)
except Exception as e:
    print("W pallas transpose FAIL:", str(e).splitlines()[0][:150], flush=True)

# 7. pallas passthrough (no transpose): measures pure grid+DMA floor
def kpass(x_ref, o_ref):
    o_ref[0] = x_ref[0]

f2 = pl.pallas_call(
    kpass,
    grid=(B,),
    in_specs=[pl.BlockSpec((1, SUB, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((1, SUB, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, SUB, LW), jnp.int32),
)
timeit("pallas passthrough", jax.jit(f2), out_cm)

# 8. in-kernel byte->word+transpose fused: read bytes as words rm, transpose
def kfull(x_ref, o_ref):
    w = x_ref[0]
    o_ref[0] = jnp.transpose(w, (1, 0))

print("DONE", flush=True)
