"""Where does the 12us/cell pallas floor come from? Scale grid size at
constant total bytes, and probe batched blocks with an in-kernel loop.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cell_floor_bench.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import functools
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
B, LW, SUB = 256, 640, 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2**31, (B, SUB, LW), np.int64).astype(np.int32))
mb = B * SUB * LW * 4 / 1e6


def timeit(name, fn, *a, reps=8):
    out = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    print(f"F {name}: {dt*1e3:7.2f} ms  ({mb/1e3/dt:6.2f} GB/s)", flush=True)
    return dt


def make(gp, sem="arbitrary", work=0):
    def k(x_ref, o_ref):
        for p in range(gp):
            v = x_ref[p]
            for _ in range(work):
                v = v * 3 + 1
            o_ref[p] = v

    return jax.jit(pl.pallas_call(
        k,
        grid=(B // gp,),
        in_specs=[pl.BlockSpec((gp, SUB, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((gp, SUB, LW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SUB, LW), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    ))


for gp in (1, 2, 4, 8, 16):
    timeit(f"passthrough gp={gp}", make(gp), x)
timeit("passthrough gp=1 parallel", make(1, "parallel"), x)
timeit("passthrough gp=8 parallel", make(8, "parallel"), x)
# with some vector work to see overlap
timeit("work=8 gp=1", make(1, work=8), x)
timeit("work=8 gp=8", make(8, work=8), x)

# no grid at all: one cell, whole array (VMEM 21MB in+out -> too big? try half)
xh = x[:64]
mbh = mb / 4


def kall(x_ref, o_ref):
    o_ref[...] = x_ref[...]


try:
    f = jax.jit(pl.pallas_call(
        kall,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((64, SUB, LW), jnp.int32),
    ))
    out = f(xh)
    jax.device_get(out.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(8):
        out = f(xh)
    jax.device_get(out.ravel()[:1])
    dt = (time.perf_counter() - t0) / 8
    print(f"F ANY-space copy 64 rows: {dt*1e3:7.2f} ms ({mbh/1e3/dt:6.2f} GB/s)", flush=True)
except Exception as e:
    print("F ANY-space FAIL:", str(e).splitlines()[0][:140], flush=True)

# XLA copy baseline
timeit("xla add1", jax.jit(lambda v: v + 1), x)
print("DONE", flush=True)
