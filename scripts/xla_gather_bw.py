"""Measure dense XLA gather/vector throughput on the chip.

Decides the LZ4 decode architecture: a speculative parallel parse needs
~16 pointer-doubling gathers per 64K-position chunk; viability hinges on
gathered elements/s for large batched take_along_axis.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/xla_gather_bw.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np

print("devices", jax.devices(), flush=True)


def _flush(r):
    # on the tunneled platform block_until_ready is lazy; a device_get of a
    # small slice is the only reliable completion wall (PERF.md)
    leaf = jax.tree_util.tree_leaves(r)[0]
    jax.device_get(leaf.ravel()[:1])


def timeit(f, *a):
    _flush(f(*a))
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*a)
    _flush(r)
    return (time.perf_counter() - t0) / reps


B, N = 256, 16384  # 256 chunks x 16K words (64KB) = 16M elements
x = jnp.arange(B * N, dtype=jnp.int32).reshape(B, N)
idx = (x * 7 + 13) % N

# G1: per-row gather (B,N) from (B,N) — the pointer-doubling shape
g1 = jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=1))
dt = timeit(g1, x, idx)
print(f"G1 take_along_axis (B={B},N={N}): {dt*1e3:.2f} ms  {B*N/dt/1e9:.2f} G elem/s", flush=True)

# G2: chained 16 gathers (the full doubling ladder)
def ladder(x, i):
    for _ in range(16):
        i = jnp.take_along_axis(i, i & (N - 1), axis=1) + 1
    return i
g2 = jax.jit(ladder)
dt = timeit(g2, x, idx)
print(f"G2 16-chained gathers: {dt*1e3:.2f} ms  {16*B*N/dt/1e9:.2f} G elem/s  "
      f"-> {B*64/dt/1024:.2f} GB/s-equivalent for 64KB chunks", flush=True)

# G3: flat 1-D gather
xf = x.ravel(); idxf = ((jnp.arange(B * N, dtype=jnp.uint32) * jnp.uint32(2654435761)) % jnp.uint32(B * N)).astype(jnp.int32)
g3 = jax.jit(lambda x, i: x[i])
dt = timeit(g3, xf, idxf)
print(f"G3 flat gather 16M: {dt*1e3:.2f} ms  {B*N/dt/1e9:.2f} G elem/s", flush=True)

# V1: vector-op baseline (10 elementwise passes)
def v10(x):
    for k in range(10):
        x = x * 3 + k
    return x
v1 = jax.jit(v10)
dt = timeit(v1, x)
print(f"V1 10 eltwise passes: {dt*1e3:.2f} ms  {10*B*N*4/dt/1e9:.1f} GB/s touched", flush=True)

# S1: segmented scan baseline (cummax over rows) — used by forward fills
s1 = jax.jit(lambda x: jax.lax.cummax(x, axis=1))
dt = timeit(s1, x)
print(f"S1 cummax (B,N): {dt*1e3:.2f} ms  {B*N/dt/1e9:.2f} G elem/s", flush=True)

# SO1: sort baseline (the round-1 matcher primitive)
so = jax.jit(lambda x: jnp.sort(x, axis=1))
dt = timeit(so, x)
print(f"SO1 sort rows (B,N): {dt*1e3:.2f} ms  {B*N/dt/1e6:.1f} M elem/s", flush=True)
print("DONE", flush=True)
