"""Does Mosaic overlap dynamic-offset VMEM RMW chains of DIFFERENT chunks?

The v4 LZ decode loop advances K interleaved chunks, each doing a window
read + 16-row RMW store per iteration, all on one (K, rows, 128) ref with
a static leading index.  kpack sweeps show zero overlap (K=4 == K=8
throughput), suggesting Mosaic serializes on may-alias between the dynamic
row-offset stores and the next chunk's loads.  This probe times the same
load/align/RMW pattern with:
  A) one (K, R, 128) ref, static leading index k      (the kernel's shape)
  B) K separate refs                                  (provably disjoint)
  C) one ref, K=1                                     (serial baseline)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/alias_probe.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
R = 256  # rows per chunk buffer
N = 4096  # iterations


def body_for(get32, setrows, getrows, i, k):
    # mimic one granule move: window read at pseudo-random dyn offset,
    # 16-row RMW at a second offset
    src = ((i * 1103515245 + k * 12345) & 0x7FFF) % ((R - 40) * 512)
    dst_r = ((i * 214013 + k * 2531) & 0x7FFF) % (R - 24)
    W = L._read_win16(get32, src)
    cur = L._u(getrows(dst_r))
    m = L._byte_mask16((i * 7 + k) % 512, 1024)
    setrows(dst_r, ((cur & ~m) | (W & m)).astype(jnp.int32))


def mk_single(K):
    def kernel(x_ref, o_ref):
        def get32(k):
            return lambda r0: L._u(o_ref[k, pl.ds(r0, 32), :])

        def step(i, _):
            for k in range(K):
                body_for(
                    get32(k),
                    lambda r, v, k=k: o_ref.__setitem__((k, pl.ds(r, 16), slice(None)), v),
                    lambda r, k=k: o_ref[k, pl.ds(r, 16), :],
                    i, k,
                )
            return 0

        jax.lax.fori_loop(0, N, step, 0)

    x = jnp.zeros((K, R, ROWW), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, R, ROWW), jnp.int32),
        input_output_aliases={0: 0},
    ))
    return lambda: f(x)


def mk_multi(K):
    def kernel(*refs):
        x_refs = refs[:K]
        o_refs = refs[K:]

        def step(i, _):
            for k in range(K):
                ref = o_refs[k]
                body_for(
                    lambda r0, ref=ref: L._u(ref[pl.ds(r0, 32), :]),
                    lambda r, v, ref=ref: ref.__setitem__((pl.ds(r, 16), slice(None)), v),
                    lambda r, ref=ref: ref[pl.ds(r, 16), :],
                    i, k,
                )
            return 0

        jax.lax.fori_loop(0, N, step, 0)

    xs = [jnp.zeros((R, ROWW), jnp.int32) for _ in range(K)]
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * K,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * K,
        out_shape=[jax.ShapeDtypeStruct((R, ROWW), jnp.int32)] * K,
        input_output_aliases={i: i for i in range(K)},
    ))
    return lambda: f(*xs)


def tm(name, mk, K):
    f = mk(K)
    r = f()
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = f()
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{name} K={K}: {dt*1e3:8.2f} ms  {dt/N*1e9/K:7.1f} ns/chunk-step", flush=True)


tm("single-ref", mk_single, 1)
tm("single-ref", mk_single, 4)
tm("single-ref", mk_single, 8)
tm("multi-ref ", mk_multi, 4)
tm("multi-ref ", mk_multi, 8)
print("DONE", flush=True)
