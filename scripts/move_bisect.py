"""Micro-bisect ONE granule move on hardware: which part costs ~300-700 ns?

Variants per iteration (K=8 interleaved chunks, same while-loop shape as
the decode kernel):
  full     : read_win (dyn VMEM read + 2 rolls) + mask + 8-row RMW store
  nostore  : same minus the store (accumulate into carry)
  noread   : store a carried constant tile (no window read)
  noalign  : dyn VMEM read without the alignment rolls + RMW
  static   : full but all offsets static (compile-time)
  empty    : loop with scalar state only

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/move_bisect.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
R = 256
K = 8
N = 4096


def mk(variant):
    def kernel(x_ref, o_ref):
        def get16(k):
            return lambda r0: L._u(o_ref[k, pl.ds(r0, 16), :])

        def step(i, carry):
            accs = []
            for k in range(K):
                acc = carry[k]
                if variant == "empty":
                    accs.append(acc + i)
                    continue
                src = ((i * 1103515245 + k * 12345) & 0x7FFF) % ((R - 40) * 512)
                dst_r = ((i * 214013 + k * 2531) & 0x7FFF) % (R - 24)
                h = (i * 31 + k * 7) % 512
                g = 256
                if variant == "static":
                    src = jnp.int32((k * 977) % ((R - 40) * 512))
                    dst_r = jnp.int32((k * 13) % (R - 24))
                    h = jnp.int32((k * 31) % 512)
                if variant == "noalign":
                    W = L._u(o_ref[k, pl.ds(src >> 9, 8), :])
                else:
                    W = L._read_win(get16(k), src)
                if variant == "noread":
                    W = jnp.full((8, ROWW), jnp.uint32(i))
                m = L._byte_mask_tile(h, g)
                if variant == "nostore":
                    accs.append(acc ^ (W & m).astype(jnp.int32))
                else:
                    cur = L._u(o_ref[k, pl.ds(dst_r, 8), :])
                    o_ref[k, pl.ds(dst_r, 8), :] = ((cur & ~m) | (W & m)).astype(jnp.int32)
                    accs.append(acc)
            return tuple(accs)

        final = jax.lax.fori_loop(
            0, N, step, tuple(jnp.zeros((8, ROWW), jnp.int32) for _ in range(K))
        )
        o_ref[0, pl.ds(0, 8), :] = final[0]

    x = jnp.zeros((K, R, ROWW), jnp.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, R, ROWW), jnp.int32),
        input_output_aliases={0: 0},
    ))
    return lambda: f(x)


import sys
variants = sys.argv[1:] or ["empty", "noread", "noalign", "nostore", "full", "static"]
for variant in variants:
    f = mk(variant)
    r = f(); jax.device_get(r.ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(3):
        r = f()
    jax.device_get(r.ravel()[:1])
    dt = (time.perf_counter() - t0) / 3
    print(f"{variant:8s}: {dt*1e3:8.2f} ms  {dt/N*1e9/K:7.1f} ns/chunk-step", flush=True)
print("DONE", flush=True)
