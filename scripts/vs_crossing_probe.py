"""Latency of a dependent vector->scalar crossing (_extract_word-style).

The encode kernels pay 3-4 such crossings per sequence (table extracts +
first-diff reductions).  The round-2 cost table measured reductions at
20-50 ns as THROUGHPUT; this measures the dependent-chain LATENCY:
  s_{i+1} = f(extract(table, s_i))  -- one crossing per iteration.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/vs_crossing_probe.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
UNROLL = int(__import__("sys").argv[1]) if len(__import__("sys").argv) > 1 else 1
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
R = 512
N = 20000


def mk(kind, chains):
    def kernel(x_ref, o_ref):
        def extract(s):
            return L._extract_word(lambda r: x_ref[pl.ds(jnp.clip(r, 0, R - 1), 1), :], s)

        def smem_like(s):  # scalar-only chain baseline: arithmetic
            return (s * 1103515245 + 12345) & 0xFFFF

        def step(i, ss):
            out = []
            for k, s in enumerate(ss):
                if kind == "extract":
                    out.append((extract(s & (R * ROWW - 1)) + i + k) & 0x7FFFFFFF)
                elif kind == "min":
                    t = x_ref[pl.ds(s & (R - 8), 8), :]
                    m = jnp.min(t + i)
                    out.append((m + s) & 0x7FFFFFFF)
                else:
                    out.append(smem_like(s + i))
            return tuple(out)

        def stepU(i, ss):
            for u in range(UNROLL):
                ss = step(i * UNROLL + u, ss)
            return ss

        final = jax.lax.fori_loop(0, N // UNROLL, stepU,
                                  tuple(jnp.int32(k) for k in range(chains)))
        acc = final[0]
        for s in final[1:]:
            acc = acc + s
        o_ref[0, 0] = acc

    x = jnp.asarray(np.random.default_rng(0).integers(0, 127, (R, ROWW), np.int64).astype(np.int32))
    f = jax.jit(pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    ))
    return lambda: f(x)


for kind in ("scalar", "extract", "min"):
    for chains in (1, 4):
        f = mk(kind, chains)
        r = f(); jax.device_get(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = f()
        jax.device_get(r)
        dt = (time.perf_counter() - t0) / 3
        print(f"{kind:8s} x{chains}: {dt*1e3:8.2f} ms  {dt/N*1e9:7.1f} ns/iter "
              f"({dt/N/chains*1e9:6.1f} ns/chain-step)", flush=True)
print("DONE", flush=True)
