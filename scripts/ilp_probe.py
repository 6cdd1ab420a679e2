"""Does interleaving K independent chains hide lane-crossing-op latency?

The round-2 cost model measured *dependent chains*: lane roll ~75 ns,
read_win ~170 ns.  If those are pipeline latencies rather than issue
costs, a kernel carrying K independent per-chunk states should pay far
less than K x 75 ns per step -- which decides whether round-3's LZ
kernels should process K chunks in lockstep per grid cell.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ilp_probe.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


N1, N2 = 20_000, 100_000


def bench(name, mk):
    try:
        t1 = run(mk(N1))
        t2 = run(mk(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:58s} {per:9.1f} ns/it  (call {t1*1e3:.1f}/{t2*1e3:.1f} ms)", flush=True)
        return per
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "NotImplemented" in l), msg[0] if msg else "?")
        print(f"{name:58s} FAIL {key[:120]}", flush=True)
        return None


def mk_chains(K, op, dyn=False):
    """K independent chains; each iteration applies `op` once per chain."""

    def mk(iters):
        def kernel(vin_ref, out_ref):
            tiles0 = [L._u(vin_ref[pl.ds(8 * k, 8), :]) for k in range(K)]

            def body(c):
                i, tiles = c
                nt = []
                for k, x in enumerate(tiles):
                    if op == "lane_roll":
                        sh = (i + k) & 127 if dyn else (k * 13 + 1) % 127 + 1
                        y = pltpu.roll(x, sh, axis=1)
                    elif op == "sub_roll":
                        sh = (i + k) & 7 if dyn else (k % 7) + 1
                        y = pltpu.roll(x, sh, axis=0)
                    elif op == "vec_add":
                        y = x + jnp.uint32(k + 1)
                    elif op == "read_win":
                        def rd16(r0, k=k):
                            return L._u(vin_ref[pl.ds(r0, 16), :])
                        # per-chain dependent offset
                        off = (jnp.sum(jnp.where(L._fwi((8, ROWW)) == 0, x.astype(jnp.int32), 0)) + i + k) & 32767
                        y = x ^ L._read_win(rd16, off)
                    elif op == "rot_tile":
                        d = (jnp.sum(jnp.where(L._fwi((8, ROWW)) == 0, x.astype(jnp.int32), 0)) + i + k) & 4095
                        y = L._rot_tile(x, d)
                    elif op == "reduce_min":
                        m = jnp.min(x.astype(jnp.int32))
                        y = x + L._u(m & 1)
                    nt.append(y)
                return (i + 1, nt)

            i, tiles = jax.lax.while_loop(lambda c: c[0] < iters, body, (jnp.int32(0), tiles0))
            acc = tiles[0]
            for x in tiles[1:]:
                acc = acc ^ x
            out_ref[0:8, :] = acc + L._u(jnp.zeros((8, ROWW), jnp.int32) + i)

        vin = jnp.arange(256 * ROWW, dtype=jnp.int32).reshape(256, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    return mk


def mk_bigroll(rows):
    """One chain, but rolling a (rows,128) tile: throughput vs tile size."""

    def mk(iters):
        def kernel(vin_ref, out_ref):
            x0 = L._u(vin_ref[pl.ds(0, rows), :])

            def body(c):
                i, x = c
                return (i + 1, pltpu.roll(x, 5, axis=1))

            i, x = jax.lax.while_loop(lambda c: c[0] < iters, body, (jnp.int32(0), x0))
            out_ref[0:8, :] = x[0:8] + L._u(jnp.zeros((8, ROWW), jnp.int32) + i)

        vin = jnp.arange(256 * ROWW, dtype=jnp.int32).reshape(256, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    return mk


for op in ["vec_add", "lane_roll", "sub_roll", "reduce_min", "rot_tile", "read_win"]:
    for K in [1, 2, 4, 8]:
        bench(f"{op:10s} K={K} static", mk_chains(K, op))
for K in [1, 4, 8]:
    bench(f"lane_roll  K={K} dynamic", mk_chains(K, "lane_roll", dyn=True))
for rows in [8, 16, 32, 64]:
    bench(f"lane_roll one chain ({rows},128) tile", mk_bigroll(rows))
print("DONE", flush=True)
