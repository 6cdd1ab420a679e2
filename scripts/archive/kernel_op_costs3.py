"""Round 3: gather vs roll costs in-kernel (slope-based, jitted).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs3.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
ROWW = 128
N1, N2 = 64_000, 512_000


def _li(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _si(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def bench(name, body_fn, rows=8, unroll=1):
    def mk(iters):
        def kernel(vin_ref, out_ref):
            def body(i, c):
                x, s = c
                for _ in range(unroll):
                    x, s = body_fn(i, x, s, vin_ref)
                return x, s

            x, s = jax.lax.fori_loop(
                0, iters // unroll, body, (vin_ref[0:rows, :], jnp.int32(1))
            )
            out_ref[0:rows, :] = x + s

        vin = jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, ROWW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    try:
        t1 = run(mk(N1))
        t2 = run(mk(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9 / unroll
        print(f"{name:40s} {per:9.1f} ns/op   (call {t1*1e3:.1f} / {t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:40s} FAIL {key[:120]}", flush=True)


def g_lane_dyn(i, x, s, v):
    idx = (_li(x.shape) + (s & 127)) % ROWW
    return jnp.take_along_axis(x, idx, axis=1), (s * 5 + 1) & 0x7FFF


def g_lane_arb(i, x, s, v):
    idx = (_li(x.shape) * 7 + (s & 127)) % ROWW
    return jnp.take_along_axis(x, idx, axis=1), (s * 5 + 1) & 0x7FFF


def g_sub_dyn(i, x, s, v):
    idx = (_si(x.shape) + (s & 7)) % x.shape[0]
    return jnp.take_along_axis(x, idx, axis=0), (s * 5 + 1) & 0x7FFF


def r_sub_dyn(i, x, s, v):
    return pltpu.roll(x, s & 7, axis=0), (s * 5 + 1) & 0x7FFF


def r_sub_stat(i, x, s, v):
    return pltpu.roll(x, 3, axis=0), s


def r_lane_16(i, x, s, v):
    return pltpu.roll(x, s & 127, axis=1), (s * 5 + 1) & 0x7FFF


def shifts(i, x, s, v):
    return ((x << 8) | (x >> 24)) + 1, s


def select_op(i, x, s, v):
    return jnp.where(_li(x.shape) < (s & 127), x, x + 1), (s * 5 + 1) & 0x7FFF


def splat(i, x, s, v):
    return x + s, (s * 5 + 1) & 0x7FFF


def extract(i, x, s, v):
    w = jnp.sum(jnp.where((_li(x.shape) == 0) & (_si(x.shape) == 0), x, 0))
    return x + 1, (w & 0x7FFF)


bench("lane gather dyn-rot (8,128)", g_lane_dyn, unroll=8)
bench("lane gather arbitrary (8,128)", g_lane_arb, unroll=8)
bench("lane gather dyn-rot (16,128)", g_lane_dyn, rows=16, unroll=8)
bench("sublane gather dyn-rot (8,128)", g_sub_dyn, unroll=8)
bench("sublane gather dyn-rot (16,128)", g_sub_dyn, rows=16, unroll=8)
bench("sublane roll dyn (8,128)", r_sub_dyn, unroll=8)
bench("sublane roll dyn (16,128)", r_sub_dyn, rows=16, unroll=8)
bench("sublane roll static (8,128)", r_sub_stat, unroll=8)
bench("lane roll dyn (16,128)", r_lane_16, rows=16, unroll=8)
bench("lane roll dyn (1,128)", r_lane_16, rows=1, unroll=8)
bench("shift+or", shifts, unroll=8)
bench("where(li<k) dyn", select_op, unroll=8)
bench("scalar splat add", splat, unroll=8)
bench("extract scalar (masked sum)", extract, unroll=8)
print("DONE", flush=True)
