"""Isolate the S0 blowup: dynamic stores, ref sizes, loop-carried stores.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs5.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lz_pallas as L

print("devices", jax.devices(), flush=True)
ROWW = 128
N1, N2 = 8_000, 64_000


def run(f):
    jax.device_get(f())
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def bench(name, body_fn, out_rows=64, in_rows=256):
    def mk(iters):
        def kernel(vin_ref, out_ref):
            def body(i, c):
                x, s = c
                return body_fn(i, x, s, vin_ref, out_ref)

            x, s = jax.lax.fori_loop(
                0, iters, body, (L._u(vin_ref[0:8, :]), jnp.int32(1))
            )
            out_ref[0:8, :] = (x + s).astype(jnp.uint32)

        vin = jnp.arange(in_rows * ROWW, dtype=jnp.int32).reshape(in_rows, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, ROWW), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    try:
        t1 = run(mk(N1))
        t2 = run(mk(N2))
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:44s} {per:9.1f} ns/op  (call {t1*1e3:.1f}/{t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:44s} FAIL {key[:120]}", flush=True)


def st_dyn(rows_mask):
    def f(i, x, s, v, o):
        o[pl.ds((s & rows_mask) * 8, 8), :] = x
        return x, (s * 5 + 1) & 0x7FFF
    return f


def st_stat(i, x, s, v, o):
    o[8:16, :] = x
    return x, (s * 5 + 1) & 0x7FFF


def st_dyn_cond(rows_mask):
    def f(i, x, s, v, o):
        def w():
            o[pl.ds((s & rows_mask) * 8, 8), :] = x
            return 0
        jax.lax.cond((s & 3) == 0, w, lambda: 0)
        return x, (s * 5 + 1) & 0x7FFF
    return f


def rd_dyn_big(i, x, s, v, o):
    t = L._u(v[pl.ds((s & 63) * 8, 16), :])
    return x + t[0:8], (s * 5 + 1) & 0x7FFF


bench("dyn 8-row store, 64-row out", st_dyn(3), out_rows=64)
bench("dyn 8-row store, 512-row out", st_dyn(31), out_rows=512)
bench("dyn 8-row store, 2048-row out", st_dyn(255), out_rows=2048)
bench("static 8-row store, 2048-row out", st_stat, out_rows=2048)
bench("dyn store 1/4 cond, 2048-row out", st_dyn_cond(255), out_rows=2048)
bench("dyn 16-row read, 2048-row in", rd_dyn_big, in_rows=2048)


# store + read-back interleave (the decode pattern: flush then window-read)
def st_rd(i, x, s, v, o):
    o[pl.ds((s & 255) * 8, 8), :] = x
    t = L._u(o[pl.ds(((s * 7) & 255) * 8, 16), :])
    return x + t[0:8], (s * 5 + 1) & 0x7FFF
bench("dyn store + dyn read same ref (2048)", st_rd, out_rows=2048)
print("DONE", flush=True)
