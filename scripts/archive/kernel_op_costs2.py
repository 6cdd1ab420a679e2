"""In-kernel per-op cost, slope-based (t(N2)-t(N1))/(N2-N1) to cancel
per-call overheads.  Run: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/kernel_op_costs2.py
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


def run(make_kernel, iters):
    f = make_kernel(iters)
    jax.device_get(f())  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


def bench(name, body_fn, scalar_only=False, unroll=1):
    def mk(iters):
        def kernel(vin_ref, out_ref):
            def body(i, c):
                x, s = c
                for _ in range(unroll):
                    x, s = body_fn(i, x, s, vin_ref)
                return x, s

            x0 = jnp.zeros((8, ROWW), jnp.int32) if scalar_only else vin_ref[0:8, :]
            x, s = jax.lax.fori_loop(0, iters // unroll, body, (x0, jnp.int32(1)))
            out_ref[0:8, :] = (x0 if scalar_only else x) + s

        vin = jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)
        call = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        jf = jax.jit(lambda v: call(v))
        return lambda: jf(vin)

    try:
        t1 = run(mk, N1)
        t2 = run(mk, N2)
        per = (t2 - t1) / (N2 - N1) * 1e9
        print(f"{name:36s} {per:9.1f} ns/iter   (call {t1*1e3:.1f} / {t2*1e3:.1f} ms)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{name:36s} FAIL {key[:120]}", flush=True)


# loop skeleton costs
bench("empty loop, vec carry", lambda i, x, s, v: (x, s))
bench("empty loop, scalar work only", lambda i, x, s, v: (x, s * 5 + 1), scalar_only=False)
bench("vec add", lambda i, x, s, v: (x + 1, s))
bench("vec add x16 unrolled", lambda i, x, s, v: (x + 1, s), unroll=16)
bench("dyn lane roll", lambda i, x, s, v: (pltpu.roll(x, s & 127, axis=1), (s * 5 + 1) & 0x7FFF))
bench("dyn lane roll x8 unrolled", lambda i, x, s, v: (pltpu.roll(x, s & 127, axis=1), (s * 5 + 1) & 0x7FFF), unroll=8)
bench("static lane roll x8", lambda i, x, s, v: (pltpu.roll(x, 13, axis=1), s), unroll=8)
def dynread(i, x, s, v):
    return x + v[pl.ds(s & 31, 1), :], (s * 5 + 1) & 0x7FFF
bench("dyn row read", dynread)
bench("dyn row read x8", dynread, unroll=8)
def cond_op(i, x, s, v):
    x = jax.lax.cond((s & 1) == 0, lambda: pltpu.roll(x, s & 127, axis=1), lambda: x + 2)
    return x, (s * 5 + 1) & 0x7FFF
bench("cond(roll,add)", cond_op)
bench("cond(roll,add) x8", cond_op, unroll=8)
def reduce_op(i, x, s, v):
    return x, s + jnp.min(x) * 0 + 1
bench("min reduce->scalar", reduce_op)
bench("min reduce->scalar x8", reduce_op, unroll=8)
print("DONE", flush=True)
