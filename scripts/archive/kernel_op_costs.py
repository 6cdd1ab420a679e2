"""In-kernel per-op cost microbenchmark (decides LZ kernel redesign).

Times a fori_loop of ITERS iterations whose body applies one primitive to
loop-carried state (data-dependent, so nothing hoists).  Reported as
ns/iteration after subtracting the empty-loop baseline.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
ITERS = 200_000
ROWW = 128


def _li(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def bench(name, body_fn, iters=ITERS):
    """body_fn(i, x, s, vref) -> (x, s): x vec (8,128) i32, s scalar i32."""
    def kernel(vin_ref, out_ref):
        def body(i, c):
            x, s = c
            return body_fn(i, x, s, vin_ref)

        x0 = vin_ref[0:8, :]
        x, s = jax.lax.fori_loop(0, iters, body, (x0, jnp.int32(1)))
        out_ref[0:8, :] = x + s

    vin = jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)
    f = lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(vin)
    try:
        jax.device_get(f())  # compile
        t0 = time.perf_counter()
        jax.device_get(f())
        dt = time.perf_counter() - t0
        print(f"{name:34s} {dt/iters*1e9:9.1f} ns/iter", flush=True)
        return dt / iters * 1e9
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l or "failed" in l.lower()), msg[0] if msg else "?")
        print(f"{name:34s} FAIL {key[:120]}", flush=True)
        return None


# baselines
bench("empty (add only)", lambda i, x, s, v: (x + 1, s))
bench("scalar only", lambda i, x, s, v: (x, s * 5 + 1))

# rolls
bench("static lane roll", lambda i, x, s, v: (pltpu.roll(x, 13, axis=1) + 1, s))
bench("dynamic lane roll", lambda i, x, s, v: (pltpu.roll(x, s & 127, axis=1) + 1, s))
bench("dynamic sublane roll", lambda i, x, s, v: (pltpu.roll(x, s & 7, axis=0) + 1, s))
bench("2x dynamic lane roll", lambda i, x, s, v: (
    pltpu.roll(pltpu.roll(x, s & 127, axis=1), (s + 1) & 127, axis=1) + 1, s))

# in-vreg gather
def g_lane(i, x, s, v):
    idx = (_li((8, ROWW)) + (s & 127)) % ROWW
    return jnp.take_along_axis(x, idx, axis=1) + 1, s
bench("lane gather (8,128) axis=1", g_lane)

# dynamic VMEM row read / write
def r_dyn(i, x, s, v):
    r = v[pl.ds((s & 31), 1), :]
    return x + r, s
bench("dyn VMEM row read [1,128]", r_dyn)

def r_dyn8(i, x, s, v):
    r = v[pl.ds((s & 31), 8), :]
    return x + r, s
bench("dyn VMEM 8-row read [8,128]", r_dyn8)

def r_stat(i, x, s, v):
    return x + v[0:8, :] + 1, s
bench("static VMEM 8-row read", r_stat)

# conds
def c_vec(i, x, s, v):
    x = jax.lax.cond((i & 1) == 0, lambda: x + 1, lambda: x + 2)
    return x, s
bench("cond 2 vector branches", c_vec)

def c_heavy(i, x, s, v):
    x = jax.lax.cond(
        (i & 1) == 0,
        lambda: pltpu.roll(x, s & 127, axis=1),
        lambda: x + 2,
    )
    return x, s
bench("cond roll-vs-add", c_heavy)

# lane reduction to scalar
def red(i, x, s, v):
    m = jnp.min(x)
    return x + 1, s + m * 0 + 1
bench("full min reduce -> scalar", red)

# where/select and iota
bench("where(li<k)", lambda i, x, s, v: (jnp.where(_li((8, ROWW)) < (s & 127), x, x + 1), s))
bench("iota+compare+2where", lambda i, x, s, v: (
    jnp.where(_li((8, ROWW)) < (s & 127), x, jnp.where(_li((8, ROWW)) > 5, x + 1, x)), s))

# multiply (VPU int mul)
bench("vector i32 multiply", lambda i, x, s, v: (x * 3 + 1, s))

# composite: _read512-equivalent (4 dyn reads + 4 dyn rolls + wheres)
def read512(i, x, s, v):
    def get(r):
        return v[pl.ds(jnp.clip(r, 0, 63), 1), :]
    k = s & 1023
    r0 = k // ROWW
    lw = k - r0 * ROWW
    a, b = get(r0), get(r0 + 1)
    ra = pltpu.roll(a, (-lw) % ROWW, axis=1)
    rb = pltpu.roll(b, (-lw) % ROWW, axis=1)
    w0 = jnp.where(_li((1, ROWW)) < ROWW - lw, ra, rb)
    a2, b2 = get(r0 + 1), get(r0 + 2)
    ra2 = pltpu.roll(a2, (-lw) % ROWW, axis=1)
    rb2 = pltpu.roll(b2, (-lw) % ROWW, axis=1)
    w1 = jnp.where(_li((1, ROWW)) < ROWW - lw, ra2, rb2)
    sh = 8 * (s & 3)
    r = jnp.where(sh > 0, (w0 >> sh) | (w1 << (32 - sh)), w0)
    return x + r, s
bench("read512 composite", read512)

# scalar SMEM chain: 8 dependent loads
def smem_chain(i, x, s, v):
    return x, s
def smem_kernel_bench():
    def kernel(vin_ref, out_ref, sm_ref):
        # fill smem once
        cp = pltpu.make_async_copy(vin_ref.at[0:8], sm_ref, None)
        def body(it, c):
            x, s = c
            q = s & 511
            for _ in range(8):
                q = sm_ref[q >> 7, q & 127] & 511
            return x, q
        x, s = jax.lax.fori_loop(0, ITERS, body, (vin_ref[0:8, :], jnp.int32(1)))
        out_ref[0:8, :] = x + s
    vin = jnp.abs(jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)) % 512
    f = lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((8, 128), jnp.int32)],
    )(vin)
    try:
        jax.device_get(f())
        t0 = time.perf_counter()
        jax.device_get(f())
        dt = time.perf_counter() - t0
        print(f"{'8 dependent SMEM loads':34s} {dt/ITERS*1e9:9.1f} ns/iter", flush=True)
    except Exception as e:
        print(f"8 dependent SMEM loads FAIL {str(e).splitlines()[0][:120]}", flush=True)

# SMEM scratch without DMA fill (fill via scalar stores first)
def smem_kernel_bench2():
    def kernel(vin_ref, out_ref, sm_ref):
        def fill(j, c):
            sm_ref[j >> 7, j & 127] = (j * 13 + 5) & 511
            return c
        jax.lax.fori_loop(0, 1024, fill, 0)
        def body(it, c):
            x, s = c
            q = s & 1023
            for _ in range(8):
                q = sm_ref[q >> 7, q & 127] & 1023
            return x, q
        x, s = jax.lax.fori_loop(0, ITERS, body, (vin_ref[0:8, :], jnp.int32(1)))
        out_ref[0:8, :] = x + s
    vin = jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)
    f = lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, ROWW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((8, 128), jnp.int32)],
    )(vin)
    try:
        jax.device_get(f())
        t0 = time.perf_counter()
        jax.device_get(f())
        dt = time.perf_counter() - t0
        print(f"{'8 dependent SMEM loads':34s} {dt/ITERS*1e9:9.1f} ns/iter", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{'8 dependent SMEM loads':34s} FAIL {key[:120]}", flush=True)

smem_kernel_bench2()

# dynamic VMEM row write
def wr_kernel_bench():
    def kernel(vin_ref, out_ref):
        def body(it, c):
            x, s = c
            out_ref[pl.ds(s & 31, 1), :] = x[0:1, :]
            return x, (s * 5 + 1) & 0x7FFFFFFF
        x, s = jax.lax.fori_loop(0, ITERS, body, (vin_ref[0:8, :], jnp.int32(1)))
        out_ref[0:8, :] = x + s
    vin = jnp.arange(64 * ROWW, dtype=jnp.int32).reshape(64, ROWW)
    f = lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, ROWW), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(vin)
    try:
        jax.device_get(f())
        t0 = time.perf_counter()
        jax.device_get(f())
        dt = time.perf_counter() - t0
        print(f"{'dyn VMEM row write [1,128]':34s} {dt/ITERS*1e9:9.1f} ns/iter", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"{'dyn VMEM row write [1,128]':34s} FAIL {key[:120]}", flush=True)

wr_kernel_bench()
print("DONE", flush=True)
