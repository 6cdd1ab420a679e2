"""Probe in-kernel gather reach + throughput (decides decode architecture).

P10  take_along_axis axis=1 on [8, 2048] (cross-vreg lane gather)
P11  take_along_axis axis=1 on [32, 8192], idx [32, 8192] (big table)
P12  take_along_axis axis=0 on [512, 128] (cross-vreg sublane gather)
P13  per-row single extract: axis=1 idx [32, 128] from [32, 4096]
T1   gather throughput: 64 chained gathers on [32, 2048]
T2   roll throughput baseline: 64 chained rolls on [32, 2048]

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe_gather.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)


def probe(name, fn, check=None):
    try:
        t0 = time.time()
        out = np.asarray(jax.device_get(fn()))
        dt = time.time() - t0
        ok = True if check is None else check(out)
        print(f"PROBE {name}: {'OK' if ok else 'WRONG-VALUE'} ({dt:.0f}s) {out.ravel()[:5]}", flush=True)
        return ok
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l or "failed" in l.lower()), msg[0] if msg else "?")
        print(f"PROBE {name}: FAIL {key[:150]}", flush=True)
        return False


def mk(shape, mod):
    def kernel(x_ref, o_ref):
        axis = 1
        n = shape[axis]
        idx = (jax.lax.broadcasted_iota(jnp.int32, shape, axis) * mod + 13) % n
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=axis)

    x = jnp.arange(shape[0] * shape[1], dtype=jnp.int32).reshape(shape)
    return lambda: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


probe("P10 axis1 [8,2048]", mk((8, 2048), 7), lambda o: o[0, 1] == 20 % 2048)
probe("P11 axis1 [32,8192]", mk((32, 8192), 7), lambda o: o[0, 1] == 20)


def p12():
    shape = (512, 128)

    def kernel(x_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) * 7 + 3) % 512
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=0)

    x = jnp.arange(512 * 128, dtype=jnp.int32).reshape(shape)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


probe("P12 axis0 [512,128]", p12, lambda o: o[1, 0] == 10 * 128)


def p13():
    def kernel(x_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1) * 31 + jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)) % 4096
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=1)[:, :128]

    x = jnp.arange(32 * 4096, dtype=jnp.int32).reshape(32, 4096)
    def run():
        def kernel(x_ref, o_ref):
            idx = (jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1) * 31
                   + jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0) * 5) % 4096
            src = x_ref[:, :]
            # gather a narrow result from a wide source
            o_ref[:, :] = jnp.take_along_axis(src, idx, axis=1)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return run()


probe("P13 narrow-from-wide", p13, lambda o: o[0, 1] == 31)


# ---- timing: chained gathers vs rolls on [32, 2048] ----
def timed(name, body):
    x = jnp.arange(32 * 2048, dtype=jnp.int32).reshape(32, 2048)

    def kernel(x_ref, o_ref):
        v = x_ref[:, :]
        v = body(v)
        o_ref[:, :] = v

    fn = jax.jit(lambda x: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 2048), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x))
    try:
        out = fn(x)
        jax.device_get(out[0, :2])
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(out)
        jax.device_get(out[0, :2])
        dt = (time.perf_counter() - t0) / reps
        print(f"TIME {name}: {dt*1e6:.0f} us/call (64 passes on [32,2048] i32)", flush=True)
    except Exception as e:
        print(f"TIME {name}: FAIL {str(e)[:120]}", flush=True)


def g_body(v):
    idx = (jax.lax.broadcasted_iota(jnp.int32, (32, 2048), 1) * 7 + 3) % 2048
    for _ in range(64):
        v = jnp.take_along_axis(v, idx, axis=1) + 1
    return v


def r_body(v):
    for i in range(64):
        v = pltpu.roll(v, 1 + i, axis=1) + 1
    return v


timed("T1 gather", g_body)
timed("T2 roll", r_body)
print("DONE", flush=True)
