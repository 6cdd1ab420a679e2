"""Do i16 tiles halve lane-roll cost vs i32 (the w<=2 butterfly lever)?

Lane rolls cost ~75 ns per vreg-row; an i16 (32, L) tile is half the
vregs of i32.  If Mosaic lowers i16 dynamic lane rolls at half cost, the
cascaded inverse pipeline could run its element butterflies on i16 for
1/2-byte dtypes.  Slope-timed dependent roll chains.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/i16_roll_probe.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)


def slope(name, dtype, shape):
    def build(n):
        def kernel(x_ref, o_ref):
            def body(i, acc):
                r = pltpu.roll(acc ^ x_ref[...], 1, axis=1)
                return r
            o_ref[...] = jax.lax.fori_loop(0, n, body, x_ref[...])
        return jax.jit(pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, dtype),
        ))
    x = jnp.asarray(np.random.default_rng(0).integers(0, 100, shape, np.int64)).astype(dtype)
    try:
        ts = {}
        for n in (2000, 20000):
            f = build(n)
            r = f(x); jax.device_get(r.ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(3):
                r = f(x)
            jax.device_get(r.ravel()[:1])
            ts[n] = (time.perf_counter() - t0) / 3
        per = (ts[20000] - ts[2000]) / 18000
        print(f"{name}: {per*1e9:8.1f} ns/roll", flush=True)
    except Exception as e:
        key = next((l for l in str(e).splitlines() if "Mosaic" in l or "nsupported" in l), str(e).splitlines()[0])
        print(f"{name}: FAIL {key[:140]}", flush=True)


slope("i32 (32,512)", jnp.int32, (32, 512))
slope("i16 (32,512)", jnp.int16, (32, 512))
slope("i32 (32,128)", jnp.int32, (32, 128))
slope("i16 (32,128)", jnp.int16, (32, 128))
print("DONE", flush=True)
