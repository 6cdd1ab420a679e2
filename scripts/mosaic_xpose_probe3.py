"""Amortized in-kernel cost of Mosaic 2D transposes (slope method).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_xpose_probe3.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def slope(name, shape, mk_kernel):
    def build(n):
        return jax.jit(pl.pallas_call(
            mk_kernel(n),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((shape[1], shape[0]), jnp.int32),
        ))
    x = jnp.asarray(rng.integers(0, 1 << 30, shape, np.int64).astype(np.int32))
    ts = {}
    try:
        for n in (2000, 20000):
            f = build(n)
            out = f(x); jax.device_get(out.ravel()[:1])
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(x)
            jax.device_get(out.ravel()[:1])
            ts[n] = (time.perf_counter() - t0) / 5
        per = (ts[20000] - ts[2000]) / 18000
        nb = int(np.prod(shape)) * 4
        print(f"{name}: {per*1e9:9.1f} ns/op  ({nb/per/1e9:6.1f} GB/s-equiv)", flush=True)
    except Exception as e:
        lines = str(e).splitlines()
        key = next((l for l in lines if "Mosaic" in l or "nsupported" in l), lines[0] if lines else "?")
        print(f"{name}: FAIL {key[:120]}", flush=True)


def mk_T(shape):
    def mk(n):
        def kernel(x_ref, o_ref):
            def body(i, acc):
                t = (x_ref[...] ^ i).T
                return acc ^ t  # i-dependence prevents hoisting
            o_ref[...] = jax.lax.fori_loop(0, n, body, jnp.zeros(
                (shape[1], shape[0]), jnp.int32))
        return kernel
    return mk


for shape in ((1152, 32), (32, 1152), (128, 128), (1024, 128), (640, 32), (32, 640)):
    slope(f"T {shape}", shape, mk_T(shape))
print("DONE", flush=True)
