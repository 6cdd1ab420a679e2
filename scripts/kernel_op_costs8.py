"""Time the VMEM->SMEM staging DMA alone, per grid cell.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_op_costs8.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
ROWW = 128
B = 64


def mk(rc, nloads):
    def kernel(vin_ref, out_ref, ws_ref, sem):
        cp = pltpu.make_async_copy(vin_ref.at[0], ws_ref, sem)
        cp.start()
        cp.wait()
        # nloads dependent scalar loads so the DMA isn't dead
        def body(i, s):
            return ws_ref[(s & (rc * ROWW - 1)) >> 7, s & 127] ^ i

        s = jax.lax.fori_loop(0, nloads, body, jnp.int32(1))
        out_ref[0, 0:1, :] = jnp.zeros((1, ROWW), jnp.int32) + s

    vin = jnp.arange(B * rc * ROWW, dtype=jnp.int32).reshape(B, rc, ROWW)
    call = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rc, ROWW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, ROWW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, ROWW), jnp.int32),
        scratch_shapes=[pltpu.SMEM((rc, ROWW), jnp.int32), pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    jf = jax.jit(lambda v: call(v))
    return lambda: jf(vin)


def run(f):
    jax.device_get(f())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(r)
    return (time.perf_counter() - t0) / reps


for rc, nl in [(8, 0), (8, 4096), (40, 0), (136, 0), (136, 4096)]:
    try:
        dt = run(mk(rc, nl))
        print(f"rc={rc:4d} loads={nl:5d}: {dt*1e3:8.2f} ms/call  {dt/B*1e6:8.1f} us/cell "
              f"({rc*512} B SMEM stage)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"rc={rc} loads={nl}: FAIL {key[:130]}", flush=True)
print("DONE", flush=True)
