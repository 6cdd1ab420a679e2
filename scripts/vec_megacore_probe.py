"""Vector-work variant of the megacore probe + production-kernel semantics A/B."""
import functools, os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 3000

def _kernel(x_ref, o_ref):
    def body(i, v):
        # dependent vector chain with a lane roll (the production kernels' staple)
        v = pltpu.roll(v, 1, axis=1)
        return v * 3 + 1
    v = jax.lax.fori_loop(0, ITERS, body, x_ref[0].astype(jnp.int32) + pl.program_id(0))
    o_ref[0] = v

@functools.partial(jax.jit, static_argnames=("grid", "sem"))
def run(x, grid, sem):
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )(x)

print("devices", jax.devices(), flush=True)
for sem in ("parallel", "arbitrary"):
    base = None
    for grid in (1, 2, 4, 8):
        x = jnp.zeros((grid, 8, 128), jnp.int32)
        out = run(x, grid, sem); jax.device_get(out[0,0,0])
        t0 = time.perf_counter()
        for _ in range(30):
            out = run(x, grid, sem)
        jax.device_get(out[0,0,0])
        dt = (time.perf_counter()-t0)/30
        if base is None: base = dt
        print(f"VECMEGA sem={sem} grid={grid}: {dt*1e6:8.1f} us (x{dt/base:.2f})", flush=True)
print("DONE", flush=True)
