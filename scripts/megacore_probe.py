"""Megacore-readiness probe (VERDICT r3 #7).

BASELINE hardware is v5p, whose chips expose 2 TensorCores behind one
device ("megacore"); the bench chip is v5e.  The production kernels mark
their chunk grid `dimension_semantics=("parallel",)`, which is the Mosaic
mechanism that splits grid cells across cores (the same knob the public
paged-attention kernels use for their explicit core dimension).  This
probe measures whether parallel grid cells actually run concurrently on
the local chip: a kernel with a fixed ~1 ms scalar busy loop per cell is
timed at grid sizes 1/2/4/8 under both "parallel" and "arbitrary"
semantics.  If wall time is flat 1->2 under "parallel" (and doubles under
"arbitrary"), the grid is splitting across 2 cores; if both scale
linearly, the local chip runs one core and the ~2x on v5p remains an
expectation backed by the documented Mosaic behavior, not a measurement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/megacore_probe.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 20000  # dependent scalar chain ~> 1-2 ms per grid cell


def _kernel(x_ref, o_ref):
    def body(i, s):
        return (s * jnp.int32(1103515245) + jnp.int32(12345)) & jnp.int32(0x7FFFFFFF)

    s = jax.lax.fori_loop(0, ITERS, body, x_ref[0, 0] + pl.program_id(0))
    o_ref[0, :, :] = jnp.zeros_like(o_ref[0]) + s


@functools.partial(jax.jit, static_argnames=("grid", "sem"))
def run(x, grid: int, sem: str):
    return pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=(sem,)),
    )(x)


def main():
    print("devices", jax.devices(), flush=True)
    for sem in ("parallel", "arbitrary"):
        base = None
        for grid in (1, 2, 4, 8):
            x = jnp.zeros((grid, 8, 128), jnp.int32)
            out = run(x, grid, sem)
            jax.device_get(out[0, 0, 0])
            t0 = time.perf_counter()
            reps = 50
            for _ in range(reps):
                out = run(x, grid, sem)
            jax.device_get(out[0, 0, 0])
            dt = (time.perf_counter() - t0) / reps
            if base is None:
                base = dt
            print(
                f"MEGACORE sem={sem} grid={grid}: {dt*1e6:8.1f} us "
                f"(x{dt/base:.2f} vs grid=1)",
                flush=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
