"""Diagnose the 24ms floor seen in lanes_bench and the butterfly crash.

Methodology: queue K calls back-to-back (chained through a data dependency so
XLA cannot elide), device_get once at the end; per-call time = total / K.
This separates tunnel round-trip latency from on-device cost.

Run in background: nohup python scripts/diag_overhead.py > /tmp/diag.log 2>&1 &
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lanes

SUB, L = 32, 512
B = 64


def timed(name, fn, x, reps=10):
    try:
        t0 = time.time()
        out = fn(x)
        jax.device_get(jnp.sum(out[0]))
        compile_s = time.time() - t0
        # chained calls: out feeds back in, one sync at the end
        t0 = time.perf_counter()
        y = x
        for _ in range(reps):
            y = fn(y)
        jax.device_get(jnp.sum(y[0]))
        dt = (time.perf_counter() - t0) / reps
        mb = int(np.prod(x.shape)) * x.dtype.itemsize / 1e6
        print(f"DIAG {name}: {dt*1e3:.3f} ms/call for {mb:.1f} MB -> {mb/1e3/dt:.2f} GB/s (compile {compile_s:.0f}s)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"DIAG {name} FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)


def pallas_grid(kernel_body, grid_b):
    def kernel(x_ref, o_ref):
        o_ref[:] = kernel_body(x_ref[0])[None]

    blk = B // grid_b
    def kernel_blk(x_ref, o_ref):
        o_ref[:] = kernel_body_multi(kernel_body, x_ref[:])

    if blk == 1:
        fn = pl.pallas_call(
            kernel,
            grid=(grid_b,),
            out_shape=jax.ShapeDtypeStruct((B, SUB, L), jnp.uint32),
            in_specs=[pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
    else:
        fn = pl.pallas_call(
            kernel_blk,
            grid=(grid_b,),
            out_shape=jax.ShapeDtypeStruct((B, SUB, L), jnp.uint32),
            in_specs=[pl.BlockSpec((blk, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((blk, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        )
    return jax.jit(fn)


def kernel_body_multi(body, x):
    # x: [blk, SUB, L] -> apply body per slice without a Python loop over blk
    # (treat the block dim as extra lanes: reshape is lane-preserving on last dim)
    return jax.vmap(body)(x)


def body_noop(x):
    return x + 1


def body_roll10(x):
    for s in range(10):
        x = lanes.flat_roll_static(x, 1 << s, L)
    return x


def body_butterfly10_i32(x):
    """butterfly with int32 masks instead of bool (bool rolls may crash Mosaic)."""
    fi = lanes.flat_iota(x.shape)
    valid = ((x & 1) == 1)
    rank = lanes.seg_cumsum(valid.astype(jnp.int32), 32, exclusive=True)
    dist = jnp.where(valid, (fi % 1024) - rank, 0)
    (p,), ok = butterfly_left_i32([x], dist, valid.astype(jnp.int32), 32, nbits=10)
    return jnp.where(ok != 0, p, 0).astype(jnp.uint32)


def butterfly_left_i32(payloads, dist, valid, span, nbits):
    dist = dist.astype(jnp.int32)
    for s in range(nbits):
        step = 1 << s
        move = valid * (((dist >> s) & 1) == 1)
        incoming = lanes.flat_roll_static(move, -step, span)
        inc_b = incoming != 0
        payloads = [jnp.where(inc_b, lanes.flat_roll_static(p, -step, span), p) for p in payloads]
        dist = jnp.where(inc_b, lanes.flat_roll_static(dist, -step, span) - step, dist)
        valid = jnp.where(inc_b, 1, valid * (1 - move))
    return payloads, valid


if __name__ == "__main__":
    print(f"devices={jax.devices()}", flush=True)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 2**31, (B, SUB, L)).astype(np.uint32))

    # 0) pure XLA elementwise, same harness (tunnel baseline)
    timed("xla_add", jax.jit(lambda v: v + 1), x)
    # 1) pallas noop, per-partition grid
    timed("pallas_noop_grid64", pallas_grid(body_noop, 64), x)
    # 2) pallas noop, single cell whole array
    timed("pallas_noop_grid1", pallas_grid(body_noop, 1), x)
    # 3) pallas roll10 grid1 (vmapped inside)
    timed("pallas_roll10_grid1", pallas_grid(body_roll10, 1), x)
    # 4) pallas roll10 grid64
    timed("pallas_roll10_grid64", pallas_grid(body_roll10, 64), x)
    # 5) butterfly with i32 masks, grid64
    timed("pallas_bfly_i32_grid64", pallas_grid(body_butterfly10_i32, 64), x)
    # 6) butterfly with i32 masks, grid1
    timed("pallas_bfly_i32_grid1", pallas_grid(body_butterfly10_i32, 1), x)
    print("DONE", flush=True)
