"""Microbenchmark of the lanes.py primitives compiled on the real TPU.

Calibrates tile-op throughput on [32, 512] u32 tiles (one 64KB int32
partition per grid cell).  Per-call dispatch through the axon tunnel is
~2.6 ms, so the workload must be large per call: B partitions per call,
chained calls, one device_get sync at the end.

Run in the background (never interrupt mid-compile):
    nohup python scripts/lanes_bench.py > /tmp/lanes_bench.log 2>&1 &
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
B = 2048  # partitions per call (128 MB)


def bench(name, kernel_body, reps=4):
    def kernel(x_ref, o_ref):
        o_ref[0] = kernel_body(x_ref[0])

    fn = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, SUB, L), jnp.uint32),
        in_specs=[pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    fn = jax.jit(fn)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**31, (B, SUB, L)).astype(np.uint32)
    )
    try:
        t0 = time.time()
        out = fn(x)
        jax.device_get(jnp.sum(out[0, 0, :8]))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        y = x
        for _ in range(reps):
            y = fn(y)
        jax.device_get(jnp.sum(y[0, 0, :8]))
        dt = (time.perf_counter() - t0) / reps
        mb = B * SUB * L * 4 / 1e6
        print(
            f"BENCH {name}: {dt*1e3:.3f} ms for {mb:.0f} MB -> {mb/1e3/dt:.2f} GB/s "
            f"({dt*1e9/B/(SUB*L):.3f} ns/elem, compile {compile_s:.0f}s)",
            flush=True,
        )
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"BENCH {name} FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def body_noop(x):
    return x + 1


def body_roll10(x):
    # 10 static flat rolls (the butterfly pass shift cost floor)
    for s in range(10):
        x = lanes.flat_roll_static(x, 1 << s, L)
    return x


def body_cumsum(x):
    return lanes.seg_cumsum(x.astype(jnp.int32), 32).astype(jnp.uint32)


def body_butterfly10(x):
    fi = lanes.flat_iota(x.shape)
    valid = (x & 1) == 1
    rank = lanes.seg_cumsum(valid.astype(jnp.int32), 32, exclusive=True)
    dist = jnp.where(valid, (fi % 1024) - rank, 0)
    (p,), ok = lanes.butterfly_left([x], dist, valid, 32, nbits=10)
    return jnp.where(ok, p, 0).astype(jnp.uint32)


def body_pack(x):
    bw = jnp.full(x.shape, 13, jnp.int32)
    return lanes.pack_allpairs(x & jnp.uint32(0x1FFF), bw, 1)


def body_unpack(x):
    bw = jnp.full(x.shape, 13, jnp.int32)
    return lanes.unpack_allpairs(x, bw, 1)


def body_ffill(x):
    is_src = (x & 7) == 0
    return lanes.ffill(jnp.where(is_src, x, 0), is_src, 32)


def body_encode_sim(x):
    """~full encode workload simulation: 2 compactions + cumsum + pack."""
    y = body_butterfly10(x)
    y = body_butterfly10(y | 1)
    z = lanes.seg_cumsum(y.astype(jnp.int32), 32).astype(jnp.uint32)
    return body_pack(z)


if __name__ == "__main__":
    print(f"devices={jax.devices()}", flush=True)
    bench("noop(x+1)", body_noop)
    bench("roll10", body_roll10)
    bench("seg_cumsum", body_cumsum)
    bench("butterfly10+rank", body_butterfly10)
    bench("pack_allpairs", body_pack)
    bench("unpack_allpairs", body_unpack)
    bench("ffill", body_ffill)
    bench("encode_sim", body_encode_sim)
    print("DONE", flush=True)
