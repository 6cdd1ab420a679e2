"""Mosaic capability probes for the LZ4/Snappy decode kernel design.

Probes (hardware compile + run + value check):
  P1  SMEM scratch dynamic read/write at traced indices
  P1b SMEM scratch capacity 64KB (16K i32 words)
  P2  DMA VMEM -> SMEM scratch
  P2b input ref directly in SMEM memory space (16K words)
  P3  dynamic sublane-offset 2D vector load  ref[pl.ds(r,2), :]
  P4  dynamic sublane-offset 2D vector store ref[pl.ds(r,1), :] = v
  P5  pltpu.roll with traced scalar shift on lane axis (re-verify)
  P6  fori_loop with SMEM scalar state driving dynamic ds offsets
  P7  vector store at dynamic sublane offset with read-modify-write blend
  P8  per-lane dynamic gather jnp.take_along_axis on lane axis (expected fail)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/mosaic_probe_lz.py
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)


def probe(name, fn, check=None):
    try:
        out = np.asarray(jax.device_get(fn()))
        ok = True if check is None else check(out)
        print(f"PROBE {name}: {'OK' if ok else 'WRONG-VALUE'} {out.ravel()[:6]}", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l or "failed" in l.lower()), msg[0] if msg else "?")
        print(f"PROBE {name}: FAIL {key[:160]}", flush=True)


# ---- P1: SMEM dynamic rw ----
def p1():
    def kernel(x_ref, o_ref, s_ref):
        def body(i, _):
            s_ref[i] = x_ref[0, i] + 1
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
        def body2(i, acc):
            return acc + s_ref[7 - i]
        tot = jax.lax.fori_loop(0, 8, body2, 0)
        o_ref[0, 0] = tot

    x = jnp.arange(8, dtype=jnp.int32).reshape(1, 8)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
    )(x)


probe("P1 smem dyn rw", p1, lambda o: o[0, 0] == 36)


# ---- P1b: SMEM 16K words scratch ----
def p1b():
    def kernel(x_ref, o_ref, s_ref):
        def body(i, _):
            s_ref[i * 1024] = x_ref[0, 0] + i
            return 0
        jax.lax.fori_loop(0, 16, body, 0)
        o_ref[0, 0] = s_ref[15 * 1024]

    x = jnp.ones((1, 1), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((16 * 1024,), jnp.int32)],
    )(x)


probe("P1b smem 64KB scratch", p1b, lambda o: o[0, 0] == 16)


# ---- P2: DMA VMEM -> SMEM ----
def p2():
    def kernel(x_ref, o_ref, s_ref, sem):
        cp = pltpu.make_async_copy(x_ref.at[0], s_ref, sem)
        cp.start()
        cp.wait()
        o_ref[0, 0] = s_ref[5]

    x = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.SMEM((256,), jnp.int32), pltpu.SemaphoreType.DMA],
    )(x)


probe("P2 dma vmem->smem", p2, lambda o: o[0, 0] == 5)


# ---- P2b: big SMEM input ----
def p2b():
    def kernel(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 12345]

    x = jnp.arange(16 * 1024, dtype=jnp.int32).reshape(1, -1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )(x)


probe("P2b smem 64KB input", p2b, lambda o: o[0, 0] == 12345)


# ---- P3: dynamic sublane load ----
def p3():
    def kernel(i_ref, x_ref, o_ref):
        r = i_ref[0]
        o_ref[:, :] = x_ref[pl.ds(r, 2), :]

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    i = jnp.array([7], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, x)


probe("P3 dyn sublane load", p3, lambda o: o[0, 0] == 7 * 128)


# ---- P4: dynamic sublane store ----
def p4():
    def kernel(i_ref, x_ref, o_ref):
        r = i_ref[0]
        o_ref[:, :] = jnp.zeros_like(o_ref)
        o_ref[pl.ds(r, 2), :] = x_ref[0:2, :]

    x = jnp.arange(64 * 128, dtype=jnp.int32).reshape(64, 128)
    i = jnp.array([9], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, x)


probe("P4 dyn sublane store", p4, lambda o: o[9, 1] == 1 and o[0, 0] == 0)


# ---- P5: traced-shift lane roll ----
def p5():
    def kernel(i_ref, x_ref, o_ref):
        o_ref[:, :] = pltpu.roll(x_ref[:, :], i_ref[0], axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    i = jnp.array([3], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, x)


probe("P5 traced lane roll", p5, lambda o: o[0, 3] == 0)


# ---- P6: fori_loop scalar state -> dynamic ds ----
def p6():
    def kernel(x_ref, o_ref, s_ref):
        s_ref[0] = 0

        def body(i, _):
            p = s_ref[0]
            row = x_ref[pl.ds(p, 1), :]
            o_ref[pl.ds(i, 1), :] = row * 2
            s_ref[0] = p + 2
            return 0

        jax.lax.fori_loop(0, 4, body, 0)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(x)


probe("P6 loop dyn ds", p6, lambda o: o[1, 0] == 2 * 2 * 128)


# ---- P7: read-modify-write blend at dynamic sublanes ----
def p7():
    def kernel(i_ref, x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :]
        r = i_ref[0]
        cur = o_ref[pl.ds(r, 1), :]
        li = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        o_ref[pl.ds(r, 1), :] = jnp.where(li < 64, cur + 100, cur)

    x = jnp.arange(16 * 128, dtype=jnp.int32).reshape(16, 128)
    i = jnp.array([5], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(i, x)


probe("P7 rmw blend dyn row", p7, lambda o: o[5, 0] == 5 * 128 + 100 and o[5, 127] == 5 * 128 + 127)


# ---- P8: per-lane gather (expected fail) ----
def p8():
    def kernel(x_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) * 7) % 128
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=1)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


probe("P8 per-lane gather", p8, lambda o: o[0, 1] == 7)

# ---- P9: per-sublane gather (dynamic_gather on sublane axis) ----
def p9():
    def kernel(x_ref, o_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 3) % 8
        o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], idx, axis=0)

    x = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)


probe("P9 per-sublane gather", p9, lambda o: o[1, 0] == 3 * 128)

print("DONE", flush=True)
