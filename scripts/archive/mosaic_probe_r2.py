"""Mosaic capability probe, round 2.

Compiles and runs one tiny Pallas kernel per capability on the real TPU,
comparing against interpret-mode output.  Each probe is independent; a
failure records the exception and moves on.  Results print as one line per
probe: PROBE <name> OK/FAIL <detail>.

Run in the background (never interrupt mid-compile through the axon tunnel):
    nohup python scripts/mosaic_probe_r2.py > /tmp/probe_r2.log 2>&1 &
"""

from __future__ import annotations

import functools
import os
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run_probe(name, build):
    """build() returns (fn, args, ref_fn) where fn(*args) runs the kernel
    compiled; ref_fn(*args) produces the expected output (numpy)."""
    t0 = time.time()
    try:
        fn, args, ref_fn = build()
        out = jax.device_get(fn(*args))
        ref = ref_fn(*args)
        ok = np.array_equal(np.asarray(out), np.asarray(ref))
        dt = time.time() - t0
        if ok:
            print(f"PROBE {name} OK {dt:.1f}s", flush=True)
        else:
            print(f"PROBE {name} MISMATCH {dt:.1f}s out={np.asarray(out).ravel()[:8]} ref={np.asarray(ref).ravel()[:8]}", flush=True)
    except Exception as e:  # noqa: BLE001
        dt = time.time() - t0
        msg = str(e).replace("\n", " | ")[:500]
        print(f"PROBE {name} FAIL {dt:.1f}s {type(e).__name__}: {msg}", flush=True)


R, L = 32, 512


def _call(kernel, out_shape, *args, grid=None, smem_out=False):
    out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
        out_specs=out_specs,
    )(*args)


def mk_x():
    return jnp.arange(R * L, dtype=jnp.uint32).reshape(R, L)


# ---- probes ----------------------------------------------------------------

def p_roll_static_axis0():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 3, axis=0)

    x = mk_x()
    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), (
        lambda x: np.roll(np.asarray(x), 3, axis=0)
    )


def p_roll_static_axis1():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], 5, axis=1)

    x = mk_x()
    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), (
        lambda x: np.roll(np.asarray(x), 5, axis=1)
    )


def p_roll_dynamic_axis1():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)

    x = mk_x()
    s = jnp.array([7], jnp.int32)

    def fn(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    return fn, (x, s), (lambda x, s: np.roll(np.asarray(x), 7, axis=1))


def p_roll_dynamic_axis0():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=0)

    x = mk_x()
    s = jnp.array([3], jnp.int32)

    def fn(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    return fn, (x, s), (lambda x, s: np.roll(np.asarray(x), 3, axis=0))


def p_cumsum_axis1():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    x = jnp.ones((R, L), jnp.int32)
    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), (
        lambda x: np.cumsum(np.asarray(x), axis=1)
    )


def p_cumsum_axis0():
    def kernel(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=0)

    x = jnp.ones((R, L), jnp.int32)
    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), (
        lambda x: np.cumsum(np.asarray(x), axis=0)
    )


def p_transpose():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].T

    x = mk_x()
    return (
        lambda x: _call(kernel, jax.ShapeDtypeStruct((L, R), x.dtype), x)
    ), (x,), (lambda x: np.asarray(x).T)


def p_fori_carry():
    def kernel(x_ref, o_ref):
        def body(i, acc):
            return acc + pltpu.roll(x_ref[:], i, axis=0)

        o_ref[:] = jax.lax.fori_loop(0, 4, body, jnp.zeros_like(x_ref))

    x = mk_x()

    def ref(x):
        a = np.zeros_like(np.asarray(x))
        for i in range(4):
            a = a + np.roll(np.asarray(x), i, axis=0)
        return a

    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), ref


def p_scalar_read_dynamic():
    """Read a scalar from a VMEM tile at a traced (i, j) inside fori_loop."""

    def kernel(x_ref, o_ref):
        def body(c, acc):
            i = c % R
            j = (c * 37) % L
            return acc + x_ref[i, j]

        s = jax.lax.fori_loop(0, 16, body, jnp.uint32(0))
        o_ref[0, 0] = s

    x = mk_x()

    def ref(x):
        xx = np.asarray(x)
        s = np.uint32(0)
        for c in range(16):
            s += xx[c % R, (c * 37) % L]
        return s.reshape(1, 1)

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return fn, (x,), ref


def p_dynamic_ds_store():
    """Store a [8, L] block at a dynamic sublane offset."""

    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        off = s_ref[0]
        o_ref[pl.ds(off, 8), :] = x_ref[0:8, :]

    x = mk_x()
    s = jnp.array([5], jnp.int32)

    def ref(x, s):
        o = np.zeros((R, L), np.uint32)
        o[5:13] = np.asarray(x)[0:8]
        return o

    def fn(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, L), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    return fn, (x, s), ref


def p_dynamic_ds_load():
    def kernel(x_ref, s_ref, o_ref):
        off = s_ref[0]
        o_ref[:] = x_ref[pl.ds(off, 8), :]

    x = mk_x()
    s = jnp.array([9], jnp.int32)

    def ref(x, s):
        return np.asarray(x)[9:17]

    def fn(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    return fn, (x, s), ref


def p_switch_dynamic():
    """lax.switch on a traced scalar selects one branch."""

    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = jax.lax.switch(
            s_ref[0],
            [lambda v: v + 1, lambda v: v * 2, lambda v: v ^ 3],
            x_ref[:],
        )

    x = mk_x()
    s = jnp.array([1], jnp.int32)

    def ref(x, s):
        return np.asarray(x) * 2

    def fn(x, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, s)

    return fn, (x, s), ref


def p_dynamic_shift_per_lane():
    """Per-lane variable shift amounts (elementwise shl)."""

    def kernel(x_ref, o_ref):
        sh = jax.lax.broadcasted_iota(jnp.uint32, (R, L), 1) % 31
        o_ref[:] = x_ref[:] << sh

    x = mk_x()

    def ref(x):
        sh = (np.arange(L, dtype=np.uint32) % 31)[None, :]
        return (np.asarray(x) << sh).astype(np.uint32)

    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), ref


def p_assoc_scan():
    def kernel(x_ref, o_ref):
        o_ref[:] = jax.lax.associative_scan(jnp.add, x_ref[:], axis=1)

    x = jnp.ones((R, L), jnp.int32)
    return (lambda x: _call(kernel, jax.ShapeDtypeStruct(x.shape, x.dtype), x)), (x,), (
        lambda x: np.cumsum(np.asarray(x), axis=1)
    )


def p_matmul_f32():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)

    a = jnp.ones((128, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32)
    return (
        lambda a, b: _call(kernel, jax.ShapeDtypeStruct((128, 128), jnp.float32), a, b)
    ), (a, b), (lambda a, b: np.full((128, 128), 128.0, np.float32))


def p_matmul_int8():
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    a = jnp.ones((128, 128), jnp.int8)
    b = jnp.ones((128, 128), jnp.int8)
    return (
        lambda a, b: _call(kernel, jax.ShapeDtypeStruct((128, 128), jnp.int32), a, b)
    ), (a, b), (lambda a, b: np.full((128, 128), 128, np.int32))


def p_while_loop():
    def kernel(x_ref, o_ref):
        def cond(c):
            i, acc = c
            return i < 5

        def body(c):
            i, acc = c
            return i + 1, acc + x_ref[0, 0]

        _, s = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.uint32(0)))
        o_ref[0, 0] = s

    x = mk_x()

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return fn, (x,), (lambda x: np.zeros((1, 1), np.uint32))


def p_scalar_store_smem_indexed():
    """Write scalars into an SMEM output at traced indices in a loop."""

    def kernel(x_ref, o_ref):
        def body(i, _):
            o_ref[(i * 3) % 16] = x_ref[0, i]
            return 0

        jax.lax.fori_loop(0, 16, body, 0)

    x = mk_x()

    def ref(x):
        o = np.zeros((16,), np.uint32)
        for i in range(16):
            o[(i * 3) % 16] = np.asarray(x)[0, i]
        return o

    def fn(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16,), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(x)

    return fn, (x,), ref


def p_grid_output_rows():
    """Per-grid-cell output blocks + sizes row (the fused-codec I/O shape)."""

    def kernel(x_ref, o_ref, n_ref):
        o_ref[:] = x_ref[:] + 1
        n_ref[0] = jnp.sum(x_ref[:]).astype(jnp.int32)

    x = jnp.tile(mk_x()[None], (4, 1, 1))

    def fn(x):
        return pl.pallas_call(
            kernel,
            grid=(4,),
            out_shape=(
                jax.ShapeDtypeStruct((4, R, L), jnp.uint32),
                jax.ShapeDtypeStruct((4,), jnp.int32),
            ),
            in_specs=[
                pl.BlockSpec((1, R, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            ],
            out_specs=(
                pl.BlockSpec((1, R, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1,), lambda i: (i,), memory_space=pltpu.SMEM),
            ),
        )(x)

    def ref(x):
        xx = np.asarray(x)
        return xx + 1, xx.reshape(4, -1).sum(axis=1).astype(np.int32)

    def fn2(x):
        o, n = fn(x)
        return jnp.concatenate([o.reshape(4, -1).astype(jnp.int64), n[:, None].astype(jnp.int64)], axis=1)

    def ref2(x):
        o, n = ref(x)
        return np.concatenate([o.reshape(4, -1).astype(np.int64), n[:, None].astype(np.int64)], axis=1)

    return fn2, (x,), ref2


def p_reshape_lane_preserving():
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(R * 4, L // 4)

    x = mk_x()
    return (
        lambda x: _call(kernel, jax.ShapeDtypeStruct((R * 4, L // 4), x.dtype), x)
    ), (x,), (lambda x: np.asarray(x).reshape(R * 4, L // 4))


PROBES = [
    ("roll_static_axis0", p_roll_static_axis0),
    ("roll_static_axis1", p_roll_static_axis1),
    ("roll_dynamic_axis1", p_roll_dynamic_axis1),
    ("roll_dynamic_axis0", p_roll_dynamic_axis0),
    ("cumsum_axis1", p_cumsum_axis1),
    ("cumsum_axis0", p_cumsum_axis0),
    ("transpose", p_transpose),
    ("fori_carry", p_fori_carry),
    ("scalar_read_dynamic", p_scalar_read_dynamic),
    ("dynamic_ds_store", p_dynamic_ds_store),
    ("dynamic_ds_load", p_dynamic_ds_load),
    ("switch_dynamic", p_switch_dynamic),
    ("dynamic_shift_per_lane", p_dynamic_shift_per_lane),
    ("assoc_scan", p_assoc_scan),
    ("matmul_f32", p_matmul_f32),
    ("matmul_int8", p_matmul_int8),
    ("while_loop", p_while_loop),
    ("scalar_store_smem_indexed", p_scalar_store_smem_indexed),
    ("grid_output_rows", p_grid_output_rows),
    ("reshape_lane_preserving", p_reshape_lane_preserving),
]


if __name__ == "__main__":
    only = sys.argv[1:] or None
    print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
    for name, build in PROBES:
        if only and name not in only:
            continue
        run_probe(name, build)
    print("DONE", flush=True)
