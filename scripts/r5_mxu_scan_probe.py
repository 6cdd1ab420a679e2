"""Round-5 probe 5: segmented cumsum on the MXU via constant block-triangular
ones-matrices (f32, byte/limb-plane exact decomposition) vs lanes.seg_cumsum.

The decode pipeline's cost on full-occupancy data is ~3 scan structures x
log(n) full-tile passes; the LANE-level stages are lane-crossing rolls
(~75 ns/vreg-row).  A cumsum is a matmul with a constant triangular ones
matrix -- unlike the dead one-hot permutation idea, nothing data-dependent
is materialized.  Exactness: int32 is split into 8-bit planes (full MXU
variant) or 11-bit limbs of the column totals (hybrid variant); products
are exact in f32 and group sums stay below 2^24, so f32 accumulation is
exact; planes recombine with wrapping int32 shifts.

Also times ffill (the run-expansion gap filler) since scatter-diff + MXU
cumsum could replace scatter + ffill.

    nohup python scripts/r5_mxu_scan_probe.py > /tmp/mxu_scan.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lanes

SUB, L = 32, 512
SPAN = 32           # lanes per chunk group (e=1024 elements)
B = 2048            # partitions per call (128 MB)


def _tri_sub(s):
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (j <= i).astype(jnp.float32)        # Y = Ls @ X: out[i] = sum_{j<=i}


def _carry_mat(l, span):
    i = jax.lax.broadcasted_iota(jnp.int32, (l, l), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (l, l), 1)
    return ((i // span == j // span) & (i < j)).astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def mxu_seg_cumsum(x, span):
    """Inclusive per-group cumsum of int32 in column-major order, both scan
    levels as f32 matmuls over 8-bit planes."""
    xu = x.astype(jnp.uint32)
    ls = _tri_sub(x.shape[0])
    m = _carry_mat(x.shape[1], span)
    out = jnp.zeros(x.shape, jnp.int32)
    for p in range(4):
        xp = ((xu >> (8 * p)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
        y = _dot(ls, xp)                                  # sublane scan
        tot = jax.lax.broadcast_in_dim(y[SUB - 1 : SUB, :], x.shape, (0, 1))
        c = _dot(tot, m)                                  # lane carries
        v = (y + c).astype(jnp.int32)
        out = out + (v << (8 * p))
    return out


def hybrid_seg_cumsum(x, span):
    """Sublane scan via cheap sublane rolls; lane carries via MXU matmuls
    over 11-bit limbs of the column totals."""
    si = lanes.sublane_iota(x.shape)
    acc = x
    step = 1
    while step < SUB:
        sh = pltpu.roll(acc, step, axis=0)
        acc = acc + jnp.where(si >= step, sh, 0)
        step <<= 1
    tot = jax.lax.broadcast_in_dim(acc[SUB - 1 : SUB, :], x.shape, (0, 1))
    tu = tot.astype(jnp.uint32)
    m = _carry_mat(x.shape[1], span)
    prev = jnp.zeros(x.shape, jnp.int32)
    for p in range(3):
        lp = ((tu >> (11 * p)) & jnp.uint32(0x7FF)).astype(jnp.int32).astype(jnp.float32)
        c = _dot(lp, m).astype(jnp.int32)
        prev = prev + (c << (11 * p))
    return acc + prev


def bench(name, kernel_body, reps=4, check_against=None):
    def kernel(x_ref, o_ref):
        o_ref[0] = kernel_body(x_ref[0].astype(jnp.int32)).astype(jnp.uint32)

    fn = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, SUB, L), jnp.uint32),
        in_specs=[pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )
    fn = jax.jit(fn)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 2**32, (B, SUB, L), dtype=np.uint64).astype(np.uint32)
    )
    try:
        t0 = time.time()
        out = fn(x)
        jax.device_get(jnp.sum(out[0, 0, :8]))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        jax.device_get(jnp.sum(out[0, 0, :8]))
        dt = (time.perf_counter() - t0) / reps
        mb = B * SUB * L * 4 / 1e6
        exact = ""
        if check_against is not None:
            ref = np.asarray(check_against(np.asarray(x[:8]).astype(np.int64)))
            got = np.asarray(out[:8]).astype(np.uint32).astype(np.int64)
            ref = ref.astype(np.uint32).astype(np.int64)
            exact = f" exact={bool((got == ref).all())}"
        print(f"BENCH {name}: {dt*1e3:.3f} ms for {mb:.0f} MB -> {mb/1e3/dt:.2f} GB/s "
              f"(compile {compile_s:.0f}s){exact}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"BENCH {name} FAIL {type(e).__name__}: {str(e)[:300]}", flush=True)
        return None


def np_seg_cumsum(x):
    # x: [b, SUB, L] int64 of uint32 values; column-major groups of SPAN lanes
    b = x.shape[0]
    xc = x.transpose(0, 2, 1).reshape(b, L // SPAN, SPAN * SUB)  # flat col-major per group
    cs = np.cumsum(xc.astype(np.int64), axis=-1)
    return (cs & 0xFFFFFFFF).reshape(b, L // SPAN, SPAN, SUB).transpose(0, 2, 1).reshape(
        b, SUB, L
    )


def np_seg_cumsum_fix(x):
    b = x.shape[0]
    xc = x.transpose(0, 2, 1).reshape(b, L // SPAN, SPAN * SUB)
    cs = np.cumsum(xc, axis=-1) & 0xFFFFFFFF
    out = cs.reshape(b, L // SPAN, SPAN, SUB).transpose(0, 3, 1, 2).reshape(b, SUB, L)
    return out


if __name__ == "__main__":
    print(f"devices={jax.devices()}", flush=True)
    bench("noop(x+1)", lambda x: x + 1)
    bench("seg_cumsum(rolls)", lambda x: lanes.seg_cumsum(x, SPAN),
          check_against=np_seg_cumsum_fix)
    bench("mxu_seg_cumsum", lambda x: mxu_seg_cumsum(x, SPAN),
          check_against=np_seg_cumsum_fix)
    bench("hybrid_seg_cumsum", lambda x: hybrid_seg_cumsum(x, SPAN),
          check_against=np_seg_cumsum_fix)
    bench("ffill", lambda x: lanes.ffill(
        jnp.where((x & 7) == 0, x, 0), (x & 7) == 0, SPAN))
    def chain(f, n):
        def body(x):
            for _ in range(n):
                x = f(x, SPAN) & jnp.int32(0x7FFFFFFF)
            return x
        return body
    bench("cumsum x8 (mxu)", chain(mxu_seg_cumsum, 8))
    bench("cumsum x8 (hybrid)", chain(hybrid_seg_cumsum, 8))
    bench("cumsum x8 (rolls)", chain(lanes.seg_cumsum, 8))
    def chain_ffill(n):
        def body(x):
            for _ in range(n):
                x = lanes.ffill(jnp.where((x & 7) == 0, x, 0), (x & 7) == 0, SPAN).astype(jnp.int32) | 1
            return x
        return body
    bench("ffill x8", chain_ffill(8))
    print("DONE", flush=True)
