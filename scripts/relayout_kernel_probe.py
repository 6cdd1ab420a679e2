"""Standalone Pallas relayout kernel: flat row-major words -> column-major
[32, L] (word w at (w % 32, w // 32)) with DENSE blocks on both sides.

Per 16K-word group: T = in(128,128).T (native), then per 128-lane out tile
t: one lane-gather (idx uniform across rows) + one sublane-gather.
Measures GB/s at 38 MB vs the ~4-5 GB/s XLA ceiling (xpose_variants.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/relayout_kernel_probe.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
B, LW = 256, 1152  # partitions x lanes: 256 x 1152 x 32 words = 37.7 MB
SUB = 32
R = LW * SUB // 128  # 288 dense rows per partition


def kernel(x_ref, o_ref):
    # x block: (1, 128, 128) rows of one 16K-word group
    # o block: (1, 32, 512)
    T = x_ref[0].T  # (128,128): T[q, r'] = w = 128 r' + q
    li = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    li32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
    m = li32 & 3
    for t in range(4):
        # out_t[s, c] = T[32 (c & 3) + s, 32 t + (c >> 2)]
        G = jnp.take_along_axis(T, 32 * t + (li >> 2), axis=1)
        v = jnp.where(
            m == 0, G[0:32], jnp.where(m == 1, G[32:64], jnp.where(m == 2, G[64:96], G[96:128]))
        )
        o_ref[0, :, 128 * t : 128 * (t + 1)] = v


RP = (R + 127) // 128 * 128  # pad rows so (128,128) groups tile evenly


@jax.jit
def relayout(x):
    # x: [B, R, 128] dense row-major words
    if RP != R:
        x = jnp.concatenate([x, jnp.zeros((B, RP - R, 128), x.dtype)], axis=1)
    out = pl.pallas_call(
        kernel,
        grid=(B, RP // 128),
        in_specs=[pl.BlockSpec((1, 128, 128), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 32, 512), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 32, RP * 4), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(x)
    return out[:, :, :LW]


rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 1 << 30, (B, R, 128), np.int64).astype(np.int32))
out = relayout(x)
ref = np.asarray(x).reshape(B, -1).reshape(B, LW, SUB).transpose(0, 2, 1)
print("correct:", bool((np.asarray(out) == ref).all()), flush=True)
jax.device_get(out.ravel()[:1])
t0 = time.perf_counter()
for _ in range(6):
    out = relayout(x)
jax.device_get(out.ravel()[:1])
dt = (time.perf_counter() - t0) / 6
mb = B * LW * SUB * 4 / 1e6
print(f"relayout kernel: {dt*1e3:.2f} ms  ({mb/1e3/dt:.2f} GB/s)", flush=True)
print("DONE", flush=True)
