"""Decompose the cascaded wrapper-transform cost: u8<->u32 bitcast vs the
[B,L,32]<->[B,32,L] transpose, XLA vs in-kernel Mosaic alternatives.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/xform_bench2.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpucomp.utils import bits

print("devices", jax.devices(), flush=True)
B, L, SUB = 256, 1152, 32   # 37.7 MB of u32
rng = np.random.default_rng(0)
w_rm = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (B, L, SUB), dtype=np.int64).astype(np.int32))
w_cm = jnp.asarray(np.ascontiguousarray(np.asarray(w_rm).transpose(0, 2, 1)))
by = jnp.asarray(rng.integers(0, 256, (B, L * SUB * 4), dtype=np.uint8))
NB = B * L * SUB * 4


def tput(name, fn, *args, reps=24):  # sync-amortized
    r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:7.2f} ms ({NB/1e9/dt:6.1f} GB/s)", flush=True)


@jax.jit
def t_xla(w):
    return w.transpose(0, 2, 1) + 1  # +1 defeats layout-only elision


@jax.jit
def t_bitcast(c):
    return jax.lax.bitcast_convert_type(c.reshape(B, -1, 4), jnp.uint32) + 1


@jax.jit
def t_b2u(c):
    return bits.bytes_to_units_le(c, 4).astype(jnp.uint32) + 1


@jax.jit
def t_full(c):
    w = jax.lax.bitcast_convert_type(c.reshape(B, -1, 4), jnp.uint32)
    return w.reshape(B, L, SUB).transpose(0, 2, 1) + 1


# in-kernel Mosaic transpose of [L,32] -> [32,L] per batch row
def _tr_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0].T


@jax.jit
def t_pallas(w):
    return pl.pallas_call(
        _tr_kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, L, SUB), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, SUB, L), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(w)


# in-kernel strided-read transpose: out[32, L] built from 32 row-gathers
def _tr2_kernel(x_ref, o_ref):
    x = x_ref[0]          # [L, 32]
    o_ref[0] = jnp.swapaxes(x, 0, 1)


for name, fn, arg in [
    ("XLA transpose [L,32]->[32,L] (+1)", t_xla, w_rm),
    ("bitcast u8->u32 (+1)", t_bitcast, by),
    ("bytes_to_units_le shifts (+1)", t_b2u, by),
    ("bitcast + transpose (full in-xform)", t_full, by),
    ("pallas .T kernel", t_pallas, w_rm),
]:
    try:
        tput(name, fn, arg)
    except Exception as e:
        print(f"{name:44s} FAIL {str(e).splitlines()[0][:110]}", flush=True)
print("DONE", flush=True)
