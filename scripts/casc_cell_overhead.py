"""Per-grid-cell overhead at the cascaded decoder's block shapes.

Passthrough kernel (reads one word, writes one row) over B cells with the
decode's in/out block sizes; varying B at fixed total data separates
per-cell from per-call cost.  Also times the XLA wrapper passes alone.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/casc_cell_overhead.py
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices", jax.devices(), flush=True)
SUB = 8
L_IN = 2176   # decode l_inw rows for 64KB partitions (approx)
L_OUT = 2176  # decode l_out


def run(f):
    jax.device_get(f())
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f()
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:2])
    return (time.perf_counter() - t0) / reps


def mk_pass(b, per_cell):
    def kernel(size_ref, vin_ref, out_ref):
        for j in range(per_cell):
            out_ref[j, 0:1, :] = vin_ref[j, 0:1, :] + size_ref[pl.program_id(0)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[pl.BlockSpec((per_cell, SUB, L_IN), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((per_cell, SUB, L_OUT), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    vin = jnp.ones((b * per_cell, SUB, L_IN), jnp.int32)
    sizes = jnp.zeros((b,), jnp.int32)
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * per_cell, SUB, L_OUT), jnp.int32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )
    jf = jax.jit(lambda s, v: call(s, v))
    return lambda: jf(sizes, vin)


for b, pc in [(256, 1), (64, 4), (32, 8), (64, 1), (16, 16)]:
    try:
        dt = run(mk_pass(b, pc))
        print(f"passthrough B={b:4d} x{pc:2d}/cell: {dt*1e3:7.2f} ms "
              f"({dt/b*1e6:6.1f} us/cell)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"passthrough B={b} x{pc}: FAIL {key[:120]}", flush=True)

# XLA wrapper cost alone (input+output shaping passes at 17MB/64MB scale)
from tpucomp.utils import bits

@jax.jit
def wrapper_only(comp):
    b, cmax = comp.shape
    pad = L_IN * SUB * 4 - cmax
    cw = jnp.concatenate([comp, jnp.zeros((b, pad), jnp.uint8)], axis=1)
    words = bits.bytes_to_units_le(cw, 4).astype(jnp.uint32)
    words_cm = words.reshape(b, L_IN, SUB).transpose(0, 2, 1)
    out = words_cm.astype(jnp.int32)  # stand-in for the kernel result
    elems = out.transpose(0, 2, 1).reshape(b, -1)[:, : 16384]
    u = elems.astype(jnp.uint32)
    data = bits.units_to_bytes_le(u)[:, : 65536]
    return data

comp = jnp.ones((256, 66000), jnp.uint8)
dt = run(lambda: wrapper_only(comp))
print(f"wrapper passes alone: {dt*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
