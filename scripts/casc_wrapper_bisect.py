"""Where do the milliseconds go? Wrapper conversions vs the pallas_call.

Timing: queue ``reps`` independent dispatches, then ONE device_get of a tiny
slice of the LAST output -- TPU executes queued programs in order, so the
last output's completion implies all finished.  Avoids the per-get
round-trip floor (~4.5 ms each through the axon tunnel) that polluted the
first version of this script.

Run: PYTHONPATH=/root/repo nohup python scripts/casc_wrapper_bisect.py > /tmp/casc_wb.log 2>&1 &
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import functools
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpucomp.core.options import CascadedOpts
from tpucomp.kernels import cascaded_pallas as cp
from tpucomp.kernels import lanes
from tpucomp.utils import bits

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
C = 65536
B = 256  # 17 MB per call
opts = CascadedOpts()
lay = cp._Layout(opts, C)
SUB = cp.SUB

raw = np.repeat(rng.integers(0, 50, C * B // 4), rng.integers(1, 9, C * B // 4)).astype(np.int32).tobytes()[: B * C]
arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
da = jnp.asarray(arr)
dl = jnp.asarray(np.full(B, C, np.int32))
mb = B * C / 1e6


@jax.jit
def probe(x):
    return x.ravel()[:2]


def timeit(name, fn, *args, reps=16):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(probe(jax.tree_util.tree_leaves(out)[0]))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(probe(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"WB {name}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s (compile {compile_s:.0f}s)", flush=True)
    return dt


# ---- calibration: plain XLA elementwise on the same bytes -----------------
timeit("xla x+1 u8      ", jax.jit(lambda x: x + jnp.uint8(1)), da)
timeit("xla x+1 i32     ", jax.jit(lambda x: x + 1), jnp.asarray(np.frombuffer(raw, np.int32).reshape(B, -1)))

# ---- input conversion pieces ----------------------------------------------
@jax.jit
def conv_units(data):
    return bits.bytes_to_units_le(data, 4)

@jax.jit
def conv_in(data):
    units = bits.bytes_to_units_le(data, 4)
    elems = bits.bitcast(units, jnp.int32)
    return elems.reshape(B, lay.l_elem, SUB).transpose(0, 2, 1)

@jax.jit
def conv_transpose_only(units):
    return units.reshape(B, lay.l_elem, SUB).transpose(0, 2, 1)

units_i32 = jax.jit(lambda d: bits.bitcast(bits.bytes_to_units_le(d, 4), jnp.int32))(da)
jax.device_get(probe(units_i32))
elems_cm = conv_in(da)
jax.device_get(probe(elems_cm))

timeit("conv_units      ", conv_units, da)
timeit("conv_transpose  ", conv_transpose_only, units_i32)
timeit("conv_in full    ", conv_in, da)

# ---- pallas passthrough ----------------------------------------------------
def _pass_kernel(len_ref, elems_ref, out_ref):
    x = elems_ref[0]
    w = min(x.shape[1], lay.l_out)
    if lay.l_out > w:
        y = jnp.concatenate([x[:, :w], jnp.zeros((SUB, lay.l_out - w), jnp.int32)], axis=1)
    else:
        y = x[:, : lay.l_out]
    out_ref[0] = y.astype(jnp.uint32)


def _mk_pallas(kernel, grid_b=B):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(grid_b,),
        in_specs=[pl.BlockSpec((1, SUB, lay.l_elem), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, SUB, lay.l_out), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    return jax.jit(lambda l, e: pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((grid_b, SUB, lay.l_out), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(l, e))


pallas_pass = _mk_pallas(_pass_kernel)
out_tile = pallas_pass(dl, elems_cm)
jax.device_get(probe(out_tile))

@jax.jit
def conv_out(out):
    flat = out.transpose(0, 2, 1).reshape(B, lay.l_out * SUB)
    return bits.units_to_bytes_le(flat)[:, : lay.pmax]


def _roll_kernel(nrolls, len_ref, elems_ref, out_ref):
    x = elems_ref[0]
    for i in range(nrolls):
        x = lanes.flat_roll_static(x, 1 + (i % 3), lay.ec)
    w = min(x.shape[1], lay.l_out)
    if lay.l_out > w:
        y = jnp.concatenate([x[:, :w], jnp.zeros((SUB, lay.l_out - w), jnp.int32)], axis=1)
    else:
        y = x[:, : lay.l_out]
    out_ref[0] = y.astype(jnp.uint32)


timeit("pallas_pass     ", pallas_pass, dl, elems_cm)
timeit("roll32 kernel   ", _mk_pallas(functools.partial(_roll_kernel, 32)), dl, elems_cm)
timeit("roll128 kernel  ", _mk_pallas(functools.partial(_roll_kernel, 128)), dl, elems_cm)
timeit("conv_out        ", conv_out, out_tile)
timeit("full compress   ", lambda d, l: cp.compress(d, l, opts), da, dl)
print("DONE", flush=True)
