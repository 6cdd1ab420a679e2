"""Stage-bisect timing of the fused cascaded Pallas encoder on hardware.

Round-3 note: reps raised 4 -> 24 because the tunnel's ~35 ms device_get
sync swamped the earlier readings (the "passthrough ~= full kernel"
conclusion was a sync artifact; the profiler shows the device 100% busy
during these loops).

Times the full compress under opts configs that enable progressively more
pipeline stages, plus a passthrough kernel as the grid/DMA overhead
baseline.  Run: nohup python scripts/casc_bisect_bench.py > /tmp/casc_bisect.log 2>&1 &
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tpucomp.core.options import CascadedOpts
from tpucomp.kernels import cascaded_pallas as cp

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
C = 65536
B = 64  # 4 MB per call

raw = np.repeat(rng.integers(0, 50, C * B // 4), rng.integers(1, 9, C * B // 4)).astype(np.int32).tobytes()[: B * C]
arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
lens = np.full(B, C, np.int32)
da, dl = jnp.asarray(arr), jnp.asarray(lens)


def timeit(name, fn, *args, reps=24):
    t0 = time.time()
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    mb = B * C / 1e6
    print(f"BISECT {name}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s (compile {compile_s:.0f}s)", flush=True)


# 0. passthrough: same tile shapes as the default-opts kernel, no compute
lay = cp._Layout(CascadedOpts(), C)
def _pass_kernel(len_ref, elems_ref, out_ref):
    x = elems_ref[0]
    w = min(x.shape[1], lay.l_out)
    y = jnp.concatenate(
        [x[:, :w].astype(jnp.uint32), jnp.zeros((cp.SUB, lay.l_out - w), jnp.uint32)], axis=1
    ) if lay.l_out > w else x[:, :w].astype(jnp.uint32)
    out_ref[0] = y

def passthrough(data, lengths):
    from tpucomp.utils import bits
    b, c = data.shape
    units = bits.bytes_to_units_le(data, 4).astype(jnp.int32)
    elems_cm = units.reshape(b, lay.l_elem, cp.SUB).transpose(0, 2, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(b,),
        in_specs=[pl.BlockSpec((1, cp.SUB, lay.l_elem), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, cp.SUB, lay.l_out), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _pass_kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, cp.SUB, lay.l_out), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(lengths.astype(jnp.int32), elems_cm)
    sizes = out[:, 0, lay.l_out - 1].astype(jnp.int32)
    flat = out.transpose(0, 2, 1).reshape(b, lay.l_out * cp.SUB)
    comp = bits.units_to_bytes_le(flat)[:, : lay.pmax]
    return comp, sizes

timeit("passthrough+wrapper", jax.jit(passthrough), da, dl)

CONFIGS = [
    ("bp-only      ", CascadedOpts(num_rles=0, num_deltas=0, use_bp=True)),
    ("delta+bp     ", CascadedOpts(num_rles=0, num_deltas=1, use_bp=True)),
    ("r1+bp        ", CascadedOpts(num_rles=1, num_deltas=0, use_bp=True)),
    ("full r2d1bp  ", CascadedOpts()),
    ("full chunk16k", CascadedOpts(chunk_size=16384)),
]
for name, opts in CONFIGS:
    timeit(name, lambda d, l, o=opts: cp.compress(d, l, o), da, dl)
print("DONE", flush=True)
