"""Separate the cascaded-decode wrapper's XLA transform cost from per-grid-cell
kernel overhead (stage bench cut=1 = 10.7ms of ~15-20ms total at 17 MB).

Times, each as its own jit:
  A. input transform only  (pad + bytes->u32 + reshape/transpose)
  B. output transform only (transpose/reshape + mask + u32->bytes)
  C. full decompress cut=1 (A + trivial kernel + B)
  D. full decompress cut=1 with gp=8 (32 cells instead of 256)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/casc_wrapper_probe.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from tpucomp.core.options import CascadedOpts
from tpucomp.codecs import cascaded
from tpucomp.kernels import cascaded_pallas as cp
from tpucomp.utils import bits

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
C = 65536
B = 256
opts = CascadedOpts()

raw = np.repeat(
    rng.integers(0, 50, C * B // 4), rng.integers(1, 9, C * B // 4)
).astype(np.int32).tobytes()[: B * C]
arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
lens = np.full(B, C, np.int32)
da, dl = jnp.asarray(arr), jnp.asarray(lens)
comp, sizes = cascaded.compress(da, dl, opts)
jax.device_get(sizes[:2])
cmax = comp.shape[1]
lay = cp._DLayout(opts, cmax, C)
mb = B * C / 1e6
print(f"cmax={cmax} l_inw={lay.l_inw} l_out={lay.l_out} l_a={lay.l_a}", flush=True)


@jax.jit
def in_transform(comp):
    b = comp.shape[0]
    pad = lay.l_inw * cp.SUB * 4 - cmax
    cw = comp
    if pad:
        cw = jnp.concatenate([comp, jnp.zeros((b, pad), jnp.uint8)], axis=1)
    words = bits.bytes_to_units_le(cw, 4).astype(jnp.uint32)
    return words.reshape(b, lay.l_inw, cp.SUB).transpose(0, 2, 1)


@jax.jit
def out_transform(out):
    b = out.shape[0]
    last = lay.l_out - 1
    out_bytes = out[:, 0, last].astype(jnp.int32)
    statuses = out[:, 1, last].astype(jnp.int32)
    elems = out.transpose(0, 2, 1).reshape(b, -1)[:, : lay.cap_elems]
    u = elems.astype(jnp.uint32)
    data = bits.units_to_bytes_le(u)[:, :C]
    return data, out_bytes, statuses


def timeit(name, fn, reps=24):  # sync-amortized (tunnel device_get ~35 ms)
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"PROBE {name}: {dt*1e3:8.2f} ms ({mb/1e3/dt:6.2f} GB/s-equiv)", flush=True)
    return dt


dummy_out = jnp.zeros((B, cp.SUB, lay.l_out), jnp.int32)
timeit("A in_transform ", lambda: in_transform(comp))
timeit("B out_transform", lambda: out_transform(dummy_out))
timeit("C cut=1 gp=1   ", lambda: cp.decompress(comp, sizes, opts, C, debug_cut=1))
try:
    timeit("D cut=1 gp=8   ", lambda: cp.decompress(comp, sizes, opts, C, debug_cut=1, gp=8))
except Exception as e:
    print("D FAIL", str(e)[:140], flush=True)
try:
    timeit("E full  gp=8   ", lambda: cp.decompress(comp, sizes, opts, C, gp=8))
except Exception as e:
    print("E FAIL", str(e)[:140], flush=True)
print("DONE", flush=True)
