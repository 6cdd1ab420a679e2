"""Batch-size sweep of the fused cascaded Pallas encoder + correctness.

Run: nohup python scripts/casc_scale_bench.py > /tmp/casc_scale.log 2>&1 &
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from tpucomp.core.options import CascadedOpts
from tpucomp.codecs import cascaded
from tpucomp.kernels import cascaded_pallas as cp

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
opts = CascadedOpts()
C = 65536

def make(B):
    raw = np.repeat(rng.integers(0, 50, C*B//4), rng.integers(1, 9, C*B//4)).astype(np.int32).tobytes()[:B*C]
    arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
    lens = np.full(B, C, np.int32); lens[-1] = C - 37
    return jnp.asarray(arr), jnp.asarray(lens)

# correctness once (vs XLA path, 8 partitions)
da, dl = make(8)
got, got_sz = cp.compress(da, dl, opts)
ref, ref_sz = cascaded.compress(da, dl, opts)
g, gs, r, rs = map(np.asarray, (got, got_sz, ref, ref_sz))
bad = sum(1 for i in range(8) if gs[i] != rs[i] or not (g[i,:rs[i]] == r[i,:rs[i]]).all())
print("hardware correctness:", "FAIL" if bad else "OK (8/8 byte-identical)", flush=True)

for B in (64, 256, 1024):
    da, dl = make(B)
    o, s = cp.compress(da, dl, opts)
    jax.device_get(s[:2])
    reps = 6
    t0 = time.perf_counter()
    x = da
    for _ in range(reps):
        o, s = cp.compress(x, dl, opts)
        x = da + (s[0] % 2).astype(jnp.uint8)
    jax.device_get(s[:2])
    dt = (time.perf_counter() - t0) / reps
    mb = B * C / 1e6
    print(f"SCALE B={B}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)

# async-pipelined (no serializing dep): closer to production dispatch
for B in (256,):
    da, dl = make(B)
    o, s = cp.compress(da, dl, opts)
    jax.device_get(s[:2])
    reps = 8
    t0 = time.perf_counter()
    outs = [cp.compress(da, dl, opts) for _ in range(reps)]
    for o, s in outs:
        jax.device_get(s[:1])
    dt = (time.perf_counter() - t0) / reps
    mb = B * C / 1e6
    print(f"PIPELINED B={B}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)
print("DONE", flush=True)
