"""Hardware validation + throughput of the fused cascaded Pallas encoder.

Run: nohup python scripts/casc_pallas_bench.py > /tmp/casc_enc.log 2>&1 &
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
B = 256  # 16 MB per call

raw = np.repeat(rng.integers(0, 50, C*B//4), rng.integers(1, 9, C*B//4)).astype(np.int32).tobytes()[:B*C]
arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
lens = np.full(B, C, np.int32)
lens[-1] = C - 37

da, dl = jnp.asarray(arr), jnp.asarray(lens)
t0 = time.time()
got, got_sz = cp.compress(da, dl, opts)
jax.device_get(got_sz[:2])
print(f"pallas compile+run {time.time()-t0:.1f}s", flush=True)

# correctness vs XLA path on a subset (XLA path is slow: use 16 partitions)
t0 = time.time()
ref, ref_sz = cascaded.compress(da[:16], dl[:16], opts)
ref, ref_sz = np.asarray(jax.device_get(ref)), np.asarray(jax.device_get(ref_sz))
print(f"xla path {time.time()-t0:.1f}s", flush=True)
g, gs = np.asarray(jax.device_get(got[:16])), np.asarray(jax.device_get(got_sz[:16]))
bad = 0
for i in range(16):
    if gs[i] != ref_sz[i] or not (g[i,:ref_sz[i]] == ref[i,:ref_sz[i]]).all():
        bad += 1
        d = np.nonzero(g[i,:min(gs[i],ref_sz[i])] != ref[i,:min(gs[i],ref_sz[i])])[0][:5]
        print(f"MISMATCH part {i}: size got {gs[i]} ref {ref_sz[i]} first-diff {d}", flush=True)
print("hardware correctness:", "FAIL" if bad else "OK (16/16 byte-identical)", flush=True)

# throughput: chained calls, one sync
reps = 6
t0 = time.perf_counter()
x = da
for _ in range(reps):
    o, s = cp.compress(x, dl, opts)
    x = da + (s[0] % 2).astype(jnp.uint8)  # data dep to serialize
jax.device_get(s[:2])
dt = (time.perf_counter() - t0) / reps
mb = B * C / 1e6
print(f"ENC THROUGHPUT: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)
print("ratio:", B*C/float(np.asarray(jax.device_get(jnp.sum(got_sz)))), flush=True)
print("DONE", flush=True)
