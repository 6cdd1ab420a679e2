"""Sweep the per-grid-cell chunk interleave factor K of the v3 LZ kernels.

Decides whether interleaving independent per-chunk state machines actually
hides lane-crossing latency in the compiled kernel (ilp_probe.py says 8
independent chains cost ~1.3x one *in a plain loop*; this measures it in
the real decode/encode loop bodies).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lz_kpack_sweep.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpucomp.codecs import lz4
from tpucomp.kernels import lz_pallas as lzp
from bench import load_corpus

print("devices", jax.devices(), flush=True)

C = 65536
B = 128  # 8 MB
corpus = load_corpus(B * C, seed=1)
arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
lens = np.full(B, C, np.int32)
da, dl = jnp.asarray(arr), jnp.asarray(lens)
comp, sizes = lz4.compress(da, dl)
jax.device_get(sizes[:2])
mb = B * C / 1e6

for K in (1, 2, 4, 8, 16):
    out = lzp.decompress(comp, sizes, C, kpack=K)
    jax.device_get(out[2][:2])
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        out = lzp.decompress(comp, sizes, C, kpack=K)
    jax.device_get(out[2][:2])
    dt = (time.perf_counter() - t0) / reps
    ok = bool((np.asarray(out[0]) == arr).all() and (np.asarray(out[2]) == 0).all())
    print(f"dec K={K:2d}: {dt*1e3:7.1f} ms  {mb/1e3/dt:.4f} GB/s  ok={ok}", flush=True)

for K in (1, 2, 4, 8):
    co, so = lzp.compress(da, dl, kpack=K)
    jax.device_get(so[:2])
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        co, so = lzp.compress(da, dl, kpack=K)
    jax.device_get(so[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"enc K={K:2d}: {dt*1e3:7.1f} ms  {mb/1e3/dt:.4f} GB/s", flush=True)
print("DONE", flush=True)
