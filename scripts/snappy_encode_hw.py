"""Hardware validation + throughput of the Snappy Pallas encode kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/snappy_encode_hw.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpucomp.kernels import snappy_pallas as snp
from oracles.snappy_oracle import snappy_compress_oracle
from bench import load_corpus

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(3)

# ---- correctness at 16KB: byte-identity vs oracle --------------------------
C = 16384
rows = [
    np.repeat(rng.integers(0, 5, C), rng.integers(1, 30, C)).astype(np.uint8)[:C],
    rng.choice(np.frombuffer(b"the quick brown fox jumps over a dog ", np.uint8), C),
    rng.integers(0, 256, C, dtype=np.uint8),
    np.tile(np.frombuffer(b"abc", np.uint8), C // 3 + 1)[:C],
    np.frombuffer(load_corpus(C, seed=5), np.uint8),
]
lens = np.array([C, C, C, C - 5, C], np.int32)
arr = np.stack(rows)
t0 = time.time()
comp, sizes = snp.compress(jnp.asarray(arr), jnp.asarray(lens))
comp, sizes = np.asarray(comp), np.asarray(sizes)
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
bad = 0
for i in range(len(rows)):
    ref = snappy_compress_oracle(rows[i][: lens[i]].tobytes())
    got = comp[i, : sizes[i]].tobytes()
    if got != ref:
        bad += 1
        m = min(len(got), len(ref))
        d = next((k for k in range(m) if got[k] != ref[k]), m)
        print(f"  row {i} MISMATCH {len(got)} vs {len(ref)}B, first diff {d}", flush=True)
print("SNPENC oracle identity:", "OK" if bad == 0 else f"{bad} FAIL", flush=True)

out, olen, st = map(np.asarray, snp.decompress(jnp.asarray(comp), jnp.asarray(sizes), C))
ok = (st == 0).all() and (olen == lens).all() and all(
    (out[i, : lens[i]] == arr[i, : lens[i]]).all() for i in range(len(rows))
)
print("SNPENC roundtrip:", "OK" if ok else "FAIL", flush=True)

# ---- throughput at 64KB chunks (corpus mix) -------------------------------
C = 65536
B = 128
corpus = load_corpus(B * C, seed=1)
arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
da, dl = jnp.asarray(arr), jnp.full(B, C, jnp.int32)
t0 = time.time()
comp, sizes = snp.compress(da, dl)
jax.device_get(sizes[:2])
print(f"64KB compile+run {time.time()-t0:.0f}s ratio {B*C/float(np.asarray(sizes).sum()):.3f}", flush=True)
reps = 2
t0 = time.perf_counter()
for _ in range(reps):
    comp, sizes = snp.compress(da, dl)
jax.device_get(sizes[:2])
dt = (time.perf_counter() - t0) / reps
mb = B * C / 1e6
print(f"SNPENC enc: {dt*1e3:.0f} ms for {mb:.0f} MB -> {mb/1e3/dt:.4f} GB/s", flush=True)
out = snp.decompress(comp, sizes, C)
ok = (np.asarray(out[0]) == arr).all() and (np.asarray(out[2]) == 0).all()
print("SNPENC 64KB roundtrip:", "OK" if ok else "FAIL", flush=True)
print("DONE", flush=True)
