"""Hardware validation + throughput of the Snappy Pallas decode kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/snappy_decode_hw.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpucomp.codecs import snappy
from tpucomp.kernels import snappy_pallas as snp
from bench import load_corpus

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)

# ---- correctness at 16KB chunks (oracle-encoded foreign streams) ----------
from oracles.snappy_oracle import snappy_compress_oracle

C = 16384
base = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
cases = [
    (base + bytes(rng.integers(0, 256, 3000, dtype=np.uint8)) + base) * 4,
    bytes([7, 8, 9]) * 6000,
    bytes(rng.integers(0, 256, 100, dtype=np.uint8)) + bytes([5]) * 9000 + base,
    (b"abcdefgh" * 300 + bytes(rng.integers(0, 256, 2000, dtype=np.uint8))) * 3,
]
CMAX = 22000
comps, csizes, raws = [], [], []
for raw in cases:
    raw = raw[:C]
    c = snappy_compress_oracle(raw)
    comps.append(np.frombuffer(c.ljust(CMAX, b"\0"), np.uint8))
    csizes.append(len(c))
    raws.append(np.frombuffer(raw.ljust(C, b"\0"), np.uint8))
# corrupt stream + truncated stream must produce statuses, not crashes
g = np.array(comps[0]); g[3:40] = rng.integers(0, 256, 37)
comps.append(g); csizes.append(csizes[0]); raws.append(np.zeros(C, np.uint8))
comps.append(np.array(comps[1])); csizes.append(max(4, csizes[1] // 3)); raws.append(np.zeros(C, np.uint8))

comp = jnp.asarray(np.stack(comps)); sizes = jnp.asarray(np.array(csizes, np.int32))
t0 = time.time()
gd, gl, gs = map(np.asarray, snp.decompress(comp, sizes, C))
print(f"pallas compile+run {time.time()-t0:.0f}s", flush=True)
import tpucomp.config as cfg
cfg.use_pallas_kernels = False
rd, rl, rs = map(np.asarray, snappy.decompress(comp, sizes, out_capacity=C))
cfg.use_pallas_kernels = None
ok = (gl == rl).all() and (gs == rs).all() and (gd == rd).all()
print("SNPHW correctness vs XLA:", "OK" if ok else "FAIL", flush=True)
if not ok:
    print(" gl", gl, "\n rl", rl, "\n gs", gs, "\n rs", rs, flush=True)

# ---- throughput at 64KB chunks (corpus mix) -------------------------------
C = 65536
B = 128  # 8 MB
corpus = load_corpus(B * C, seed=1)
arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
lens = np.full(B, C, np.int32)
da, dl = jnp.asarray(arr), jnp.asarray(lens)
t0 = time.time()
comp, sizes = snappy.compress(da, dl)
jax.device_get(sizes[:2])
print(f"xla encode {time.time()-t0:.0f}s ratio {B*C/float(np.asarray(sizes).sum()):.2f}", flush=True)

t0 = time.time()
out = snp.decompress(comp, sizes, C)
jax.device_get(out[2][:2])
print(f"pallas decode compile+run {time.time()-t0:.0f}s", flush=True)
ok = (np.asarray(out[0]) == arr).all() and (np.asarray(out[2]) == 0).all()
print("SNPHW 64KB roundtrip:", "OK" if ok else "FAIL", flush=True)

reps = 8
t0 = time.perf_counter()
for _ in range(reps):
    out = snp.decompress(comp, sizes, C)
jax.device_get(out[2][:2])
dt = (time.perf_counter() - t0) / reps
mb = B * C / 1e6
print(f"SNPHW dec: {dt*1e3:.1f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)
print("DONE", flush=True)
