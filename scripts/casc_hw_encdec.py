"""Hardware validation + throughput of the fused cascaded Pallas encoder AND
decoder in one run (used to measure the global-roll lanes optimization).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/casc_hw_encdec.py
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
lens[-1] = C - 36  # element-aligned short tail

da, dl = jnp.asarray(arr), jnp.asarray(lens)
t0 = time.time()
comp, sizes = cp.compress(da, dl, opts)
jax.device_get(sizes[:2])
print(f"enc compile+run {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
out, olen, st = cp.decompress(comp, sizes, opts, C)
jax.device_get(st[:2])
print(f"dec compile+run {time.time()-t0:.1f}s", flush=True)

# round-trip correctness on hardware (full batch)
o, ol, s_ = map(np.asarray, (out, olen, st))
ok = (s_ == 0).all() and (ol == lens).all() and all(
    (o[i, : lens[i]] == arr[i, : lens[i]]).all() for i in range(B)
)
print("hw round-trip:", "OK" if ok else "FAIL", flush=True)

# byte-identity of encoder vs XLA path on a subset
ref, ref_sz = cascaded.compress(da[:8], dl[:8], opts)
ref, ref_sz = np.asarray(ref), np.asarray(ref_sz)
g, gs = np.asarray(comp[:8]), np.asarray(sizes[:8])
ident = all(
    gs[i] == ref_sz[i] and (g[i, : gs[i]] == ref[i, : gs[i]]).all() for i in range(8)
)
print("enc byte-identity vs XLA:", "OK" if ident else "FAIL", flush=True)

mb = B * C / 1e6


def tput(name, fn, reps=24):
    r = fn()
    # sync the warmup so its device tail is not charged to the timed window
    jax.device_get(jax.tree_util.tree_leaves(r)[-1].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn()
    jax.device_get(jax.tree_util.tree_leaves(r)[-1].ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)


tput("ENC", lambda: cp.compress(da, dl, opts))
tput("DEC", lambda: cp.decompress(comp, sizes, opts, C))
print("ratio:", B * C / float(np.asarray(sizes).sum()), flush=True)
print("DONE", flush=True)
