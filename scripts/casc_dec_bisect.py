"""Bisect which decode-kernel phase crashes Mosaic on hardware.

Compiles cp.decompress with debug_cut = 1..11 then 0 (full); prints
PASS/FAIL per stage.  Run with PYTHONPATH=/root/repo:/root/.axon_site.
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from tpucomp.core.options import CascadedOpts
from tpucomp.codecs import cascaded
from tpucomp.kernels import cascaded_pallas as cp

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
C = 65536
opts = CascadedOpts()
raw = np.repeat(rng.integers(0, 50, C * 2), rng.integers(1, 9, C * 2)).astype(np.int32).tobytes()[: 2 * C]
arr = np.frombuffer(raw, np.uint8).reshape(2, C).copy()
lens = np.full(2, C, np.int32)
comp, sizes = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
jax.device_get(sizes)

stages = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 0]
for cut in stages:
    t0 = time.time()
    try:
        out = cp.decompress(comp, sizes, opts, C, debug_cut=cut)
        jax.device_get(out[1])
        print(f"CUT {cut}: PASS ({time.time()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l or "Check failed" in l), msg[0] if msg else "?")
        print(f"CUT {cut}: FAIL ({time.time()-t0:.0f}s) {key[:200]}", flush=True)
print("DONE", flush=True)
