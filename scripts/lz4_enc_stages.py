"""LZ4 encode stage timings on hardware (post suffix-LCP rework).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lz4_enc_stages.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import load_corpus
from tpucomp.codecs import lz4
from tpucomp.core.sizing import lz4_max_compressed_chunk_size

print("devices", jax.devices(), flush=True)
C = 65536
B = 128  # 8 MB
corpus = load_corpus(B * C, seed=1)
arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
da = jnp.asarray(arr)
dl = jnp.full(B, C, jnp.int32)
mb = B * C / 1e6

out_max = lz4_max_compressed_chunk_size(C)
s_max = C // lz4.MIN_MATCH + 2


def t(name, fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"STAGE {name}: {dt*1e3:.0f} ms for {mb:.0f} MB -> {mb/1e3/dt:.4f} GB/s", flush=True)
    return out


mlen, dist, cand = t("match", lz4._jit_match, da, dl, 1)
ls, ll, ml, off, s = t("parse", lz4._jit_parse, mlen, dist, cand, dl, s_max)
comp, sizes = t("emit", lz4._jit_emit, da, ls, ll, ml, off, s, dl, out_max)
print("ratio", B * C / float(np.asarray(sizes).sum()), flush=True)
t("full-enc", lz4.compress, da, dl)
print("DONE", flush=True)
