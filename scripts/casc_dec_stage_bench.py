"""Stage-bisect timing of the fused cascaded Pallas DECODER on hardware
using its debug_cut knob (cut=N stops after stage N).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/casc_dec_stage_bench.py
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp
from tpucomp.core.options import CascadedOpts
from tpucomp.codecs import cascaded
from tpucomp.kernels import cascaded_pallas as cp

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(0)
C = 65536
B = int(os.environ.get("DECSTAGE_B", "256"))  # 16 MB per call (production tile)
opts = CascadedOpts()

_corpus_kind = os.environ.get("DECSTAGE_CORPUS", "runs")
if _corpus_kind == "runheavy":
    # the bench's run-heavy slice (bench.runheavy_corpus): where the decode
    # pipeline genuinely engages
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import runheavy_corpus
    raw = runheavy_corpus(B * C)
elif _corpus_kind == "mixedpipe":
    # ONLY the mixed corpus's pipeline (non-fallback) partitions -- the
    # barely-compressible regime that dominates the mixed decode number
    # (full occupancy, near-identity expansions; ratio ~1.02)
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import load_corpus
    mix = np.frombuffer(load_corpus(64 * 1024 * 1024), np.uint8)
    parts = mix[: mix.size // C * C].reshape(-1, C)
    pc, ps = cascaded.compress(
        jnp.asarray(parts), jnp.full(parts.shape[0], C, np.int32), CascadedOpts()
    )
    nonfb = np.asarray(pc[:, :3]).sum(-1) != 0
    pipe = parts[nonfb]
    print(f"mixed pipe partitions: {pipe.shape[0]}/{parts.shape[0]}", flush=True)
    reps_needed = -(-B // pipe.shape[0])
    raw = np.tile(pipe, (reps_needed, 1))[:B].tobytes()
else:
    raw = np.repeat(
        rng.integers(0, 50, C * B // 4), rng.integers(1, 9, C * B // 4)
    ).astype(np.int32).tobytes()[: B * C]
arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
lens = np.full(B, C, np.int32)
da, dl = jnp.asarray(arr), jnp.asarray(lens)
comp, sizes = cascaded.compress(da, dl, opts)
jax.device_get(sizes[:2])
mb = B * C / 1e6
print(f"compressed to {float(np.asarray(sizes).sum())/1e6:.1f} MB", flush=True)


def timeit(name, fn, reps=24):  # sync-amortized (tunnel device_get ~35 ms)
    out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:2])
    dt = (time.perf_counter() - t0) / reps
    print(f"DECSTAGE {name}: {dt*1e3:8.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:6.3f} GB/s", flush=True)
    return dt


prev = 0.0
cuts_env = os.environ.get("DECSTAGE_CUTS")
cuts = (
    [int(c) for c in cuts_env.split(",")]
    if cuts_env
    else [1, 2, 3, 4, 5, 6, 61, 62, 63, 64, 7, 8, 81, 90, 91, 92, 9, 10, 11, 0]
)
# a 90+opi cut beyond the schedule never fires and would silently time the
# FULL pipeline under its stage label -- drop such ids for these opts
n_ops = len(cp._inverse_schedule_static(opts.num_rles, opts.num_deltas))
cuts = [c for c in cuts if not (90 <= c < 100 and c - 90 >= n_ops)]
for cut in cuts:
    try:
        dt = timeit(f"cut={cut}", lambda cut=cut: cp.decompress(comp, sizes, opts, C, debug_cut=cut))
    except Exception as e:
        msg = str(e).splitlines()
        key = next((l for l in msg if "Mosaic" in l or "Not implemented" in l), msg[0] if msg else "?")
        print(f"DECSTAGE cut={cut}: FAIL {key[:130]}", flush=True)
print("DONE", flush=True)
