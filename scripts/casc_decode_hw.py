"""Hardware validation + throughput of the fused cascaded Pallas DECODE kernel.

Validates cp.decompress against the XLA path on real-TPU outputs (clean
streams, truncated/corrupt streams, edge partitions), then times enc+dec
with pipelined dispatch.

Run: PYTHONPATH=/root/repo nohup python scripts/casc_decode_hw.py > /tmp/casc_dec_hw.log 2>&1 &
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

CONFIGS = [
    ("default r2d1bp", CascadedOpts()),
    ("r1d0bp", CascadedOpts(num_rles=1, num_deltas=0, use_bp=True)),
    ("r0d1bp", CascadedOpts(num_rles=0, num_deltas=1, use_bp=True)),
    ("r1d1 nobp", CascadedOpts(num_rles=1, num_deltas=1, use_bp=False)),
    ("short r2d1bp", CascadedOpts(type=3)),  # SHORT width 2
    ("uchar r1d1bp", CascadedOpts(type=1, num_rles=1)),  # UCHAR width 1
]


def make(B, w):
    raw = np.repeat(
        rng.integers(0, 50, C * B // max(w, 1)), rng.integers(1, 9, C * B // max(w, 1))
    )
    if w == 4:
        raw = raw.astype(np.int32)
    elif w == 2:
        raw = raw.astype(np.int16)
    else:
        raw = raw.astype(np.uint8)
    raw = raw.tobytes()[: B * C]
    arr = np.frombuffer(raw, np.uint8).reshape(B, C).copy()
    lens = np.full(B, C, np.int32)
    lens[-1] = C - 2 * w
    return arr, lens


fails = 0
for name, opts in CONFIGS:
    from tpucomp.core.types import width_of
    w = width_of(opts.type)
    arr, lens = make(8, w)
    da, dl = jnp.asarray(arr), jnp.asarray(lens)
    comp, sizes = cascaded.compress(da, dl, opts)
    # clean decode
    gd, gl, gs = map(np.asarray, cp.decompress(comp, sizes, opts, C))
    rd, rl_, rs = map(np.asarray, cascaded.decompress(comp, sizes, opts, C))
    ok = (gl == rl_).all() and (gs == rs).all() and all(
        (gd[i, : rl_[i]] == rd[i, : rl_[i]]).all() for i in range(8)
    )
    # corrupt: truncate sizes + garbage bytes
    csz = np.asarray(sizes).copy()
    csz[1] = max(8, csz[1] // 2)
    csz[2] = 4
    garb = np.asarray(comp).copy()
    garb[3, :64] = rng.integers(0, 256, 64)
    gd2, gl2, gs2 = map(np.asarray, cp.decompress(jnp.asarray(garb), jnp.asarray(csz), opts, C))
    rd2, rl2, rs2 = map(np.asarray, cascaded.decompress(jnp.asarray(garb), jnp.asarray(csz), opts, C))
    ok2 = (gl2 == rl2).all() and (gs2 == rs2).all() and all(
        (gd2[i, : rl2[i]] == rd2[i, : rl2[i]]).all() for i in range(8)
    )
    status = "OK" if (ok and ok2) else f"FAIL clean={ok} corrupt={ok2}"
    if not (ok and ok2):
        fails += 1
        print(f"  detail {name}: gl={gl} rl={rl_} gs={gs} rs={rs}", flush=True)
        print(f"  corrupt {name}: gl2={gl2} rl2={rl2} gs2={gs2} rs2={rs2}", flush=True)
    print(f"DECHW {name}: {status}", flush=True)

print(f"DECHW validation {'PASS' if fails == 0 else f'{fails} FAILURES'}", flush=True)

# ---- throughput (pipelined) ----
@jax.jit
def probe(x):
    return x.ravel()[:2]

opts = CascadedOpts()
B = 256
arr, lens = make(B, 4)
da, dl = jnp.asarray(arr), jnp.asarray(lens)
comp, sizes = cp.compress(da, dl, opts)
jax.device_get(probe(sizes))
mb = B * C / 1e6

for name, fn, args in [
    ("enc", lambda: cp.compress(da, dl, opts), ()),
    ("dec", lambda: cp.decompress(comp, sizes, opts, C), ()),
]:
    out = fn()
    jax.device_get(probe(jax.tree_util.tree_leaves(out)[0]))
    reps = 16
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.device_get(probe(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"DECHW {name}: {dt*1e3:.2f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)
print("DONE", flush=True)
