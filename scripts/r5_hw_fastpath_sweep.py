"""Hardware byte-identity sweep of the round-5 fast paths.

The r5 kernel changes (certain-fallback flag cells + assembly skip in
encode; all-ones-counts identity skip in decode) are data-dependent, so
the existing HW validators -- which use run-heavy inputs -- never fire
them.  This sweep drives, per config, three regimes on the real chip:
random (all certain-fallback), noisy ramps (pure-pipe: identity skips
fire), and runs (full pipeline), asserting Pallas outputs equal the XLA
path byte-for-byte both directions, plus corrupt-stream status parity.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
     scripts/r5_hw_fastpath_sweep.py > /tmp/r5_hw_sweep.log 2>&1 &
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.codecs import cascaded as cc
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import DataType
from tpucomp.kernels import cascaded_pallas as cp

print("devices", jax.devices(), flush=True)

CONFIGS = [
    ("default r2d1bp INT", CascadedOpts()),
    ("r1d0bp INT", CascadedOpts(num_rles=1, num_deltas=0)),
    ("r0d1bp INT", CascadedOpts(num_rles=0, num_deltas=1)),
    ("r2d1bp SHORT", CascadedOpts(type=DataType.SHORT)),
    ("r1d1bp UCHAR", CascadedOpts(type=DataType.UCHAR, num_rles=1)),
]

C = 65536
B = 64
rng = np.random.default_rng(11)


def regimes():
    n = C // 4
    rand = rng.integers(0, 256, (B, C), dtype=np.uint8)
    ramp = (
        np.cumsum(rng.integers(-2, 3, (B, n)), axis=1) * 64
        + rng.integers(0, 64, (B, n))
    ).astype(np.int32).view(np.uint8)
    runs = np.repeat(
        rng.integers(0, 50, (B, n // 8)), 8, axis=1
    ).astype(np.int32).view(np.uint8)
    return [("random", rand), ("ramp", ramp), ("runs", runs)]


for name, opts in CONFIGS:
    for rname, data in regimes():
        dj = jnp.asarray(data)
        lens = np.full(B, C, np.int32)
        lens[3] = C - 4 * 9  # element-aligned short tail
        lens[5] = 0
        lj = jnp.asarray(lens)
        c0, s0 = cc._compress_xla(dj, lj, opts)
        c1, s1 = cp.compress(dj, lj, opts)
        c0n, c1n = np.asarray(c0), np.asarray(c1)
        assert (np.asarray(s0) == np.asarray(s1)).all(), (name, rname, "sizes")
        assert (c0n == c1n).all(), (name, rname, "bytes")
        fbfrac = float((c1n[:, :3].sum(-1) == 0).mean())

        comp = c1n.copy()
        sizes = np.asarray(s1).copy()
        comp[1, 24] ^= 0x5A
        sizes[2] = 9
        cj, sj = jnp.asarray(comp), jnp.asarray(sizes)
        o0 = cc._decompress_xla(cj, sj, opts, C)
        o1 = cp.decompress(cj, sj, opts, C)
        for part, a, b2 in zip(("data", "len", "status"), o0, o1):
            assert (np.asarray(a) == np.asarray(b2)).all(), (name, rname, part)
        print(f"{name} / {rname}: enc+dec byte-identical on HW "
              f"(fb={fbfrac:.2f})", flush=True)

print("R5 HW FASTPATH SWEEP OK", flush=True)
