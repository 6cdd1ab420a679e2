"""Large-chunk round-trips (reference supports LZ4 chunks 32 KB-16 MB,
include/hipcomp/lz4.h:67-74; cascaded partitions are unbounded).

Validates the 256 KB and 1 MB points on CPU (the XLA paths; the Pallas
paths are validated on hardware by scripts/large_chunks_hw.py, whose
results are recorded in PERF.md).  Sizes here are kept to a handful of
chunks so the sort-based CPU paths stay fast.
"""

import numpy as np
import jax.numpy as jnp

from tpucomp.codecs import cascaded, lz4
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import Status


def _mixed(rng, n):
    rep = np.repeat(rng.integers(0, 40, n // 6 + 1), rng.integers(1, 9, n // 6 + 1))
    a = np.concatenate([rep.astype(np.uint8), rng.integers(0, 256, n, dtype=np.uint8)])
    return a[:n]


def test_cascaded_256k_and_1m_partitions(rng):
    for c in (256 * 1024, 1024 * 1024):
        a = _mixed(rng, c)
        lens = np.array([c, c - 36], np.int32)
        data = np.stack([a, np.roll(a, 7)])
        opts = CascadedOpts()
        comp, sizes = cascaded.compress(jnp.asarray(data), jnp.asarray(lens), opts)
        out, olen, st = cascaded.decompress(comp, sizes, opts, c)
        out, olen, st = map(np.asarray, (out, olen, st))
        assert (st == Status.SUCCESS).all()
        assert (olen == lens).all()
        for i in range(2):
            assert (out[i, : lens[i]] == data[i, : lens[i]]).all()


def test_lz4_256k_chunk(rng):
    c = 256 * 1024
    a = _mixed(rng, c)
    comp, sizes = lz4.compress(jnp.asarray(a[None, :]), jnp.asarray([c], np.int32))
    out, olen, st = lz4.decompress(comp, sizes, out_capacity=c)
    assert np.asarray(st)[0] == Status.SUCCESS
    assert np.asarray(olen)[0] == c
    assert np.asarray(out)[0].tobytes() == a.tobytes()
