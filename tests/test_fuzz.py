"""Randomized round-trip fuzzing across codecs.

Complements the targeted suites with breadth: many seeds, random chunk
sizes/content classes, random cascaded configs.  Everything must round-trip
with SUCCESS statuses; compressed sizes must respect the worst-case bounds.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpucomp.core.chunking import pack_chunks, unpack_chunks
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import DataType, Status
from tpucomp.codecs import cascaded as cc
from tpucomp.lowlevel.cascaded import CODEC as CASCADED
from tpucomp.lowlevel.lz4 import CODEC as LZ4
from tpucomp.lowlevel.snappy import CODEC as SNAPPY

CAP = 1024


def _random_chunk(rng):
    kind = rng.integers(0, 5)
    n = int(rng.integers(1, CAP + 1))
    if kind == 0:
        return rng.integers(0, 256, n, dtype=np.uint8)
    if kind == 1:
        return np.repeat(rng.integers(0, 4, n), rng.integers(1, 20, n))[:n].astype(np.uint8)
    if kind == 2:
        return np.full(n, int(rng.integers(0, 256)), np.uint8)
    if kind == 3:
        period = int(rng.integers(1, 30))
        return np.tile(rng.integers(0, 256, period, dtype=np.uint8), n // period + 1)[:n]
    alphabet = rng.integers(0, 256, 8, dtype=np.uint8)
    return alphabet[rng.integers(0, 8, n)]


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("codec", [LZ4, SNAPPY], ids=["lz4", "snappy"])
def test_fuzz_lz_codecs(codec, seed):
    rng = np.random.default_rng(seed)
    chunks = [_random_chunk(rng).tobytes() for _ in range(12)]
    batch = pack_chunks(chunks, capacity=CAP)
    comp = codec.compress(batch)
    bound = codec.compress_get_max_output_chunk_size(CAP)
    assert (np.asarray(comp.lengths) <= bound).all()
    out, statuses = codec.decompress(comp, CAP)
    assert (np.asarray(statuses) == Status.SUCCESS).all()
    assert unpack_chunks(out) == chunks


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_cascaded_configs(seed):
    rng = np.random.default_rng(100 + seed)
    nr = int(rng.integers(0, 4))
    nd = int(rng.integers(0, nr + 1)) if nr else int(rng.integers(0, 3))
    opts = CascadedOpts(
        chunk_size=int(rng.choice([512, 1024, 2048, 4096])),
        type=DataType(int(rng.choice([0, 1, 2, 3, 4, 5]))),
        num_rles=nr,
        num_deltas=nd,
        use_bp=bool(rng.integers(0, 2)),
    )
    from tpucomp.core.types import width_of

    w = width_of(opts.type)
    chunks = []
    for _ in range(8):
        c = _random_chunk(rng)
        chunks.append(c[: c.size // w * w].tobytes())
    batch = pack_chunks(chunks, capacity=CAP)
    comp, sizes = cc.compress(batch.data, batch.lengths, opts)
    out, lens, statuses = cc.decompress(comp, sizes, opts, CAP)
    statuses = np.asarray(statuses)
    lens = np.asarray(lens)
    for i, ch in enumerate(chunks):
        if len(ch) == 0:
            continue  # empty partitions report CannotDecompress (size-0 stream)
        assert statuses[i] == Status.SUCCESS, f"seed {seed} chunk {i} opts {opts}"
        assert np.asarray(out)[i, : lens[i]].tobytes() == ch
