"""Format-generic low-level batch API conformance suite.

Mirror of the reference's C-API harness (tests/test_batch_c_api.h:85-775,
instantiated per format): random chunk sizes in [min, max], a batch-size
matrix, full round trips with GetDecompressSize verification, zero temp
sizes, worst-case output bounds, and the crash-safety corruption test
(every chunk of garbage input must report a status without crashing).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpucomp.core.chunking import ChunkBatch, pack_chunks, unpack_chunks
from tpucomp.core.types import Status
from tpucomp.lowlevel.api import BatchCodec
from tpucomp.lowlevel.cascaded import CODEC as CASCADED
from tpucomp.lowlevel.lz4 import CODEC as LZ4
from tpucomp.lowlevel.snappy import CODEC as SNAPPY

CODECS = {"lz4": LZ4, "snappy": SNAPPY, "cascaded": CASCADED}

# batch sizes from the reference matrix (tests/test_batch_c_api.h:749-775),
# trimmed for CPU runtime
BATCH_SIZES = [1, 11, 127]
CAPACITY = 2048


def _payloads(rng, codec_name, batch_size):
    """Random compressible chunks with random sizes in [64, CAPACITY]."""
    out = []
    for _ in range(batch_size):
        n = int(rng.integers(64, CAPACITY + 1))
        if codec_name == "cascaded":
            n = n // 4 * 4  # whole int32 elements
        vals = rng.integers(0, 30, n)
        reps = rng.integers(1, 6, n)
        chunk = np.repeat(vals, reps)[:n].astype(np.uint8)
        out.append(chunk.tobytes())
    return out


@pytest.mark.parametrize("name", list(CODECS))
@pytest.mark.parametrize("batch_size", BATCH_SIZES)
def test_roundtrip_matrix(rng, name, batch_size):
    codec = CODECS[name]
    payloads = _payloads(rng, name, batch_size)
    batch = pack_chunks(payloads, capacity=CAPACITY)

    assert codec.compress_get_temp_size(batch_size, CAPACITY) == 0
    assert codec.decompress_get_temp_size(batch_size, CAPACITY) == 0
    bound = codec.compress_get_max_output_chunk_size(CAPACITY)

    comp = codec.compress(batch)
    sizes = np.asarray(comp.lengths)
    assert (sizes <= bound).all()

    # size query must match the original lengths
    got_sizes = np.asarray(codec.get_decompress_size(comp))
    want = np.array([len(p) for p in payloads])
    np.testing.assert_array_equal(got_sizes, want)

    out, statuses = codec.decompress(comp, CAPACITY)
    assert (np.asarray(statuses) == Status.SUCCESS).all()
    got = unpack_chunks(out)
    for i, p in enumerate(payloads):
        assert got[i] == p, f"{name} chunk {i}"


@pytest.mark.slow
@pytest.mark.parametrize("name", list(CODECS))
def test_roundtrip_large_batch_1025(rng, name):
    """Reference matrix's >= 1025 batch row (tests/test_batch_c_api.h:749-775)
    at a small per-chunk capacity to keep CPU runtime sane."""
    cap = 512
    codec = CODECS[name]
    payloads = []
    for _ in range(1025):
        n = int(rng.integers(16, cap + 1)) // 4 * 4
        payloads.append(
            np.repeat(rng.integers(0, 20, n), rng.integers(1, 5, n))[:n]
            .astype(np.uint8)
            .tobytes()
        )
    batch = pack_chunks(payloads, capacity=cap)
    comp = codec.compress(batch)
    assert (np.asarray(comp.lengths) <= codec.compress_get_max_output_chunk_size(cap)).all()
    out, statuses = codec.decompress(comp, cap)
    assert (np.asarray(statuses) == Status.SUCCESS).all()
    got = unpack_chunks(out)
    for i, p in enumerate(payloads):
        assert got[i] == p, f"{name} chunk {i}"


@pytest.mark.parametrize("name", list(CODECS))
def test_crash_safety_on_garbage(rng, name):
    """reference test_generic_batch_decompression_errors
    (tests/test_batch_c_api.h:700-704): garbage input must yield statuses,
    never a crash."""
    codec = CODECS[name]
    b = 16
    garbage = rng.integers(0, 256, size=(b, CAPACITY), dtype=np.uint8)
    sizes = rng.integers(1, CAPACITY, size=b).astype(np.int32)
    comp = ChunkBatch(jnp.asarray(garbage), jnp.asarray(sizes))
    out, statuses = codec.decompress(comp, CAPACITY)
    statuses = np.asarray(statuses)
    assert statuses.shape == (b,)
    assert set(np.unique(statuses)) <= {int(Status.SUCCESS), int(Status.ERROR_CANNOT_DECOMPRESS)}
    # lengths must be 0 wherever decode failed
    lens = np.asarray(out.lengths)
    assert (lens[statuses != Status.SUCCESS] == 0).all()


@pytest.mark.parametrize("name", list(CODECS))
def test_incompressible_stays_within_bound(rng, name):
    codec = CODECS[name]
    payloads = [rng.integers(0, 256, CAPACITY, dtype=np.uint8).tobytes() for _ in range(4)]
    batch = pack_chunks(payloads, capacity=CAPACITY)
    comp = codec.compress(batch)
    bound = codec.compress_get_max_output_chunk_size(CAPACITY)
    assert (np.asarray(comp.lengths) <= bound).all()
    out, statuses = codec.decompress(comp, CAPACITY)
    assert (np.asarray(statuses) == Status.SUCCESS).all()
    assert unpack_chunks(out) == payloads


def test_chunkbatch_is_pytree():
    """ChunkBatch flows through jit/vmap boundaries (registered pytree)."""
    import jax

    batch = pack_chunks([b"abcd", b"efgh"], capacity=8)
    leaves = jax.tree.leaves(batch)
    assert len(leaves) == 2
    out = jax.jit(lambda b: ChunkBatch(b.data + 1, b.lengths))(batch)
    assert np.asarray(out.data)[0, 0] == ord("a") + 1
