"""Byte-identity of the fused cascaded Pallas kernels vs the XLA path.

The XLA path (codecs/cascaded.py) is itself validated bit-exactly against an
independent sequential oracle (tests/test_cascaded.py), so byte-identity here
transitively pins the Pallas kernels to the reference stream format
(reference src/CascadedKernels.hiph:766-1058).
"""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

# The interpret-mode kernels compile into very large XLA:CPU programs;
# compiling them on top of a full suite's accumulated compilation state
# intermittently crashes the XLA:CPU backend (SIGABRT/SIGSEGV in
# backend_compile).  Dropping cached executables first avoids it.
@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    jax.clear_caches()
    yield

from tpucomp.codecs import cascaded
from tpucomp.core.options import CascadedOpts
from tpucomp.core.types import DataType
from tpucomp.kernels import cascaded_pallas as cp


def _profile(rng, name, nbytes, width):
    if name == "runs":
        t = {1: np.int8, 2: np.int16, 4: np.int32}[width]
        n = nbytes // width + 8
        return (
            np.repeat(rng.integers(0, 30, n), rng.integers(1, 9, n))
            .astype(t)
            .tobytes()[:nbytes]
        )
    if name == "random":
        return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    if name == "ramp":
        return (np.arange(nbytes // 4 + 1, dtype=np.int32) * 3 + 7).tobytes()[:nbytes]
    raise ValueError(name)


def _batch(raw, B, C):
    arr = np.zeros((B, C), np.uint8)
    lens = np.zeros(B, np.int32)
    for i in range(B):
        ch = raw[i * C : (i + 1) * C]
        a = np.frombuffer(ch, np.uint8)
        arr[i, : len(a)] = a
        lens[i] = len(a)
    return arr, lens


def _assert_identical(opts, arr, lens):
    ref, ref_sz = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
    got, got_sz = cp.compress(jnp.asarray(arr), jnp.asarray(lens), opts, interpret=True)
    ref, ref_sz, got, got_sz = map(np.asarray, (ref, ref_sz, got, got_sz))
    np.testing.assert_array_equal(got_sz, ref_sz)
    for i in range(arr.shape[0]):
        np.testing.assert_array_equal(
            got[i, : ref_sz[i]], ref[i, : ref_sz[i]], err_msg=f"partition {i}"
        )


CONFIGS = [
    (CascadedOpts(), 16384, "runs"),
    (CascadedOpts(), 16384, "random"),  # incompressible fallback
    (CascadedOpts(), 16384, "ramp"),
    (CascadedOpts(num_rles=2, num_deltas=2), 8192, "ramp"),
    (CascadedOpts(num_rles=0, num_deltas=1), 8192, "ramp"),
    (CascadedOpts(num_rles=0, num_deltas=0, use_bp=True), 8192, "runs"),
    (CascadedOpts(use_bp=False), 8192, "runs"),
    (CascadedOpts(type=DataType.SHORT, chunk_size=4096), 8192, "runs"),
    (CascadedOpts(type=DataType.UCHAR, chunk_size=4096), 8192, "runs"),
    (CascadedOpts(type=DataType.UCHAR, num_rles=1, num_deltas=0, chunk_size=512), 4096, "runs"),
    # k == 1 (out_capacity <= chunk_size): the statically specialized
    # single-chunk-partition path -- exact and ragged
    (CascadedOpts(), 4096, "runs"),
    (CascadedOpts(), 2048, "runs"),
    (CascadedOpts(type=DataType.USHORT, use_bp=False, num_rles=1, num_deltas=1, chunk_size=2048), 6144, "runs"),
]


@pytest.mark.parametrize("opts,C,profile", CONFIGS)
def test_compress_byte_identical(rng, opts, C, profile):
    assert cp.supports(opts, C)
    raw = _profile(rng, profile, 3 * C + 17, cp.width_of(opts.type))
    arr, lens = _batch(raw, 3, C)
    lens[-1] = max(1, lens[-1] - 37)  # ragged tail partition
    _assert_identical(opts, arr, lens)


def test_compress_edge_partitions(rng):
    """Empty, sub-element-width, and tiny partitions."""
    opts = CascadedOpts()
    arr = np.zeros((4, 8192), np.uint8)
    arr[2] = rng.integers(0, 3, 8192)
    arr[3, :8] = 255
    lens = np.array([0, 3, 8192, 8], np.int32)
    _assert_identical(opts, arr, lens)


def test_compress_capacity_not_chunk_multiple(rng):
    """Capacity that is not a multiple of the chunk size pads with dead
    chunks."""
    opts = CascadedOpts()
    raw = _profile(rng, "runs", 3 * 10000, 4)
    arr, lens = _batch(raw, 3, 10000)
    _assert_identical(opts, arr, lens)


def test_supports_gate():
    assert not cp.supports(CascadedOpts(type=DataType.LONGLONG), 4096)
    assert not cp.supports(CascadedOpts(chunk_size=544, type=DataType.UCHAR), 4096)
    assert cp.supports(CascadedOpts(), 65536)


# ---------------------------------------------------------------------------
# decompression


def _assert_decode_identical(opts, comp, sizes, out_capacity):
    ref = cascaded.decompress(jnp.asarray(comp), jnp.asarray(sizes), opts, out_capacity)
    got = cp.decompress(
        jnp.asarray(comp), jnp.asarray(sizes), opts, out_capacity, interpret=True
    )
    for name, r, g in zip(("data", "lengths", "statuses"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


@pytest.mark.parametrize("opts,C,profile", CONFIGS)
def test_decompress_byte_identical(rng, opts, C, profile):
    raw = _profile(rng, profile, 3 * C + 17, cp.width_of(opts.type))
    arr, lens = _batch(raw, 3, C)
    lens[-1] = max(1, lens[-1] - 37)
    comp, sizes = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
    _assert_decode_identical(opts, np.asarray(comp), np.asarray(sizes), C)


def test_decompress_roundtrip_from_pallas_encoder(rng):
    opts = CascadedOpts()
    C = 16384
    raw = _profile(rng, "runs", 3 * C, 4)
    arr, lens = _batch(raw, 3, C)
    comp, sizes = cp.compress(jnp.asarray(arr), jnp.asarray(lens), opts, interpret=True)
    data, out_lens, statuses = cp.decompress(comp, sizes, opts, C, interpret=True)
    data, out_lens, statuses = map(np.asarray, (data, out_lens, statuses))
    assert (statuses == 0).all()
    np.testing.assert_array_equal(out_lens, lens)
    for i in range(3):
        np.testing.assert_array_equal(data[i, : lens[i]], arr[i, : lens[i]])


def test_decompress_corrupt_streams(rng):
    """Garbage, truncated, and size-zero streams report errors like the XLA
    path and zero their outputs."""
    opts = CascadedOpts()
    C = 8192
    raw = _profile(rng, "runs", 4 * C, 4)
    arr, lens = _batch(raw, 4, C)
    comp, sizes = map(np.asarray, cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts))
    comp = comp.copy()
    sizes = sizes.copy()
    comp[0] = rng.integers(0, 256, comp.shape[1], dtype=np.uint8)  # garbage
    sizes[1] = max(9, sizes[1] // 2)  # truncated
    sizes[2] = 0  # empty
    _assert_decode_identical(opts, comp, sizes, C)


def test_decompress_edge_partitions(rng):
    opts = CascadedOpts()
    arr = np.zeros((4, 8192), np.uint8)
    arr[2] = rng.integers(0, 3, 8192)
    arr[3, :8] = 255
    lens = np.array([0, 3, 8192, 8], np.int32)
    comp, sizes = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
    _assert_decode_identical(opts, np.asarray(comp), np.asarray(sizes), 8192)


def test_decode_multi_partition_blocks(rng):
    """gp>1 packs several partitions per grid cell (lane-sliced); outputs
    must match the gp=1 path exactly, including the ragged tail."""
    import jax.numpy as jnp

    from tpucomp.codecs import cascaded
    from tpucomp.core.options import CascadedOpts
    from tpucomp.kernels import cascaded_pallas as cp

    opts = CascadedOpts()
    C = 8192
    raw = np.repeat(rng.integers(0, 30, 3 * C), rng.integers(1, 7, 3 * C))
    raw = raw.astype(np.int32).tobytes()[: 3 * C]
    arr = np.frombuffer(raw, np.uint8).reshape(3, C).copy()
    lens = np.array([C, C - 8, C], np.int32)
    comp, sizes = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
    ref = cp.decompress(comp, sizes, opts, C, interpret=True, gp=1)
    got = cp.decompress(comp, sizes, opts, C, interpret=True, gp=2)
    for name, r, g in zip(("data", "len", "status"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


def test_decode_barely_compressible_chunks(rng):
    """Regression: barely-compressible chunks (big final blobs, bw=32;
    all-count-1 second-RLE blobs) made the old phase-C global butterfly's
    move distances DROP across chunk boundaries, scrambling the last chunks
    and rejecting the partition.  Text-like bytes reinterpreted as int32
    reproduce the profile."""
    import jax.numpy as jnp

    from tpucomp.codecs import cascaded
    from tpucomp.codecs.cascaded import _decompress_xla
    from tpucomp.core.options import CascadedOpts
    from tpucomp.kernels import cascaded_pallas as cp

    opts = CascadedOpts()
    C = 65536
    words = rng.integers(97, 123, (3, C), dtype=np.uint8)
    words[0, rng.integers(0, C, C // 8)] = 32  # spaces -> short runs
    arr = words
    lens = np.array([C, C, C - 4], np.int32)
    comp, sizes = cascaded.compress(jnp.asarray(arr), jnp.asarray(lens), opts)
    gd, gl, gs = map(np.asarray, cp.decompress(comp, sizes, opts, C, interpret=True))
    rd, rl, rs = map(np.asarray, _decompress_xla(comp, sizes, opts, C))
    np.testing.assert_array_equal(gs, rs)
    np.testing.assert_array_equal(gl, rl)
    np.testing.assert_array_equal(gd, rd)
    assert (gs == 0).all()
    for i in range(3):
        np.testing.assert_array_equal(gd[i, : rl[i]], arr[i, : rl[i]])
