"""Core layer tests: types, sizing formulas, chunk packing, bit utilities."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpucomp.core import sizing
from tpucomp.core.chunking import join_stream, pack_chunks, split_stream, unpack_chunks
from tpucomp.core.options import CascadedOpts, LZ4Opts
from tpucomp.core.types import DataType, Status, unsigned_jnp, width_of
from tpucomp.utils import bits


def test_enum_values_match_reference():
    # Values must match hipcompType_t / hipcompStatus_t for artifact parity.
    assert DataType.CHAR == 0 and DataType.ULONGLONG == 7 and DataType.BITS == 0xFF
    assert Status.SUCCESS == 0
    assert Status.ERROR_CANNOT_DECOMPRESS == 12


def test_sizing_formulas():
    # LZ4: n + 1 + ceil(n/255) rounded to 8.
    assert sizing.lz4_max_compressed_chunk_size(65536) == ((65536 + 1 + 258) + 7) // 8 * 8
    assert sizing.lz4_max_compressed_chunk_size(0) == 8
    # Snappy: 32 + n + n/6.
    assert sizing.snappy_max_compressed_chunk_size(60000) == 32 + 60000 + 10000
    # Cascaded: roundUp4(n) + 8.
    assert sizing.cascaded_max_compressed_chunk_size(4095) == 4096 + 8
    assert sizing.cascaded_max_compressed_chunk_size(4096) == 4104


def test_opts_validation():
    CascadedOpts().validate()
    with pytest.raises(ValueError):
        CascadedOpts(chunk_size=256).validate()
    with pytest.raises(ValueError):
        CascadedOpts(chunk_size=4098, type=DataType.INT).validate()
    with pytest.raises(ValueError):
        CascadedOpts(num_rles=8).validate()
    LZ4Opts().validate()
    with pytest.raises(ValueError):
        LZ4Opts(data_type=DataType.LONGLONG).validate()


def test_pack_unpack_roundtrip(rng):
    chunks = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes() for n in [0, 1, 7, 100, 64]]
    batch = pack_chunks(chunks)
    assert batch.batch_size == 5 and batch.capacity == 100
    assert unpack_chunks(batch) == chunks


def test_split_join_stream(rng):
    stream = rng.integers(0, 256, size=10_000, dtype=np.uint8).tobytes()
    batch = split_stream(stream, 4096)
    assert batch.batch_size == 3
    assert join_stream(batch) == stream


def test_bit_width():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**31, 2**32 - 1], dtype=np.uint32)
    got = np.asarray(bits.bit_width(jnp.asarray(vals)))
    exp = np.array([0, 1, 2, 2, 3, 8, 9, 32, 32])
    np.testing.assert_array_equal(got, exp)
    v64 = np.array([0, 2**40, 2**63, 2**64 - 1], dtype=np.uint64)
    got64 = np.asarray(bits.bit_width(jnp.asarray(v64)))
    np.testing.assert_array_equal(got64, [0, 41, 64, 64])


def test_words_bytes_roundtrip(rng):
    b = jnp.asarray(rng.integers(0, 256, size=(3, 16), dtype=np.uint8))
    w = bits.bytes_to_words_le(b)
    assert w.dtype == jnp.uint32 and w.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(bits.words_to_bytes_le(w)), np.asarray(b))
    # Little-endian check against numpy view.
    np.testing.assert_array_equal(
        np.asarray(w), np.asarray(b).view("<u4")
    )


def test_units64_roundtrip(rng):
    raw = rng.integers(0, 256, size=(2, 32), dtype=np.uint8)
    u64 = bits.bytes_to_units_le(jnp.asarray(raw), 8)
    assert u64.dtype == jnp.uint64 and u64.shape == (2, 4)
    np.testing.assert_array_equal(np.asarray(u64), raw.view("<u8"))
    np.testing.assert_array_equal(np.asarray(bits.units_to_bytes_le(u64)), raw)


def test_shift_guards():
    x = jnp.asarray(np.array([1, 2, 4], dtype=np.uint32))
    s = jnp.asarray(np.array([0, 31, 32], dtype=np.int32))
    np.testing.assert_array_equal(np.asarray(bits.shl(x, s)), [1, 2**32 - 2**31 if False else 0x00000000 | (2 << 31) % 2**32, 0])
    np.testing.assert_array_equal(np.asarray(bits.shr(x, s)), [1, 0, 0])


def test_unsigned_width_maps():
    assert width_of(DataType.USHORT) == 2
    assert unsigned_jnp(DataType.INT) == jnp.uint32
