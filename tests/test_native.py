"""Native host-runtime tests: staging parity, CPU LZ4 vs python oracle and
vs the device codec, crc32."""

import numpy as np
import pytest
import zlib

from tpucomp import native
from tpucomp.native import staging

from oracles.lz4_oracle import lz4_compress_oracle, lz4_decompress_oracle

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_pack_unpack_parity(rng):
    sizes = rng.integers(0, 257, 50).astype(np.int64)
    concat = rng.integers(0, 256, int(sizes.sum()), dtype=np.uint8)
    dense = staging.pack_ragged(concat, sizes, 256)
    assert dense.shape == (50, 256)
    off = 0
    for i, n in enumerate(sizes):
        np.testing.assert_array_equal(dense[i, :n], concat[off : off + n])
        assert (dense[i, n:] == 0).all()
        off += int(n)
    back = staging.unpack_ragged(dense, sizes)
    np.testing.assert_array_equal(back, concat)


def test_split_stream(rng):
    stream = rng.integers(0, 256, 10_000, dtype=np.uint8)
    dense = staging.split_stream(stream, 4096, 3)
    np.testing.assert_array_equal(dense.reshape(-1)[:10_000], stream)
    assert (dense.reshape(-1)[10_000:] == 0).all()


def test_cpu_lz4_matches_python_oracle(rng):
    from tpucomp.native import cpu_codecs

    for profile in ["runs", "text", "random"]:
        if profile == "runs":
            a = np.repeat(rng.integers(0, 5, 500), rng.integers(1, 30, 500))[:4096].astype(np.uint8)
        elif profile == "text":
            a = np.frombuffer((b"native host runtime staging codec " * 200)[:4096], np.uint8)
        else:
            a = rng.integers(0, 256, 4096, dtype=np.uint8)
        got = cpu_codecs.lz4_compress(a.tobytes(), max_match=48)
        exp = lz4_compress_oracle(a.tobytes(), max_match=48)
        # same matcher family: identical streams expected
        assert got == exp, profile
        assert cpu_codecs.lz4_decompress(got, 4096) == a.tobytes()
        assert lz4_decompress_oracle(got) == a.tobytes()


def test_cpu_lz4_uncapped_and_corrupt(rng):
    from tpucomp.native import cpu_codecs

    a = np.tile(rng.integers(0, 256, 100, dtype=np.uint8), 40)
    full = cpu_codecs.lz4_compress(a.tobytes())  # unbounded matches
    assert cpu_codecs.lz4_decompress(full, a.size) == a.tobytes()
    with pytest.raises(ValueError):
        cpu_codecs.lz4_decompress(b"\xff\xff\xff", 64)


def test_crc32_matches_zlib(rng):
    data = rng.integers(0, 256, 10_000, dtype=np.uint8).tobytes()
    assert staging.crc32(data) == zlib.crc32(data)
