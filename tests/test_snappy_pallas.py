"""Equivalence of the Snappy Pallas decode kernel vs the XLA path (interpret).

The XLA path is validated against the pure-Python snappy oracle, foreign
large-token streams, and corruption suites (tests/test_snappy.py), so
equivalence here transitively pins the kernel to the snappy format
(reference src/snappy/decompression.hiph:195-213).
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from oracles.snappy_oracle import snappy_compress_oracle

from tpucomp.codecs import snappy
from tpucomp.kernels import snappy_pallas as snp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


def _assert_equal(comp, sizes, out_cap):
    ref = snappy.decompress(comp, sizes, out_capacity=out_cap)
    got = snp.decompress(comp, sizes, out_cap, interpret=True)
    for name, r, g in zip(("data", "len", "status"), ref, got):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=name)


def test_roundtrip_profiles(rng):
    C = 4096
    rows = [
        np.repeat(rng.integers(0, 5, C), rng.integers(1, 30, C)).astype(np.uint8)[:C],
        rng.choice(np.frombuffer(b"the quick brown fox jumps over a dog ", np.uint8), C),
        rng.integers(0, 256, C, dtype=np.uint8),
    ]
    arr = np.stack(rows)
    lens = np.array([C, C, C - 7], np.int32)
    comp, sizes = snappy.compress(jnp.asarray(arr), jnp.asarray(lens))
    _assert_equal(comp, sizes, C)
    got = snp.decompress(comp, sizes, C, interpret=True)
    gd = np.asarray(got[0])
    for i in range(3):
        np.testing.assert_array_equal(gd[i, : lens[i]], arr[i, : lens[i]])


def test_foreign_streams_and_corruption(rng):
    """Oracle-encoded streams (incl. element kinds our encoder never emits)
    decode exactly; corrupted/truncated streams report statuses."""
    C = 16384
    base = rng.integers(0, 256, 600, dtype=np.uint8).tobytes()
    cases = [
        (base + bytes(rng.integers(0, 256, 3000, dtype=np.uint8)) + base) * 4,
        bytes([7, 8, 9]) * 6000,  # period-3 self overlap
        bytes(rng.integers(0, 256, 100, dtype=np.uint8)) + bytes([5]) * 9000 + base,
        (b"abcdefgh" * 300 + bytes(rng.integers(0, 256, 2000, dtype=np.uint8))) * 3,
    ]
    CMAX = 20000
    comps, csizes, raws = [], [], []
    for raw in cases:
        raw = raw[:C]
        c = snappy_compress_oracle(raw)
        assert len(c) <= CMAX
        comps.append(np.frombuffer(c.ljust(CMAX, b"\0"), np.uint8))
        csizes.append(len(c))
        raws.append(raw)
    # corruption: garbage bytes / truncated size / zero size
    g = np.array(comps[0])
    g[3:40] = rng.integers(0, 256, 37)
    comps += [g, np.array(comps[1]), np.array(comps[2])]
    csizes += [csizes[0], max(4, csizes[1] // 3), 0]

    comp = jnp.asarray(np.stack(comps))
    sizes = jnp.asarray(np.array(csizes, np.int32))
    _assert_equal(comp, sizes, C)
    got = snp.decompress(comp, sizes, C, interpret=True)
    gd, gl, gs = map(np.asarray, got)
    for i, raw in enumerate(raws):  # foreign streams decode exactly
        assert gs[i] == 0
        np.testing.assert_array_equal(gd[i, : len(raw)], np.frombuffer(raw, np.uint8))


def test_large_tokens_and_tiny(rng):
    """Hand-built legal elements the GPU-reference compressor never emits
    (copy4, multi-byte literal lengths) and tiny/empty streams -- mirrors
    the reference's SnappyLargeTokens obligation
    (reference src/test/SnappyLargeTokens_test.cpp)."""
    C = 8192
    lit = rng.integers(0, 256, 5000, dtype=np.uint8).tobytes()
    # varint header helper
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    streams = []
    # two literals (60 + 40 bytes), then long copy2 chains over them
    s = varint(100 + 64 * 62 + 32) + bytes([(59 << 2) | 0]) + lit[:60]
    s += bytes([(39 << 2) | 0]) + lit[60:100]  # second literal (40)
    for _ in range(62):
        s += bytes([(63 << 2) | 2, 100, 0])  # copy2 len 64 off 100
    s += bytes([(31 << 2) | 2, 100, 0])  # copy2 len 32
    streams.append((s, 100 + 64 * 62 + 32))
    # one-byte extra literal length (tag 60), then copy4 (never emitted by
    # our encoder)
    s3 = varint(248 + 48)
    s3 += bytes([(60 << 2) | 0, 247]) + lit[:248]  # literal len 248
    s3 += bytes([(47 << 2) | 3, 200, 0, 0, 0])  # copy4 len 48 off 200
    streams.append((s3, 248 + 48))
    # tiny: single 1-byte literal; empty stream (varint 0)
    streams.append((varint(1) + bytes([0 << 2]) + b"Q", 1))
    streams.append((varint(0), 0))

    CMAX = 8192
    comps = [np.frombuffer(s.ljust(CMAX, b"\0"), np.uint8) for s, _ in streams]
    csizes = [len(s) for s, _ in streams]
    comp = jnp.asarray(np.stack(comps))
    sizes = jnp.asarray(np.array(csizes, np.int32))
    _assert_equal(comp, sizes, C)
    gd, gl, gs = map(np.asarray, snp.decompress(comp, sizes, C, interpret=True))
    for i, (_, n) in enumerate(streams):
        assert gs[i] == 0, f"stream {i}"
        assert gl[i] == n, f"stream {i}: {gl[i]} != {n}"


def test_kpack_remainders(rng):
    """Batches not divisible by kpack pad correctly."""
    C = 2048
    for b in (1, 3, 5, 9):
        arr = rng.integers(0, 64, (b, C), dtype=np.uint8)
        lens = np.full(b, C, np.int32)
        comp, sizes = snappy.compress(jnp.asarray(arr), jnp.asarray(lens))
        gd, gl, gs = map(
            np.asarray, snp.decompress(comp, sizes, C, interpret=True, kpack=4)
        )
        assert (gs == 0).all() and (gl == C).all()
        np.testing.assert_array_equal(gd, arr)


# ---------------------------------------------------------------------------
# compression kernel


def test_encode_oracle_identity(rng):
    """Pallas-encoded streams are byte-identical to the pure greedy
    sequential oracle (exact nearest-prev-occurrence matcher, unbounded
    extension, _emit_copies splitting) across data profiles."""
    C = 8192
    rows = [
        np.repeat(rng.integers(0, 5, C), rng.integers(1, 30, C)).astype(np.uint8)[:C],
        rng.choice(np.frombuffer(b"the quick brown fox jumps over a dog ", np.uint8), C),
        rng.integers(0, 256, C, dtype=np.uint8),
        np.tile(np.frombuffer(b"abc", np.uint8), C // 3 + 1)[:C],
        np.zeros(C, np.uint8),
    ]
    lens = np.array([C, C, C, C - 5, C], np.int32)
    arr = np.stack(rows)
    comp, sizes = snp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    for i in range(len(rows)):
        ref = snappy_compress_oracle(rows[i][: lens[i]].tobytes())
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"
    # round-trips through both decoders
    gd, gl, gs = map(
        np.asarray,
        snp.decompress(jnp.asarray(comp), jnp.asarray(sizes), C, interpret=True),
    )
    assert (gs == 0).all() and (gl == lens).all()
    rd, rl, rs = map(
        np.asarray,
        snappy.decompress(jnp.asarray(comp), jnp.asarray(sizes), out_capacity=C),
    )
    assert (rs == 0).all() and (rl == lens).all()


def test_encode_long_match_split_and_copy1(rng):
    """Copy splitting matches the oracle exactly: >= 68-byte matches split
    into 64-piece copy2 runs, 65..67 leave a 60-piece so the remainder
    stays >= 4, and short near matches emit copy1."""
    C = 4096
    rows = []
    # long runs (match lengths hitting 64/65/66/67/68 boundaries)
    for extra in (60, 61, 62, 63, 64, 100, 1000):
        r = np.zeros(C, np.uint8)
        r[: 4 + extra] = 7
        r[4 + extra :] = rng.integers(0, 256, C - 4 - extra)
        rows.append(r)
    # copy1 territory: short match at tiny offset
    r = np.frombuffer((b"abcd" * 6 + b"XYZW" * 16)[:C].ljust(C, b"\0"), np.uint8)
    rows.append(np.array(r))
    arr = np.stack(rows)
    lens = np.full(len(rows), C, np.int32)
    comp, sizes = snp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    for i in range(len(rows)):
        ref = snappy_compress_oracle(rows[i].tobytes())
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"


def test_encode_tiny_and_empty(rng):
    C = 512
    arr = np.zeros((3, C), np.uint8)
    arr[0, :7] = rng.integers(1, 255, 7)
    arr[1] = rng.integers(0, 256, C)
    lens = np.array([7, C, 0], np.int32)
    comp, sizes = snp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    for i in range(3):
        ref = snappy_compress_oracle(arr[i, : lens[i]].tobytes())
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"


def test_encode_large_chunk_headers(rng):
    """>64KB chunks need 3-byte literal-length headers and >16K-byte
    copy-element tails (the exact-div3 range) -- regression for the
    round-3 large-chunk header bugs."""
    C = 1 << 17
    rows = [
        rng.integers(0, 256, C, dtype=np.uint8),  # one 128KB literal
        np.zeros(C, np.uint8),                    # one ~128KB match
    ]
    arr = np.stack(rows)
    lens = np.full(2, C, np.int32)
    comp, sizes = snp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    for i in range(2):
        ref = snappy_compress_oracle(rows[i].tobytes())
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"
    gd, gl, gs = map(
        np.asarray,
        snp.decompress(jnp.asarray(comp), jnp.asarray(sizes), C, interpret=True),
    )
    assert (gs == 0).all() and (gl == lens).all()
    np.testing.assert_array_equal(gd, arr)
