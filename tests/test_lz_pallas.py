"""Equivalence of the LZ4 Pallas decode kernel vs the XLA path (interpret).

The XLA path is itself validated against foreign uncapped-oracle streams and
corruption suites (tests/test_lz4.py), so equivalence here transitively pins
the kernel to the LZ4 block format (reference src/LZ4Kernels.hiph:971-1097).
"""

import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from oracles.lz4_oracle import lz4_compress_oracle

from tpucomp.codecs import lz4
from tpucomp.kernels import lz_pallas as lzp


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _assert_equal(comp, sizes, out_cap):
    ref = lz4.decompress(comp, sizes, out_capacity=out_cap)
    got = lzp.decompress(comp, sizes, out_cap, interpret=True)
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
    comp, sizes = lz4.compress(jnp.asarray(arr), jnp.asarray(lens))
    _assert_equal(comp, sizes, C)
    got = lzp.decompress(comp, sizes, C, interpret=True)
    gd = np.asarray(got[0])
    for i in range(3):
        np.testing.assert_array_equal(gd[i, : lens[i]], arr[i, : lens[i]])


def test_foreign_streams_and_corruption(rng):
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
        c = lz4_compress_oracle(raw, max_match=1 << 30)
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
    got = lzp.decompress(comp, sizes, C, interpret=True)
    gd, gl, gs = map(np.asarray, got)
    for i, raw in enumerate(raws):  # foreign streams decode exactly
        assert gs[i] == 0
        np.testing.assert_array_equal(gd[i, : len(raw)], np.frombuffer(raw, np.uint8))


def test_decode_fill_periods_and_window_edges(rng):
    """Targets the v2 granule machinery: periodic fills in every tier
    (splat 1/2/4, word-aligned, odd, >2048), matches straddling the 4KB
    head-window boundary, and flush-exact output sizes."""
    C = 16384
    cases = []
    for per in (1, 2, 4, 16, 37, 513, 1024, 2048, 2049, 3000):
        pat = rng.integers(0, 256, per, dtype=np.uint8).tobytes()
        cases.append((pat * (C // per + 1))[:C])
    # literal run ending exactly at the window boundary, then a short match
    x = bytearray(rng.integers(0, 256, C, dtype=np.uint8).tobytes())
    x[4096 : 4096 + 64] = x[64 : 64 + 64]  # offset-4032 match near boundary
    x[8190 : 8190 + 40] = x[100 : 100 + 40]  # match straddling row 16
    cases.append(bytes(x))
    # output exactly one window / two windows
    cases.append(bytes([9]) * 4096 + b"")
    CMAX = 20000
    comps, csizes, raws = [], [], []
    for raw in cases:
        c = lz4_compress_oracle(raw, max_match=1 << 30)
        assert len(c) <= CMAX
        comps.append(np.frombuffer(c.ljust(CMAX, b"\0"), np.uint8))
        csizes.append(len(c))
        raws.append(raw)
    comp = jnp.asarray(np.stack(comps))
    sizes = jnp.asarray(np.array(csizes, np.int32))
    gd, gl, gs = map(np.asarray, lzp.decompress(comp, sizes, C, interpret=True))
    for i, raw in enumerate(raws):
        assert gs[i] == 0, f"case {i}"
        assert gl[i] == len(raw), f"case {i}"
        np.testing.assert_array_equal(
            gd[i, : len(raw)], np.frombuffer(raw, np.uint8), err_msg=f"case {i}"
        )


# ---------------------------------------------------------------------------
# compression


def test_compress_matches_uncapped_oracle(rng):
    """The kernel's greedy parse with exact extension IS the sequential
    oracle; streams must be byte-identical (and hence <= the reference's
    collision-lossy hash-table output)."""
    C = 2048
    rows = [
        np.repeat(rng.integers(0, 5, C), rng.integers(1, 30, C)).astype(np.uint8)[:C],
        rng.choice(np.frombuffer(b"the quick brown fox jumps over a dog ", np.uint8), C),
        rng.integers(0, 256, C, dtype=np.uint8),
        np.tile(np.frombuffer(b"abc", np.uint8), C // 3 + 1)[:C],
        np.zeros(C, np.uint8),
    ]
    lens = np.array([C, C, C, C - 5, C], np.int32)
    arr = np.stack(rows)
    comp, sizes = lzp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    for i in range(len(rows)):
        ref = lz4_compress_oracle(rows[i][: lens[i]].tobytes(), max_match=1 << 30)
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"


def test_compress_tiny_and_empty(rng):
    C = 512
    arr = np.zeros((4, C), np.uint8)
    arr[1, 0] = 7
    arr[2, :16] = rng.integers(0, 256, 16)
    arr[3] = rng.integers(0, 256, C)
    lens = np.array([0, 1, 16, C], np.int32)
    comp, sizes = lzp.compress(jnp.asarray(arr), jnp.asarray(lens), interpret=True)
    comp, sizes = np.asarray(comp), np.asarray(sizes)
    assert sizes[0] == 0
    for i in range(1, 4):
        ref = lz4_compress_oracle(arr[i, : lens[i]].tobytes(), max_match=1 << 30)
        assert comp[i, : sizes[i]].tobytes() == ref, f"row {i}"
    # round-trip through the Pallas decoder
    out, olen, st = lzp.decompress(jnp.asarray(comp), jnp.asarray(sizes), C, interpret=True)
    out, olen, st = map(np.asarray, (out, olen, st))
    assert (olen == lens).all()
    for i in range(1, 4):
        assert st[i] == 0
        np.testing.assert_array_equal(out[i, : lens[i]], arr[i, : lens[i]])
