"""Smoke tests of the driver benchmark harness (bench.py).

The headline artifact the driver records every round comes from bench.py;
these tests pin its measurement path (single-dispatch lax.map tiling,
round-trip verification, ratio accounting) on tiny inputs so harness
regressions cannot silently corrupt the recorded numbers.  Absolute GB/s
on the CPU backend are meaningless and not asserted.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench


def test_corpus_deterministic_and_sized():
    a = bench.load_corpus(1 << 20)
    b = bench.load_corpus(1 << 20)
    assert a == b and len(a) == 1 << 20
    # seed rotation decorrelates without changing content length
    c = bench.load_corpus(1 << 20, seed=1)
    assert len(c) == 1 << 20 and c != a


def test_bench_cascaded_roundtrip_smoke():
    r = bench.bench_cascaded(total_mb=1, iters=1, tile=8)
    assert r["roundtrip_ok"] is True
    assert r["encode_gbps"] > 0 and r["decode_gbps"] > 0
    assert r["ratio"] > 0.9  # worst case bounded near 1 by the raw fallback


@pytest.mark.slow
def test_bench_lz_roundtrip_smoke():
    r = bench.bench_lz("lz4", total_mb=1, iters=1, tile=8)
    assert r["roundtrip_ok"] is True
    # >0.9 not >=1.0: if the vendored corpus blob is absent the synth
    # fallback's incompressible quarter can push a 1 MB slice below 1.0
    assert r["ratio"] > 0.9
    r = bench.bench_lz("snappy", total_mb=1, iters=1, tile=8)
    assert r["roundtrip_ok"] is True


def test_bench_cascaded_runheavy_smoke():
    # the run-heavy slice must actually engage the RLE/Delta/BP pipeline:
    # ratio well above the raw-copy fallback's ~1.0
    r = bench.bench_cascaded(total_mb=1, iters=1, tile=8, corpus_kind="runheavy")
    assert r["roundtrip_ok"] is True
    assert r["ratio"] > 2.0, r["ratio"]
