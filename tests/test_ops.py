"""Stage-primitive tests vs sequential numpy oracles.

Mirrors the reference unit tier (src/test/BitPackGPU_test.cpp,
RunLengthEncodeGPU_test.cpp, DeltaGPU_test.cpp): every dtype, every bit
width, adversarial run profiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpucomp.ops import bitpack as bp
from tpucomp.ops import delta as dl
from tpucomp.ops import rle as rl

from oracles.cascaded_oracle import (
    bitpack_oracle,
    bitunpack_oracle,
    delta_decode_oracle,
    delta_encode_oracle,
    for_bitwidth_oracle,
    rle_decode_oracle,
    rle_encode_oracle,
)

DTYPES = [np.uint8, np.int8, np.uint16, np.int16, np.uint32, np.int32, np.uint64, np.int64]


def _unsigned(dtype):
    d = np.dtype(dtype)
    return np.dtype(f"u{d.itemsize}") if d.kind == "i" else d


def _rand_elems(rng, dtype, n, profile):
    d = np.dtype(dtype)
    if profile == "runs":
        vals = rng.integers(0, 5, size=n)
        x = np.repeat(vals, rng.integers(1, 9, size=n))[:n].astype(d)
    elif profile == "small_range":
        x = (rng.integers(100, 131, size=n)).astype(d)
    elif profile == "full_range":
        nbytes = n * d.itemsize
        x = rng.integers(0, 256, size=nbytes, dtype=np.uint8).view(d)
    elif profile == "constant":
        x = np.full(n, 42, dtype=d)
    elif profile == "ramp":
        x = (np.arange(n) * 3 + 7).astype(d)
    return x


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("profile", ["runs", "small_range", "full_range", "constant", "ramp"])
def test_bitpack_matches_oracle(rng, dtype, profile):
    e = 256
    for n in [1, 2, 37, e]:
        x = _rand_elems(rng, dtype, n, profile)
        u = x.view(_unsigned(dtype))
        xe = np.zeros(e, _unsigned(dtype))
        xe[:n] = u
        width = np.dtype(dtype).itemsize
        max_words = e * width // 4 + 1

        blob, size = bp.bitpack(jnp.asarray(xe), jnp.int32(n), max_words)
        blob_np = np.asarray(blob)[: int(size)]
        expected = bitpack_oracle(u[:n])
        assert blob_np.tobytes() == expected, f"n={n}"

        # round-trip through our unpacker and the oracle's; pad the blob to
        # a fixed size so each dtype compiles one unpack program, not one
        # per blob length
        padded = np.zeros(blob.shape[0], np.uint8)
        padded[: len(expected)] = np.frombuffer(expected, np.uint8)
        out, n_out, _ = bp.bitunpack(jnp.asarray(padded), e, width)
        assert int(n_out) == n
        np.testing.assert_array_equal(np.asarray(out)[:n], u[:n])
        np.testing.assert_array_equal(bitunpack_oracle(blob_np.tobytes(), _unsigned(dtype)), u[:n])


@pytest.mark.parametrize("width", [1, 2, 4, 8])
def test_bitpack_every_bitwidth(rng, width):
    """Sweep every bitwidth 0..8*width (mirrors BitPackGPU_test.cpp:251-558)."""
    udtype = np.dtype(f"u{width}")
    e = 128
    for bw in range(0, 8 * width + 1):
        if bw == 0:
            x = np.full(e, 7, udtype)
        else:
            raw = rng.integers(0, 256, size=e * 8, dtype=np.uint8).view(np.uint64)
            if bw < 64:
                raw = raw & np.uint64((1 << bw) - 1)
            x = raw.astype(udtype)
            x[0] = 0  # anchor FOR at zero so the range needs exactly bw bits
            x[1] = udtype.type(((1 << bw) - 1) & ((1 << (8 * width)) - 1))
        blob, size = bp.bitpack(jnp.asarray(x), jnp.int32(e), e * width // 4 + 1)
        got = np.asarray(blob)[: int(size)].tobytes()
        assert got == bitpack_oracle(x)
        padded = np.zeros(blob.shape[0], np.uint8)
        padded[: len(got)] = np.frombuffer(got, np.uint8)
        out, n_out, bw_got = bp.bitunpack(jnp.asarray(padded), e, width)
        np.testing.assert_array_equal(np.asarray(out), x)


@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("profile", ["runs", "constant", "full_range"])
def test_rle_matches_oracle(rng, dtype, profile):
    e = 512
    for n in [1, 3, 100, e]:
        x = _rand_elems(rng, dtype, n, profile)
        u = x.view(_unsigned(dtype))
        xe = np.zeros(e, _unsigned(dtype))
        xe[:n] = u
        vals, counts, num_runs = rl.rle_encode(jnp.asarray(xe), jnp.int32(n))
        ov, oc = rle_encode_oracle(u[:n])
        r = int(num_runs)
        assert r == ov.size
        np.testing.assert_array_equal(np.asarray(vals)[:r], ov)
        np.testing.assert_array_equal(np.asarray(counts)[:r], oc)

        y, total = rl.rle_decode(vals, counts, num_runs, e)
        assert int(total) == n
        np.testing.assert_array_equal(np.asarray(y)[:n], u[:n])
        np.testing.assert_array_equal(rle_decode_oracle(ov, oc), u[:n])


@pytest.mark.parametrize("count_dtype", ["uint16", "uint32", "uint64"])
def test_rle_count_widths(rng, count_dtype):
    """Standalone 16/32/64-bit count variants at >= 1M elements, mirroring
    the reference's compressDownstream count-type dispatch
    (src/RunLengthEncodeGPU.hip:479-560; test :259-539).  num_runs stays a
    device scalar (the device-resident-size analogue)."""
    e = 1 << 20
    x = np.repeat(
        rng.integers(0, 50, 40000).astype(np.uint32),
        rng.integers(1, 60, 40000),
    )[:e].astype(np.uint32)
    n = x.size
    xe = np.zeros(e, np.uint32)
    xe[:n] = x
    vals, counts, num_runs = rl.rle_encode(jnp.asarray(xe), jnp.int32(n), count_dtype)
    assert counts.dtype == jnp.dtype(count_dtype)
    ov, oc = rle_encode_oracle(x)
    r = int(num_runs)
    assert r == ov.size
    np.testing.assert_array_equal(np.asarray(vals)[:r], ov)
    np.testing.assert_array_equal(np.asarray(counts)[:r].astype(np.int64), oc)
    y, total = rl.rle_decode(vals, counts, num_runs, e)
    assert int(total) == n
    np.testing.assert_array_equal(np.asarray(y)[:n], x)


def test_rle_long_runs_need_wide_counts(rng):
    """Runs longer than 65535 require the 32-bit count variant (the uint16
    fused-path dtype would wrap)."""
    e = 1 << 18
    x = np.zeros(e, np.uint32)
    x[200000:] = 7  # first run 200000 > 65535
    vals, counts, num_runs = rl.rle_encode(jnp.asarray(x), jnp.int32(e), "uint32")
    assert int(num_runs) == 2
    assert int(counts[0]) == 200000 and int(counts[1]) == e - 200000
    y, total = rl.rle_decode(vals, counts, num_runs, e)
    assert int(total) == e
    np.testing.assert_array_equal(np.asarray(y), x)


@pytest.mark.parametrize("dtype", DTYPES)
def test_delta_matches_oracle(rng, dtype):
    e = 300
    for n in [1, 2, 64, e]:
        x = _rand_elems(rng, dtype, n, "full_range")
        u = x.view(_unsigned(dtype))
        xe = np.zeros(e, _unsigned(dtype))
        xe[:n] = u
        d, first, cnt = dl.delta_encode(jnp.asarray(xe), jnp.int32(n))
        od, ofirst = delta_encode_oracle(u[:n])
        assert int(cnt) == n - 1
        assert np.asarray(first) == ofirst.view(_unsigned(dtype))
        np.testing.assert_array_equal(np.asarray(d)[: n - 1], od.view(_unsigned(dtype)))

        y, n_out = dl.delta_decode(d, first, cnt)
        assert int(n_out) == n
        np.testing.assert_array_equal(np.asarray(y)[:n], u[:n])
        np.testing.assert_array_equal(delta_decode_oracle(od, ofirst), u[:n])


def test_ops_vmap_and_jit(rng):
    """Stages batch via vmap and compile under jit (the production shape)."""
    e = 256
    xs = rng.integers(0, 50, size=(8, e), dtype=np.uint32)
    ns = np.array([e, 1, 17, 255, 256, 100, 2, 64], np.int32)

    enc = jax.jit(jax.vmap(lambda x, n: rl.rle_encode(x, n)))
    vals, counts, runs = enc(jnp.asarray(xs), jnp.asarray(ns))
    dec = jax.jit(jax.vmap(lambda v, c, r: rl.rle_decode(v, c, r, e)))
    ys, totals = dec(vals, counts, runs)
    for b in range(8):
        np.testing.assert_array_equal(np.asarray(ys)[b, : ns[b]], xs[b, : ns[b]])

    pack = jax.jit(jax.vmap(lambda x, n: bp.bitpack(x, n, e)))
    blobs, sizes = pack(jnp.asarray(xs), jnp.asarray(ns))
    unpack = jax.jit(jax.vmap(lambda b: bp.bitunpack(b, e, 4)))
    outs, n_outs, _ = unpack(blobs)
    for b in range(8):
        np.testing.assert_array_equal(np.asarray(outs)[b, : ns[b]], xs[b, : ns[b]])


def test_for_bitwidth_narrow_dtypes_under_jit(rng):
    """Regression (round 5, caught on hardware): signed int8/int16
    where+min/max REDUCTIONS miscompile under jit in jax 0.9.0 (garbage
    extrema, eager correct), silently turning compressible SHORT/CHAR
    partitions into raw fallbacks.  for_bitwidth must therefore reduce at
    >= 32-bit width; this pins jit == eager == numpy at the shape that
    reproduced the miscompile (2048 elements, n = 2047)."""
    import jax

    for np_dt in (np.uint8, np.uint16, np.uint32):
        bits_n = np.dtype(np_dt).itemsize * 8
        x = rng.integers(0, 2**bits_n, 2048, dtype=np.uint64).astype(np_dt)
        n = jnp.int32(2047)
        xe = jnp.asarray(x)
        f_e, bw_e = bp.for_bitwidth(xe, n)
        f_j, bw_j = jax.jit(bp.for_bitwidth)(xe, n)
        assert int(bw_e) == int(bw_j), np_dt
        assert int(f_e) == int(f_j), np_dt
        # numpy ground truth
        s = x[:2047].astype(np.dtype(np_dt).str.replace("u", "i"))
        rng_v = (int(s.max()) - int(s.min())) & 0xFFFFFFFF
        assert int(bw_e) == int(rng_v).bit_length(), np_dt
