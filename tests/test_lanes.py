"""Unit tests for the column-major Pallas tile primitives (kernels/lanes.py).

Each primitive runs inside a tiny interpret-mode pallas_call and is compared
against a straightforward numpy oracle over the flattened column-major
stream.  Mirrors the reference's block-primitive unit tier
(src/test/BitPackGPU_test.cpp etc.) at the new abstraction level.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.kernels import lanes

SUB = lanes.SUB
L = 64  # lanes per test tile (2048 elements)


def run_kernel(fn, *arrays, n_out=1, out_dtype=jnp.uint32):
    """Run fn(*tiles) -> tile(s) inside an interpret-mode pallas_call."""

    def kernel(*refs):
        ins = refs[: len(arrays)]
        outs = refs[len(arrays) :]
        res = fn(*[r[:] for r in ins])
        if n_out == 1:
            res = (res,)
        for o, r in zip(outs, res):
            o[:] = r

    shape = arrays[0].shape
    out_shape = tuple(jax.ShapeDtypeStruct(shape, out_dtype) for _ in range(n_out))
    if n_out == 1:
        out_shape = out_shape[0]
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        interpret=True,
    )(*arrays)
    return out


def cm(x_flat):
    """numpy flat stream -> column-major [SUB, L] tile."""
    return np.asarray(x_flat).reshape(-1, SUB).T.copy()


def uncm(tile):
    """column-major tile -> numpy flat stream."""
    return np.asarray(tile).T.reshape(-1)


@pytest.mark.parametrize("span", [8, 16, L])
@pytest.mark.parametrize("d", [0, 1, 31, 32, 33, 100, 255])
def test_flat_roll_static(rng, span, d):
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    out = run_kernel(lambda t: lanes.flat_roll_static(t, d, span), jnp.asarray(cm(x)))
    flat = uncm(out)
    seg = span * SUB
    expect = np.concatenate(
        [np.roll(x[i : i + seg], d) for i in range(0, SUB * L, seg)]
    )
    np.testing.assert_array_equal(flat, expect)


@pytest.mark.parametrize("span", [8, L])
def test_flat_roll_dynamic_per_group(rng, span):
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    n_groups = L // span
    shifts = rng.integers(0, span * SUB, n_groups).astype(np.int32)
    # broadcast per-group shift to every slot of the group
    d_flat = np.repeat(shifts, span * SUB)
    out = run_kernel(
        lambda t, dd: lanes.flat_roll_dynamic(t, dd.astype(jnp.int32), span),
        jnp.asarray(cm(x)),
        jnp.asarray(cm(d_flat).astype(np.uint32)),
    )
    flat = uncm(out)
    seg = span * SUB
    expect = np.concatenate(
        [np.roll(x[g * seg : (g + 1) * seg], shifts[g]) for g in range(n_groups)]
    )
    np.testing.assert_array_equal(flat, expect)


@pytest.mark.parametrize("span", [8, 16, L])
@pytest.mark.parametrize("exclusive", [False, True])
def test_seg_cumsum(rng, span, exclusive):
    x = rng.integers(0, 100, SUB * L).astype(np.uint32)
    out = run_kernel(
        lambda t: lanes.seg_cumsum(t.astype(jnp.int32), span, exclusive=exclusive).astype(
            jnp.uint32
        ),
        jnp.asarray(cm(x)),
    )
    flat = uncm(out).astype(np.int64)
    seg = span * SUB
    chunks = [np.cumsum(x[i : i + seg]) for i in range(0, SUB * L, seg)]
    expect = np.concatenate(chunks)
    if exclusive:
        expect = np.concatenate(
            [np.concatenate([[0], c[:-1]]) for c in chunks]
        )
    np.testing.assert_array_equal(flat, expect)


@pytest.mark.parametrize("span", [8, 16, L])
@pytest.mark.parametrize("exclusive", [False, True])
@pytest.mark.parametrize("active", [1, 17, 100, SUB * 8])
def test_seg_cumsum_max_active(rng, span, exclusive, active):
    """The bounded scan's contract: exact at flat slots < max_active, and
    the per-group MAX of the inclusive scan is exact everywhere (partial
    sums of nonnegative inputs never exceed the true total)."""
    active = min(active, span * SUB)
    x = rng.integers(0, 100, SUB * L).astype(np.uint32)
    # zero inputs past the active region, as callers guarantee
    seg = span * SUB
    xf = x.copy()
    for g in range(0, SUB * L, seg):
        xf[g + active : g + seg] = 0
    out = run_kernel(
        lambda t: lanes.seg_cumsum(
            t.astype(jnp.int32), span, exclusive=exclusive,
            max_active=jnp.int32(active),
        ).astype(jnp.uint32),
        jnp.asarray(cm(xf)),
    )
    flat = uncm(out).astype(np.int64)
    for g in range(0, SUB * L, seg):
        c = np.cumsum(xf[g : g + seg])
        exp = np.concatenate([[0], c[:-1]]) if exclusive else c
        np.testing.assert_array_equal(flat[g : g + active], exp[:active])
        if not exclusive:
            assert flat[g : g + seg].max() == c.max()


@pytest.mark.parametrize("span", [8, L])
@pytest.mark.parametrize("op,npf", [("sum", np.sum), ("min", np.min), ("max", np.max), ("or", np.bitwise_or.reduce)])
def test_seg_reduce(rng, span, op, npf):
    x = rng.integers(0, 2**20, SUB * L).astype(np.uint32)
    if op == "sum":
        x = (x % 1000).astype(np.uint32)
    out = run_kernel(lambda t: lanes.seg_reduce(t, span, op), jnp.asarray(cm(x)))
    flat = uncm(out)
    seg = span * SUB
    for g in range(L // span):
        val = npf(x[g * seg : (g + 1) * seg])
        assert (flat[g * seg : (g + 1) * seg] == val).all()


@pytest.mark.parametrize("span", [8, L])
def test_butterfly_left_compaction(rng, span):
    seg = span * SUB
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    valid = rng.random(SUB * L) < 0.4
    dist = np.zeros(SUB * L, np.int32)
    expect = np.zeros(SUB * L, np.uint32)
    for g in range(L // span):
        sl = slice(g * seg, (g + 1) * seg)
        pos = np.where(valid[sl])[0]
        dist[sl][...] = 0
        d = np.zeros(seg, np.int32)
        d[pos] = pos - np.arange(len(pos))
        dist[sl] = d
        expect[g * seg : g * seg + len(pos)] = x[sl][pos]

    def f(t, dd, vv):
        (p,), ok = lanes.butterfly_left([t], dd.astype(jnp.int32), vv != 0, span)
        return jnp.where(ok, p, 0).astype(jnp.uint32)

    out = run_kernel(
        f,
        jnp.asarray(cm(x)),
        jnp.asarray(cm(dist).astype(np.uint32)),
        jnp.asarray(cm(valid.astype(np.uint32))),
    )
    np.testing.assert_array_equal(uncm(out), expect)


@pytest.mark.parametrize("span", [8, L])
def test_butterfly_right_expansion(rng, span):
    seg = span * SUB
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    dist = np.zeros(SUB * L, np.int32)
    valid = np.zeros(SUB * L, bool)
    expect = np.zeros(SUB * L, np.uint32)
    for g in range(L // span):
        k = int(rng.integers(1, seg // 2))
        starts = np.sort(rng.choice(seg, size=k, replace=False))
        sl = slice(g * seg, (g + 1) * seg)
        valid[g * seg : g * seg + k] = True
        dist[g * seg : g * seg + k] = starts - np.arange(k)
        expect[np.asarray(starts) + g * seg] = x[g * seg : g * seg + k]

    def f(t, dd, vv):
        (p,), ok = lanes.butterfly_right([t], dd.astype(jnp.int32), vv != 0, span)
        return jnp.where(ok, p, 0).astype(jnp.uint32)

    out = run_kernel(
        f,
        jnp.asarray(cm(x)),
        jnp.asarray(cm(dist).astype(np.uint32)),
        jnp.asarray(cm(valid.astype(np.uint32))),
    )
    np.testing.assert_array_equal(uncm(out), expect)


@pytest.mark.parametrize("span", [8, L])
def test_ffill(rng, span):
    seg = span * SUB
    x = rng.integers(1, 2**31, SUB * L).astype(np.uint32)
    src = rng.random(SUB * L) < 0.1

    def f(t, ss):
        return lanes.ffill(t, ss != 0, span)

    out = run_kernel(f, jnp.asarray(cm(x)), jnp.asarray(cm(src.astype(np.uint32))))
    flat = uncm(out)
    for g in range(L // span):
        cur = None
        for i in range(g * seg, (g + 1) * seg):
            if src[i]:
                cur = x[i]
            expect = x[i] if cur is None else cur
            assert flat[i] == expect


def _np_pack(vals, bw):
    """numpy oracle: pack 32 values of bw bits into bw little-endian words."""
    out = np.zeros(32, np.uint64)
    bitpos = 0
    acc = 0
    stream = 0
    big = 0
    for j, v in enumerate(vals):
        big |= int(v) << (j * bw)
    words = []
    for w in range(32):
        words.append((big >> (32 * w)) & 0xFFFFFFFF)
    return np.array(words, np.uint32)


@pytest.mark.parametrize("bw", [0, 1, 3, 7, 8, 13, 16, 29, 32])
def test_pack_unpack_allpairs(rng, bw):
    n_cols = L
    vals = rng.integers(0, 2**32, (SUB, n_cols)).astype(np.uint32)
    if bw < 32:
        vals = (vals & ((1 << bw) - 1)).astype(np.uint32)
    bwt = np.full((SUB, n_cols), bw, np.int32)

    packed = run_kernel(
        lambda t, b: lanes.pack_allpairs(t, b.astype(jnp.int32), 1),
        jnp.asarray(vals),
        jnp.asarray(bwt.astype(np.uint32)),
    )
    packed = np.asarray(packed)
    for g in range(n_cols):
        expect = _np_pack(vals[:, g], bw)
        np.testing.assert_array_equal(packed[:, g], expect, err_msg=f"col {g} bw {bw}")

    unpacked = run_kernel(
        lambda t, b: lanes.unpack_allpairs(t, b.astype(jnp.int32), 1),
        jnp.asarray(packed),
        jnp.asarray(bwt.astype(np.uint32)),
    )
    if bw == 0:
        np.testing.assert_array_equal(np.asarray(unpacked), 0)
    else:
        np.testing.assert_array_equal(np.asarray(unpacked), vals)


@pytest.mark.parametrize("bw", [0, 1, 3, 7, 8, 13, 16, 29, 31, 32])
@pytest.mark.parametrize("n", [32, 17, 1])
def test_pack_unpack_columns(rng, bw, n):
    """pack_columns/unpack_columns vs the same numpy oracle as allpairs,
    plus partial-column counts (elements >= n zeroed)."""
    n_cols = L
    vals = rng.integers(0, 2**32, (SUB, n_cols)).astype(np.uint32)
    if bw < 32:
        vals = (vals & ((1 << bw) - 1)).astype(np.uint32)
    vals[n:, :] = 0
    bwt = np.full((SUB, n_cols), bw, np.int32)
    nt = np.full((SUB, n_cols), n, np.int32)

    packed = run_kernel(
        lambda t, b, nn: lanes.pack_columns(
            t, b.astype(jnp.int32), nn.astype(jnp.int32)
        ),
        jnp.asarray(vals),
        jnp.asarray(bwt.astype(np.uint32)),
        jnp.asarray(nt.astype(np.uint32)),
    )
    packed = np.asarray(packed)
    nw = (n * bw + 31) >> 5
    for g in range(min(n_cols, 8)):
        expect = _np_pack(vals[:, g], bw)
        expect[nw:] = 0
        np.testing.assert_array_equal(packed[:, g], expect, err_msg=f"col {g} bw {bw} n {n}")

    unpacked = run_kernel(
        lambda t, b: lanes.unpack_columns(t, b.astype(jnp.int32)),
        jnp.asarray(packed),
        jnp.asarray(bwt.astype(np.uint32)),
    )
    if bw == 0:
        np.testing.assert_array_equal(np.asarray(unpacked), 0)
    else:
        np.testing.assert_array_equal(np.asarray(unpacked)[:n], vals[:n])


def test_butterfly_left_or_merges(rng):
    """OR-merge compaction: many elements landing on the same monotone
    target (the bit-pack word case: targets nondecreasing, dist
    nondecreasing)."""
    seg = SUB
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    # per column: element j targets j // 3 (nondecreasing, duplicated)
    j = np.arange(SUB)
    tgt = j // 3
    dist = np.tile(j - tgt, L).reshape(L, SUB).T.astype(np.int32)
    valid = rng.random((SUB, L)) < 0.7

    def f(t, dd, vv):
        p, ok = lanes.butterfly_left_or(t, dd.astype(jnp.int32), vv != 0, 1, nbits=5)
        return jnp.where(ok, p, 0).astype(jnp.uint32)

    out = run_kernel(
        f,
        jnp.asarray(cm(x).T.reshape(SUB, L) if False else x.reshape(L, SUB).T.copy()),
        jnp.asarray(dist.astype(np.uint32)),
        jnp.asarray(valid.astype(np.uint32)),
    )
    out = np.asarray(out)
    xs = x.reshape(L, SUB).T
    for g in range(L):
        expect = np.zeros(SUB, np.uint64)
        for jj in range(SUB):
            if valid[jj, g]:
                expect[tgt[jj]] |= xs[jj, g]
        np.testing.assert_array_equal(out[:, g], expect.astype(np.uint32), err_msg=f"col {g}")


@pytest.mark.parametrize("nbits", [5, 8])
def test_div_dyn(rng, nbits):
    x = rng.integers(0, 2**nbits * 30, (SUB, L)).astype(np.int32)
    d = rng.integers(1, 64, (SUB, L)).astype(np.int32)
    x = np.minimum(x, d * ((1 << nbits) - 1)).astype(np.int32)

    out = run_kernel(
        lambda t, dd: lanes.div_dyn(t.astype(jnp.int32), dd.astype(jnp.int32), nbits).astype(jnp.uint32),
        jnp.asarray(x.astype(np.uint32)),
        jnp.asarray(d.astype(np.uint32)),
    )
    np.testing.assert_array_equal(np.asarray(out).astype(np.int64), x // d)


def test_select_word(rng):
    x = rng.integers(0, 2**31, SUB * L).astype(np.uint32)
    pos = int(rng.integers(0, SUB * L))

    def f(t):
        return lanes.select_word(t, jnp.int32(pos))

    out = run_kernel(f, jnp.asarray(cm(x)))
    assert (np.asarray(out) == x[pos]).all()


@pytest.mark.parametrize("with_zero_runs", [False, True])
def test_rle_decode_tile_zero_count_runs(rng, with_zero_runs):
    """cascaded_pallas._rle_decode_tile: the zero-count compaction branch
    sits behind a lax.cond the encoder never triggers (it always emits
    counts >= 1) -- exercise both branches directly against a numpy
    oracle.  Zero-count runs write nothing, as ops/rle.py rle_decode and
    the reference."""
    from tpucomp.kernels import cascaded_pallas as cp

    span = 16
    seg = span * SUB
    n_groups = L // span
    num_runs = rng.integers(1, 40, n_groups)
    vals = np.zeros(SUB * L, np.int32)
    counts = np.zeros(SUB * L, np.int32)
    expect = np.zeros(SUB * L, np.int64)
    totals = []
    for g in range(n_groups):
        nr = int(num_runs[g])
        v = rng.integers(-50, 50, nr)
        c = rng.integers(1, 9, nr)
        if with_zero_runs:
            c[rng.integers(0, nr, max(1, nr // 3))] = 0
        # keep the expansion inside the group
        while c.sum() > seg:
            c[np.argmax(c)] -= 1
        vals[g * seg : g * seg + nr] = v
        counts[g * seg : g * seg + nr] = c
        expect[g * seg : g * seg + int(c.sum())] = np.repeat(v, c)
        totals.append(int(c.sum()))

    nrt = np.zeros(SUB * L, np.int32)
    for g in range(n_groups):
        nrt[g * seg : (g + 1) * seg] = num_runs[g]

    out, tot = run_kernel(
        lambda v, c, nr: cp._rle_decode_tile(
            v.astype(jnp.int32), c.astype(jnp.int32), nr.astype(jnp.int32), span
        ),
        jnp.asarray(cm(vals).astype(np.uint32)),
        jnp.asarray(cm(counts).astype(np.uint32)),
        jnp.asarray(cm(nrt).astype(np.uint32)),
        n_out=2,
        out_dtype=jnp.int32,
    )
    flat = uncm(out).astype(np.int64)
    np.testing.assert_array_equal(flat, expect)
    tflat = uncm(tot)
    for g in range(n_groups):
        assert (tflat[g * seg : (g + 1) * seg] == totals[g]).all()
