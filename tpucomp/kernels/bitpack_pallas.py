"""Pallas bitpack/bitunpack kernels (cascaded's hot stage).

Replaces the XLA word-granularity scatter (pack) and per-element gathers
(unpack) with grid-sequential kernels that branch on the chunk's bitwidth:
inside a kernel, ``lax.switch`` on a scalar executes exactly ONE branch per
grid cell, so each branch is fully static vector code -- under XLA+vmap
the same switch would evaluate every branch for the whole batch, which is
why the dense path keeps scatters.

Mosaic-friendly structure: elements process in rows of 128 lanes.  A row's
128*bw bits are a whole number of u32 words (4*bw), so every row's packed
words are self-contained and all slices/concatenations use static offsets;
no lane-crossing reshapes are needed.

Stream format matches tpucomp.ops.bitpack (reference
src/CascadedKernels.hiph:483-553,556-618): element i occupies bits
[i*bw, (i+1)*bw) of a little-endian u32 bit stream.  Both kernels work in
u32 space (any element width <= 4 converts at the caller; a bw <= 32 value
always fits in u32, and an element's bits span at most 2 u32 words).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROW = 128  # elements per row; 128*bw bits == 4*bw words for every bw


def _pack_branch(bwi: int, e: int, out_ref):
    """Static-bitwidth pack: [R, 128] uint32 values -> dense u32 words
    written straight into ``out_ref``.

    Mosaic-validated ops only: axis-1 concat of [R, 1] columns, and static
    unaligned 1-D stores of each row's words (no lane-crossing reshape or
    axis-0/1-D concatenation, which Mosaic rejects).
    """
    r_count = e // ROW
    wpr = 4 * bwi  # words per row

    def branch(g):
        out_ref[0, 0, :] = jnp.zeros((e,), jnp.uint32)
        if bwi == 0:
            return
        cols = []
        for j in range(wpr):
            e0 = (32 * j) // bwi
            e1 = min((32 * (j + 1) - 1) // bwi, ROW - 1)
            acc = None
            for ei in range(e0, e1 + 1):
                s = ei * bwi - 32 * j
                v = g[:, ei : ei + 1]
                part = (v << jnp.uint32(s)) if s >= 0 else (v >> jnp.uint32(-s))
                acc = part if acc is None else (acc | part)
            cols.append(acc)
        w2d = jnp.concatenate(cols, axis=1)  # [R, 4*bwi]
        for r in range(r_count):
            out_ref[0, 0, r * wpr : (r + 1) * wpr] = w2d[r]

    return branch


def _unpack_branch(bwi: int, e: int):
    """Static-bitwidth unpack: dense [E] u32 words -> [E] uint32 values.

    Word "columns" across element rows are strided slices of the dense
    stream (row r's word k lives at r*wpr + k); outputs assemble with the
    Mosaic-validated axis-1 concat of [R, 1] columns + lane-preserving
    reshape.
    """
    r_count = e // ROW
    wpr = 4 * bwi

    def branch(words):
        if bwi == 0:
            return jnp.zeros((e,), jnp.uint32)
        mask = jnp.uint32((1 << bwi) - 1) if bwi < 32 else ~jnp.uint32(0)

        def wcol(k):  # words[r*wpr + k] for every row, as [R, 1]
            sl = jax.lax.slice(words, (k,), (k + (r_count - 1) * wpr + 1,), (wpr,))
            return sl.reshape(r_count, 1)

        cols = []
        for ei in range(ROW):
            bit0 = ei * bwi
            lo = bit0 // 32
            off = bit0 - lo * 32
            hi = (bit0 + bwi - 1) // 32
            val = wcol(lo) >> jnp.uint32(off)
            if hi > lo and off:
                val = val | (wcol(hi) << jnp.uint32(32 - off))
            cols.append(val & mask)
        out = jnp.concatenate(cols, axis=1)  # [R, 128]
        return out.reshape(e)

    return branch


def _pack_kernel(x_ref, n_ref, bw_ref, words_ref, *, e: int):
    g0 = x_ref[0, 0, :].reshape(e // ROW, ROW)
    n = n_ref[0, 0, 0]
    bw = bw_ref[0, 0, 0]
    r = jax.lax.broadcasted_iota(jnp.int32, (e // ROW, ROW), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (e // ROW, ROW), 1)
    g = jnp.where(r * ROW + c < n, g0, 0).astype(jnp.uint32)
    branches = [_pack_branch(b, e, words_ref) for b in range(33)]
    jax.lax.switch(jnp.clip(bw, 0, 32), branches, g)


def _unpack_kernel(words_ref, bw_ref, out_ref, *, e: int):
    words = words_ref[0, 0, :]
    bw = bw_ref[0, 0, 0]
    branches = [_unpack_branch(b, e) for b in range(33)]
    out_ref[0, 0, :] = jax.lax.switch(jnp.clip(bw, 0, 32), branches, words)


def _call3(kernel, b, e, dtype, *args, interpret):
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 1, a.shape[2]), lambda i: (i, 0, 0)) for a in args],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, e), dtype),
        interpret=interpret,
    )(*args)


def pack_words(u, n, bw, *, interpret: bool = False):
    """Batched pack: u uint32[B, E] FOR-relative (zeros past n), n int32[B],
    bw int32[B] (<= 32).  Returns dense stream words uint32[B, E]."""
    b, e = u.shape
    assert e % ROW == 0
    kernel = functools.partial(_pack_kernel, e=e)
    out = _call3(
        kernel,
        b,
        e,
        jnp.uint32,
        u.astype(jnp.uint32).reshape(b, 1, e),
        n.astype(jnp.int32).reshape(b, 1, 1),
        bw.astype(jnp.int32).reshape(b, 1, 1),
        interpret=interpret,
    )
    return out[:, 0, :]


def unpack_words(words, bw, *, interpret: bool = False):
    """Batched unpack: words uint32[B, E] dense stream, bw int32[B] (<= 32).
    Returns FOR-relative values uint32[B, E]."""
    b, e = words.shape
    assert e % ROW == 0
    kernel = functools.partial(_unpack_kernel, e=e)
    out = _call3(
        kernel,
        b,
        e,
        jnp.uint32,
        words.astype(jnp.uint32).reshape(b, 1, e),
        bw.astype(jnp.int32).reshape(b, 1, 1),
        interpret=interpret,
    )
    return out[:, 0, :]


def pack_words_single(u, n, bw, *, interpret: bool = False):
    """Single-chunk pack (vmap-friendly): u uint32[E] -> words uint32[E]."""
    return pack_words(
        u.reshape(1, -1), n.reshape(1), bw.reshape(1), interpret=interpret
    )[0]


def unpack_words_single(words, bw, *, interpret: bool = False):
    """Single-chunk unpack (vmap-friendly): u32 stream words -> values."""
    return unpack_words(words.reshape(1, -1), bw.reshape(1), interpret=interpret)[0]
