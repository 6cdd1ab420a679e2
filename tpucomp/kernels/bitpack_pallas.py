"""Pallas bitpack/bitunpack kernels (cascaded's hot stage).

Replaces the XLA word-granularity scatter (pack) and per-element gathers
(unpack) with grid-sequential kernels that branch on the chunk's bitwidth:
inside a kernel, ``lax.switch`` on a scalar executes exactly ONE branch
per grid cell, so each branch can be fully static vector code (pure
shifts/ors over strided columns).  Under XLA+vmap the same switch would
evaluate every branch for the whole batch -- the reason the dense path
keeps scatters.

Formats are identical to tpucomp.ops.bitpack (reference
src/CascadedKernels.hiph:483-553,556-618): element i occupies bits
[i*bw, (i+1)*bw) of a little-endian u32 bit stream.

Supported widths: 1, 2, 4 (8-byte elements keep the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpucomp.ops.bitpack import for_bitwidth


def _pack_branch(bwi: int, e: int):
    """Static-bitwidth pack: [G, 32] uint32 FOR-relative values -> [G, 32]
    u32 words, 2-D end to end (Mosaic-friendly); only the first
    ceil(E*bwi/32) flattened words carry data."""
    p = 32  # elements per group -> bwi words per group

    def branch(g):
        if bwi == 0:
            return jnp.zeros((e // p, p), jnp.uint32)
        cols = []
        for j in range(bwi):
            e0 = (32 * j) // bwi
            e1 = min((32 * (j + 1) - 1) // bwi, p - 1)
            acc = None
            for ei in range(e0, e1 + 1):
                s = ei * bwi - 32 * j
                v = g[:, ei : ei + 1]
                part = (v << jnp.uint32(s)) if s >= 0 else (v >> jnp.uint32(-s))
                acc = part if acc is None else (acc | part)
            cols.append(acc)
        # group words are contiguous in the stream: flatten [G, bwi] first,
        # then pad the tail (zero bits past the last data word)
        w = jnp.concatenate(cols, axis=1).reshape(-1)
        pad = e - w.shape[0]
        if pad:
            w = jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)])
        return w.reshape(e // p, p)

    return branch


def _unpack_branch(bwi: int, e: int, tbits: int):
    """Static-bitwidth unpack: flat units[e] -> [G, P] values.

    Group g holds elements [g*P, (g+1)*P) whose bits live in units
    [g*UPG, (g+1)*UPG); column ei reads strided unit slices (static stride
    UPG, static offset) -- no gathers, no data-dependent reshapes."""
    p = 32 if tbits <= 32 else 64

    def branch(units):
        udtype = units.dtype
        n_groups = e // p
        if bwi == 0:
            return jnp.zeros((n_groups, p), udtype)
        upg = p * bwi // tbits  # units per group (integral by choice of p)
        mask = udtype.type((1 << bwi) - 1) if bwi < tbits else ~udtype.type(0)

        def ucol(k):  # units[g*upg + k] for each group, as a [G, 1] column
            sl = jax.lax.slice(units, (k,), (k + (n_groups - 1) * upg + 1,), (upg,))
            return sl.reshape(n_groups, 1)

        cols = []
        for ei in range(p):
            bit0 = ei * bwi
            lo = bit0 // tbits
            off = bit0 - lo * tbits
            hi = (bit0 + bwi - 1) // tbits
            val = ucol(lo) >> udtype.type(off)
            if hi > lo and off:
                val = val | (ucol(hi) << udtype.type(tbits - off))
            cols.append(val & mask)
        return jnp.concatenate(cols, axis=1)

    return branch


def _pack_kernel(x_ref, n_ref, bw_ref, words_ref, *, e: int, tbits: int):
    p = 32
    g0 = x_ref[0, 0, :].reshape(e // p, p)
    n = n_ref[0, 0, 0]
    bw = bw_ref[0, 0, 0]
    r = jax.lax.broadcasted_iota(jnp.int32, (e // p, p), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (e // p, p), 1)
    g = jnp.where(r * p + c < n, g0, 0).astype(jnp.uint32)
    branches = [_pack_branch(b, e) for b in range(tbits + 1)]
    words = jax.lax.switch(jnp.clip(bw, 0, tbits), branches, g)
    words_ref[0, 0, :] = words.reshape(e)


def _unpack_kernel(units_ref, bw_ref, out_ref, *, e: int, tbits: int):
    units = units_ref[0, 0, :]
    bw = bw_ref[0, 0, 0]
    branches = [_unpack_branch(b, e, tbits) for b in range(tbits + 1)]
    out_ref[0, 0, :] = jax.lax.switch(jnp.clip(bw, 0, tbits), branches, units).reshape(e)


def pack_words_single(u, n, bw, *, interpret: bool = False):
    """Single-chunk pack (vmap-friendly): u uint32[E] -> words uint32[E]."""
    e = u.shape[-1]
    assert e % 32 == 0
    kernel = functools.partial(_pack_kernel, e=e, tbits=32)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, e), jnp.uint32),
        interpret=interpret,
    )(
        u.astype(jnp.uint32).reshape(1, 1, e),
        n.astype(jnp.int32).reshape(1, 1, 1),
        bw.astype(jnp.int32).reshape(1, 1, 1),
    )[0, 0]


def unpack_words_single(units, bw, *, interpret: bool = False):
    """Single-chunk unpack (vmap-friendly): units unsigned[E] -> values."""
    e = units.shape[-1]
    tbits = jnp.iinfo(units.dtype).bits
    assert e % (32 if tbits <= 32 else 64) == 0
    kernel = functools.partial(_unpack_kernel, e=e, tbits=int(tbits))
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, e), units.dtype),
        interpret=interpret,
    )(units.reshape(1, 1, e), bw.astype(jnp.int32).reshape(1, 1, 1))[0, 0]


def pack_words(u, n, bw, *, interpret: bool = False):
    """Batched pack: u uint32[B, E] FOR-relative (zeros past n), n int32[B],
    bw int32[B] (<= 32).  Returns words uint32[B, E]."""
    b, e = u.shape
    assert e % 32 == 0
    tbits = 32
    kernel = functools.partial(_pack_kernel, e=e, tbits=tbits)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, e), jnp.uint32),
        interpret=interpret,
    )(
        u.astype(jnp.uint32).reshape(b, 1, e),
        n.astype(jnp.int32).reshape(b, 1, 1),
        bw.astype(jnp.int32).reshape(b, 1, 1),
    )[:, 0, :]


def unpack_words(units, bw, *, interpret: bool = False):
    """Batched unpack: units unsigned[B, E] raw stream units, bw int32[B].
    Returns FOR-relative values unsigned[B, E]."""
    b, e = units.shape
    tbits = jnp.iinfo(units.dtype).bits
    assert e % (32 if tbits <= 32 else 64) == 0
    kernel = functools.partial(_unpack_kernel, e=e, tbits=int(tbits))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, e), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 1, e), units.dtype),
        interpret=interpret,
    )(units.reshape(b, 1, e), bw.astype(jnp.int32).reshape(b, 1, 1))[:, 0, :]
