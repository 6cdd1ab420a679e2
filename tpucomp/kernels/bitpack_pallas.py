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
    """Static-bitwidth pack: [E] uint32 FOR-relative values -> [E] u32 words
    (only the first ceil(E*bwi/32) carry data)."""

    def branch(u):
        if bwi == 0:
            return jnp.zeros((e,), jnp.uint32)
        p = 32  # elements per group -> bwi words per group
        g = u.reshape(e // p, p)
        cols = []
        for j in range(bwi):
            e0 = (32 * j) // bwi
            e1 = min((32 * (j + 1) - 1) // bwi, p - 1)
            acc = jnp.zeros((e // p,), jnp.uint32)
            for ei in range(e0, e1 + 1):
                s = ei * bwi - 32 * j
                v = g[:, ei]
                part = (v << jnp.uint32(s)) if s >= 0 else (v >> jnp.uint32(-s))
                acc = acc | part
            cols.append(acc)
        w = jnp.stack(cols, axis=1).reshape(-1)
        pad = e - w.shape[0]
        if pad:  # Mosaic rejects zero-sized vectors; skip the empty pad
            w = jnp.concatenate([w, jnp.zeros((pad,), jnp.uint32)])
        return w

    return branch


def _unpack_branch(bwi: int, e: int, tbits: int):
    """Static-bitwidth unpack: [E] raw units -> [E] FOR-relative values."""

    def branch(units):
        if bwi == 0:
            return jnp.zeros((e,), units.dtype)
        p = 32 if tbits <= 32 else 64
        upg = p * bwi // tbits  # units per group (integral)
        n_groups = e // p
        g = units[: n_groups * upg].reshape(n_groups, upg)
        mask = (
            units.dtype.type((1 << bwi) - 1) if bwi < tbits else ~units.dtype.type(0)
        )
        cols = []
        for ei in range(p):
            bit0 = ei * bwi
            lo = bit0 // tbits
            off = bit0 - lo * tbits
            hi = (bit0 + bwi - 1) // tbits
            val = g[:, lo] >> units.dtype.type(off)
            if hi > lo and off:
                val = val | (g[:, hi] << units.dtype.type(tbits - off))
            cols.append(val & mask)
        return jnp.stack(cols, axis=1).reshape(-1)

    return branch


def _pack_kernel(x_ref, n_ref, bw_ref, words_ref, *, e: int, tbits: int):
    x = x_ref[0, 0, :]
    n = n_ref[0, 0, 0]
    bw = bw_ref[0, 0, 0]
    i = jax.lax.broadcasted_iota(jnp.int32, (e, 1), 0)[:, 0]
    u = jnp.where(i < n, x, 0).astype(jnp.uint32)
    branches = [_pack_branch(b, e) for b in range(tbits + 1)]
    words = jax.lax.switch(jnp.clip(bw, 0, tbits), branches, u)
    words_ref[0, 0, :] = words


def _unpack_kernel(units_ref, bw_ref, out_ref, *, e: int, tbits: int):
    units = units_ref[0, 0, :]
    bw = bw_ref[0, 0, 0]
    branches = [_unpack_branch(b, e, tbits) for b in range(tbits + 1)]
    out_ref[0, 0, :] = jax.lax.switch(jnp.clip(bw, 0, tbits), branches, units)


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
