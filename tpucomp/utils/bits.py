"""Vectorized bit-twiddling primitives shared by all codecs.

Everything here is dense jnp math (VPU-friendly): no scatters, no gathers.
Shift helpers guard the out-of-range shift amounts that XLA leaves undefined.
"""

from __future__ import annotations

import jax.numpy as jnp


def shl(x, s):
    """Left shift with ``s >= bitwidth`` yielding 0 (XLA leaves it undefined)."""
    nbits = jnp.iinfo(x.dtype).bits
    s = s.astype(x.dtype) if hasattr(s, "astype") else s
    return jnp.where(s < nbits, x << jnp.minimum(s, nbits - 1).astype(x.dtype), x.dtype.type(0) if hasattr(x.dtype, "type") else 0)


def shr(x, s):
    """Logical right shift with ``s >= bitwidth`` yielding 0.

    ``x`` must be unsigned for logical semantics.
    """
    nbits = jnp.iinfo(x.dtype).bits
    s = s.astype(x.dtype) if hasattr(s, "astype") else s
    return jnp.where(s < nbits, x >> jnp.minimum(s, nbits - 1).astype(x.dtype), jnp.zeros_like(x))


def bit_width(r):
    """Number of significant bits of unsigned ``r``: 32|64 - clz(r).

    Matches the reference's bitwidth computation
    (src/CascadedKernels.hiph:456-469).  Fully dense binary reduction.
    """
    nbits = jnp.iinfo(r.dtype).bits
    r = r.astype(jnp.uint64) if nbits > 32 else r.astype(jnp.uint32)
    bw = jnp.zeros(r.shape, jnp.int32)
    shift = nbits // 2
    while shift:
        has_high = (r >> r.dtype.type(shift)) != 0
        bw = bw + jnp.where(has_high, shift, 0)
        r = jnp.where(has_high, r >> r.dtype.type(shift), r)
        shift //= 2
    return bw + (r != 0)


def bytes_to_words_le(b):
    """uint8[..., 4*W] -> uint32[..., W], little-endian within each word."""
    assert b.shape[-1] % 4 == 0
    g = b.reshape(*b.shape[:-1], -1, 4).astype(jnp.uint32)
    return g[..., 0] | (g[..., 1] << 8) | (g[..., 2] << 16) | (g[..., 3] << 24)


def words_to_bytes_le(w):
    """uint32[..., W] -> uint8[..., 4*W], little-endian within each word."""
    w = w.astype(jnp.uint32)
    parts = jnp.stack(
        [w & 0xFF, (w >> 8) & 0xFF, (w >> 16) & 0xFF, (w >> 24) & 0xFF],
        axis=-1,
    )
    return parts.astype(jnp.uint8).reshape(*w.shape[:-1], -1)


def words64_to_words32_le(w):
    """uint64[..., W] -> uint32[..., 2*W], low word first."""
    w = w.astype(jnp.uint64)
    parts = jnp.stack(
        [(w & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32), (w >> jnp.uint64(32)).astype(jnp.uint32)],
        axis=-1,
    )
    return parts.reshape(*w.shape[:-1], -1)


def words32_to_words64_le(w):
    """uint32[..., 2*W] -> uint64[..., W], low word first."""
    g = w.reshape(*w.shape[:-1], -1, 2).astype(jnp.uint64)
    return g[..., 0] | (g[..., 1] << jnp.uint64(32))
