"""LZ4 block decompression as a Pallas TPU kernel.

TPU-native counterpart of the reference's warp-cooperative decompressor
(decompressStream, reference src/LZ4Kernels.hiph:971-1097): one grid cell
per chunk; the scalar core plays lane 0's role (sequential token parse over
an SMEM-resident copy of the stream, ~ns per step instead of the ~19us
per-step floor of the dense-XLA batched while loop), and the VPU plays the
cooperative-copy role (<=512-byte word-vector granules instead of warp
copies, reference coopCopyNoOverlap/Repeat/Overlap :520-555).

Memory plan per chunk:
  - the compressed stream twice: as u32 words in VMEM [RC, 128] (one row =
    512 B) for vector literal reads, and flat in SMEM for the scalar parser
    (the reference's BufferControl shared-memory window, :353-518, is not
    needed: SMEM holds the whole stream)
  - output builds through a HEAD-row (2 KB) register tile whose last row is
    the current write row; completed rows flush to the VMEM output tile
    with one dynamic-sublane store each, so nothing read-modify-writes VMEM
  - match sources: bytes younger than the flushed rows come from the head
    tile by rolls; older bytes come from the flushed VMEM rows; straddling
    reads shrink the granule to the boundary; self-overlapping copies
    (offset < granule) use log-doubling period fills (coopCopyRepeat)

State machine (lax.while_loop): each iteration either parses the next
sequence (scalar) or moves one granule of pending literal/match bytes
(vector), so all loop-body work is statically bounded.  Corruption checks
mirror codecs/lz4.py _delimit (OOB literals/offsets/extension bytes,
output-capacity overflow) and produce per-chunk statuses without crashing
(reference OOB_CHECKING, src/LZ4Kernels.hiph:1004-1096).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.core.types import Status

ROWB = 512  # bytes per row ([1, 128] u32)
ROWW = 128  # words per row
HEAD = 8  # head rows: HEAD-1 rows of recent history + the write row
# (8 keeps the head tile sublane-aligned: Mosaic's tpu.dynamic_rotate on
# the sublane axis rejects tiles narrower than one vreg)


def _cdiv(a, b):
    return -(-a // b)


def _rup(x, m):
    return (x + m - 1) // m * m


def _li(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)


def _si(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _u(x):
    return x.astype(jnp.uint32)


def _words_at(get_row, k):
    """[1, 128] u32 row of consecutive words k .. k+127 (k traced >= 0).

    ``get_row(r)`` must return word row r as [1, 128] u32 (clamped OOR)."""
    r = k // ROWW
    lw = k - r * ROWW
    a = get_row(r)
    b = get_row(r + 1)
    # result[j] = words[k + j]: lane j+lw of row r while j < 128-lw, else b
    ra = pltpu.roll(a, (-lw) % ROWW, axis=1)
    rb = pltpu.roll(b, (-lw) % ROWW, axis=1)
    return jnp.where(_li((1, ROWW)) < ROWW - lw, ra, rb)


def _read512(get_row, src):
    """[1, 128] u32 whose stream byte j (LE within words) is source byte
    src + j, for j in [0, 512); byte 511 may be short by the alignment
    carry (callers never use bytes >= their granule)."""
    k = src >> 2
    w0 = _words_at(get_row, k)
    w1 = _words_at(get_row, k + 1)
    b0 = _u(src & 3)
    sh = 8 * b0
    return jnp.where(sh > 0, (_u(w0) >> sh) | (_u(w1) << (32 - sh)), _u(w0))


def _shift_bytes_right(row, k):
    """Byte-stream right shift of [1,128] u32: result byte j+k = byte j,
    bytes < k zero.  k traced in [0, 512)."""
    kw = k >> 2
    kb = _u(k & 3)
    li = _li((1, ROWW))
    r = pltpu.roll(row, kw % ROWW, axis=1)
    r = jnp.where(li >= kw, _u(r), 0)
    rp = pltpu.roll(row, (kw + 1) % ROWW, axis=1)
    rp = jnp.where(li >= kw + 1, _u(rp), 0)
    sh = 8 * kb
    return jnp.where(sh > 0, (r << sh) | (rp >> (32 - sh)), r)


def _byte_mask_row(lo, n):
    """[1,128] u32 mask with stream bytes [lo, lo+n) set (LE byte order)."""
    li = _li((1, ROWW))
    b0 = li * 4
    a = jnp.clip(lo - b0, 0, 4)
    b = jnp.clip(lo + n - b0, 0, 4)
    nb = b - a
    m = jnp.where(
        nb >= 4,
        jnp.uint32(0xFFFFFFFF),
        ((jnp.uint32(1) << (8 * _u(nb))) - 1) << (8 * _u(a)),
    )
    return jnp.where(nb > 0, m, jnp.uint32(0))


def _period_fill(row, period):
    """Fill a [1,128] u32 row (bytes >= ``period`` zero) with its first
    ``period`` bytes repeated.  period traced >= 1."""
    filled = period
    for _ in range(9):  # 2^9 = 512
        sh = _shift_bytes_right(row, jnp.minimum(filled, 511))
        row = row | jnp.where(filled < ROWB, sh, jnp.uint32(0))
        filled = filled * 2
    return row


def _head_row(head, r):
    """Row r (traced) of the head value tile as [1,128] u32."""
    rolled = pltpu.roll(head, (-r) % HEAD, axis=0)
    return rolled[0:1, :]


# ---------------------------------------------------------------------------


def _lz4_decode_kernel(
    rc: int, ro: int, out_cap: int, size_ref, wv_ref, out_ref, ws_ref, sem
):
    comp_len = size_ref[pl.program_id(0)]
    nsw = rc * ROWW  # SMEM words available

    # stage the stream into SMEM for the scalar parser (one DMA; the
    # reference's BufferControl window is unnecessary at this size)
    cp = pltpu.make_async_copy(wv_ref.at[0], ws_ref, sem)
    cp.start()
    cp.wait()

    def byte_at(q):
        qc = jnp.clip(q, 0, nsw * 4 - 1) >> 2
        w = ws_ref[qc >> 7, qc & (ROWW - 1)]
        return (w >> (8 * (q & 3))) & 0xFF

    def vmem_row(ref, rows):
        def get(r):
            return _u(ref[0, pl.ds(jnp.clip(r, 0, rows - 1), 1), :])

        return get

    # carry: p, o, rem_lit, lit_src, rem_m, m_off, last_seen, ok, head, head_lo
    # head holds bytes [head_lo, head_lo + HEAD*ROWB); write row is the last:
    # row_start = head_lo + (HEAD-1)*ROWB <= o < row_start + ROWB.
    def cond(c):
        p, o, rem_lit, lit_src, rem_m, m_off, last_seen, ok, head, head_lo = c
        return ok & ((rem_lit > 0) | (rem_m > 0) | ~last_seen)

    def body(c):
        p, o, rem_lit, lit_src, rem_m, m_off, last_seen, ok, head, head_lo = c
        no_pending = (rem_lit == 0) & (rem_m == 0)

        # ---- a) parse next sequence (scalar core) ------------------------
        def lsic(q0):
            def w_cond(s):
                q, acc = s
                return (byte_at(q) == 255) & (q < comp_len)

            def w_body(s):
                q, acc = s
                return q + 1, acc + 255

            q, acc = jax.lax.while_loop(w_cond, w_body, (q0, 0))
            return q + 1, acc + byte_at(q)

        def parse():
            token = byte_at(p)
            lnib = token >> 4
            qe, lext = jax.lax.cond(lnib == 15, lambda: lsic(p + 1), lambda: (p + 1, 0))
            llen = jnp.where(lnib == 15, 15 + lext, lnib)
            src = qe
            q = src + llen
            is_last = q >= comp_len
            off = byte_at(q) | (byte_at(q + 1) << 8)
            mnib = token & 15
            qm, mext = jax.lax.cond(
                (mnib == 15) & ~is_last, lambda: lsic(q + 2), lambda: (q + 2, 0)
            )
            mlen = jnp.where(is_last, 0, 4 + jnp.where(mnib == 15, 15 + mext, mnib))
            step_ok = q <= comp_len
            step_ok &= is_last | ((off >= 1) & (off <= o + llen))
            step_ok &= is_last | (qm <= comp_len)
            step_ok &= o + llen + mlen <= out_cap
            p2 = jnp.where(is_last, comp_len, qm)
            return p2, llen, src, mlen, off, is_last, step_ok

        p2, nl, nls, nm, noff, nlast, pok = jax.lax.cond(
            no_pending,
            parse,
            lambda: (p, rem_lit, lit_src, rem_m, m_off, last_seen, ok),
        )
        rem_lit = jnp.where(no_pending, nl, rem_lit)
        lit_src = jnp.where(no_pending, nls, lit_src)
        rem_m = jnp.where(no_pending, nm, rem_m)
        m_off = jnp.where(no_pending, noff, m_off)
        last_seen = jnp.where(no_pending, nlast | last_seen, last_seen)
        ok = ok & pok

        # ---- b) move one granule (VPU) ------------------------------------
        row_start = head_lo + (HEAD - 1) * ROWB
        h = o - row_start  # write offset in the head's last row, [0, ROWB)
        space = ROWB - h

        do_lit = rem_lit > 0
        gmax = jnp.where(do_lit, rem_lit, rem_m)
        g = jnp.minimum(gmax, space)
        src = jnp.where(do_lit, lit_src, o - m_off)
        # match reads from head when src >= head_lo, else from flushed VMEM
        # rows; shrink granule to the head_lo boundary if it would straddle
        from_head = ~do_lit & (src >= head_lo)
        g = jnp.where(
            ~do_lit & (src < head_lo) & (src + g > head_lo), head_lo - src, g
        )
        g = jnp.where(ok & (g > 0), g, 0)

        def read_lit():
            return _read512(vmem_row(wv_ref, rc), src)

        def read_hist():
            def from_h():
                return _read512(lambda r: _head_row(head, jnp.clip(r, 0, HEAD - 1)), src - head_lo)

            def from_v():
                return _read512(vmem_row(out_ref, ro), jnp.maximum(src, 0))

            v = jax.lax.cond(from_head, from_h, from_v)
            per = jnp.minimum(m_off, ROWB)

            def fill():
                vz = v & _byte_mask_row(0, per)
                return _period_fill(vz, per)

            return jax.lax.cond(m_off < ROWB, fill, lambda: v)

        v = jax.lax.cond(do_lit, read_lit, read_hist)

        # splice bytes [0, g) of v into the head's last row at byte h
        lastrow = _head_row(head, HEAD - 1)
        placed = _shift_bytes_right(v, h)
        m = _byte_mask_row(h, g)
        newrow = (lastrow & ~m) | (placed & m)
        head = jnp.where(_si((HEAD, ROWW)) == HEAD - 1, newrow, head)

        o = o + g
        rem_lit = jnp.where(do_lit, rem_lit - g, rem_lit)
        lit_src = jnp.where(do_lit, lit_src + g, lit_src)
        rem_m = jnp.where(do_lit, rem_m, rem_m - g)

        # ---- c) flush a completed row -------------------------------------
        def flush(args):
            head, head_lo = args
            r = (head_lo + (HEAD - 1) * ROWB) // ROWB

            @pl.when((r >= 0) & (r < ro))
            def _():
                out_ref[0, pl.ds(r, 1), :] = _head_row(head, HEAD - 1).astype(jnp.uint32)

            head = pltpu.roll(head, -1 % HEAD, axis=0)  # discard oldest row
            head = jnp.where(_si((HEAD, ROWW)) == HEAD - 1, jnp.uint32(0), head)
            return head, head_lo + ROWB

        head, head_lo = jax.lax.cond(
            o - row_start >= ROWB, lambda: flush((head, head_lo)), lambda: (head, head_lo)
        )

        return (p2, o, rem_lit, lit_src, rem_m, m_off, last_seen, ok, head, head_lo)

    init = (
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        jnp.int32(0),
        comp_len <= 0,
        comp_len >= 0,
        jnp.zeros((HEAD, ROWW), jnp.uint32),
        jnp.int32(-(HEAD - 1) * ROWB),
    )
    p, o, _, _, _, _, _, ok, head, head_lo = jax.lax.while_loop(cond, body, init)

    # final flush of the partial write row
    r = (head_lo + (HEAD - 1) * ROWB) // ROWB

    @pl.when(ok & (o > head_lo + (HEAD - 1) * ROWB) & (r >= 0) & (r < ro))
    def _():
        out_ref[0, pl.ds(r, 1), :] = _head_row(head, HEAD - 1).astype(jnp.uint32)

    # length and status ride an extra trailing row of the output tile
    li = _li((1, ROWW))
    lengths = jnp.where(ok, o, 0)
    status = jnp.where(ok, int(Status.SUCCESS), int(Status.ERROR_CANNOT_DECOMPRESS))
    resrow = jnp.where(li == 0, lengths, jnp.where(li == 1, status, 0))
    out_ref[0, ro : ro + 1, :] = _u(resrow)


# ---------------------------------------------------------------------------
# XLA-side wrapper


def supports_decode(out_capacity: int) -> bool:
    return out_capacity >= 1


@functools.partial(jax.jit, static_argnames=("out_capacity", "interpret"))
def decompress(comp, comp_sizes, out_capacity: int, interpret: bool = False):
    """Batched LZ4 decompression on the Pallas path.

    comp: uint8[B, CMAX]; comp_sizes: int32[B].  Returns (data uint8[B,
    out_capacity], lengths int32[B], statuses int32[B]) matching
    codecs/lz4.py decompress.
    """
    from tpucomp.utils import bits

    b, cmax = comp.shape
    # row counts padded to 8 sublanes: an unaligned-sublane VMEM->SMEM DMA
    # hard-faults the TPU worker (observed at rc=49/129; rc=40 fine)
    rc = _rup(_cdiv(cmax, ROWB), 8)
    ro = _cdiv(out_capacity, ROWB)
    pad = rc * ROWB - cmax
    cw = comp
    if pad:
        cw = jnp.concatenate([comp, jnp.zeros((b, pad), jnp.uint8)], axis=1)
    wv = bits.bytes_to_units_le(cw, 4).astype(jnp.int32).reshape(b, rc, ROWW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rc, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _rup(ro + 1, 8), ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SMEM((rc, ROWW), jnp.int32), pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        functools.partial(_lz4_decode_kernel, rc, ro, out_capacity),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, _rup(ro + 1, 8), ROWW), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(comp_sizes.astype(jnp.int32), wv)

    lengths = out[:, ro, 0].astype(jnp.int32)
    statuses = out[:, ro, 1].astype(jnp.int32)
    data = bits.units_to_bytes_le(out[:, :ro].reshape(b, ro * ROWW))[:, :out_capacity]
    pos = jnp.arange(out_capacity, dtype=jnp.int32)[None, :]
    good = (statuses == int(Status.SUCCESS))[:, None] & (pos < lengths[:, None])
    data = jnp.where(good, data, 0).astype(jnp.uint8)
    return data, lengths, statuses
