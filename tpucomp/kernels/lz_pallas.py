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

            q, acc = jax.lax.while_loop(w_cond, w_body, (q0, jnp.int32(0)))
            return jnp.asarray(q + 1, jnp.int32), jnp.asarray(acc + byte_at(q), jnp.int32)

        def parse():
            token = byte_at(p)
            lnib = token >> 4
            qe, lext = jax.lax.cond(
                lnib == 15,
                lambda: lsic(p + 1),
                lambda: (jnp.asarray(p + 1, jnp.int32), jnp.int32(0)),
            )
            llen = jnp.where(lnib == 15, 15 + lext, lnib)
            src = qe
            q = src + llen
            is_last = q >= comp_len
            off = byte_at(q) | (byte_at(q + 1) << 8)
            mnib = token & 15
            qm, mext = jax.lax.cond(
                (mnib == 15) & ~is_last,
                lambda: lsic(q + 2),
                lambda: (jnp.asarray(q + 2, jnp.int32), jnp.int32(0)),
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


# ===========================================================================
# LZ4 compression
#
# TPU-native counterpart of the reference's warp-cooperative compressor
# (compressStream, reference src/LZ4Kernels.hiph:794-969).  Match *finding*
# stays in XLA as the exact nearest-previous-occurrence kv-sort (31 ms for
# 8 MB -- tpucomp/codecs/lz77.py nearest_prev_occurrence, the collision-free
# ideal of the reference's 2^14 hash table :557-561); the kernel replaces
# the gather-bound dense LCP walk / parse / emit stages (3.5 s + 0.5 s +
# 0.6 s for 8 MB) with a per-chunk sequential state machine:
#
#   - greedy parse over SMEM sliding windows of the candidate tables
#     (next-match-position, offset), refilled by forward-only DMA -- the
#     scalar-core form of the reference's hash probe loop
#   - exact unbounded match extension by 512-byte VPU compares of the
#     source data (lengthOfMatch, reference :592-617)
#   - stream emission through the same head-register splice machinery as
#     decompression (token/LSIC header and offset/LSIC tail vectors are
#     constructed arithmetically per iteration)
#
# The output is the pure greedy parse with exact extension -- byte-identical
# to the uncapped sequential oracle (tests/oracles/lz4_oracle.py), and never
# larger than the XLA path's block-clamped parse.

_SENT = 1 << 30  # "no further match" sentinel in the nmp table
WIN = 4096  # candidate-table window entries (32 rows of 128)
WINR = 32


def _shift_bytes_left(row, k):
    """Byte-stream left shift of [1,128] u32: result byte j = byte j+k."""
    kw = k >> 2
    kb = _u(k & 3)
    li = _li((1, ROWW))
    r = pltpu.roll(row, (-kw) % ROWW, axis=1)
    r = jnp.where(li < ROWW - kw, _u(r), 0)
    rp = pltpu.roll(row, (-(kw + 1)) % ROWW, axis=1)
    rp = jnp.where(li < ROWW - (kw + 1), _u(rp), 0)
    sh = 8 * kb
    return jnp.where(sh > 0, (r >> sh) | (rp << (32 - sh)), r)


def _lsic_nb(v):
    """LSIC extension byte count for a length field value v (v >= 0)."""
    return jnp.where(v >= 15, (v - 15) // 255 + 1, 0)


def _lsic_vec(first_bytes, v, total_len):
    """[1,128] u32 byte stream: ``first_bytes`` literal bytes (list of
    scalars), then the LSIC encoding of v (if v >= 15): (nb-1) 0xFF bytes
    and a remainder byte.  total_len = len(first_bytes) + nb."""
    nf = len(first_bytes)
    nb = total_len - nf
    rem = v - 15 - 255 * (nb - 1)
    li = _li((1, ROWW))
    words = jnp.zeros((1, ROWW), jnp.int32)
    for t in range(4):
        bidx = li * 4 + t
        bv = jnp.zeros((1, ROWW), jnp.int32)
        for fi, fb in enumerate(first_bytes):
            bv = jnp.where(bidx == fi, fb & 0xFF, bv)
        is_ext = (bidx >= nf) & (bidx < nf + nb)
        bv = jnp.where(is_ext, jnp.where(bidx == nf + nb - 1, rem & 0xFF, 255), bv)
        words = words | (bv << (8 * t))
    return _u(words)


def _first_diff(a, b):
    """Index of the first differing byte of two [1,128] u32 byte streams
    (512 if equal).  One lane min-fold."""
    x = a ^ b
    li = _li((1, ROWW))
    lmin = jnp.min(jnp.where(x != 0, li, ROWW))
    # signed sum: Mosaic has no unsigned reductions
    w = _u(jnp.sum(jnp.where(li == jnp.minimum(lmin, ROWW - 1), x, 0).astype(jnp.int32)))
    bidx = (
        jnp.where((w & 0xFF) == 0, 1, 0)
        + jnp.where((w & 0xFFFF) == 0, 1, 0)
        + jnp.where((w & 0xFFFFFF) == 0, 1, 0)
    )
    return jnp.where(lmin >= ROWW, 512, lmin * 4 + bidx.astype(jnp.int32))


def _lz4_encode_kernel(
    rd: int, rt: int, ro: int, size_ref, wv_ref, nmp_ref, dist_ref,
    out_ref, wnmp_ref, wdist_ref, sems
):
    n = size_ref[pl.program_id(0)]
    data_row = None

    def vrow(ref, rows):
        def get(r):
            return _u(ref[0, pl.ds(jnp.clip(r, 0, rows - 1), 1), :])

        return get

    read_data = lambda src: _read512(vrow(wv_ref, rd), jnp.maximum(src, 0))

    # carry: p(anchor), o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
    #        ext_on, is_final, done, head, head_lo, win_base
    def cond(c):
        return ~c[11]

    def body(c):
        (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
         ext_on, is_final, done, head, head_lo, win_base) = c

        # ---- extension branch --------------------------------------------
        def ext_branch():
            a = read_data(q + mlen)
            b = read_data(q + mlen - off)
            d = _first_diff(a, b)
            limit = n - 5 - q
            m2 = jnp.minimum(mlen + d, limit)
            still = (d >= 512) & (m2 < limit)
            # on completion, stage the header emission
            llen2 = q - p
            hdr2 = 1 + _lsic_nb(llen2)
            tail2 = 2 + _lsic_nb(m2 - 4)
            i32 = lambda v: jnp.asarray(v, jnp.int32)
            return (
                i32(m2),
                i32(jnp.where(still, llen, llen2)),
                i32(jnp.where(still, hdr_rem, hdr2)),
                i32(jnp.where(still, lit_rem, llen2)),
                i32(jnp.where(still, tail_rem, tail2)),
                jnp.asarray(still, jnp.bool_),
            )

        def no_ext():
            i32 = lambda v: jnp.asarray(v, jnp.int32)
            return (
                i32(mlen), i32(llen), i32(hdr_rem), i32(lit_rem), i32(tail_rem),
                jnp.asarray(ext_on, jnp.bool_),
            )

        mlen, llen, hdr_rem, lit_rem, tail_rem, ext_on = jax.lax.cond(
            ext_on & ~done, ext_branch, no_ext
        )

        # ---- parse branch (idle: nothing pending) -------------------------
        idle = ~ext_on & (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0) & ~done

        def refill(base):
            r0 = jnp.clip(base >> 7, 0, rt - WINR)
            cp1 = pltpu.make_async_copy(
                nmp_ref.at[0, pl.ds(r0, WINR), :], wnmp_ref, sems.at[0]
            )
            cp2 = pltpu.make_async_copy(
                dist_ref.at[0, pl.ds(r0, WINR), :], wdist_ref, sems.at[1]
            )
            cp1.start()
            cp2.start()
            cp1.wait()
            cp2.wait()
            return r0 * 128

        def win_at(ref, base, x):
            e = jnp.clip(x - base, 0, WIN - 1)
            return ref[e >> 7, e & (ROWW - 1)]

        def parse(args):
            head, win_base = args

            def ensure(base, x):
                need = (base < 0) | (x >= base + WIN) | (x < base)
                return jax.lax.cond(
                    need,
                    lambda: jnp.asarray(refill(x & ~1023), jnp.int32),
                    lambda: jnp.asarray(base, jnp.int32),
                )

            wb = ensure(win_base, p)
            q2 = win_at(wnmp_ref, wb, p)
            fin = q2 >= jnp.minimum(_SENT, n - 12)
            q2c = jnp.where(fin, n, q2)
            wb = jax.lax.cond(fin, lambda: wb, lambda: ensure(wb, q2c))
            off2 = jnp.where(fin, 1, win_at(wdist_ref, wb, q2c))
            # final: emit the tail literal run [p, n)
            lf = n - p
            hdrf = 1 + _lsic_nb(lf)
            i32 = lambda v: jnp.asarray(v, jnp.int32)
            return (
                i32(q2c),
                i32(off2),
                i32(jnp.where(fin, 0, 4)),
                i32(jnp.where(fin, lf, llen)),
                i32(jnp.where(fin, hdrf, hdr_rem)),
                i32(jnp.where(fin, lf, lit_rem)),
                i32(tail_rem),
                jnp.asarray(~fin, jnp.bool_),
                jnp.asarray(fin, jnp.bool_),
                i32(wb),
            )

        def no_parse(args):
            i32 = lambda v: jnp.asarray(v, jnp.int32)
            return (
                i32(q), i32(off), i32(mlen), i32(llen), i32(hdr_rem),
                i32(lit_rem), i32(tail_rem), jnp.asarray(ext_on, jnp.bool_),
                jnp.asarray(is_final, jnp.bool_), i32(args[1]),
            )

        q, off, mlen, llen, hdr_rem, lit_rem, tail_rem, ext_on, is_final, win_base = (
            jax.lax.cond(idle, parse, no_parse, (head, win_base))
        )

        # ---- emission: one granule from header / literals / tail ----------
        row_start = head_lo + (HEAD - 1) * ROWB
        h = o - row_start
        space = ROWB - h

        do_hdr = hdr_rem > 0
        do_lit = ~do_hdr & (lit_rem > 0)
        do_tail = ~do_hdr & ~do_lit & (tail_rem > 0)

        def hdr_vec():
            tok_m = jnp.where(is_final, 0, jnp.minimum(mlen - 4, 15))
            token = (jnp.minimum(llen, 15) << 4) | tok_m
            hl = 1 + _lsic_nb(llen)
            v = _lsic_vec([token], llen, hl)
            return _shift_bytes_left(v, hl - hdr_rem), jnp.asarray(hdr_rem, jnp.int32)

        def tail_vec():
            tl = 2 + _lsic_nb(mlen - 4)
            v = _lsic_vec([off & 0xFF, (off >> 8) & 0xFF], mlen - 4, tl)
            return _shift_bytes_left(v, tl - tail_rem), jnp.asarray(tail_rem, jnp.int32)

        def lit_vec():
            src = p + (llen - lit_rem)
            return read_data(src), jnp.asarray(lit_rem, jnp.int32)

        v, rem = jax.lax.cond(
            do_hdr, hdr_vec, lambda: jax.lax.cond(do_lit, lit_vec, tail_vec)
        )
        g = jnp.minimum(jnp.minimum(rem, space), ROWB)
        emitting = (do_hdr | do_lit | do_tail) & ~done & ~ext_on
        g = jnp.where(emitting, g, 0)

        lastrow = _head_row(head, HEAD - 1)
        placed = _shift_bytes_right(v, h)
        m = _byte_mask_row(h, g)
        newrow = (lastrow & ~m) | (placed & m)
        head = jnp.where(_si((HEAD, ROWW)) == HEAD - 1, newrow, head)
        o = o + g

        hdr_rem = jnp.where(emitting & do_hdr, hdr_rem - g, hdr_rem)
        lit_rem = jnp.where(emitting & do_lit, lit_rem - g, lit_rem)
        tail_rem = jnp.where(emitting & do_tail, tail_rem - g, tail_rem)

        # sequence completion
        seq_done = emitting & ~do_hdr & (lit_rem == 0) & (
            (do_tail & (tail_rem == 0)) | (is_final & do_lit) | (is_final & (llen == 0))
        )
        # a final sequence with llen == 0 still finishes after its header
        fin_hdr_only = emitting & do_hdr & (hdr_rem == 0) & is_final & (llen == 0)
        done = done | (seq_done & is_final) | fin_hdr_only
        p = jnp.where(seq_done & ~is_final, q + mlen, p)

        # ---- flush a completed row ----------------------------------------
        def flush(args):
            head, head_lo = args
            r = (head_lo + (HEAD - 1) * ROWB) // ROWB

            @pl.when((r >= 0) & (r < ro))
            def _():
                out_ref[0, pl.ds(r, 1), :] = _head_row(head, HEAD - 1).astype(jnp.uint32)

            head = pltpu.roll(head, -1 % HEAD, axis=0)
            head = jnp.where(_si((HEAD, ROWW)) == HEAD - 1, jnp.uint32(0), head)
            return head, head_lo + ROWB

        head, head_lo = jax.lax.cond(
            o - row_start >= ROWB, lambda: flush((head, head_lo)), lambda: (head, head_lo)
        )

        return (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
                ext_on, is_final, done, head, head_lo, win_base)

    init = (
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1), jnp.int32(0),
        jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
        jnp.bool_(False), jnp.bool_(False), n <= 0,
        jnp.zeros((HEAD, ROWW), jnp.uint32), jnp.int32(-(HEAD - 1) * ROWB),
        jnp.int32(-1),
    )
    out = jax.lax.while_loop(cond, body, init)
    o, head, head_lo = out[1], out[12], out[13]

    r = (head_lo + (HEAD - 1) * ROWB) // ROWB

    @pl.when((o > head_lo + (HEAD - 1) * ROWB) & (r >= 0) & (r < ro))
    def _():
        out_ref[0, pl.ds(r, 1), :] = _head_row(head, HEAD - 1).astype(jnp.uint32)

    li = _li((1, ROWW))
    out_ref[0, ro : ro + 1, :] = _u(jnp.where(li == 0, o, 0))


def supports_compress(capacity: int) -> bool:
    return capacity >= 1


@functools.partial(jax.jit, static_argnames=("stride", "interpret"))
def compress(data, lengths, stride: int = 1, interpret: bool = False):
    """Batched LZ4 compression on the Pallas path.

    data: uint8[B, C]; lengths: int32[B].  Returns (comp uint8[B, CMAX],
    comp_sizes int32[B]); streams are the pure greedy parse with exact
    nearest-previous-occurrence matches (== the uncapped sequential oracle).
    """
    from tpucomp.codecs import lz77
    from tpucomp.core.sizing import lz4_max_compressed_chunk_size
    from tpucomp.utils import bits

    b, c = data.shape
    lengths = lengths.astype(jnp.int32)
    out_max = lz4_max_compressed_chunk_size(c)
    ro = _cdiv(out_max, ROWB)
    rd = _rup(_cdiv(c, ROWB), 8)

    # exact nearest-previous-occurrence candidate tables (XLA sorts)
    def tables(d, nn):
        i = jnp.arange(c, dtype=jnp.int32)
        j = lz77.nearest_prev_occurrence(d, nn, stride)
        dist = i - j
        cand = (j >= 0) & (dist <= 65535) & (i <= nn - 13)
        nmp = jax.lax.cummin(
            jnp.where(cand, i, jnp.int32(_SENT)), axis=0, reverse=True
        )
        return nmp, dist

    nmp, dist = jax.vmap(tables)(data, lengths)

    rt = _rup(_cdiv(c, ROWW), 8)
    rt = max(rt, WINR)

    def pad_tbl(t, fill):
        padn = rt * ROWW - c
        if padn:
            t = jnp.concatenate([t, jnp.full((b, padn), fill, jnp.int32)], axis=1)
        return t.reshape(b, rt, ROWW)

    nmp_t = pad_tbl(nmp, _SENT)
    dist_t = pad_tbl(dist, 1)

    padd = rd * ROWB - c
    dd = data
    if padd:
        dd = jnp.concatenate([data, jnp.zeros((b, padd), jnp.uint8)], axis=1)
    wv = bits.bytes_to_units_le(dd, 4).astype(jnp.int32).reshape(b, rd, ROWW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rd, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rt, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _rup(ro + 1, 8), ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((WINR, ROWW), jnp.int32),
            pltpu.SMEM((WINR, ROWW), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_lz4_encode_kernel, rd, rt, ro),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, _rup(ro + 1, 8), ROWW), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
    )(lengths, wv, nmp_t, dist_t)

    sizes = out[:, ro, 0].astype(jnp.int32)
    comp = bits.units_to_bytes_le(out[:, :ro].reshape(b, ro * ROWW))[:, :out_max]
    pos = jnp.arange(out_max, dtype=jnp.int32)[None, :]
    comp = jnp.where(pos < sizes[:, None], comp, 0).astype(jnp.uint8)
    return comp, sizes
