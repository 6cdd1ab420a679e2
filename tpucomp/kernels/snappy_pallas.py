"""Snappy decompression as a Pallas TPU kernel.

TPU-native counterpart of the reference's 3-warp pipelined decompressor
(do_unsnap, reference src/snappy/decompression.hiph:195-213; tag-byte
classification src/snappy/symbol.hiph:75-209; varint size decode
src/lowlevel/SnappyBatchKernels.hip:84-134), built on the same v3
machinery as the LZ4 kernel (kernels/lz_pallas.py): K chunks per grid
cell advanced by one branch-free interleaved loop, SMEM-staged scalar
parse, direct 16-row read-modify-write output granules with extent
doubling for self-overlapping copies.

Snappy's element grammar is simpler than LZ4's (no 255-run length
chains), so the parse is entirely branch-free: a tag byte plus up to
four extra bytes read by the scalar core classify literal / copy1 /
copy2 / copy4 and yield (length, offset, advance) with selects only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpucomp.core.types import Status
from tpucomp.kernels.lz_pallas import (
    LEAD,
    ROWB,
    ROWW,
    TB,
    _cdiv,
    _granule_mover,
    _li,
    _rup,
    _u,
)


def _snappy_decode_kernel(
    rc: int, rw: int, rt: int, r_res: int, out_cap: int, K: int,
    size_ref, in_ref, uv_ref, ws_ref, sem
):
    """See kernels/lz_pallas.py _lz4_decode_kernel for the v4 design rules
    (one aliased unified stream|output buffer per chunk, single window read
    per granule move); this kernel only swaps the parse step for snappy's
    element grammar (codecs/snappy.py _delimit is the validated XLA
    formulation it mirrors)."""
    nsb = rc * ROWB

    cp = pltpu.make_async_copy(uv_ref.at[:, pl.ds(LEAD, rc), :], ws_ref, sem)
    cp.start()
    cp.wait()

    def mk_chunk(k):
        comp_len = size_ref[pl.program_id(0) * K + k]

        def get16u(r0):
            return _u(uv_ref[k, pl.ds(r0, 16), :])

        def byte_at(q):
            qc = jnp.clip(q, 0, nsb - 1) >> 2
            w = ws_ref[k, qc >> 7, qc & (ROWW - 1)]
            return (w >> (8 * (q & 3))) & 0xFF

        move_granule = _granule_mover(k, get16u, uv_ref, rw)

        # varint uncompressed length (1-4 bytes)
        b0, b1, b2, b3 = byte_at(0), byte_at(1), byte_at(2), byte_at(3)
        vlen = jnp.where(b0 < 128, 1, jnp.where(b1 < 128, 2, jnp.where(b2 < 128, 3, 4)))
        n_out = b0 & 0x7F
        n_out = jnp.where(vlen >= 2, n_out | ((b1 & 0x7F) << 7), n_out)
        n_out = jnp.where(vlen >= 3, n_out | ((b2 & 0x7F) << 14), n_out)
        n_out = jnp.where(vlen >= 4, n_out | ((b3 & 0x7F) << 21), n_out)

        def step(c):
            p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok = c
            no_pending = (rem_lit == 0) & (rem_m == 0)
            do_parse = no_pending & ~last_seen & ok

            # ---- a) speculative branch-free parse (scalar chains) --------
            tag = byte_at(p)
            kind = tag & 3
            e1, e2, e3, e4 = byte_at(p + 1), byte_at(p + 2), byte_at(p + 3), byte_at(p + 4)

            lraw = tag >> 2
            lk = jnp.where(lraw < 60, 0, lraw - 59)  # extra length bytes
            lv = jnp.where(
                lk == 0,
                lraw,
                jnp.where(
                    lk == 1,
                    e1,
                    jnp.where(
                        lk == 2,
                        e1 | (e2 << 8),
                        jnp.where(
                            lk == 3,
                            e1 | (e2 << 8) | (e3 << 16),
                            e1 | (e2 << 8) | (e3 << 16) | (e4 << 24),
                        ),
                    ),
                ),
            )
            ll = lv + 1
            nls = p + 1 + lk
            lit_adv = 1 + lk + ll

            c1_len = ((tag >> 2) & 7) + 4
            c1_off = ((tag >> 5) << 8) | e1
            c2_len = (tag >> 2) + 1
            c2_off = e1 | (e2 << 8)
            c4_off = e1 | (e2 << 8) | (e3 << 16) | (e4 << 24)
            ml = jnp.where(kind == 1, c1_len, c2_len)
            off = jnp.where(kind == 1, c1_off, jnp.where(kind == 2, c2_off, c4_off))
            copy_adv = jnp.where(kind == 1, 2, jnp.where(kind == 2, 3, 5))

            is_lit = kind == 0
            adv = jnp.where(is_lit, lit_adv, copy_adv)
            add = jnp.where(is_lit, ll, ml)
            step_ok = p + adv <= comp_len
            step_ok &= is_lit | ((off >= 1) & (off <= o))
            step_ok &= o + add <= out_cap

            p2 = p + adv
            p = jnp.where(do_parse, p2, p)
            rem_lit = jnp.where(do_parse & is_lit, ll, rem_lit)
            lit_src = jnp.where(do_parse & is_lit, nls, lit_src)
            rem_m = jnp.where(do_parse & ~is_lit, ml, rem_m)
            m_ext = jnp.where(do_parse, jnp.maximum(off, 1), m_ext)
            last_seen = last_seen | (do_parse & (p2 >= comp_len))
            ok = ok & (step_ok | ~do_parse)

            # ---- b) two predicated granule moves -------------------------
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            return (p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok)

        init = (
            jnp.asarray(vlen, jnp.int32),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(1),
            (comp_len <= vlen) | (comp_len <= 0),
            comp_len > 0,
        )

        def finalize(c):
            o, ok = c[1], c[7]
            # the expanded byte count must match the varint header
            # (codecs/snappy.py _delimit:257-259)
            ok = ok & (o == n_out) & (n_out <= out_cap)
            li = _li((1, ROWW))
            lengths = jnp.where(ok, o, 0)
            status = jnp.where(
                ok, int(Status.SUCCESS), int(Status.ERROR_CANNOT_DECOMPRESS)
            )
            resrow = jnp.where(li == 0, lengths, jnp.where(li == 1, status, 0))
            uv_ref[k, rw + r_res : rw + r_res + 1, :] = resrow.astype(uv_ref.dtype)

        return init, step, finalize

    chunks = [mk_chunk(k) for k in range(K)]

    def active(c):
        return c[7] & ((c[2] > 0) | (c[4] > 0) | ~c[6])

    def cond(cs):
        a = active(cs[0])
        for c in cs[1:]:
            a = a | active(c)
        return a

    def body(cs):
        return tuple(chunks[k][1](c) for k, c in enumerate(cs))

    finals = jax.lax.while_loop(cond, body, tuple(ch[0] for ch in chunks))
    for k, c in enumerate(finals):
        chunks[k][2](c)


def supports_decode(cmax: int, out_capacity: int) -> bool:
    from tpucomp.kernels.lz_pallas import SMEM_ROWS_BUDGET

    rc = _rup(_cdiv(cmax, ROWB), 8)
    return out_capacity >= 1 and rc <= SMEM_ROWS_BUDGET


@functools.partial(jax.jit, static_argnames=("out_capacity", "interpret", "kpack"))
def decompress(comp, comp_sizes, out_capacity: int, interpret: bool = False,
               kpack: int = 8):
    """Batched snappy decompression on the Pallas path.

    comp: uint8[B, CMAX]; comp_sizes: int32[B].  Returns (data uint8[B,
    out_capacity], lengths int32[B], statuses int32[B]) matching
    codecs/snappy.py decompress."""
    from tpucomp.utils import bits

    from tpucomp.kernels.lz_pallas import SMEM_ROWS_BUDGET

    b, cmax = comp.shape
    rc = _rup(_cdiv(cmax, ROWB), 8)
    # large chunks shrink the interleave so the SMEM staging fits
    K = max(1, min(kpack, b, SMEM_ROWS_BUDGET // rc))
    bp = _rup(b, K)
    rw = LEAD + rc + 32
    ro = _cdiv(out_capacity, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rt = _rup(r_res + 1, 8)
    ru = rw + rt  # unified buffer rows: [stream | output region]
    pad = ru * ROWB - cmax - LEAD * ROWB
    lead = jnp.zeros((b, LEAD * ROWB), jnp.uint8)
    cw = jnp.concatenate([lead, comp, jnp.zeros((b, pad), jnp.uint8)], axis=1)
    sizes = comp_sizes.astype(jnp.int32)
    if bp != b:
        cw = jnp.concatenate([cw, jnp.zeros((bp - b, cw.shape[1]), jnp.uint8)], axis=0)
        sizes = jnp.concatenate([sizes, jnp.zeros((bp - b,), jnp.int32)])
    uv = bits.bytes_to_units_le(cw, 4).astype(jnp.int32).reshape(bp, ru, ROWW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // K,),
        in_specs=[
            pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.SMEM((K, rc, ROWW), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_snappy_decode_kernel, rc, rw, rt, r_res, out_capacity, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, ru, ROWW), jnp.int32),
        interpret=interpret,
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(sizes, uv)

    out = out[:b]
    lengths = out[:, rw + r_res, 0].astype(jnp.int32)
    statuses = out[:, rw + r_res, 1].astype(jnp.int32)
    data = bits.units_to_bytes_le(
        out[:, rw + LEAD : rw + LEAD + ro].astype(jnp.uint32).reshape(b, ro * ROWW)
    )[:, :out_capacity]
    pos = jnp.arange(out_capacity, dtype=jnp.int32)[None, :]
    good = (statuses == int(Status.SUCCESS))[:, None] & (pos < lengths[:, None])
    data = jnp.where(good, data, 0).astype(jnp.uint8)
    return data, lengths, statuses


# ===========================================================================
# Snappy compression
#
# TPU-native counterpart of the reference's warp-cooperative compressor
# (do_snap, reference src/snappy/compression.hiph:281-389; match finding
# FindFourByteMatch :191 with a 2^12 shared-memory hash map, Match60
# extension :252, StoreLiterals :74 / StoreCopy :129 emission).  Same v3/v5
# architecture as the LZ4 encoder (kernels/lz_pallas.py): match *finding*
# stays in XLA as the exact nearest-previous-occurrence kv-sort bounded to
# snappy's 32768-byte window (the collision-free ideal of the reference's
# hash map); the kernel runs K interleaved per-chunk greedy parse +
# extension + emission state machines.  Streams are byte-identical to the
# pure-greedy sequential oracle (tests/oracles/snappy_oracle.py
# snappy_compress_oracle): literal headers, the 64-byte copy splitting of
# _emit_copies (64-piece runs, a 60-piece to keep the remainder >= 4, and
# a final copy1 when len <= 11 and offset < 2048, else copy2), and the
# leading varint.

from tpucomp.core.sizing import snappy_max_compressed_chunk_size
from tpucomp.kernels.lz_pallas import (
    GMOVE,
    WINR,
    _SENT,
    _byte_mask_tile,
    _extract_word,
    _first_diff_tile,
    _fwi,
    _read_win,
    _si,
)


def _div3(x):
    """Exact x // 3 for 0 <= x < 2^24 (two-step: 4096 = 3*1365 + 1, so
    x = 4096 hi + lo gives x//3 = 1365 hi + (hi + lo)//3 with
    hi + lo < 12288, where the 21846 = ceil(2^16/3) trick is exact)."""
    hi = x >> 12
    lo = x & 4095
    return 1365 * hi + (((hi + lo) * 21846) >> 16)


def _snp_lit_hdr_tile(h, bi0, llen, hl):
    """(8,128) u32 tile carrying a snappy literal header at flat bytes
    [h, ...): byte with field index bi (= flat_byte - h + bi0) takes the
    tag at bi==0 (1-byte form (llen-1)<<2 when hl==1, else the 60/61/62
    multi-byte tags), then little-endian (llen-1) bytes (up to 3: literal
    runs reach the chunk size, 2^24 covers 16 MB chunks).  Pure selects."""
    v = llen - 1
    fwi = _fwi((8, ROWW))
    words = jnp.zeros((8, ROWW), jnp.int32)
    for t in range(4):
        bi = (fwi * 4 + t) - h + bi0
        tag = jnp.where(
            hl == 1, v << 2,
            jnp.where(hl == 2, 60 << 2, jnp.where(hl == 3, 61 << 2, 62 << 2)),
        )
        b = jnp.where(
            bi == 0,
            tag,
            jnp.where(
                bi == 1, v & 0xFF, jnp.where(bi == 2, (v >> 8) & 0xFF, (v >> 16) & 0xFF)
            ),
        )
        words = words | ((b & 0xFF) << (8 * t))
    return _u(words)


def _snp_tail_tile(h, bi0, off, n68, has60, m2, fin1):
    """(8,128) u32 tile carrying a snappy copy-element run at flat bytes
    [h, ...): ``n68`` copy2(64) elements, ``has60`` copy2(60) elements,
    then a final copy1 (when ``fin1``) or copy2 of ``m2`` bytes -- the
    exact split of snappy_compress_oracle._emit_copies.  Byte with
    element-stream index bi = flat_byte - h + bi0.  Pure selects."""
    ne = n68 + has60
    off_lo = off & 0xFF
    off_hi = (off >> 8) & 0xFF
    c1b0 = 1 | ((m2 - 4) << 2) | ((off >> 8) << 5)
    c2b0 = ((m2 - 1) << 2) | 2
    fwi = _fwi((8, ROWW))
    words = jnp.zeros((8, ROWW), jnp.int32)
    for t in range(4):
        bi = (fwi * 4 + t) - h + bi0
        bic = jnp.clip(bi, 0, (1 << 24) - 1)
        e = _div3(bic)
        r = bic - 3 * e
        tag = jnp.where(e < n68, (63 << 2) | 2, (59 << 2) | 2)
        run_b = jnp.where(r == 0, tag, jnp.where(r == 1, off_lo, off_hi))
        fi = bi - 3 * ne
        fin_b = jnp.where(
            fin1,
            jnp.where(fi == 0, c1b0, off_lo),
            jnp.where(fi == 0, c2b0, jnp.where(fi == 1, off_lo, off_hi)),
        )
        b = jnp.where(bi < 3 * ne, run_b, fin_b)
        words = words | ((b & 0xFF) << (8 * t))
    return _u(words)


def _snappy_encode_kernel(
    rd: int, rt: int, ro: int, r_res: int, K: int, merged: bool,
    size_ref, wv_ref, nmp_ref, *rest
):
    # merged: nmp_ref packs (position << 16) | distance (one dependent
    # table extract per sequence; see lz_pallas for the measured rationale)
    dist_ref = None if merged else rest[0]
    out_ref = rest[-1]
    """K chunks encode per grid cell through one branch-free interleaved
    loop -- the snappy twin of lz_pallas._lz4_encode_kernel (see its
    docstring for the design rules).  Differences: snappy has no end
    rules (matches may run to the last byte, candidates need only
    p + 4 <= n), literal headers may be absent (llen == 0), the match
    tail is the _emit_copies element run, and the stream opens with a
    varint of the uncompressed length (written in finalize; emission
    starts at o = varint_len)."""

    GM = GMOVE

    def mk_chunk(k):
        n = size_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(wv_ref[k, pl.ds(r0, 16), :])

        def tbl_at(ref, x):
            e = jnp.clip(x, 0, rt * ROWW - 1)
            return _extract_word(
                lambda r: ref[k, pl.ds(jnp.clip(r, 0, rt - 1), 1), :], e
            )

        vl = 1 + (n >= 128) + (n >= 1 << 14) + (n >= 1 << 21)

        def tail_params(mlen, off):
            n68 = jnp.where(mlen >= 68, (mlen - 4) >> 6, 0)
            m1 = mlen - 64 * n68
            has60 = (m1 > 64).astype(jnp.int32)
            m2 = m1 - 60 * has60
            fin1 = (m2 <= 11) & (off < 2048)
            tl = jnp.where(
                mlen > 0, 3 * (n68 + has60) + jnp.where(fin1, 2, 3), 0
            )
            return n68, has60, m2, fin1, tl

        def hdr_len(llen):
            return jnp.where(
                llen <= 0,
                0,
                jnp.where(
                    llen <= 60,
                    1,
                    jnp.where(llen <= 256, 2, jnp.where(llen <= 65536, 3, 4)),
                ),
            )

        # carry: p(anchor), o, q, off, mlen, llen, hdr_rem, lit_rem,
        #        tail_rem, ext_on, is_final, done
        def step(c):
            (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
             ext_on, is_final, done) = c

            # ---- a) speculative parse (table extracts; commit by select) --
            idle = (
                ~ext_on & (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0)
                & ~done
            )
            if merged:
                v = tbl_at(nmp_ref, p)
                q2 = (v >> 16) & 0xFFFF
                fin = q2 >= jnp.minimum(_SENT, n - 3)
                q2c = jnp.where(fin, n, q2)
                off2 = jnp.where(fin, 1, v & 0xFFFF)
            else:
                q2 = tbl_at(nmp_ref, p)
                fin = q2 >= jnp.minimum(_SENT, n - 3)
                q2c = jnp.where(fin, n, q2)
                off2 = jnp.where(fin, 1, tbl_at(dist_ref, q2c))
            lf = n - p  # final tail literal run [p, n)
            q = jnp.where(idle, q2c, q)
            off = jnp.where(idle, off2, off)
            mlen = jnp.where(idle, jnp.where(fin, 0, 4), mlen)
            llen = jnp.where(idle & fin, lf, llen)
            hdr_rem = jnp.where(idle & fin, hdr_len(lf), hdr_rem)
            lit_rem = jnp.where(idle & fin, lf, lit_rem)
            ext_on = jnp.where(idle, ~fin, ext_on)
            is_final = jnp.where(idle, fin, is_final)

            # ---- b) extension round (4KB compares; commit by select) ------
            exting = ext_on & ~done
            a = _read_win(get16d, jnp.minimum(q + mlen, n) + LEAD * ROWB)
            b = _read_win(
                get16d, jnp.maximum(jnp.minimum(q + mlen, n) - off, 0) + LEAD * ROWB
            )
            d = _first_diff_tile(a, b)
            limit = n - q
            m2x = jnp.minimum(mlen + d, limit)
            still = (d >= TB) & (m2x < limit)
            llen2 = q - p
            mlen = jnp.where(exting, m2x, mlen)
            ext_done = exting & ~still
            llen = jnp.where(ext_done, llen2, llen)
            hdr_rem = jnp.where(ext_done, hdr_len(llen2), hdr_rem)
            lit_rem = jnp.where(ext_done, llen2, lit_rem)
            n68, has60, mm2, fin1, tl_full = tail_params(mlen, off)
            tail_rem = jnp.where(ext_done, tl_full, tail_rem)
            ext_on = jnp.where(exting, still, ext_on)

            # ---- c) one emission granule (header || literals || tail) -----
            pend = (hdr_rem > 0) | (lit_rem > 0) | (tail_rem > 0)
            emitting = ~ext_on & ~done & pend
            hl = hdr_len(llen)
            tl = jnp.where(is_final, 0, tl_full)
            g = jnp.minimum(hdr_rem + lit_rem + tail_rem, GM)
            g = jnp.where(emitting, g, 0)
            gh = jnp.minimum(hdr_rem, g)
            gl = jnp.minimum(lit_rem, g - gh)
            gt = g - gh - gl
            r0 = o >> 9
            h = o - r0 * 512

            H = _snp_lit_hdr_tile(h, hl - hdr_rem, llen, hl)
            H = H & _byte_mask_tile(h, gh)
            lit_start = p + (llen - lit_rem)
            L = _read_win(
                get16d, jnp.maximum(lit_start - (h + gh) + LEAD * ROWB, 0)
            )
            L = L & _byte_mask_tile(h + gh, gl)
            h2 = h + gh + gl
            T = _snp_tail_tile(h2, tl - tail_rem, off, n68, has60, mm2, fin1)
            T = T & _byte_mask_tile(h2, gt)

            cur = _u(out_ref[k, pl.ds(LEAD + r0, 8), :])
            m = _byte_mask_tile(h, g)
            out_ref[k, pl.ds(LEAD + r0, 8), :] = (cur & ~m) | H | L | T

            o = o + g
            hdr_rem = hdr_rem - gh
            lit_rem = lit_rem - gl
            tail_rem = tail_rem - gt

            completed = emitting & (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0)
            empty_final = is_final & ~pend & ~done & ~ext_on
            done = done | (completed & is_final) | empty_final
            p = jnp.where(completed & ~is_final, q + mlen, p)

            return (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
                    ext_on, is_final, done)

        init = (
            jnp.int32(0), jnp.asarray(vl, jnp.int32), jnp.int32(0), jnp.int32(1),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.bool_(False), jnp.bool_(False), n <= 0,
        )

        def finalize(c):
            o = c[1]
            # leading varint of the uncompressed length (static rows RMW)
            fwi = _fwi((8, ROWW))
            words = jnp.zeros((8, ROWW), jnp.int32)
            vb = [
                jnp.where(vl > 1, (n & 0x7F) | 0x80, n & 0x7F),
                jnp.where(vl > 2, ((n >> 7) & 0x7F) | 0x80, (n >> 7) & 0x7F),
                jnp.where(vl > 3, ((n >> 14) & 0x7F) | 0x80, (n >> 14) & 0x7F),
                (n >> 21) & 0x7F,
            ]
            for t in range(4):
                bi = fwi * 4 + t
                b = jnp.where(bi == 0, vb[0], 0)
                for j in range(1, 4):
                    b = jnp.where(bi == j, vb[j], b)
                words = words | ((b & 0xFF) << (8 * t))
            vmask = _byte_mask_tile(0, jnp.where(c[11] | True, vl, vl))
            cur = _u(out_ref[k, pl.ds(LEAD, 8), :])
            out_ref[k, pl.ds(LEAD, 8), :] = (cur & ~vmask) | (_u(words) & vmask)
            li = _li((1, ROWW))
            osz = jnp.where(n > 0, o, vl)  # n==0: varint only
            out_ref[k, r_res : r_res + 1, :] = _u(jnp.where(li == 0, osz, 0))

        return init, step, finalize

    chunks = [mk_chunk(k) for k in range(K)]

    def cond(cs):
        a = ~cs[0][11]
        for c in cs[1:]:
            a = a | ~c[11]
        return a

    def body(cs):
        return tuple(chunks[k][1](c) for k, c in enumerate(cs))

    finals = jax.lax.while_loop(cond, body, tuple(ch[0] for ch in chunks))
    for k, c in enumerate(finals):
        chunks[k][2](c)


def supports_compress(capacity: int) -> bool:
    # same VMEM bound as lz_pallas.supports_compress (validated at 1 MB)
    return 1 <= capacity <= (1 << 20)


@functools.partial(jax.jit, static_argnames=("interpret", "kpack"))
def compress(data, lengths, interpret: bool = False, kpack: int = 4):
    """Batched snappy compression on the Pallas path.

    data: uint8[B, C]; lengths: int32[B].  Returns (comp uint8[B, CMAX],
    comp_sizes int32[B]); streams are the pure greedy parse with exact
    nearest-previous-occurrence matches in the 32768-byte snappy window
    (== tests/oracles/snappy_oracle.py snappy_compress_oracle)."""
    from tpucomp.codecs import lz77
    from tpucomp.utils import bits

    b, c = data.shape
    K = max(1, min(kpack, b))
    bp = _rup(b, K)
    lengths = lengths.astype(jnp.int32)
    if bp != b:
        data = jnp.concatenate([data, jnp.zeros((bp - b, c), jnp.uint8)], axis=0)
        lengths = jnp.concatenate([lengths, jnp.zeros((bp - b,), jnp.int32)])
    out_max = snappy_max_compressed_chunk_size(c)
    ro = _cdiv(out_max, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rto = _rup(r_res + 1, 8)
    rd = _rup(_cdiv(c, ROWB), 8)
    rw = LEAD + rd + 32

    # exact nearest-previous-occurrence candidate tables, snappy window.
    # Positions <= 64 KB pack (pos << 16) | dist into one u32 entry (the
    # lz_pallas merged-table parse trim; dist <= 32768 fits 16 bits).
    merged = c <= 65536

    def tables(d, nn):
        i = jnp.arange(c, dtype=jnp.int32)
        j = lz77.nearest_prev_occurrence(d, nn, 1)
        dist = i - j
        cand = (j >= 0) & (dist <= 32768) & (i <= nn - 4)
        if merged:
            packed = jnp.where(
                cand,
                (i.astype(jnp.uint32) << 16) | dist.astype(jnp.uint32),
                jnp.uint32(0xFFFFFFFF),
            )
            nm = jax.lax.cummin(packed, axis=0, reverse=True)
            return jax.lax.bitcast_convert_type(nm, jnp.int32), dist
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
            t = jnp.concatenate([t, jnp.full((bp, padn), fill, jnp.int32)], axis=1)
        return t.reshape(bp, rt, ROWW)

    nmp_t = pad_tbl(nmp, -1 if merged else _SENT)
    dist_t = None if merged else pad_tbl(dist, 1)

    padd = rw * ROWB - c - LEAD * ROWB
    lead = jnp.zeros((bp, LEAD * ROWB), jnp.uint8)
    dd = jnp.concatenate([lead, data, jnp.zeros((bp, padd), jnp.uint8)], axis=1)
    wv = bits.bytes_to_units_le(dd, 4).astype(jnp.int32).reshape(bp, rw, ROWW)

    tbl_spec = pl.BlockSpec((K, rt, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // K,),
        in_specs=[
            pl.BlockSpec((K, rw, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        + [tbl_spec] * (1 if merged else 2),
        out_specs=pl.BlockSpec(
            (K, rto, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    ins = [lengths, wv, nmp_t] + ([] if merged else [dist_t])
    out = pl.pallas_call(
        functools.partial(_snappy_encode_kernel, rd, rt, ro, r_res, K, merged),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, rto, ROWW), jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(*ins)

    out = out[:b]
    sizes = out[:, r_res, 0].astype(jnp.int32)
    comp = bits.units_to_bytes_le(
        out[:, LEAD : LEAD + ro].reshape(b, ro * ROWW)
    )[:, :out_max]
    pos = jnp.arange(out_max, dtype=jnp.int32)[None, :]
    comp = jnp.where(pos < sizes[:, None], comp, 0).astype(jnp.uint8)
    return comp, sizes
