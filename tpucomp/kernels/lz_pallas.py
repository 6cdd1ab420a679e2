"""LZ4 block decompression as a Pallas TPU kernel.

TPU-native counterpart of the reference's warp-cooperative decompressor
(decompressStream, reference src/LZ4Kernels.hiph:971-1097): one grid cell
per chunk; the scalar core plays lane 0's role (sequential token parse over
an SMEM-resident copy of the stream, ~ns per step instead of the ~19us
per-step floor of the dense-XLA batched while loop), and the VPU plays the
cooperative-copy role (reference coopCopyNoOverlap/Repeat/Overlap :520-555)
in up-to-4KB (8,128)-word-tile granules.

Cost model (measured in-kernel on v5e, scripts/kernel_op_costs*.py): loop
iterations, dynamic-sublane VMEM reads/writes, sublane rolls/gathers,
selects and shifts are all ~0-6 ns; *lane-crossing* moves (pltpu.roll on
the lane axis, take_along_axis axis=1) are ~75 ns each, static or dynamic.
The kernel is therefore organized to spend O(1) lane ops per granule,
regardless of granule size:

  - a "window read" materializes 4 KB of a byte stream at an arbitrary
    byte offset as one (8,128) u32 tile: one dynamic 16-row VMEM read
    (free), one dynamic + one static lane roll for word alignment, and
    elementwise shifts for the byte-in-word part (_read_win / _align16)
  - the output builds through a 4 KB (8,128) head-window register tile
    covering bytes [head_lo, head_lo+4096); full windows flush to the VMEM
    output with one dynamic 8-row store; match sources inside the window
    use a modular tile rotation (_rot_tile), older bytes use window reads
    of the flushed output
  - sources are read directly at *output* alignment (window read at
    src - h), so splicing is a pure mask/select
  - self-overlapping matches (offset < granule) build a periodic fill
    tile: offsets 1/2/4 by scalar extract + multiply splat (~60 ns),
    others by word-space doubling rotations (coopCopyRepeat's log trick)

State machine (lax.while_loop): each iteration parses the next sequence if
nothing is pending (scalar core) and moves up to two granules (literal
and/or match), so short sequences cost one iteration.  Corruption checks
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
# 4KB (8,128)-tile byte-stream machinery (row-major: flat word j at
# (j >> 7, j & 127); flat byte fb = 4*j + b, little-endian within words).

TB = 4096  # head-window bytes ( == one (8,128) u32 tile)
TW = 1024  # head-window words
LEAD = 8  # leading zero rows padded onto stream refs (negative-offset slack)
# granule cap: the 16-row window covers 4096+515 bytes past the word-aligned
# read base, so a full window's worth of bytes is always available
GMAX = TB


def _fwi(shape):
    """Flat word iota (row-major)."""
    return _si(shape) * ROWW + _li(shape)


def _align16(t16, kw, kb):
    """(8,128) u32 tile whose flat byte j = t16's flat byte (4*kw + kb + j).

    t16: (16,128) u32; kw traced in [0,128); kb traced in [0,4).
    Cost: one dynamic + one static lane roll."""
    a = pltpu.roll(t16, (-kw) % ROWW, axis=1)
    b = pltpu.roll(a, ROWW - 1, axis=1)  # == roll of t16 by -(kw+1)
    li = _li((8, ROWW))
    w0 = jnp.where(li < ROWW - kw, a[0:8], a[1:9])
    w1 = jnp.where(li < ROWW - 1 - kw, b[0:8], b[1:9])
    sh = 8 * _u(kb)
    return jnp.where(kb > 0, (_u(w0) >> sh) | (_u(w1) << (32 - sh)), _u(w0))


def _read_win(get16, off_b):
    """(8,128) u32: flat byte j = padded-stream byte (off_b + j).

    ``get16(r0)`` returns 16 consecutive u32 rows starting at row r0
    (callers pad refs so r0+16 is always in bounds).  off_b traced >= 0."""
    r0 = off_b >> 9
    t16 = get16(r0)
    rem = off_b - r0 * 512
    return _align16(t16, rem >> 2, off_b & 3)


def _rot_tile(t, d):
    """(8,128) u32: flat byte j = t's flat byte ((j + d) mod 4096).

    d traced in [0, 4096).  Cost: one dynamic + one static lane roll."""
    kw = d >> 2
    ks = kw >> 7
    kl = kw & (ROWW - 1)
    a = pltpu.roll(t, (-kl) % ROWW, axis=1)
    a0 = pltpu.roll(a, (-ks) % 8, axis=0)
    a1 = pltpu.roll(a, (-(ks + 1)) % 8, axis=0)
    li = _li((8, ROWW))
    w0 = jnp.where(li < ROWW - kl, a0, a1)
    b = pltpu.roll(a, ROWW - 1, axis=1)  # one more word along the stream
    b0 = pltpu.roll(b, (-ks) % 8, axis=0)
    b1 = pltpu.roll(b, (-(ks + 1)) % 8, axis=0)
    w1 = jnp.where(li < ROWW - 1 - kl, b0, b1)
    kb = d & 3
    sh = 8 * _u(kb)
    return jnp.where(kb > 0, (_u(w0) >> sh) | (_u(w1) << (32 - sh)), _u(w0))


def _rot_words(t, dw):
    """(8,128) u32: flat word j = t's flat word ((j + dw) mod 1024).

    Word-aligned variant of _rot_tile: one dynamic lane roll only."""
    ks = dw >> 7
    kl = dw & (ROWW - 1)
    a = pltpu.roll(t, (-kl) % ROWW, axis=1)
    a0 = pltpu.roll(a, (-ks) % 8, axis=0)
    a1 = pltpu.roll(a, (-(ks + 1)) % 8, axis=0)
    return jnp.where(_li((8, ROWW)) < ROWW - kl, a0, a1)


def _byte_mask_tile(lo, n):
    """(8,128) u32 mask with flat bytes [lo, lo+n) set."""
    b0 = _fwi((8, ROWW)) * 4
    a = jnp.clip(lo - b0, 0, 4)
    b = jnp.clip(lo + n - b0, 0, 4)
    nb = b - a
    m = jnp.where(
        nb >= 4,
        jnp.uint32(0xFFFFFFFF),
        ((jnp.uint32(1) << (8 * _u(nb))) - 1) << (8 * _u(a)),
    )
    return jnp.where(nb > 0, m, jnp.uint32(0))


def _extract_word(get_row, wi):
    """Scalar i32 = flat word ``wi`` of a row-major u32/i32 word stream
    (one dynamic row read + one masked-lane reduction, ~30 ns).

    Replaces scalar-core SMEM loads: staging a stream into SMEM costs a
    ~100 us fixed-latency DMA per grid cell on this hardware
    (scripts/kernel_op_costs8.py), which dominated whole chunks."""
    row = get_row(wi >> 7).astype(jnp.int32)
    return jnp.sum(
        jnp.where(_li(row.shape) == (wi & (ROWW - 1)), row, 0), dtype=jnp.int32
    )


def _first_diff_tile(a, b):
    """Index of the first differing byte of two (8,128) u32 byte streams
    (TB if equal).  One cross-lane min reduction: the byte-in-word index is
    folded into each word's candidate before reducing."""
    x = (a ^ b).astype(jnp.int32)
    tzb = (
        jnp.where((x & 0xFF) == 0, 1, 0)
        + jnp.where((x & 0xFFFF) == 0, 1, 0)
        + jnp.where((x & 0xFFFFFF) == 0, 1, 0)
    )
    fb = _fwi(x.shape) * 4 + tzb
    return jnp.minimum(jnp.min(jnp.where(x != 0, fb, TB)), TB).astype(jnp.int32)


def _fill_tile(P, per):
    """Periodic fill: P holds pattern bytes [0, per) (zeros elsewhere
    within mask scope); returns (8,128) whose flat byte x = pattern[x %
    per] for all x in [0, 4096).  per traced in [1, 4096)."""

    def splat():
        # per in {1,2,4}: one scalar extract + multiply, alignment-free
        w = _u(jnp.sum(jnp.where(_fwi((8, ROWW)) == 0, P.astype(jnp.int32), 0)))
        pat1 = (w & 0xFF) * jnp.uint32(0x01010101)
        pat2 = (w & 0xFFFF) * jnp.uint32(0x00010001)
        pat = jnp.where(per == 1, pat1, jnp.where(per == 2, pat2, w))
        return jnp.zeros((8, ROWW), jnp.uint32) + pat

    def general():
        Pm = P & _byte_mask_tile(0, per)
        # extend the pattern to a word-aligned length; each extension is a
        # modular right-rotation masked to its exact target range [f, 2f),
        # so wrapped source bytes can never leak in
        P1 = Pm | (_rot_tile(Pm, (TB - per) % TB) & _byte_mask_tile(per, per))
        f1 = 2 * per
        P2 = P1 | (_rot_tile(P1, (TB - f1 % TB) % TB) & _byte_mask_tile(f1, f1))
        half = per % 4 == 2
        Pw = jnp.where(per % 4 == 0, Pm, jnp.where(half, P1, P2))
        filled = jnp.where(per % 4 == 0, per, jnp.where(half, 2 * per, 4 * per))
        # word-space doubling to 4KB (one dynamic lane roll per step)
        for _ in range(10):
            ext = _rot_words(Pw, (TW - (filled >> 2) % TW) % TW)
            ext = ext & _byte_mask_tile(filled, filled)
            Pw = Pw | jnp.where(filled < TB, ext, jnp.uint32(0))
            filled = filled * 2
        return Pw

    return jax.lax.cond((per == 1) | (per == 2) | (per == 4), splat, general)


# ---------------------------------------------------------------------------


def _align32_16(t32, kw, kb):
    """(16,128) u32 tile whose flat byte j = t32's flat byte (4*kw + kb + j).

    t32: (32,128) u32; kw traced in [0,128); kb traced in [0,4).
    Cost: one dynamic + one static lane roll (same as _align16)."""
    a = pltpu.roll(t32, (-kw) % ROWW, axis=1)
    b = pltpu.roll(a, ROWW - 1, axis=1)  # == roll of t32 by -(kw+1)
    li = _li((16, ROWW))
    w0 = jnp.where(li < ROWW - kw, a[0:16], a[1:17])
    w1 = jnp.where(li < ROWW - 1 - kw, b[0:16], b[1:17])
    sh = 8 * _u(kb)
    return jnp.where(kb > 0, (_u(w0) >> sh) | (_u(w1) << (32 - sh)), _u(w0))


def _read_win16(get32, off_b):
    """(16,128) u32: flat byte j = padded-stream byte (off_b + j), j < 8192.

    ``get32(r0)`` returns 32 consecutive u32 rows from row r0 (callers pad
    refs so r0+32 stays in bounds).  off_b traced >= 0."""
    r0 = off_b >> 9
    t32 = get32(r0)
    rem = off_b - r0 * 512
    return _align32_16(t32, rem >> 2, off_b & 3)


def _byte_mask16(lo, n):
    """(16,128) u32 mask with flat bytes [lo, lo+n) set."""
    b0 = (_si((16, ROWW)) * ROWW + _li((16, ROWW))) * 4
    a = jnp.clip(lo - b0, 0, 4)
    b = jnp.clip(lo + n - b0, 0, 4)
    nb = b - a
    m = jnp.where(
        nb >= 4,
        jnp.uint32(0xFFFFFFFF),
        ((jnp.uint32(1) << (8 * _u(nb))) - 1) << (8 * _u(a)),
    )
    return jnp.where(nb > 0, m, jnp.uint32(0))


GMOVE = 2048  # granule cap of the slim mover: h + g <= 511 + 2048 < 4096,
# so the value pipeline runs entirely on (8,128) single-vreg tiles and the
# RMW touches 8 rows (v5: lane rolls cost ~75 ns PER VREG-ROW, so the old
# (16/32,128) machinery paid 2-4x per op; halving the granule cap costs
# bulk data one extra iteration per 4 KB, a ~free trade)


def _granule_mover(k, get16u, u_ref, ob_rows: int, gm: int = GMOVE):
    """Predicated literal/match granule move via direct 8-row RMW of the
    output (shared by the LZ4 and Snappy decode kernels).

    v4: the compressed stream and the output live in ONE buffer (``u_ref``;
    stream rows [0, ob_rows), output rows [ob_rows, ...) with its own LEAD),
    so literal and match sources collapse into a single window read at a
    selected absolute offset -- 2 lane rolls per granule instead of 4.

    State contract: (o write pos, rem_lit, lit_src, rem_m, m_ext, ok);
    matches copy from (o - m_ext) with extent doubling (see
    _lz4_decode_kernel docstring)."""
    outb = (ob_rows + LEAD) * ROWB  # output byte 0, as a u_ref byte offset

    def move_granule(o, rem_lit, lit_src, rem_m, m_ext, ok):
        do_lit = rem_lit > 0
        pend = do_lit | (rem_m > 0)
        g = jnp.minimum(
            jnp.where(do_lit, rem_lit, jnp.minimum(rem_m, m_ext)), gm
        )
        g = jnp.where(ok & pend, g, 0)
        r0 = o >> 9
        h = o - r0 * 512
        # clamp: a corrupt stream can leave m_ext > o before ok kills the
        # chunk; the masked write is dead but the read must stay in bounds
        src = jnp.where(
            do_lit,
            LEAD * ROWB + lit_src,
            outb + jnp.maximum(o - m_ext, 0),
        )
        W = _read_win(get16u, src - h)
        cur = _u(u_ref[k, pl.ds(ob_rows + LEAD + r0, 8), :])
        m = _byte_mask_tile(h, g)
        u_ref[k, pl.ds(ob_rows + LEAD + r0, 8), :] = (
            (cur & ~m) | (W & m)
        ).astype(u_ref.dtype)
        # extent doubles only on a full-extent copy (keeps e % d == 0)
        m_ext = jnp.where(~do_lit & (g == m_ext), m_ext * 2, m_ext)
        o = o + g
        rem_lit = jnp.where(do_lit, rem_lit - g, rem_lit)
        lit_src = jnp.where(do_lit, lit_src + g, lit_src)
        rem_m = jnp.where(do_lit, rem_m, rem_m - g)
        return o, rem_lit, lit_src, rem_m, m_ext

    return move_granule


def _lz4_decode_kernel(
    rc: int, rw: int, rt: int, r_res: int, out_cap: int, K: int,
    size_ref, in_ref, uv_ref, ws_ref, sem, probe_no_lsic: bool = False
):
    """rc: stream data rows; rw: padded stream rows (LEAD + rc + 32);
    rt: output-region rows; r_res: result-row index within the output
    region.  ``uv_ref`` is ONE aliased in/out buffer per chunk: stream
    rows [0, rw), output region rows [rw, rw + rt) with its own LEAD
    (v4 -- the unified buffer lets every granule move pay a single
    window read; see _granule_mover).

    v3 design rules learned on hardware (scripts/ilp_probe.py and the
    round-3 lax.cond regression):

      - lane-crossing dependent chains are pipeline latencies (8
        independent chains cost ~1.3x one), BUT only inside one basic
        block: per-chunk work wrapped in lax.cond lives in scf.if regions
        Mosaic cannot software-pipeline across.  So the hot path is pure
        predication (selects); the only branches left are the rare LSIC
        255-run scans.
      - the round-2 head-register tile + flush branches are replaced by a
        direct 16-row read-modify-write of the VMEM output at the write
        row: dynamic sublane reads/writes are ~free, and every granule
        becomes load/splice/store with no flush bookkeeping.
      - self-overlapping matches use extent doubling instead of the
        periodic-fill tile: a match at offset d keeps a source extent e
        (init d, doubling while fully copied); copying g <= e bytes from
        (o - e) is always exact because e stays a multiple of d and the
        zone behind o is d-periodic.  Offset-1 runs cost log2 extra
        iterations instead of a 10-roll fill pipeline.
      - the scalar parser reads from one SMEM staging of all K streams
        (one DMA per cell); scalar-unit loads run off the critical vector
        path and their 8 chains interleave.
    """
    nsb = rc * ROWB  # parser-addressable stream bytes

    # stage all K streams into SMEM with one DMA
    cp = pltpu.make_async_copy(uv_ref.at[:, pl.ds(LEAD, rc), :], ws_ref, sem)
    cp.start()
    cp.wait()

    def mk_chunk(k):
        comp_len = size_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(uv_ref[k, pl.ds(r0, 16), :])

        def byte_at(q):
            qc = jnp.clip(q, 0, nsb - 1) >> 2
            w = ws_ref[k, qc >> 7, qc & (ROWW - 1)]
            return (w >> (8 * (q & 3))) & 0xFF

        def lsic(q0):
            # vectorized 255-run scan: one 4KB window read + first-non-FF
            # reduction per 4KB of run
            ff = jnp.zeros((8, ROWW), jnp.uint32) + jnp.uint32(0xFFFFFFFF)

            def lstep(c):
                q, acc, go = c
                W = _read_win(get16d, q + LEAD * ROWB)
                d_raw = _first_diff_tile(W, ff)
                d = jnp.minimum(d_raw, jnp.maximum(comp_len - q, 0))
                return (
                    jnp.asarray(q + d, jnp.int32),
                    jnp.asarray(acc + 255 * d, jnp.int32),
                    jnp.asarray((d_raw >= TB) & (q + d < comp_len), jnp.bool_),
                )

            q, acc, _ = jax.lax.while_loop(
                lambda c: c[2], lstep, (q0, jnp.int32(0), jnp.bool_(True))
            )
            return jnp.asarray(q + 1, jnp.int32), jnp.asarray(acc + byte_at(q), jnp.int32)

        move_granule = _granule_mover(k, get16d, uv_ref, rw)

        def step(c):
            p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok = c
            no_pending = (rem_lit == 0) & (rem_m == 0)
            do_parse = no_pending & ~last_seen & ok

            # ---- a) speculative parse (scalar chains; commit by select) --
            token = byte_at(p)
            lnib = token >> 4
            mnib = token & 15
            if probe_no_lsic:
                # timing probe: LSIC handled as if absent (WRONG results on
                # streams with 255-run lengths; measures the lax.cond
                # scheduling-barrier cost -- see PERF.md round 3)
                qe, lext = jnp.asarray(p + 1, jnp.int32), jnp.int32(0)
            else:
                qe, lext = jax.lax.cond(
                    do_parse & (lnib == 15),
                    lambda: lsic(p + 1),
                    lambda: (jnp.asarray(p + 1, jnp.int32), jnp.int32(0)),
                )
            llen = jnp.where(lnib == 15, 15 + lext, lnib)
            src = qe
            q = src + llen
            is_last = q >= comp_len
            off = byte_at(q) | (byte_at(q + 1) << 8)
            if probe_no_lsic:
                qm, mxb = jnp.asarray(q + 2, jnp.int32), jnp.int32(0)
            else:
                qm, mxb = jax.lax.cond(
                    do_parse & (mnib == 15) & ~is_last,
                    lambda: lsic(q + 2),
                    lambda: (jnp.asarray(q + 2, jnp.int32), jnp.int32(0)),
                )
            mlen = jnp.where(is_last, 0, 4 + jnp.where(mnib == 15, 15 + mxb, mnib))
            step_ok = q <= comp_len
            step_ok &= is_last | ((off >= 1) & (off <= o + llen))
            step_ok &= is_last | (qm <= comp_len)
            step_ok &= o + llen + mlen <= out_cap

            p = jnp.where(do_parse, jnp.where(is_last, comp_len, qm), p)
            rem_lit = jnp.where(do_parse, llen, rem_lit)
            lit_src = jnp.where(do_parse, src, lit_src)
            rem_m = jnp.where(do_parse, mlen, rem_m)
            m_ext = jnp.where(do_parse, jnp.maximum(off, 1), m_ext)
            last_seen = last_seen | (do_parse & is_last)
            ok = ok & (step_ok | ~do_parse)

            # ---- b) two predicated granule moves (literal, then match) ---
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            return (p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok)

        init = (
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(0),
            jnp.int32(1),
            comp_len <= 0,
            comp_len >= 0,
        )

        def finalize(c):
            o, ok = c[1], c[7]
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


# ---------------------------------------------------------------------------
# XLA-side wrapper


# SMEM holds the staged streams for the scalar parser: K * rc rows of
# 512 B must fit the ~1 MB scalar memory (a (16,136,128) i32 staging
# measured the hard limit in round 3); keep headroom for sizes/spill
SMEM_ROWS_BUDGET = 1880


def supports_decode(cmax: int, out_capacity: int) -> bool:
    rc = _rup(_cdiv(cmax, ROWB), 8)
    return out_capacity >= 1 and rc <= SMEM_ROWS_BUDGET


@functools.partial(jax.jit, static_argnames=("out_capacity", "interpret", "kpack", "probe_no_lsic"))
def decompress(comp, comp_sizes, out_capacity: int, interpret: bool = False,
               kpack: int = 8, probe_no_lsic: bool = False):
    """Batched LZ4 decompression on the Pallas path.

    comp: uint8[B, CMAX]; comp_sizes: int32[B].  Returns (data uint8[B,
    out_capacity], lengths int32[B], statuses int32[B]) matching
    codecs/lz4.py decompress.  ``kpack`` chunks share a grid cell and
    decode interleaved (ILP over the per-chunk dependent chains).
    """
    from tpucomp.utils import bits

    b, cmax = comp.shape
    # stream data rows padded to 8 sublanes: an unaligned-sublane VMEM->SMEM
    # DMA hard-faults the TPU worker (observed at rc=49/129; rc=40 fine)
    rc = _rup(_cdiv(cmax, ROWB), 8)
    # large chunks shrink the interleave so the SMEM staging fits
    K = max(1, min(kpack, b, SMEM_ROWS_BUDGET // rc))
    bp = _rup(b, K)
    rw = LEAD + rc + 32  # window-read slack: reads reach r0 + 32 <= rw
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
        functools.partial(_lz4_decode_kernel, rc, rw, rt, r_res, out_capacity, K,
                          probe_no_lsic=probe_no_lsic),
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
# LZ4 compression
#
# TPU-native counterpart of the reference's warp-cooperative compressor
# (compressStream, reference src/LZ4Kernels.hiph:794-969).  Match *finding*
# stays in XLA as the exact nearest-previous-occurrence kv-sort (31 ms for
# 8 MB -- tpucomp/codecs/lz77.py nearest_prev_occurrence, the collision-free
# ideal of the reference's 2^14 hash table :557-561); the kernel replaces
# the gather-bound dense LCP walk / parse / emit stages with K interleaved
# per-chunk sequential state machines (same ILP scheme as decode):
#
#   - greedy parse over the candidate tables (next-match-position, offset)
#     read by VMEM extract -- the scalar-core form of the reference's hash
#     probe loop
#   - exact unbounded match extension by 4KB VPU compares of the source
#     data (lengthOfMatch, reference :592-617).  Feeding precomputed
#     lengths from the XLA-side LCP walk (lz77.match_lengths) instead is a
#     measured dead end: its per-level ids[a] gathers cost ~115 ms per
#     [128, 64K] gather on v5e, 3.4 s/8 MB total -- 40x the whole in-kernel
#     extension (scripts history, round 3)
#   - stream emission through the 16-row read-modify-write splice machinery
#     shared with decompression (token/LSIC header and offset/LSIC tail
#     vectors are constructed arithmetically per iteration), so short
#     sequences (the common case) cost one loop iteration
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


def _field_tile(h, bi0, b0, b_last, flen, b1=None):
    """(8,128) u32 tile carrying an LZ4 header/tail field at flat bytes
    [h, ...): byte with field index bi (= flat_byte - h + bi0) takes value
    b0 at bi==0, b1 at bi==1 (when given), b_last at bi==flen-1, else 255
    (LSIC filler).  Pure selects -- no lane-crossing ops."""
    fwi = _fwi((8, ROWW))
    words = jnp.zeros((8, ROWW), jnp.int32)
    for t in range(4):
        bi = (fwi * 4 + t) - h + bi0
        v = jnp.where(bi == flen - 1, b_last, 255)
        if b1 is not None:
            v = jnp.where(bi == 1, b1, v)
        v = jnp.where(bi == 0, b0, v)
        words = words | ((v & 0xFF) << (8 * t))
    return _u(words)


def _field_tile16(h, bi0, b0, b_last, flen, b1=None):
    """(16,128) variant of _field_tile: LZ4 header/tail field at flat bytes
    [h, ...); byte with field index bi (= flat_byte - h + bi0) takes value
    b0 at bi==0, b1 at bi==1 (when given), b_last at bi==flen-1, else 255
    (LSIC filler).  Pure selects -- no lane-crossing ops."""
    fwi = _si((16, ROWW)) * ROWW + _li((16, ROWW))
    words = jnp.zeros((16, ROWW), jnp.int32)
    for t in range(4):
        bi = (fwi * 4 + t) - h + bi0
        v = jnp.where(bi == flen - 1, b_last, 255)
        if b1 is not None:
            v = jnp.where(bi == 1, b1, v)
        v = jnp.where(bi == 0, b0, v)
        words = words | ((v & 0xFF) << (8 * t))
    return _u(words)


def _lz4_encode_kernel(
    rd: int, rt: int, ro: int, r_res: int, K: int, merged: bool,
    size_ref, wv_ref, nmp_ref, *rest
):
    # merged: nmp_ref packs (position << 16) | distance per entry (one table,
    # one dependent extract per sequence); else the classic two-table form
    dist_ref = None if merged else rest[0]
    out_ref = rest[-1]
    """K chunks encode per grid cell through one branch-free interleaved
    loop (same design rules as _lz4_decode_kernel v3).

    Emission treats each sequence as a virtual byte stream
    header || literals || tail and writes one granule of it per iteration
    as a single predicated 16-row read-modify-write: the header and tail
    field tiles are pure selects built at their target offsets, the
    literal window is one aligned read, and short sequences (the common
    case) complete parse + extension + emission in a single iteration."""

    GM = GMOVE  # granule cap; 8-row RMW covers 2048+511 at any offset

    def mk_chunk(k):
        n = size_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(wv_ref[k, pl.ds(r0, 16), :])

        def get32d(r0):
            return _u(wv_ref[k, pl.ds(r0, 32), :])

        def tbl_at(ref, x):
            e = jnp.clip(x, 0, rt * ROWW - 1)
            return _extract_word(
                lambda r: ref[k, pl.ds(jnp.clip(r, 0, rt - 1), 1), :], e
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
                fin = q2 >= jnp.minimum(_SENT, n - 12)
                q2c = jnp.where(fin, n, q2)
                off2 = jnp.where(fin, 1, v & 0xFFFF)
            else:
                q2 = tbl_at(nmp_ref, p)
                fin = q2 >= jnp.minimum(_SENT, n - 12)
                q2c = jnp.where(fin, n, q2)
                off2 = jnp.where(fin, 1, tbl_at(dist_ref, q2c))
            lf = n - p  # final tail literal run [p, n)
            q = jnp.where(idle, q2c, q)
            off = jnp.where(idle, off2, off)
            mlen = jnp.where(idle, jnp.where(fin, 0, 4), mlen)
            llen = jnp.where(idle & fin, lf, llen)
            hdr_rem = jnp.where(idle & fin, 1 + _lsic_nb(lf), hdr_rem)
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
            limit = n - 5 - q
            m2 = jnp.minimum(mlen + d, limit)
            still = (d >= TB) & (m2 < limit)
            llen2 = q - p
            mlen = jnp.where(exting, m2, mlen)
            ext_done = exting & ~still
            llen = jnp.where(ext_done, llen2, llen)
            hdr_rem = jnp.where(ext_done, 1 + _lsic_nb(llen2), hdr_rem)
            lit_rem = jnp.where(ext_done, llen2, lit_rem)
            tail_rem = jnp.where(ext_done, 2 + _lsic_nb(m2 - 4), tail_rem)
            ext_on = jnp.where(exting, still, ext_on)

            # ---- c) one emission granule (header || literals || tail) -----
            pend = (hdr_rem > 0) | (lit_rem > 0) | (tail_rem > 0)
            emitting = ~ext_on & ~done & pend
            hl = 1 + _lsic_nb(llen)
            tl = jnp.where(is_final, 0, 2 + _lsic_nb(mlen - 4))
            g = jnp.minimum(hdr_rem + lit_rem + tail_rem, GM)
            g = jnp.where(emitting, g, 0)
            gh = jnp.minimum(hdr_rem, g)
            gl = jnp.minimum(lit_rem, g - gh)
            gt = g - gh - gl
            r0 = o >> 9
            h = o - r0 * 512

            tok_m = jnp.where(is_final, 0, jnp.minimum(mlen - 4, 15))
            token = (jnp.minimum(llen, 15) << 4) | tok_m
            rem_b = llen - 15 - 255 * (hl - 2)
            H = _field_tile(h, hl - hdr_rem, token, rem_b, hl)
            H = H & _byte_mask_tile(h, gh)
            lit_start = p + (llen - lit_rem)
            L = _read_win(
                get16d, jnp.maximum(lit_start - (h + gh) + LEAD * ROWB, 0)
            )
            L = L & _byte_mask_tile(h + gh, gl)
            h2 = h + gh + gl
            mrem = (mlen - 4) - 15 - 255 * (tl - 3)
            T = _field_tile(h2, tl - tail_rem, off & 0xFF, mrem, tl,
                            b1=(off >> 8) & 0xFF)
            T = T & _byte_mask_tile(h2, gt)

            cur = _u(out_ref[k, pl.ds(LEAD + r0, 8), :])
            m = _byte_mask_tile(h, g)
            out_ref[k, pl.ds(LEAD + r0, 8), :] = (cur & ~m) | H | L | T

            o = o + g
            hdr_rem = hdr_rem - gh
            lit_rem = lit_rem - gl
            tail_rem = tail_rem - gt

            completed = emitting & (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0)
            done = done | (completed & is_final)
            p = jnp.where(completed & ~is_final, q + mlen, p)

            return (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
                    ext_on, is_final, done)

        init = (
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.bool_(False), jnp.bool_(False), n <= 0,
        )

        def finalize(c):
            o = c[1]
            li = _li((1, ROWW))
            out_ref[k, r_res : r_res + 1, :] = _u(jnp.where(li == 0, o, 0))

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
    # VMEM bound: the encode cell holds the chunk stream plus two
    # position tables; 1 MB chunks compile and round-trip on v5e
    # (round-3 sweep), larger sizes route to the XLA path
    return 1 <= capacity <= (1 << 20)


@functools.partial(jax.jit, static_argnames=("stride", "interpret", "kpack"))
def compress(data, lengths, stride: int = 1, interpret: bool = False,
             kpack: int = 4):
    """Batched LZ4 compression on the Pallas path.

    data: uint8[B, C]; lengths: int32[B].  Returns (comp uint8[B, CMAX],
    comp_sizes int32[B]); streams are the pure greedy parse with exact
    nearest-previous-occurrence matches (== the uncapped sequential oracle).
    ``kpack`` chunks share a grid cell and encode interleaved.
    """
    from tpucomp.codecs import lz77
    from tpucomp.core.sizing import lz4_max_compressed_chunk_size
    from tpucomp.utils import bits

    b, c = data.shape
    K = max(1, min(kpack, b))
    bp = _rup(b, K)
    lengths = lengths.astype(jnp.int32)
    if bp != b:
        data = jnp.concatenate([data, jnp.zeros((bp - b, c), jnp.uint8)], axis=0)
        lengths = jnp.concatenate([lengths, jnp.zeros((bp - b,), jnp.int32)])
    out_max = lz4_max_compressed_chunk_size(c)
    ro = _cdiv(out_max, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rto = _rup(r_res + 1, 8)
    rd = _rup(_cdiv(c, ROWB), 8)
    rw = LEAD + rd + 32  # window-read slack: reads reach r0 + 32 <= rw

    # exact nearest-previous-occurrence candidate tables (XLA sorts).
    # When chunk positions fit 16 bits the candidate's (position, distance)
    # pair packs into ONE u32 entry ((pos << 16) | dist; pos-major order
    # keeps a plain unsigned cummin correct, sentinel 0xFFFFFFFF): the
    # kernel's parse then needs a single dependent table extract per
    # sequence instead of two -- worth ~15% of encode, which the round-5
    # drain/parse battery showed is PARSE-chain-bound (PERF.md).
    merged = c <= 65536

    def tables(d, nn):
        i = jnp.arange(c, dtype=jnp.int32)
        j = lz77.nearest_prev_occurrence(d, nn, stride)
        dist = i - j
        cand = (j >= 0) & (dist <= 65535) & (i <= nn - 13)
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
        functools.partial(_lz4_encode_kernel, rd, rt, ro, r_res, K, merged),
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
