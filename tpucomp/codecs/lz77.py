"""Shared dense LZ77 machinery used by the LZ4 and Snappy codecs.

Both formats reduce to the same sequence representation -- (literal source,
literal length, output start, match length, offset) per sequence -- and the
same two hard sub-problems on a vector machine:

  - match finding during compression: a stable kv-sort of (4-byte window,
    position) yields the exact nearest previous occurrence of every
    position (the ideal form of the reference's per-format hash tables,
    src/LZ4Kernels.hiph:557-561 and src/snappy/compression.hiph:158)
  - materialization during decompression: literal bytes are a single
    gather, self-overlapping copies collapse in closed form with modular
    arithmetic, and match-of-match chains resolve by pointer doubling

See tpucomp/codecs/lz4.py for the full design narrative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpucomp.utils import permute

MIN_MATCH = 4
_INF = np.int32(2**30)  # numpy scalar: no backend init at import


def u32_keys(data):
    """Little-endian 4-byte window at every position (elementwise)."""
    d = data.astype(jnp.uint32)
    k = d
    for s in range(1, 4):
        k = k | (jnp.roll(d, -s) << jnp.uint32(8 * s))
    return k


def rev_cummin(x):
    return jax.lax.cummin(x, axis=x.ndim - 1, reverse=True)


def nearest_prev_occurrence(data, n, stride: int = 1):
    """j[i] = largest j < i with data[j:j+4] == data[i:i+4], else -1.

    One stable 2-key sort + one placement sort.  ``stride`` > 1 restricts
    candidates (both ends) to stride-aligned positions -- the typed-input
    match granularity of the reference's element-typed kernels
    (reference src/lowlevel/LZ4CompressionKernels.hip:185-219): matches
    start element-aligned with element-aligned offsets.
    """
    c = data.shape[-1]
    i = jnp.arange(c, dtype=jnp.int32)
    key = u32_keys(data)
    # pack (invalid flag, position) into the secondary key: valid entries
    # sort before invalid ones within a window value, ascending position
    invalid = i > n - MIN_MATCH
    if stride > 1:
        invalid = invalid | (i % stride != 0)
    packed = jnp.where(invalid, i + _INF, i)
    sk, sp = jax.lax.sort((key, packed), num_keys=2, is_stable=False)
    pos = jnp.where(sp >= _INF, sp - _INF, sp)
    ok = sp < _INF
    same = (sk == jnp.roll(sk, 1)) & jnp.roll(ok, 1) & ok
    same = same.at[0].set(False)
    prev = jnp.where(same, jnp.roll(pos, 1), -1)
    return permute.place(prev, pos, jnp.ones((c,), jnp.bool_), c)


def suffix_id_levels(data, max_h: int):
    """Prefix-equality ids by prefix doubling.

    Returns [(h, ids int32[c])] for h = 8, 16, ..., first >= max_h.  For
    positions a, b with a + h <= valid length, ids[a] == ids[b] iff
    data[a:a+h] == data[b:b+h]; ids at positions whose window runs past the
    array end are arbitrary (callers bound-check before use).  Each level is
    one 2-key sort + one placement sort (no gathers) -- O(n log n) total
    sort work, the dense counterpart of the reference's byte-at-a-time
    lengthOfMatch walk (reference src/LZ4Kernels.hiph:592-617).
    """
    c = data.shape[-1]
    i = jnp.arange(c, dtype=jnp.int32)
    ones = jnp.ones((c,), jnp.bool_)
    cur = jax.lax.bitcast_convert_type(u32_keys(data), jnp.int32)
    levels = []
    h = 4
    while h < max_h:
        k2 = jnp.roll(cur, -h)
        sk1, sk2, sp = jax.lax.sort((cur, k2, i), num_keys=2, is_stable=False)
        neq = (sk1 != jnp.roll(sk1, 1)) | (sk2 != jnp.roll(sk2, 1))
        neq = neq.at[0].set(True)
        cur = permute.place(jnp.cumsum(neq.astype(jnp.int32)), sp, ones, c)
        h *= 2
        levels.append((h, cur))
    return levels


# Suffix-level height cap for large chunks: levels are built to
# min(c/2, MATCH_H_CAP), bounding peak memory at ~log2(cap) * 4 * c bytes
# and sort work at log2(cap) passes.  Matches stay exact up to the walk
# ceiling 2*cap + 3 bytes; a longer true match is reported at the ceiling
# and the greedy parse simply re-anchors inside it (the continuation is the
# next candidate at the same offset), costing ~3 stream bytes per 2*cap of
# match -- negligible ratio, and required to make the reference's 16 MB
# chunk range (include/hipcomp/lz4.h:67-74) tractable on one device.
MATCH_H_CAP = 1 << 16


def match_lengths(data, n, j, max_offset: int):
    """Common-prefix length of data[i:n] vs data[j[i]:n], exact up to
    2*MATCH_H_CAP + 3 (unbounded below that ceiling).

    Binary greedy walk over suffix-id levels (high -> low): at level h the
    next h bytes match iff the level ids agree, so the walk accumulates the
    exact LCP in log2(c) compares (2 gathers each).  Handles overlapping
    (periodic) matches exactly -- the ids encode the actual data.  Returns
    (mlen, dist, cand).
    """
    c = data.shape[-1]
    i = jnp.arange(c, dtype=jnp.int32)
    dist = i - j
    cand = (j >= 0) & (dist <= max_offset)

    # closed-form low levels; sort-built doubling levels cover 8..>=c/2
    # (walk ceiling 2H+3 >= c covers any in-chunk match below the cap)
    id1 = data.astype(jnp.int32)
    id2 = id1 | (jnp.roll(id1, -1) << 8)
    id4 = jax.lax.bitcast_convert_type(u32_keys(data), jnp.int32)
    levels = suffix_id_levels(data, min(max(8, c // 2), MATCH_H_CAP))
    walk = levels[::-1] + [(4, id4), (2, id2), (1, id1)]

    # the candidate shares the 4-byte sort key, so the walk starts at 4;
    # descending levels {H..8, 4, 2, 1} reach any value in [4, 2H+3]
    lcp = jnp.where(cand, 4, 0)
    jc = jnp.where(cand, j, 0)
    last = c - 1
    for h, ids in walk:
        a = i + lcp
        b = jc + lcp
        okh = cand & (a + h <= n) & (ids[jnp.clip(a, 0, last)] == ids[jnp.clip(b, 0, last)])
        lcp = jnp.where(okh, lcp + h, lcp)
    return jnp.where(cand, lcp, 0), dist, cand


def block_parallel_parse(m_clamped, dist, n, parse_block: int, s_max: int):
    """Greedy parse with block-level parallelism.

    The chunk splits into ``parse_block``-byte parse blocks; matches clamp
    at block boundaries so every block parses independently (extra vmap
    lanes instead of serial while-loop steps -- the reference gets this
    parallelism from its warps, we get it from lanes).  Trailing literals
    of each block merge into the next block's first sequence (they are
    contiguous in the input), restoring a single valid stream.

    ``m_clamped`` must already carry the format's end-of-block clamps.
    Returns (lit_start, lit_len, match_len, offset, num_seqs) with
    sequences in stream order; the final sequence is literals-only
    (match_len 0, possibly empty).
    """
    c = m_clamped.shape[-1]
    i = jnp.arange(c, dtype=jnp.int32)
    kb = max(1, c // parse_block)
    sb = parse_block // MIN_MATCH + 1

    block_end = (i // parse_block + 1) * parse_block
    m_block = jnp.minimum(m_clamped, block_end - i)
    usable = m_block >= MIN_MATCH
    nmp = rev_cummin(jnp.where(usable, i, _INF))

    def parse_block_fn(bs):
        be = jnp.minimum(bs + parse_block, n)
        rows = jnp.zeros((sb, 4), jnp.int32)
        unroll = 4

        def step(carry):
            p, s, done, rows = carry
            q = nmp[jnp.clip(p, 0, c - 1)]
            fin = (q >= be) | (p >= be)
            q = jnp.minimum(q, be)
            m = jnp.where(fin, 0, m_block[jnp.clip(q, 0, c - 1)])
            o = jnp.where(fin, 0, dist[jnp.clip(q, 0, c - 1)])
            row = jnp.stack([p, q - p, m, o])
            rows = rows.at[jnp.where(done | fin, sb, s)].set(row, mode="drop")
            p2 = q + m
            return (
                jnp.where(done | fin, p, p2),
                jnp.where(done | fin, s, s + 1),
                done | fin,
                rows,
            )

        def body(carry):
            for _ in range(unroll):
                carry = step(carry)
            return carry

        def cond(carry):
            return ~carry[2] & (carry[1] < sb)

        p, s, done, rows = jax.lax.while_loop(
            cond, body, (bs, jnp.int32(0), bs >= n, rows)
        )
        # p = anchor after the last in-block match (tail literals start here)
        return rows, s, p

    starts = jnp.arange(kb, dtype=jnp.int32) * parse_block
    rows, counts, tails = jax.vmap(parse_block_fn)(starts)

    # pending anchor entering each block: last tail among earlier blocks
    # with a match, else 0
    has = counts > 0
    tail_ff = permute.ffill(jnp.where(has, tails, 0), has)
    # pending anchor of block b = last tail among blocks < b (0 before any)
    pending = jnp.concatenate([jnp.zeros((1,), jnp.int32), tail_ff[:-1]])

    # absorb the pending tail into each block's first sequence
    q0 = rows[:, 0, 0] + rows[:, 0, 1]  # first match position
    rows = rows.at[:, 0, 0].set(jnp.where(has, pending, rows[:, 0, 0]))
    rows = rows.at[:, 0, 1].set(jnp.where(has, q0 - pending, rows[:, 0, 1]))

    # final literals-only sequence for the chunk tail
    last_anchor = jnp.where(jnp.any(has), tail_ff[-1], 0)
    final_row = jnp.stack([last_anchor, jnp.maximum(n, 0) - last_anchor, jnp.int32(0), jnp.int32(0)])

    # compact (block, idx) sequences in stream order + append the final row
    bi = jnp.arange(kb, dtype=jnp.int32)[:, None]
    si = jnp.arange(sb, dtype=jnp.int32)[None, :]
    valid = (si < counts[:, None]).reshape(-1)
    order = (bi * sb + si).reshape(-1)
    key = jnp.where(valid, order, _INF)
    flat = rows.reshape(-1, 4)
    _, c0, c1, c2, c3 = jax.lax.sort(
        (key, flat[:, 0], flat[:, 1], flat[:, 2], flat[:, 3]), num_keys=1, is_stable=True
    )
    num_seqs = jnp.sum(valid.astype(jnp.int32))

    def fit(x, fill):
        x = x[:s_max] if x.shape[0] >= s_max else jnp.concatenate(
            [x, jnp.zeros((s_max - x.shape[0],), jnp.int32)]
        )
        return x.at[jnp.minimum(num_seqs, s_max - 1)].set(fill)

    lit_start = fit(c0, final_row[0])
    lit_len = fit(c1, final_row[1])
    match_len = fit(c2, final_row[2])
    offset = fit(c3, final_row[3])
    return lit_start, lit_len, match_len, offset, jnp.minimum(num_seqs + 1, s_max)


def materialize(src_bytes, seqs, total_out, out_cap: int, num_seqs=None):
    """Expand sequences into output bytes.

    seqs = (lit_src, lit_len, out_start, match_len, offset) arrays; literal
    bytes come from ``src_bytes`` (the compressed stream for decompression).
    """
    lit_src, lit_len, out_start, match_len, offset = seqs
    s_max = lit_src.shape[-1]
    si = jnp.arange(s_max, dtype=jnp.int32)
    valid = (lit_len > 0) | (match_len > 0)
    if num_seqs is not None:
        valid &= si < num_seqs
    t = jnp.arange(out_cap, dtype=jnp.int32)

    # per-position sequence params: one scatter + multi-value forward fill
    # (no gathers)
    p_os, p_dst, p_off, p_lsrc = permute.fill_from_markers(
        out_start, valid, [out_start, out_start + lit_len, offset, lit_src], out_cap
    )
    p_off = jnp.maximum(p_off, 1)

    # positions past the real output count as literals so the resolution
    # loop is not kept alive by junk tail entries
    is_lit = (t < p_dst) | (t >= total_out)
    # one-step jump with "resolved" sign-encoded: literals hold the bitwise
    # NOT of their own position; match positions jump out of their own
    # (possibly self-overlapping) copy in closed form.  One gather per
    # doubling iteration.
    jump = jnp.where(
        is_lit, ~t, jnp.clip(p_dst - p_off + ((t - p_dst) % p_off), 0, out_cap - 1)
    )

    def cond(carry):
        cur, it = carry
        return jnp.any(cur >= 0) & (it < 24)

    def body(carry):
        cur, it = carry
        # pointer doubling: cur_k = jump^(2^k); negative entries are resolved
        nxt = cur[jnp.clip(cur, 0, out_cap - 1)]
        return jnp.where(cur < 0, cur, nxt), it + 1

    cur, _ = jax.lax.while_loop(cond, body, (jump, jnp.int32(0)))
    lit_pos = ~cur  # resolved literal positions
    # literal source delta is piecewise-constant: one gather instead of two
    lit_delta = p_lsrc - p_os
    src = lit_delta[jnp.clip(lit_pos, 0, out_cap - 1)] + lit_pos
    out = src_bytes[jnp.clip(src, 0, src_bytes.shape[-1] - 1)]
    return jnp.where(t < total_out, out, 0).astype(jnp.uint8)
