"""Column-major tile primitives for Pallas TPU codec kernels.

Arrays are ``[SUB, L]`` tiles holding a flattened stream in **column-major**
order: element ``i`` lives at ``[i % SUB, i // SUB]`` (SUB = 32 sublanes).
This layout makes "32 consecutive elements" one lane column, which is
exactly one bit-pack group, and it turns every data-dependent permutation
the cascaded/LZ codecs need into log-many roll+select passes:

  - prefix sums / reductions  -> two-level (sublane, lane) log scans
  - stream compaction         -> butterfly left-shift, low->high bit order
  - run expansion / placement -> butterfly right-shift, high->low bit order
  - dynamic placement         -> bit-decomposed grouped rolls

Correctness of the butterfly networks requires monotone move distances
(per segment), which compaction/expansion targets always satisfy; verified
by exhaustive randomized simulation (see tests/test_lanes.py).

Mosaic capability notes (probed on v5e, scripts/mosaic_probe_r2.py):
``pltpu.roll`` with static AND traced shifts works on both axes;
``jnp.cumsum``/``associative_scan``, dynamic-index scalar reads, and
dynamic-offset block stores are NOT supported -- everything here is
full-tile dense ops and rolls only.

These functions run inside Pallas kernels (traced on refs' values) and in
interpret mode; they contain no memory-space operations.

This module is the TPU-native counterpart of the reference's warp/block
primitives (hipcub BlockScan/BlockReduce, warp ballots; reference
src/CascadedKernels.hiph:129-305, src/LZ4Kernels.hiph:219-245).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

SUB = 32  # sublanes per tile; one lane column == one bit-pack group


def _ilog2_ceil(n: int) -> int:
    return max(1, (n - 1).bit_length())


def sublane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def lane_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1)


def flat_iota(shape):
    """Column-major flat index of every slot."""
    return sublane_iota(shape) + shape[0] * lane_iota(shape)


def group_lane_roll(x, q: int, span: int):
    """Roll lanes forward by ``q`` (static) within every ``span``-lane group."""
    q = q % span
    if q == 0:
        return x
    if x.dtype == jnp.bool_:
        # Mosaic's tpu.rotate rejects i1 vectors (crashes the remote
        # compiler); roll masks as int32.
        return group_lane_roll(x.astype(jnp.int32), q, span) != 0
    if span == x.shape[1]:
        return pltpu.roll(x, q, axis=1)
    a = pltpu.roll(x, q, axis=1)
    b = pltpu.roll(x, (q - span) % x.shape[1], axis=1)
    lane_in = lane_iota(x.shape) % span
    return jnp.where(lane_in >= q, a, b)


def flat_roll_static(x, d: int, span: int):
    """Circular column-major roll by static ``d`` within ``span``-lane groups
    (element i -> i + d mod span*SUB, groups independent)."""
    s = x.shape[0]
    total = span * s
    d = d % total
    if d == 0:
        return x
    if x.dtype == jnp.bool_:
        return flat_roll_static(x.astype(jnp.int32), d, span) != 0
    r, q = d % s, d // s
    if r == 0:
        return group_lane_roll(x, q, span)
    y = pltpu.roll(x, r, axis=0)
    lo = group_lane_roll(y, q, span)       # sublanes that did not wrap
    hi = group_lane_roll(y, q + 1, span)   # wrapped sublanes advance a lane
    return jnp.where(sublane_iota(x.shape) < r, hi, lo)


def flat_roll_dynamic(x, d, span: int):
    """Circular column-major roll by a traced per-group ``d``.

    ``d`` is an int32 [SUB, L] array constant within each ``span``-lane
    group (broadcast per-group shift).  Bit-decomposed into
    log2(span*SUB) static-shift passes selected by d's bits.
    """
    total = span * x.shape[0]
    nbits = _ilog2_ceil(total)
    d = d.astype(jnp.int32) % total
    for s in range(nbits):
        moved = flat_roll_static(x, 1 << s, span)
        x = jnp.where((d >> s) & 1 == 1, moved, x)
    return x


def seg_cumsum(x, span: int, *, exclusive: bool = False, max_active=None):
    """Per-group inclusive (or exclusive) prefix sum over column-major order.

    Two-level Hillis-Steele: sublane scan within columns, lane scan of
    column totals within each ``span``-lane group, then combine.

    ``max_active``: optional traced scalar that must upper-bound BOTH the
    highest flat slot any consumer reads the cumsum at and the highest
    flat slot holding nonzero input, per group (the union of the two
    requirements; under-bounding either silently corrupts prefix sums).
    Lane-scan stages that only propagate into columns past the last
    occupied one are skipped at run time (a lax.cond per stage).  Values
    at flat slots >= max_active are then garbage-partial -- callers must
    mask by their own validity bound.  The per-group MAX of the result is
    still exact (partial sums never exceed the true total, which is fully
    propagated to the last occupied slot).
    """
    s = x.shape[0]
    si = sublane_iota(x.shape)
    # sublane-dimension scan (within each lane column)
    acc = x
    step = 1
    while step < s:
        sh = pltpu.roll(acc, step, axis=0)
        acc = acc + jnp.where(si >= step, sh, 0).astype(acc.dtype)
        step <<= 1
    # column totals, broadcast down the column
    tot = jax.lax.broadcast_in_dim(acc[s - 1 : s, :], acc.shape, (0, 1))
    # lane scan of column totals within the group (exclusive)
    li = lane_iota(x.shape) % span
    col = jnp.zeros_like(tot) + tot
    prev = jnp.zeros_like(tot)
    step = 1
    while step < span:

        def lstage(args, step=step):
            col, prev = args
            sh = group_lane_roll(col, step, span)
            add = jnp.where(li >= step, sh, 0).astype(col.dtype)
            return col + add, prev + add

        if max_active is None:
            col, prev = lstage((col, prev))
        else:
            # stage `step` first matters for column index `step`; the last
            # occupied column is (max_active-1)//s, so run iff
            # (max_active-1)//s >= step  <=>  max_active > step*s
            col, prev = jax.lax.cond(
                max_active > step * s, lstage, lambda a: a, (col, prev)
            )
        step <<= 1
    out = acc + prev
    if exclusive:
        sh = flat_roll_static(out, 1, span)
        out = jnp.where(flat_iota(x.shape) % (span * s) == 0, 0, sh).astype(x.dtype)
    return out


def seg_reduce(x, span: int, op: str):
    """Per-group reduction over column-major groups of ``span`` lanes,
    result broadcast to every slot of the group.  op in {sum,min,max,or}."""
    fns = {
        "sum": jnp.add,
        "min": jnp.minimum,
        "max": jnp.maximum,
        "or": jnp.bitwise_or,
    }
    f = fns[op]
    s = x.shape[0]
    acc = x
    step = 1
    while step < s:  # sublane tree (circular roll is fine: full fold)
        acc = f(acc, pltpu.roll(acc, step, axis=0))
        step <<= 1
    step = 1
    while step < span:  # lane tree within group
        acc = f(acc, group_lane_roll(acc, step, span))
        step <<= 1
    return acc


def butterfly_left(payloads, dist, valid, span: int, nbits: int | None = None,
                   max_dist=None):
    """Move element at flat position i to i - dist[i] (within its group).

    Targets must be distinct with nondecreasing ``dist`` per group
    (compaction / left-packing).  Bits processed low -> high.
    Returns (payloads', valid').

    dist and valid are fused into one state tensor (-1 = empty slot) so each
    stage rolls len(payloads) + 1 tensors and derives both the incoming and
    the vacated masks from the single rolled state.

    ``max_dist``: optional traced scalar upper bound on dist; stages whose
    step exceeds it are skipped at run time (a lax.cond per stage) -- since
    state only ever decreases, no element can carry bit s once
    max_dist < 2^s.  Worth it when dists are usually tiny (e.g. run
    compaction with no empty runs).
    """
    total = span * payloads[0].shape[0]
    nbits = nbits or _ilog2_ceil(total)
    state = jnp.where(valid, dist.astype(jnp.int32), -1)
    for s in range(nbits):
        step = 1 << s

        def stage(args, step=step, s=s):
            payloads, state = args
            rolled = flat_roll_static(state, -step, span)
            incoming = rolled >= step
            incoming &= (rolled >> s) & 1 == 1
            moving_away = (state >= step) & ((state >> s) & 1 == 1)
            payloads = [
                jnp.where(incoming, flat_roll_static(p, -step, span), p)
                for p in payloads
            ]
            state = jnp.where(
                incoming, rolled - step, jnp.where(moving_away, -1, state)
            )
            return payloads, state

        if max_dist is None:
            payloads, state = stage((payloads, state))
        else:
            payloads, state = jax.lax.cond(
                max_dist >= step, stage, lambda a: a, (payloads, state)
            )
    return payloads, state >= 0


def butterfly_right(payloads, dist, valid, span: int, nbits: int | None = None,
                    max_dist=None):
    """Move element at flat position i to i + dist[i] (within its group).

    Targets must be distinct with nondecreasing ``dist`` per group
    (expansion / monotone placement).  Bits processed high -> low.
    Returns (payloads', valid').  Same fused-state scheme as butterfly_left.

    ``max_dist``: optional traced scalar upper bound on dist; stages whose
    step exceeds it are identity (no element carries that bit) and are
    skipped at run time with a lax.cond per stage.
    """
    total = span * payloads[0].shape[0]
    nbits = nbits or _ilog2_ceil(total)
    state = jnp.where(valid, dist.astype(jnp.int32), -1)
    for s in reversed(range(nbits)):
        step = 1 << s

        def stage(args, step=step, s=s):
            payloads, state = args
            rolled = flat_roll_static(state, step, span)
            incoming = rolled >= step
            incoming &= (rolled >> s) & 1 == 1
            moving_away = (state >= step) & ((state >> s) & 1 == 1)
            payloads = [
                jnp.where(incoming, flat_roll_static(p, step, span), p)
                for p in payloads
            ]
            state = jnp.where(
                incoming, rolled - step, jnp.where(moving_away, -1, state)
            )
            return payloads, state

        if max_dist is None:
            payloads, state = stage((payloads, state))
        else:
            payloads, state = jax.lax.cond(
                max_dist >= step, stage, lambda a: a, (payloads, state)
            )
    return payloads, state >= 0


def butterfly_left_or(payload, dist, valid, span: int, nbits: int | None = None):
    """butterfly_left variant that OR-merges collisions.

    Requires ``dist`` nondecreasing per group AND targets (i - dist[i])
    nondecreasing (duplicates allowed).  Under those conditions any two
    elements colliding at an intermediate stage provably share the same
    final target (their dists differ by the already-processed shift), so
    OR-merging is exact.  Used for bit packing where several elements'
    shifted contributions land in the same output word.

    Returns (payload', valid').
    """
    total = span * payload.shape[0]
    nbits = _ilog2_ceil(total) if nbits is None else nbits
    zero = jnp.zeros_like(payload)
    state = jnp.where(valid, dist.astype(jnp.int32), -1)
    for s in range(nbits):
        step = 1 << s
        rolled = flat_roll_static(state, -step, span)
        incoming = (rolled >= step) & ((rolled >> s) & 1 == 1)
        moving_away = (state >= step) & ((state >> s) & 1 == 1)
        stay = (state >= 0) & ~moving_away
        inc_p = flat_roll_static(payload, -step, span)
        payload = jnp.where(stay, payload, zero) | jnp.where(incoming, inc_p, zero)
        state = jnp.where(incoming, rolled - step, jnp.where(stay, state, -1))
    return payload, state >= 0


def pack_columns(e, bw, n):
    """Bit-pack each lane column (32 consecutive elements) into words.

    ``e``: uint32 [SUB, L] FOR-subtracted values; ``bw``: int32 bit width
    (broadcast per column); ``n``: int32 valid-element count (broadcast per
    column) -- elements j >= n must already be zero.

    Word w of a column holds bits [32w, 32w+32) of the column's bit stream
    (element j at bits [j*bw, (j+1)*bw), little-endian), matching the
    reference layout (src/CascadedKernels.hiph:483-553).  Rows w >= bw are
    zero.  ~8x cheaper than pack_allpairs: two 5-pass sublane
    butterfly-OR compactions instead of a 32-term fold.
    """
    j = sublane_iota(e.shape)
    bw = bw.astype(jnp.int32)
    bit0 = j * bw
    t = bit0 >> 5  # target word row of the low part
    off = bit0 & 31
    u32 = e.astype(jnp.uint32)
    lo = jnp.where(off < 32, u32 << off.astype(jnp.uint32), 0)
    # high part spills into word t+1 only when off + bw > 32 (off > 0 there)
    sh = (32 - off).astype(jnp.uint32)
    hi = jnp.where(off > 0, u32 >> sh, 0)
    valid = j < n
    wlo, oklo = butterfly_left_or(lo, j - t, valid, 1, nbits=5)
    whi, okhi = butterfly_left_or(hi, j - t - 1, valid & (off + bw > 32) & (j >= 1), 1, nbits=5)
    out = jnp.where(oklo, wlo, 0) | jnp.where(okhi, whi, 0)
    # zero rows at/after the data word count (ceil(n*bw/32))
    nw = (n * bw + 31) >> 5
    return jnp.where(j < nw, out, 0)


def unpack_columns(words, bw, nmax: int | None = None):
    """Inverse of pack_columns: element j of each column reads its ``bw``
    bits from words (j*bw)>>5 and +1.

    ``words``: uint32 [SUB, L]; ``bw`` broadcast per column.  Returns the
    FOR-relative element values (all 32 rows; caller masks by n).

    Places each word at the first element that reads it as its low word
    (distinct monotone targets), forward-fills down the column, and pairs
    it with the next word (pre-rolled) filled along the same route.
    """
    j = sublane_iota(words.shape)
    bw = bw.astype(jnp.int32)
    bit0 = j * bw
    w_lo = bit0 >> 5  # word row needed by element j (<= j)
    off = bit0 & 31
    nxt = pltpu.roll(words, words.shape[0] - 1, axis=0)  # row w holds word w+1
    # word row w first serves element ceil(32w / bw); bw == 0 -> no data
    bwc = jnp.maximum(bw, 1)
    first_elem = (j * 32 + bwc - 1) // bwc
    # elements move right from word-row position to first-reader position
    valid = (first_elem < words.shape[0]) & (j * 32 < 32 * bwc)  # row < bw
    (v_lo, v_hi), ok = butterfly_right(
        [words, nxt], jnp.where(valid, first_elem - j, 0), valid, 1, nbits=5
    )
    v_lo = jnp.where(ok, v_lo, 0)
    v_hi = jnp.where(ok, v_hi, 0)
    v_lo = ffill(v_lo, ok, 1)
    v_hi = ffill(v_hi, ok, 1)
    lo = jnp.where(off < 32, v_lo >> off.astype(jnp.uint32), 0)
    sh = (32 - off).astype(jnp.uint32)
    hi = jnp.where(off > 0, v_hi << sh, 0)
    mask = jnp.where(
        bw >= 32,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << jnp.minimum(bw, 31).astype(jnp.uint32)) - 1,
    )
    return (lo | hi) & mask


def div_dyn(x, d, nbits: int):
    """Elementwise floor(x / d) for traced positive ``d`` via binary search
    over the quotient (Mosaic has no integer divide).  Quotient must fit in
    ``nbits`` bits; x >= 0."""
    x = x.astype(jnp.int32)
    d = d.astype(jnp.int32)
    q = jnp.zeros_like(x)
    for s in reversed(range(nbits)):
        cand = q | (1 << s)
        q = jnp.where(cand * d <= x, cand, q)
    return q


def ffill(vals, is_src, span: int, max_gap=None):
    """Forward fill within groups over column-major order: each slot takes
    the value of the nearest source at or before it (log passes).

    ``max_gap``: optional traced scalar bound on the largest distance any
    slot is from its source; later passes are skipped at run time once
    every slot within max_gap is filled (fill reach doubles per pass)."""
    total = span * vals.shape[0]
    fi = flat_iota(vals.shape) % total
    # the skip-cond carries masks as i32: Mosaic rejects scf.if regions
    # yielding i1 vectors
    src_i = is_src.astype(jnp.int32)
    step = 1
    while step < total:

        def fpass(args, step=step):
            vals, src_i = args
            is_src = src_i != 0
            v_sh = flat_roll_static(vals, step, span)
            f_sh = flat_roll_static(is_src, step, span)
            take = ~is_src & f_sh & (fi >= step)
            vals = jnp.where(take, v_sh, vals)
            is_src = is_src | (f_sh & (fi >= step))
            return vals, is_src.astype(jnp.int32)

        if max_gap is None:
            vals, src_i = fpass((vals, src_i))
        else:
            vals, src_i = jax.lax.cond(
                max_gap >= step, fpass, lambda a: a, (vals, src_i)
            )
        step <<= 1
    return vals


def pack_allpairs(e, bw, span: int, max_w: int = 32):
    """Bit-pack each lane column (32 consecutive elements) into words.

    ``e``: uint32 [SUB, L] FOR-subtracted values (invalid elements zero).
    ``bw``: int32 [SUB, L] per-slot bit width (broadcast per ``span`` group).
    Output word ``w`` of the group at column position [w, g]:
        W[w, g] = OR_j  e[j, g] <<or>> (j*bw - 32w)
    Words beyond ceil(32*bw/32)=bw per column are zero.  ``max_w`` caps the
    emitted word rows (16 suffices for uint16 inputs).

    Mirrors the reference's bit layout (src/CascadedKernels.hiph:483-553):
    element i occupies bits [i*bw, (i+1)*bw) of a little-endian u32 stream.
    """
    s = e.shape[0]
    j = sublane_iota(e.shape)
    jb = j * bw  # start bit of element j within its group stream
    out = jnp.zeros_like(e)
    for w in range(max_w):
        t = jb - 32 * w  # shift amount for element j's contribution to word w
        left = jnp.where((t >= 0) & (t < 32), e << t.astype(jnp.uint32), 0)
        tn = -t
        right = jnp.where((tn > 0) & (tn < 32), e >> tn.astype(jnp.uint32), 0)
        contrib = (left | right).astype(jnp.uint32)
        word = seg_reduce(contrib, 1, "or")  # fold 32 sublanes of each column
        out = jnp.where(sublane_iota(e.shape) == w, word, out)
    return out


def unpack_allpairs(words, bw, span: int, max_w: int = 32):
    """Inverse of pack_allpairs: element j of each column reads its bw bits
    from words w = floor(j*bw/32) and w+1.

        elem[j, g] = OR_w  words[w, g] >>or<< (32w - j*bw)   masked to bw bits
    """
    j = sublane_iota(words.shape)
    jb = j * bw
    out = jnp.zeros_like(words)
    for w in range(max_w):
        # broadcast word row w down each column, then shift per output element
        word = seg_reduce(
            jnp.where(sublane_iota(words.shape) == w, words, 0).astype(jnp.uint32),
            1,
            "or",
        )
        t = 32 * w - jb  # left-shift amount of word w's contribution to element j
        left = jnp.where((t > 0) & (t < 32), word << t.astype(jnp.uint32), 0)
        tn = -t
        right = jnp.where((tn >= 0) & (tn < 32), word >> tn.astype(jnp.uint32), 0)
        out = out | (left | right).astype(jnp.uint32)
    mask = jnp.where(
        bw >= 32, jnp.uint32(0xFFFFFFFF), (jnp.uint32(1) << jnp.minimum(bw, 31).astype(jnp.uint32)) - 1
    )
    return out & mask


def regroup_scalar(t, span_src: int, n_groups: int, span_dst: int):
    """Transfer per-group broadcast scalars between group layouts.

    ``t``: [SUB, n_groups*span_src] tile whose value is uniform within each
    span_src-lane group.  Returns [SUB, n_groups*span_dst] with group g's
    scalar broadcast over span_dst lanes.  (Lane-crossing reshapes are not
    available in Mosaic; this is K slices + broadcasts + one concat.)
    """
    parts = []
    for g in range(n_groups):
        col = t[:, g * span_src : g * span_src + 1]
        parts.append(jax.lax.broadcast_in_dim(col, (t.shape[0], span_dst), (0, 1)))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


def select_word(x, pos):
    """Extract the value at traced column-major flat position ``pos`` as a
    broadcast [SUB, L] array (mask + full OR-reduce; no dynamic indexing)."""
    hit = flat_iota(x.shape) == pos
    masked = jnp.where(hit, x, 0).astype(x.dtype)
    return seg_reduce(masked, x.shape[1], "or")
