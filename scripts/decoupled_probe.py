"""Decoupled parse/materialize probe for the LZ4 decode kernel (VERDICT r3 #1).

The reference's answer to LZ decode serialization is the 3-warp pipeline
(decode warp batches symbols into a queue, process warp drains it --
reference src/snappy/decompression.hiph:166-181).  The TPU analogue would be:
scalar core parses W sequences into an SMEM descriptor queue, then a vector
phase executes W granule moves back-to-back.  Before building that kernel,
this probe bounds its best case by SPLITTING the production loop into its
two halves and timing each against the production interleaved kernel on the
same data:

  - DRAIN kernel: descriptors are precomputed on the host (parse cost
    exactly zero); the loop pops 3 SMEM words per sequence and runs the
    production _granule_mover.  Its rate is an upper bound on ANY
    decoupled kernel's move phase (a real one still pays the parse
    somewhere).
  - PARSE kernel: the production loop with the two granule moves replaced
    by scalar state accounting (identical iteration structure and counts,
    no vector work).  Its rate bounds the parse phase.

If drain_time + parse_time ~= production_time, the phases already overlap
as well as they can and decoupling is dead (publish the floor:
production ~ drain means the moves bound it; the per-seq op-count floor is
N_seq x measured drain cost/seq).  If production_time >> max(drain, parse),
the interleave is losing real time to cross-phase serialization and the
full decoupled kernel is worth building.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/decoupled_probe.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpucomp.kernels.lz_pallas import (
    GMOVE,
    LEAD,
    ROWB,
    ROWW,
    _cdiv,
    _granule_mover,
    _li,
    _rup,
    _u,
)
from tpucomp.utils import bits


# --------------------------------------------------------------------------
# host-side sequence delimiter (numpy oracle of codecs/lz4._delimit)


def delimit_host(stream: bytes):
    """[(lit_src, lit_len, mlen, off)] for one LZ4 block stream."""
    seqs = []
    p, n = 0, len(stream)
    while p < n:
        tok = stream[p]
        p += 1
        llen = tok >> 4
        if llen == 15:
            while True:
                b = stream[p]
                p += 1
                llen += b
                if b != 255:
                    break
        lit_src = p
        p += llen
        if p >= n:
            seqs.append((lit_src, llen, 0, 1))
            break
        off = stream[p] | (stream[p + 1] << 8)
        p += 2
        mlen = tok & 15
        if mlen == 15:
            while True:
                b = stream[p]
                p += 1
                mlen += b
                if b != 255:
                    break
        seqs.append((lit_src, llen, mlen + 4, off))
    return seqs


# --------------------------------------------------------------------------
# DRAIN kernel: pop descriptors from SMEM, run the production mover


def _drain_kernel(rw: int, rt: int, r_res: int, K: int, S: int,
                  ns_ref, in_ref, dv_ref, uv_ref, ws_ref, sem):
    # in_ref is the VMEM input aliased onto uv_ref (the output); all
    # reads/writes go through uv_ref, mirroring the production kernel
    drows = dv_ref.shape[1]
    cp = pltpu.make_async_copy(dv_ref, ws_ref, sem)
    cp.start()
    cp.wait()

    def mk_chunk(k):
        nseq = ns_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(uv_ref[k, pl.ds(r0, 16), :])

        move_granule = _granule_mover(k, get16d, uv_ref, rw)

        def step(c):
            si, o, rem_lit, lit_src, rem_m, m_ext = c
            pending = (rem_lit > 0) | (rem_m > 0)
            pop = ~pending & (si < nseq)
            # 3 SMEM scalar loads per sequence (the descriptor "queue").
            # Word 2 packs off (16 bits, may occupy the sign bit) with a
            # biased match length (mlen in {0} u [4, 65536] -> {0} u
            # [1, 65533], 16 bits): the previous `off << 17 | mlen` form
            # overflowed int32 for offsets >= 16384 and mis-decoded; a
            # 4-words-per-seq table would exceed the 1 MB SMEM scratch.
            base = si * 3
            idx = jnp.clip(base, 0, drows * ROWW - 3)
            w0 = ws_ref[k, idx // ROWW, idx % ROWW]
            w1 = ws_ref[k, (idx + 1) // ROWW, (idx + 1) % ROWW]
            w2 = ws_ref[k, (idx + 2) // ROWW, (idx + 2) % ROWW]
            mlen_b = w2 & 0xFFFF
            rem_lit = jnp.where(pop, w1, rem_lit)
            lit_src = jnp.where(pop, w0, lit_src)
            rem_m = jnp.where(pop, jnp.where(mlen_b > 0, mlen_b + 3, 0), rem_m)
            m_ext = jnp.where(pop, jnp.maximum((w2 >> 16) & 0xFFFF, 1), m_ext)
            si = jnp.where(pop, si + 1, si)
            ok = jnp.bool_(True)
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            return (si, o, rem_lit, lit_src, rem_m, m_ext)

        init = tuple(jnp.int32(0) for _ in range(6))

        def active(c):
            return (c[0] < nseq) | (c[2] > 0) | (c[4] > 0)

        def finalize(c):
            o = c[1]
            li = _li((1, ROWW))
            row = jnp.where(li == 0, o, 0)
            uv_ref[k, rw + r_res : rw + r_res + 1, :] = row.astype(uv_ref.dtype)

        return init, step, active, finalize

    chunks = [mk_chunk(k) for k in range(K)]

    def cond(cs):
        a = chunks[0][2](cs[0])
        for k, c in enumerate(cs[1:], 1):
            a = a | chunks[k][2](c)
        return a

    def body(cs):
        return tuple(chunks[k][1](c) for k, c in enumerate(cs))

    finals = jax.lax.while_loop(cond, body, tuple(ch[0] for ch in chunks))
    for k, c in enumerate(finals):
        chunks[k][3](c)


@functools.partial(jax.jit, static_argnames=("out_capacity", "kpack", "s_max", "interpret"))
def drain(comp, nseqs, desc, out_capacity: int, kpack: int = 8, s_max: int = 8192,
          interpret: bool = False):
    b, cmax = comp.shape
    rc = _rup(_cdiv(cmax, ROWB), 8)
    K = kpack
    bp = _rup(b, K)
    rw = LEAD + rc + 32
    ro = _cdiv(out_capacity, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rt = _rup(r_res + 1, 8)
    ru = rw + rt
    pad = ru * ROWB - cmax - LEAD * ROWB
    lead = jnp.zeros((b, LEAD * ROWB), jnp.uint8)
    cw = jnp.concatenate([comp[:, :cmax], jnp.zeros((b, pad), jnp.uint8)], axis=1)
    cw = jnp.concatenate([lead, cw], axis=1)
    uv = bits.bytes_to_units_le(cw, 4).astype(jnp.int32).reshape(bp, ru, ROWW)
    drows = _rup(_cdiv(s_max * 3, ROWW), 8)
    dv = jnp.zeros((bp, drows, ROWW), jnp.int32)
    dv = dv.at[:, : desc.shape[1] // ROWW, :].set(
        desc[:, : (desc.shape[1] // ROWW) * ROWW].reshape(bp, -1, ROWW)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // K,),
        in_specs=[
            pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, drows, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((K, drows, ROWW), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_drain_kernel, rw, rt, r_res, K, s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, ru, ROWW), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(nseqs, uv, dv)
    out = out[:b]
    lengths = out[:, rw + r_res, 0].astype(jnp.int32)
    data = bits.units_to_bytes_le(
        out[:, rw + LEAD : rw + LEAD + ro].astype(jnp.uint32).reshape(b, ro * ROWW)
    )[:, :out_capacity]
    return data, lengths


# --------------------------------------------------------------------------
# PARSE kernel: production loop with the vector mover stubbed to accounting


def _parse_kernel(rc: int, rw: int, rt: int, r_res: int, out_cap: int, K: int,
                  size_ref, in_ref, uv_ref, ws_ref, sem):
    from tpucomp.kernels.lz_pallas import _read_win, _first_diff_tile, TB

    nsb = rc * ROWB
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

        def consume(o, rem_lit, lit_src, rem_m, m_ext, ok):
            # scalar accounting of one granule move (no vector work)
            do_lit = rem_lit > 0
            pend = do_lit | (rem_m > 0)
            g = jnp.minimum(
                jnp.where(do_lit, rem_lit, jnp.minimum(rem_m, m_ext)), GMOVE
            )
            g = jnp.where(ok & pend, g, 0)
            m_ext = jnp.where(~do_lit & (g == m_ext), m_ext * 2, m_ext)
            o = o + g
            rem_lit = jnp.where(do_lit, rem_lit - g, rem_lit)
            lit_src = jnp.where(do_lit, lit_src + g, lit_src)
            rem_m = jnp.where(do_lit, rem_m, rem_m - g)
            return o, rem_lit, lit_src, rem_m, m_ext

        def step(c):
            p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok = c
            no_pending = (rem_lit == 0) & (rem_m == 0)
            do_parse = no_pending & ~last_seen & ok
            token = byte_at(p)
            lnib = token >> 4
            mnib = token & 15
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

            o, rem_lit, lit_src, rem_m, m_ext = consume(o, rem_lit, lit_src, rem_m, m_ext, ok)
            o, rem_lit, lit_src, rem_m, m_ext = consume(o, rem_lit, lit_src, rem_m, m_ext, ok)
            return (p, o, rem_lit, lit_src, rem_m, m_ext, last_seen, ok)

        init = (
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.int32(1), comp_len <= 0, comp_len >= 0,
        )

        def finalize(c):
            o, ok = c[1], c[7]
            li = _li((1, ROWW))
            row = jnp.where(li == 0, jnp.where(ok, o, 0), 0)
            uv_ref[k, rw + r_res : rw + r_res + 1, :] = row.astype(uv_ref.dtype)

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


@functools.partial(jax.jit, static_argnames=("out_capacity", "kpack"))
def parse_only(comp, comp_sizes, out_capacity: int, kpack: int = 8):
    from tpucomp.kernels.lz_pallas import SMEM_ROWS_BUDGET

    b, cmax = comp.shape
    rc = _rup(_cdiv(cmax, ROWB), 8)
    K = max(1, min(kpack, b, SMEM_ROWS_BUDGET // rc))
    bp = _rup(b, K)
    rw = LEAD + rc + 32
    ro = _cdiv(out_capacity, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rt = _rup(r_res + 1, 8)
    ru = rw + rt
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
        out_specs=pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((K, rc, ROWW), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_parse_kernel, rc, rw, rt, r_res, out_capacity, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, ru, ROWW), jnp.int32),
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(sizes, uv)
    out = out[:b]
    return out[:, rw + r_res, 0].astype(jnp.int32)


# --------------------------------------------------------------------------


def main():
    from bench import load_corpus
    from tpucomp.codecs import lz4
    from tpucomp.kernels import lz_pallas as lzp

    print("devices", jax.devices(), flush=True)
    C = 65536
    B = 128  # 8 MB
    corpus = load_corpus(B * C, seed=1)
    arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
    da = jnp.asarray(arr)
    dl = jnp.full((B,), C, jnp.int32)
    comp, sizes = lz4.compress(da, dl)
    csz = np.asarray(sizes)
    comp_np = np.asarray(comp)
    print(f"encoded: ratio {B*C/float(csz.sum()):.2f}", flush=True)

    # host delimit -> descriptor tables
    all_seqs = [delimit_host(comp_np[i, : csz[i]].tobytes()) for i in range(B)]
    nseq = np.array([len(s) for s in all_seqs], np.int32)
    s_max = (int(nseq.max()) + 511) // 512 * 512
    assert s_max <= 10240, nseq.max()
    print(f"sequences/chunk: mean {nseq.mean():.0f} max {nseq.max()}", flush=True)
    # word 2 = off<<16 | biased mlen (see _drain_kernel): both fields fit
    # 16 bits, unlike the former off<<17|mlen packing which overflowed
    desc = np.zeros((B, s_max * 3), np.int32)
    for i, seqs in enumerate(all_seqs):
        a = np.asarray(seqs, np.uint32)
        if len(a):
            d = np.empty((len(a), 3), np.uint32)
            d[:, 0] = a[:, 0]
            d[:, 1] = a[:, 1]
            mlen_b = np.where(a[:, 2] > 0, a[:, 2] - 3, 0)
            d[:, 2] = (a[:, 3] << np.uint32(16)) | mlen_b
            desc[i, : len(a) * 3] = d.reshape(-1).view(np.int32)
    dnseq = jnp.asarray(nseq)
    ddesc = jnp.asarray(desc)

    def timeit(fn, label, reps=8):
        out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.device_get(jax.tree_util.tree_leaves(out)[0][:2])
        dt = (time.perf_counter() - t0) / reps
        mb = B * C / 1e6
        print(f"{label}: {dt*1e3:.1f} ms for {mb:.0f} MB -> {mb/1e3/dt:.3f} GB/s", flush=True)
        return out, dt

    # production kernel
    (outp, dtp) = timeit(lambda: lzp.decompress(comp, sizes, C), "production")
    ok = (np.asarray(outp[0]) == arr).all() and (np.asarray(outp[2]) == 0).all()
    print("production correctness:", "OK" if ok else "FAIL", flush=True)

    # drain-only
    (outd, dtd) = timeit(lambda: drain(comp, dnseq, ddesc, C, s_max=s_max), "drain-only")
    okd = (np.asarray(outd[0]) == arr).all() and (np.asarray(outd[1]) == C).all()
    print("drain correctness:", "OK" if okd else "FAIL", flush=True)
    if not okd:
        od = np.asarray(outd[0])
        bad = [i for i in range(B) if not (od[i] == arr[i]).all()]
        print("bad rows:", bad[:8], "lens", np.asarray(outd[1])[bad[:8]], flush=True)

    # parse-only
    (outl, dtl) = timeit(lambda: parse_only(comp, sizes, C), "parse-only")
    okl = (np.asarray(outl) == C).all()
    print("parse totals:", "OK" if okl else f"FAIL {np.asarray(outl)[:8]}", flush=True)

    print(
        f"SPLIT: production {dtp*1e3:.1f} ms = drain {dtd*1e3:.1f} + parse {dtl*1e3:.1f} "
        f"(sum {1e3*(dtd+dtl):.1f}); decoupling bound {dtp/max(dtd, dtl):.2f}x",
        flush=True,
    )

    # ---- load balance: cells run until their slowest chunk finishes, and
    # mixed-corpus chunk costs vary ~100x (text ~5K seqs, runs ~300, random
    # ~40 iters).  Sorting chunks by descriptor count before K-grouping
    # bounds the straggler waste; measure production AND drain on the
    # sorted batch (decode of a permuted batch is the same work).
    order = np.argsort(-nseq, kind="stable")
    comp_s = jnp.asarray(comp_np[order])
    sizes_s = jnp.asarray(csz[order])
    arr_s = arr[order]
    (outps, dtps) = timeit(lambda: lzp.decompress(comp_s, sizes_s, C), "production-sorted")
    okps = (np.asarray(outps[0]) == arr_s).all() and (np.asarray(outps[2]) == 0).all()
    print("production-sorted correctness:", "OK" if okps else "FAIL", flush=True)
    dnseq_s = jnp.asarray(nseq[order])
    ddesc_s = jnp.asarray(desc[order])
    (outds, dtds) = timeit(
        lambda: drain(comp_s, dnseq_s, ddesc_s, C, s_max=s_max), "drain-sorted"
    )
    okds = (np.asarray(outds[0]) == arr_s).all()
    print("drain-sorted correctness:", "OK" if okds else "FAIL", flush=True)
    print(
        f"BALANCE: production {dtp*1e3:.1f} -> sorted {dtps*1e3:.1f} ms "
        f"({dtp/dtps:.2f}x); drain {dtd*1e3:.1f} -> sorted {dtds*1e3:.1f} ms "
        f"({dtd/dtds:.2f}x)",
        flush=True,
    )
    print("DONE", flush=True)


def drain2_main():
    """K-sweep of the scratch-free drain (results: /tmp/drain2.log, PERF.md)."""
    import sys as _sys
    from bench import load_corpus
    from tpucomp.codecs import lz4

    print("devices", jax.devices(), flush=True)
    C, B = 65536, 128
    corpus = load_corpus(B * C, seed=1)
    arr = np.frombuffer(corpus, np.uint8).reshape(B, C)
    comp, sizes = lz4.compress(jnp.asarray(arr), jnp.full((B,), C, jnp.int32))
    csz = np.asarray(sizes)
    comp_np = np.asarray(comp)
    all_seqs = [delimit_host(comp_np[i, : csz[i]].tobytes()) for i in range(B)]
    nseq = np.array([len(s) for s in all_seqs], np.int32)
    s_max = (int(nseq.max()) + 511) // 512 * 512
    desc4 = np.zeros((B, s_max * 4), np.int32)
    for i, seqs in enumerate(all_seqs):
        a = np.asarray(seqs, np.int32)
        desc4[i, : a.size] = a.reshape(-1)
    dn, dd = jnp.asarray(nseq), jnp.asarray(desc4)
    for K in (8, 4, 2, 1):
        out = drain2(comp, dn, dd, C, kpack=K, s_max=s_max)
        jax.device_get(out[1][:2])
        ok = (np.asarray(out[0]) == arr).all() and (np.asarray(out[1]) == C).all()
        t0 = time.perf_counter()
        for _ in range(8):
            out = drain2(comp, dn, dd, C, kpack=K, s_max=s_max)
        jax.device_get(out[1][:2])
        dt = (time.perf_counter() - t0) / 8
        print(f"DRAIN2 K={K}: {dt*1e3:6.1f} ms -> {B*C/1e9/dt:.4f} GB/s ok={ok}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    import sys as _sys

    if "--drain2" in _sys.argv:
        drain2_main()
    else:
        main()


# --------------------------------------------------------------------------
# DRAIN-V2: no SMEM scratch / no entry DMA (descriptors read by VMEM word
# extraction).  Tests whether the shared SMEM scratch + staging DMA is what
# serializes grid cells: the vector megacore probe (scripts history) showed
# scratch-free latency-bound cell bodies overlap ~2x at grid=2 for free.


def _drain2_kernel(rw: int, rt: int, r_res: int, K: int, S: int,
                   ns_ref, in_ref, dv_ref, uv_ref):
    from tpucomp.kernels.lz_pallas import _extract_word

    drows = dv_ref.shape[1]

    def mk_chunk(k):
        nseq = ns_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(uv_ref[k, pl.ds(r0, 16), :])

        def tbl(x):
            e = jnp.clip(x, 0, drows * ROWW - 1)
            return _extract_word(
                lambda r: dv_ref[k, pl.ds(jnp.clip(r, 0, drows - 1), 1), :], e
            )

        move_granule = _granule_mover(k, get16d, uv_ref, rw)

        def step(c):
            si, o, rem_lit, lit_src, rem_m, m_ext = c
            pending = (rem_lit > 0) | (rem_m > 0)
            pop = ~pending & (si < nseq)
            base = si * 4
            w0 = tbl(base)
            w1 = tbl(base + 1)
            w2 = tbl(base + 2)
            w3 = tbl(base + 3)
            rem_lit = jnp.where(pop, w1, rem_lit)
            lit_src = jnp.where(pop, w0, lit_src)
            rem_m = jnp.where(pop, w2, rem_m)
            m_ext = jnp.where(pop, jnp.maximum(w3, 1), m_ext)
            si = jnp.where(pop, si + 1, si)
            ok = jnp.bool_(True)
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            o, rem_lit, lit_src, rem_m, m_ext = move_granule(
                o, rem_lit, lit_src, rem_m, m_ext, ok
            )
            return (si, o, rem_lit, lit_src, rem_m, m_ext)

        init = tuple(jnp.int32(0) for _ in range(6))

        def active(c):
            return (c[0] < nseq) | (c[2] > 0) | (c[4] > 0)

        def finalize(c):
            o = c[1]
            li = _li((1, ROWW))
            row = jnp.where(li == 0, o, 0)
            uv_ref[k, rw + r_res : rw + r_res + 1, :] = row.astype(uv_ref.dtype)

        return init, step, active, finalize

    chunks = [mk_chunk(k) for k in range(K)]

    def cond(cs):
        a = chunks[0][2](cs[0])
        for k, c in enumerate(cs[1:], 1):
            a = a | chunks[k][2](c)
        return a

    def body(cs):
        return tuple(chunks[k][1](c) for k, c in enumerate(cs))

    finals = jax.lax.while_loop(cond, body, tuple(ch[0] for ch in chunks))
    for k, c in enumerate(finals):
        chunks[k][3](c)


@functools.partial(jax.jit, static_argnames=("out_capacity", "kpack", "s_max", "interpret"))
def drain2(comp, nseqs, desc4, out_capacity: int, kpack: int = 8, s_max: int = 8192,
           interpret: bool = False):
    b, cmax = comp.shape
    rc = _rup(_cdiv(cmax, ROWB), 8)
    K = kpack
    bp = _rup(b, K)
    rw = LEAD + rc + 32
    ro = _cdiv(out_capacity, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rt = _rup(r_res + 1, 8)
    ru = rw + rt
    pad = ru * ROWB - cmax - LEAD * ROWB
    lead = jnp.zeros((b, LEAD * ROWB), jnp.uint8)
    cw = jnp.concatenate([comp[:, :cmax], jnp.zeros((b, pad), jnp.uint8)], axis=1)
    cw = jnp.concatenate([lead, cw], axis=1)
    uv = bits.bytes_to_units_le(cw, 4).astype(jnp.int32).reshape(bp, ru, ROWW)
    drows = _rup(_cdiv(s_max * 4, ROWW), 8)
    dv = jnp.zeros((bp, drows * ROWW), jnp.int32)
    dv = dv.at[:, : desc4.shape[1]].set(desc4)
    dv = dv.reshape(bp, drows, ROWW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bp // K,),
        in_specs=[
            pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, drows, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, ru, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_drain2_kernel, rw, rt, r_res, K, s_max),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, ru, ROWW), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(nseqs, uv, dv)
    out = out[:b]
    lengths = out[:, rw + r_res, 0].astype(jnp.int32)
    data = bits.units_to_bytes_le(
        out[:, rw + LEAD : rw + LEAD + ro].astype(jnp.uint32).reshape(b, ro * ROWW)
    )[:, :out_capacity]
    return data, lengths
