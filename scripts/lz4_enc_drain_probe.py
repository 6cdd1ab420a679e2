"""LZ4 ENCODE drain probe (VERDICT r4 task 5): the zero-parse encode floor.

Symmetric counterpart of the decode decoupling battery
(scripts/decoupled_probe.py): the production encode loop interleaves
(a) a speculative parse (2 candidate-table extracts), (b) a 4 KB VPU
extension compare with first-diff fold, and (c) one emission granule (an
8-row predicated RMW assembling header || literals || tail).  This probe
host-precomputes the ENTIRE parse -- the per-sequence (llen, mlen, off)
descriptors, recovered by delimiting the production kernel's own output
stream -- and runs a kernel containing ONLY phase (c), popping descriptors
from a prefetched table.  Its rate upper-bounds any encode restructure
that moves parse/extension off the critical path; byte-identity with the
production stream is asserted.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lz4_enc_drain_probe.py
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
    _byte_mask_tile,
    _cdiv,
    _extract_word,
    _field_tile,
    _li,
    _lsic_nb,
    _read_win,
    _rup,
    _u,
)
from tpucomp.kernels import lz_pallas
from tpucomp.utils import bits
from decoupled_probe import delimit_host


def _emit_drain_kernel(rt2: int, ro: int, r_res: int, K: int,
                       size_ref, wv_ref, seq_ref, out_ref):
    """Phase (c) of _lz4_encode_kernel driven by a descriptor table.

    seq_ref words per sequence s: [3s]=llen, [3s+1]=mlen (0 marks the final
    literal run), [3s+2]=offset."""
    GM = GMOVE

    def mk_chunk(k):
        n = size_ref[pl.program_id(0) * K + k]

        def get16d(r0):
            return _u(wv_ref[k, pl.ds(r0, 16), :])

        def tbl_at(x):
            e = jnp.clip(x, 0, rt2 * ROWW - 1)
            return _extract_word(
                lambda r: seq_ref[k, pl.ds(jnp.clip(r, 0, rt2 - 1), 1), :], e
            )

        # carry: p, o, s, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
        #        is_final, done
        def step(c):
            (p, o, s, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
             is_final, done) = c

            # ---- descriptor pop (parse + extension cost exactly zero) ----
            idle = (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0) & ~done
            w0 = tbl_at(3 * s)
            w1 = tbl_at(3 * s + 1)
            w2 = tbl_at(3 * s + 2)
            fin = w1 == 0
            llen = jnp.where(idle, w0, llen)
            mlen = jnp.where(idle, w1, mlen)
            off = jnp.where(idle, w2, off)
            hdr_rem = jnp.where(idle, 1 + _lsic_nb(w0), hdr_rem)
            lit_rem = jnp.where(idle, w0, lit_rem)
            tail_rem = jnp.where(
                idle, jnp.where(fin, 0, 2 + _lsic_nb(w1 - 4)), tail_rem
            )
            is_final = jnp.where(idle, fin, is_final)
            s = jnp.where(idle, s + 1, s)

            # ---- one emission granule (verbatim production phase (c)) ----
            pend = (hdr_rem > 0) | (lit_rem > 0) | (tail_rem > 0)
            emitting = ~done & pend
            hl = 1 + _lsic_nb(llen)
            g = jnp.minimum(hdr_rem + lit_rem + tail_rem, GM)
            g = jnp.where(emitting, g, 0)
            gh = jnp.minimum(hdr_rem, g)
            gl = jnp.minimum(lit_rem, g - gh)
            gt = g - gh - gl
            r0 = o >> 9
            h = o - r0 * 512

            tl = jnp.where(is_final, 0, 2 + _lsic_nb(mlen - 4))
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
            p = jnp.where(completed & ~is_final, p + llen + mlen, p)

            return (p, o, s, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
                    is_final, done)

        init = (
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
            jnp.int32(0), jnp.bool_(False), n <= 0,
        )

        def finalize(c):
            o = c[1]
            li = _li((1, ROWW))
            out_ref[k, r_res : r_res + 1, :] = _u(jnp.where(li == 0, o, 0))

        return init, step, finalize

    chunks = [mk_chunk(k) for k in range(K)]

    def cond(cs):
        a = ~cs[0][10]
        for c in cs[1:]:
            a = a | ~c[10]
        return a

    def body(cs):
        return tuple(chunks[k][1](c) for k, c in enumerate(cs))

    finals = jax.lax.while_loop(cond, body, tuple(ch[0] for ch in chunks))
    for k, c in enumerate(finals):
        chunks[k][2](c)


def emit_drain(data, lengths, seq_tbl, rt2: int, kpack: int = 4):
    from tpucomp.core.sizing import lz4_max_compressed_chunk_size

    b, c = data.shape
    K = max(1, min(kpack, b))
    bp = _rup(b, K)
    assert bp == b, "pad the batch to a kpack multiple host-side"
    out_max = lz4_max_compressed_chunk_size(c)
    ro = _cdiv(out_max, ROWB)
    r_res = LEAD + _rup(ro, 8) + 32
    rto = _rup(r_res + 1, 8)
    rd = _rup(_cdiv(c, ROWB), 8)
    rw = LEAD + rd + 32

    padd = rw * ROWB - c - LEAD * ROWB
    lead = jnp.zeros((b, LEAD * ROWB), jnp.uint8)
    dd = jnp.concatenate([lead, data, jnp.zeros((b, padd), jnp.uint8)], axis=1)
    wv = bits.bytes_to_units_le(dd, 4).astype(jnp.int32).reshape(b, rw, ROWW)
    seq = jnp.asarray(seq_tbl.reshape(b, rt2, ROWW))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // K,),
        in_specs=[
            pl.BlockSpec((K, rw, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, rt2, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, rto, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_emit_drain_kernel, rt2, ro, r_res, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, rto, ROWW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(lengths.astype(jnp.int32), wv, seq)

    sizes = out[:, r_res, 0].astype(jnp.int32)
    comp = bits.units_to_bytes_le(
        out[:, LEAD : LEAD + ro].reshape(b, ro * ROWW)
    )[:, :out_max]
    pos = jnp.arange(out_max, dtype=jnp.int32)[None, :]
    comp = jnp.where(pos < sizes[:, None], comp, 0).astype(jnp.uint8)
    return comp, sizes


def main():
    from bench import load_corpus

    C = 64 * 1024
    B = 128
    total = B * C
    raw = np.frombuffer(load_corpus(total, seed=1), np.uint8).reshape(B, C)
    da = jnp.asarray(raw)
    dl = jnp.full((B,), C, jnp.int32)

    enc = jax.jit(lambda d, l: lz_pallas.compress(d, l))
    comp, sizes = enc(da, dl)
    jax.device_get(sizes[:2])
    comp_np = np.asarray(comp)
    sizes_np = np.asarray(sizes)

    # host parse of the production streams -> descriptor tables
    nseq = []
    descs = []
    for i in range(B):
        seqs = delimit_host(comp_np[i, : sizes_np[i]].tobytes())
        nseq.append(len(seqs))
        d = np.zeros((len(seqs), 3), np.int32)
        for j, (lit_src, llen, mlen, off) in enumerate(seqs):
            d[j] = (llen, mlen, off)
        descs.append(d)
    maxseq = max(nseq)
    rt2 = _rup(_cdiv(3 * (maxseq + 1), ROWW), 8)
    tbl = np.zeros((B, rt2 * ROWW), np.int32)
    for i, d in enumerate(descs):
        tbl[i, : d.size] = d.reshape(-1)
    print(f"sequences: total={sum(nseq)} max/chunk={maxseq}", flush=True)

    drain = jax.jit(functools.partial(emit_drain, rt2=rt2))
    dcomp, dsizes = drain(da, dl, jnp.asarray(tbl))
    jax.device_get(dsizes[:2])
    ok = bool((np.asarray(dsizes) == sizes_np).all()
              and (np.asarray(dcomp) == comp_np).all())
    print(f"drain byte-identity vs production: {ok}", flush=True)

    def timeit(label, fn, *args, reps=8):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:2])
        dt = (time.perf_counter() - t0) / reps
        print(f"{label}: {dt*1e3:7.1f} ms for {total/1e6:.0f} MB -> "
              f"{total/1e9/dt:.4f} GB/s, {dt*1e9/sum(nseq):.0f} ns/seq", flush=True)
        return dt

    t_prod = timeit("production encode      ", enc, da, dl)
    t_drain = timeit("EMIT-DRAIN (zero parse)", drain, da, dl, jnp.asarray(tbl))
    print(f"ceiling of any parse-decoupled encode: {t_prod/t_drain:.2f}x", flush=True)


# ---------------------------------------------------------------------------
# PARSE-ONLY: the production loop with phase (c)'s tile builds and RMW store
# removed (identical iteration structure and scalar accounting).  Bounds the
# parse+extension phase; if parse_only + drain ~= production, the phases do
# not overlap today and a two-kernel parse->emit pipeline wins iff the parse
# kernel's cells overlap.

from tpucomp.kernels.lz_pallas import _SENT, _first_diff_tile, TB


def _parse_only_kernel(rt: int, r_res: int, K: int,
                       size_ref, wv_ref, nmp_ref, dist_ref, out_ref):
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

        def step(c):
            (p, o, q, off, mlen, llen, hdr_rem, lit_rem, tail_rem,
             ext_on, is_final, done) = c

            idle = (
                ~ext_on & (hdr_rem == 0) & (lit_rem == 0) & (tail_rem == 0)
                & ~done
            )
            q2 = tbl_at(nmp_ref, p)
            fin = q2 >= jnp.minimum(_SENT, n - 12)
            q2c = jnp.where(fin, n, q2)
            off2 = jnp.where(fin, 1, tbl_at(dist_ref, q2c))
            lf = n - p
            q = jnp.where(idle, q2c, q)
            off = jnp.where(idle, off2, off)
            mlen = jnp.where(idle, jnp.where(fin, 0, 4), mlen)
            llen = jnp.where(idle & fin, lf, llen)
            hdr_rem = jnp.where(idle & fin, 1 + _lsic_nb(lf), hdr_rem)
            lit_rem = jnp.where(idle & fin, lf, lit_rem)
            ext_on = jnp.where(idle, ~fin, ext_on)
            is_final = jnp.where(idle, fin, is_final)

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

            # ---- emission replaced by pure scalar accounting -------------
            pend = (hdr_rem > 0) | (lit_rem > 0) | (tail_rem > 0)
            emitting = ~ext_on & ~done & pend
            g = jnp.minimum(hdr_rem + lit_rem + tail_rem, GM)
            g = jnp.where(emitting, g, 0)
            gh = jnp.minimum(hdr_rem, g)
            gl = jnp.minimum(lit_rem, g - gh)
            gt = g - gh - gl
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
            out_ref[k, 0:1, :] = _u(jnp.where(li == 0, o, 0))

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


def parse_only(data, lengths, kpack: int = 4):
    from tpucomp.codecs import lz77

    b, c = data.shape
    K = max(1, min(kpack, b))
    rd = _rup(_cdiv(c, ROWB), 8)
    rw = LEAD + rd + 32

    def tables(d, nn):
        i = jnp.arange(c, dtype=jnp.int32)
        j = lz77.nearest_prev_occurrence(d, nn, 1)
        dist = i - j
        cand = (j >= 0) & (dist <= 65535) & (i <= nn - 13)
        nmp = jax.lax.cummin(
            jnp.where(cand, i, jnp.int32(_SENT)), axis=0, reverse=True
        )
        return nmp, dist

    nmp, dist = jax.vmap(tables)(data, lengths.astype(jnp.int32))
    rt = _rup(_cdiv(c, ROWW), 8)
    rt = max(rt, 16)

    def pad_tbl(t, fill):
        padn = rt * ROWW - c
        if padn:
            t = jnp.concatenate([t, jnp.full((b, padn), fill, jnp.int32)], axis=1)
        return t.reshape(b, rt, ROWW)

    padd = rw * ROWB - c - LEAD * ROWB
    lead = jnp.zeros((b, LEAD * ROWB), jnp.uint8)
    dd = jnp.concatenate([lead, data, jnp.zeros((b, padd), jnp.uint8)], axis=1)
    wv = bits.bytes_to_units_le(dd, 4).astype(jnp.int32).reshape(b, rw, ROWW)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // K,),
        in_specs=[
            pl.BlockSpec((K, rw, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, rt, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, rt, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, 8, ROWW), lambda i, s: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_parse_only_kernel, rt, 0, K),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 8, ROWW), jnp.uint32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(lengths.astype(jnp.int32), wv, pad_tbl(nmp, _SENT), pad_tbl(dist, 1))
    return out[:, 0, 0].astype(jnp.int32)


def parse_main():
    from bench import load_corpus

    C = 64 * 1024
    B = 128
    total = B * C
    raw = np.frombuffer(load_corpus(total, seed=1), np.uint8).reshape(B, C)
    da = jnp.asarray(raw)
    dl = jnp.full((B,), C, jnp.int32)
    enc = jax.jit(lambda d, l: lz_pallas.compress(d, l))
    comp, sizes = enc(da, dl)
    jax.device_get(sizes[:2])
    po = jax.jit(parse_only)
    o = po(da, dl)
    ok = bool((np.asarray(o) == np.asarray(sizes)).all())
    print(f"parse-only sizes match production: {ok}", flush=True)
    for label, fn, args in (("production", enc, (da, dl)), ("parse-only", po, (da, dl))):
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:2])
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[:2])
        dt = (time.perf_counter() - t0) / 8
        print(f"{label}: {dt*1e3:7.1f} ms -> {total/1e9/dt:.4f} GB/s", flush=True)


if __name__ == "__main__":
    import sys as _s
    if "--parse" in _s.argv:
        parse_main()
    else:
        main()
