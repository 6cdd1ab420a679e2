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

        def get32u(r0):
            return _u(uv_ref[k, pl.ds(r0, 32), :])

        def byte_at(q):
            qc = jnp.clip(q, 0, nsb - 1) >> 2
            w = ws_ref[k, qc >> 7, qc & (ROWW - 1)]
            return (w >> (8 * (q & 3))) & 0xFF

        move_granule = _granule_mover(k, get32u, uv_ref, rw)

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


def supports_decode(out_capacity: int) -> bool:
    return out_capacity >= 1


@functools.partial(jax.jit, static_argnames=("out_capacity", "interpret", "kpack"))
def decompress(comp, comp_sizes, out_capacity: int, interpret: bool = False,
               kpack: int = 8):
    """Batched snappy decompression on the Pallas path.

    comp: uint8[B, CMAX]; comp_sizes: int32[B].  Returns (data uint8[B,
    out_capacity], lengths int32[B], statuses int32[B]) matching
    codecs/snappy.py decompress."""
    from tpucomp.utils import bits

    b, cmax = comp.shape
    K = max(1, min(kpack, b))
    bp = _rup(b, K)
    rc = _rup(_cdiv(cmax, ROWB), 8)
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
        compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary",)),
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
