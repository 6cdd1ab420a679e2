"""Round-5 probe: is the cascaded raw-fallback fast path worth it, and how?

Measures, on the real chip, through the SAME single-dispatch harness bench.py
uses (jit(lax.map(...)) + device_get sync):

  1. memcpy rooflines for the two fast-path shapes:
       dec-shape: comp[:, 8:8+cap] row-shift copy  [128,131848] -> [128,65536]
       enc-shape: pad+header emission              [128,65536] -> [128,131848]
  2. the corpus facts the routing design depends on:
       - fraction of mixed_v1 64KB partitions that take the raw fallback
       - fraction of G-sized contiguous blocks that are ALL-fallback
         (the lax.cond routing granularity), G in {4,8,16,32,64,128}
  3. the cheap encode-side precompute (pure-chunk lower bound):
       - false-fallback count vs ground truth (MUST be 0)
       - coverage: certain-fallback / actual-fallback
       - its device cost as a fused elementwise pass

Ground truth comes from running the production encoder on the corpus.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpucomp"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import load_corpus
from tpucomp.codecs import cascaded as cc
from tpucomp.core.options import CascadedOpts


def timeit(fn, *args, iters=16):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
    return (time.perf_counter() - t0) / iters, out


def main():
    opts = CascadedOpts()
    chunk = 64 * 1024
    total = 64 * 1024 * 1024
    tile = 128
    corpus = load_corpus(total)
    b = total // chunk
    data = np.frombuffer(corpus, np.uint8)[: b * chunk].reshape(b // tile, tile, chunk)
    tiles = jnp.asarray(data)
    l = jnp.full((tile,), chunk, jnp.int32)

    # ---- ground truth: run the production encoder --------------------------
    enc_all = jax.jit(lambda ts: jax.lax.map(lambda t: cc.compress(t, l, opts), ts))
    enc_s, comps = timeit(enc_all, tiles, iters=8)
    comp_np = np.asarray(comps[0])          # [T, tile, PMAX]
    sizes_np = np.asarray(comps[1])
    pmax = comp_np.shape[-1]
    fb = (comp_np[:, :, :3].sum(-1) == 0).reshape(-1)   # actual fallback flags
    print(f"encode (current path): {total/1e9/enc_s:.3f} GB/s, pmax={pmax}")
    print(f"fallback partitions: {fb.sum()}/{fb.size} = {fb.mean():.4f}")

    for g in (4, 8, 16, 32, 64, 128):
        blocks = fb.reshape(-1, g)
        allfb = blocks.all(axis=1)
        print(f"  G={g:3d}: all-fb blocks {allfb.mean():.4f} "
              f"(covers {allfb.sum()*g/fb.size:.4f} of partitions)")

    # ---- decode current + roofline -----------------------------------------
    dec_all = jax.jit(lambda cs, ss: jax.lax.map(
        lambda a: cc.decompress(a[0], a[1], opts, chunk), (cs, ss)))
    dec_s, outs = timeit(dec_all, comps[0], comps[1], iters=8)
    ok = bool((np.asarray(outs[0]) == data).all() and (np.asarray(outs[2]) == 0).all())
    print(f"decode (current path): {total/1e9/dec_s:.3f} GB/s ok={ok}")

    def dec_copy(cs):
        return jax.lax.map(lambda c: c[:, 8 : 8 + chunk], cs)

    t, _ = timeit(jax.jit(dec_copy), comps[0])
    print(f"dec-shape memcpy roofline (slice copy): {total/1e9/t:.2f} GB/s")

    # enc-shape: emit header + shifted payload into the PMAX-wide row
    ib = jnp.asarray(np.full((tile,), chunk, np.int32))

    def enc_emit(ts):
        def one(tl):
            out = jnp.pad(tl, ((0, 0), (8, pmax - 8 - chunk)))
            hdr = jnp.zeros((tile, 8), jnp.uint8).at[:, 3].set(jnp.uint8(int(opts.type)))
            from tpucomp.utils import bits as B
            hdr = hdr.at[:, 4:8].set(B.units_to_bytes_le(ib.astype(jnp.uint32)[:, None]))
            out = out.at[:, :8].set(hdr)
            return out, ib + 8
        return jax.lax.map(one, ts)

    t, eo = timeit(jax.jit(enc_emit), tiles)
    print(f"enc-shape emit roofline (pad+hdr): {total/1e9/t:.2f} GB/s")

    # ---- cheap precompute: pure-chunk lower bound --------------------------
    # numpy ground-truth of the lb decision
    e = opts.chunk_num_elements          # 1024
    k = chunk // opts.chunk_size         # 16
    x = np.frombuffer(corpus, np.uint8)[: b * chunk].view("<i4").reshape(b, k, e)
    neq0 = x[:, :, 1:] != x[:, :, :-1]
    r0 = 1 + neq0.sum(-1)
    pure = r0 == e
    d = (x[:, :, 1:].astype(np.int64) - x[:, :, :-1].astype(np.int64)).astype(np.int32)
    r1 = 1 + (d[:, :, 1:] != d[:, :, :-1]).sum(-1)
    dmin = d.min(-1).astype(np.int64)
    dmax = d.max(-1).astype(np.int64)
    rng = (dmax - dmin) & 0xFFFFFFFF
    bw1 = np.zeros_like(r1)
    nz = rng > 0
    bw1[nz] = np.floor(np.log2(rng[nz])).astype(np.int64) + 1
    f_size = 8 + 4 * ((r1 * bw1 + 31) >> 5)
    t_lb = np.where(pure, 36 + ((f_size + 3) & ~3), 44)
    certain = t_lb.sum(-1) > chunk       # limit - 8 = round4(input_bytes)
    false_pos = (certain & ~fb).sum()
    print(f"precompute lb: certain={certain.sum()} actual-fb={fb.sum()} "
          f"false_pos={false_pos} coverage={certain.sum()/max(fb.sum(),1):.4f}")
    for g in (8, 16, 32):
        blocks = certain.reshape(-1, g)
        print(f"  G={g:3d}: all-certain blocks {blocks.all(axis=1).mean():.4f}")

    # device cost of the flags pass
    def flags_pass(ts):
        def one(tl):
            xx = tl.reshape(tile, k, opts.chunk_size)
            xi = jax.lax.bitcast_convert_type(
                xx.reshape(tile, k, e, 4), jnp.int32)
            neq = xi[:, :, 1:] != xi[:, :, :-1]
            rr0 = 1 + neq.sum(-1)
            pu = rr0 == e
            dd = xi[:, :, 1:] - xi[:, :, :-1]
            rr1 = 1 + (dd[:, :, 1:] != dd[:, :, :-1]).sum(-1)
            dmn = dd.min(-1)
            dmx = dd.max(-1)
            from tpucomp.utils import bits as B
            rg = B.bitcast(dmx, jnp.uint32) - B.bitcast(dmn, jnp.uint32)
            bw = B.bit_width(rg)
            fs = 8 + 4 * ((rr1 * bw + 31) >> 5)
            tl_ = jnp.where(pu, 36 + ((fs + 3) & ~3), 44)
            return tl_.sum(-1) > chunk
        return jax.lax.map(one, ts)

    t, fl = timeit(jax.jit(flags_pass), tiles)
    fl_np = np.asarray(fl).reshape(-1)
    print(f"flags pass: {total/1e9/t:.2f} GB/s-equiv ({t*1e3:.3f} ms/64MB), "
          f"agrees with numpy: {bool((fl_np == certain).all())}")


if __name__ == "__main__":
    main()
