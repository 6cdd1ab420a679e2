"""Round-5 probe 4 (VERDICT r4 task 4): does splitting a partition's decode
across more grid cells gain anything, or is the pipeline truly
vector-ISSUE-bound (cells already overlap to saturation)?

Method: same bytes, same 4 KB scheme chunks, but partition size C in
{64K, 32K, 16K} -> each partition's chunks spread over 1/2/4x the grid
cells.  If the expansion (and the other vector phases) were
latency-bound, smaller partitions would approach ~2x; if issue-bound,
per-byte time stays flat (modulo per-partition overhead, which grows).

Run-heavy corpus (pipeline fully engaged) + the structured all-pipe mix.
256 MB per dispatch, iters high enough to swamp the tunnel sync.
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

from bench import runheavy_corpus
from tpucomp.codecs import cascaded as cc
from tpucomp.core.options import CascadedOpts


def rate(fn, *args, total_bytes, iters=16):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[-1].ravel()[-1])
    dt = (time.perf_counter() - t0) / iters
    return total_bytes / 1e9 / dt, out


def main():
    opts = CascadedOpts()
    total = 256 * 1024 * 1024
    rh = np.frombuffer(runheavy_corpus(total), np.uint8)

    rng = np.random.default_rng(7)
    n = total // 4
    base = np.repeat(rng.integers(0, 1000, size=n // 64 + 1), 64)[:n]
    struct = (base + rng.integers(0, 3, size=n)).astype(np.int32).view(np.uint8)

    for name, buf in (("runheavy", rh), ("struct", struct)):
        print(f"== {name} ==")
        for chunk in (64 * 1024, 32 * 1024, 16 * 1024):
            tile = 128
            nt = total // (tile * chunk)
            tiles = jnp.asarray(buf.reshape(nt, tile, chunk))
            l = jnp.full((tile,), chunk, jnp.int32)
            enc_all = jax.jit(lambda ts, l=l: jax.lax.map(
                lambda t: cc.compress(t, l, opts), ts))
            dec_all = jax.jit(lambda cs, ss, chunk=chunk: jax.lax.map(
                lambda a: cc.decompress(a[0], a[1], opts, chunk), (cs, ss)))
            er, comps = rate(enc_all, tiles, total_bytes=total, iters=8)
            dr, outs = rate(dec_all, comps[0], comps[1], total_bytes=total, iters=8)
            ok = bool((np.asarray(outs[0]).reshape(-1) == buf).all()
                      and (np.asarray(outs[2]) == 0).all())
            print(f"  C={chunk//1024:3d}K (cells/64KB={65536//chunk}): "
                  f"enc {er:6.3f}  dec {dr:6.3f} GB/s  ok={ok}")


if __name__ == "__main__":
    main()
