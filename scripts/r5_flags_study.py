"""Round-5 probe 3: which precompute refinement reaches near-exact
fallback-flag coverage on mixed_v1 (default cascaded opts, w=4)?

Levels (all numpy, ground truth = exact per-chunk simulation):
  L0: pure chunks (r0==n) get exact f + c0, c1 lower-bounded at 8;
      impure chunks get the weak 44-byte lower bound.
  L1: pure chunks additionally get exact c1 (d-run gap min/max).
  L2: exact everything (equivalent to running the pipeline sizes).

Coverage = certain-fallback / actual-fallback, false positives must be 0.
Also prints G-block all-certain fractions for the routing granularity.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import load_corpus


def bitw(rng):
    rng = np.asarray(rng, np.uint64)
    out = np.zeros(rng.shape, np.int64)
    nz = rng > 0
    out[nz] = np.floor(np.log2(rng[nz].astype(np.float64))).astype(np.int64) + 1
    return out


def r4(v):
    return (v + 3) & ~3


def pack_size(n, bw):
    return 8 + 4 * ((n * bw + 31) >> 5)


def chunk_exact(x):
    """Exact chunk total for opts {nr=2, nd=1, bp, INT}; x int32[n]."""
    n = x.size
    b0 = np.flatnonzero(x[1:] != x[:-1]) + 1          # run starts (excl. 0)
    starts0 = np.concatenate([[0], b0])
    r0 = starts0.size
    ends0 = np.concatenate([b0, [n]])
    counts0 = ends0 - starts0                          # int
    c0 = pack_size(r0, bitw(counts0.max() - counts0.min() if r0 else 0))
    vals0 = x[starts0]
    d = (vals0[1:].astype(np.int64) - vals0[:-1].astype(np.int64)).astype(np.int32)
    m = d.size                                         # r0 - 1
    if m:
        b1 = np.flatnonzero(d[1:] != d[:-1]) + 1
        starts1 = np.concatenate([[0], b1])
        ends1 = np.concatenate([b1, [m]])
        counts1 = ends1 - starts1
        r1 = starts1.size
        vals1 = d[starts1]
        c1 = pack_size(r1, bitw(counts1.max() - counts1.min()))
        rngv = (vals1.max().astype(np.int64) - vals1.min().astype(np.int64)) & 0xFFFFFFFF
        f = pack_size(r1, bitw(rngv))
    else:
        r1 = 0
        c1 = 8
        f = 8
    return 20 + r4(c0) + r4(c1) + r4(f), r0 == n, c1


def main():
    chunk = 64 * 1024
    total = 64 * 1024 * 1024
    corpus = load_corpus(total)
    e = 1024
    k = 16
    b = total // chunk
    x = np.frombuffer(corpus, np.uint8).view("<i4").reshape(b, k, e)

    # exact per-chunk totals (ground truth)
    t_exact = np.zeros((b, k), np.int64)
    purec = np.zeros((b, k), bool)
    c1s = np.zeros((b, k), np.int64)
    for i in range(b):
        for j in range(k):
            t_exact[i, j], purec[i, j], c1s[i, j] = chunk_exact(x[i, j])
    fb = t_exact.sum(-1) > chunk

    # L0 (vectorized, same as r5_fastpath_probe)
    neq0 = x[:, :, 1:] != x[:, :, :-1]
    r0 = 1 + neq0.sum(-1)
    pure = r0 == e
    d = (x[:, :, 1:].astype(np.int64) - x[:, :, :-1].astype(np.int64)).astype(np.int32)
    r1 = 1 + (d[:, :, 1:] != d[:, :, :-1]).sum(-1)
    rngv = (d.max(-1).astype(np.int64) - d.min(-1).astype(np.int64)) & 0xFFFFFFFF
    f = pack_size(r1, bitw(rngv))
    t0 = np.where(pure, 20 + 8 + 8 + r4(f), 44)
    l0 = t0.sum(-1) > chunk

    # L1: pure chunks get exact c1 too
    t1 = np.where(pure, 20 + 8 + r4(np.where(pure, c1s, 8)) + r4(f), 44)
    l1 = t1.sum(-1) > chunk

    l2 = fb

    print(f"actual fb: {fb.sum()}/{b}  pure chunks overall: {pure.mean():.4f}  "
          f"pure among fb partitions: {pure[fb].mean():.4f}")
    for name, fl, tt in (("L0", l0, t0), ("L1", l1, t1), ("L2(exact)", l2, t_exact)):
        fp = (fl & ~fb).sum()
        print(f"{name}: certain={fl.sum()} coverage={fl.sum()/fb.sum():.4f} "
              f"false_pos={fp}")
        for g in (8, 16, 32):
            blocks = fl.reshape(-1, g)
            print(f"   G={g:3d}: all-certain blocks {blocks.all(axis=1).mean():.4f}")
    # where do L0 misses come from?
    miss = fb & ~l0
    gap = (t_exact.sum(-1) - t0.sum(-1))[miss]
    impure_frac = (~pure[miss]).mean(-1)
    print(f"L0 misses: {miss.sum()}  mean lb-gap {gap.mean():.0f}B  "
          f"mean impure-chunk frac {impure_frac.mean():.3f}")
    # margin distribution of actual-fb partitions (how far above limit)
    margin = (t_exact.sum(-1) - chunk)[fb]
    print(f"fb margin over limit: p10={np.percentile(margin,10):.0f} "
          f"p50={np.percentile(margin,50):.0f} p90={np.percentile(margin,90):.0f}")


if __name__ == "__main__":
    main()
