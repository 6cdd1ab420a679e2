"""Benchmark harness: batched codec throughput on the local chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no absolute numbers (BASELINE.md); the project
target is >= 0.5x HBM-roofline GB/s per chip (BASELINE.json).  vs_baseline
is therefore measured against 0.5 x the chip's approximate HBM bandwidth.

Corpus: deterministic Silesia-like mix (text-ish, structured records, runs,
random) since the environment has no network access; chunked at the
BASELINE chunk size.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# persistent compilation cache: first-run compiles are minutes through the
# remote tunnel; later runs (and rounds) hit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))

# Approximate HBM bandwidth per chip (GB/s) by TPU generation.
HBM_GBPS = {
    "v5 lite": 819.0,  # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,
    "cpu": 100.0,
}


def load_corpus(total_bytes: int, seed: int = 0) -> bytes:
    """Vendored fixed corpus (corpus/mixed_v1.bin.gz, built by
    scripts/build_corpus.py): a committed Silesia-profile mix (text, source,
    ELF binary, structured records, redundant DB text, near-random) so the
    headline number is comparable across rounds.  True Silesia is
    unreachable (no network); the metric names the corpus truthfully.
    Repeats the blob if more bytes are requested; falls back to the
    synthetic mix if the blob is missing."""
    import gzip

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "corpus", "mixed_v1.bin.gz")
    if not os.path.exists(path):
        return synth_corpus(total_bytes, seed)
    with gzip.open(path, "rb") as f:
        blob = f.read()
    if seed:  # decorrelate multi-use: rotate by a seed-dependent offset
        k = (seed * 1009001) % len(blob)
        blob = blob[k:] + blob[:k]
    reps = -(-total_bytes // len(blob))
    return (blob * reps)[:total_bytes]


def runheavy_corpus(total_bytes: int, seed: int = 2) -> bytes:
    """Deterministic run-heavy int32 columns: the workload where the cascaded
    RLE/Delta/BitPack pipeline genuinely engages (ratio >> 1) instead of the
    raw-copy fallback.  Bench slice demanded by VERDICT r3 ("make the BENCH
    headline honest about the cascaded split")."""
    rng = np.random.default_rng(seed)
    n = total_bytes // 4
    # run lengths ~ geometric around 24 elems; values slowly varying so
    # delta+bitpack bite after the RLE stage
    n_runs = n // 16 + 2
    runlens = rng.integers(4, 48, size=n_runs)
    vals = np.cumsum(rng.integers(-3, 4, size=n_runs)).astype(np.int32) + 1000
    col = np.repeat(vals, runlens)[:n].astype(np.int32)
    if col.size < n:
        col = np.pad(col, (0, n - col.size), mode="edge")
    return col.tobytes()[:total_bytes]


def synth_corpus(total_bytes: int, seed: int = 0) -> bytes:
    """Deterministic mixed-compressibility corpus (Silesia stand-in)."""
    rng = np.random.default_rng(seed)
    parts = []
    quarter = total_bytes // 4
    # text-like: skewed byte distribution with repeated words
    words = rng.integers(97, 122, size=(64, 8), dtype=np.uint8)
    idx = rng.integers(0, 64, size=quarter // 8 + 1)
    parts.append(words[idx].reshape(-1)[:quarter])
    # structured records: slowly-varying int32 columns (cascaded's home turf)
    base = rng.integers(0, 1000, size=quarter // 4 // 64 + 1)
    col = (np.repeat(base, 64)[: quarter // 4] + rng.integers(0, 3, size=quarter // 4)).astype(
        np.int32
    )
    parts.append(col.view(np.uint8))
    # runs
    vals = rng.integers(0, 256, size=quarter // 32 + 1, dtype=np.uint8)
    parts.append(np.repeat(vals, 32)[:quarter])
    # incompressible
    parts.append(rng.integers(0, 256, size=total_bytes - 3 * quarter, dtype=np.uint8))
    return b"".join(p.tobytes() for p in parts)


def _chip_roofline() -> float:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    for key, gbps in HBM_GBPS.items():
        if key in kind:
            return gbps
    return 819.0


def bench_cascaded(
    total_mb: int = 256, iters: int = 16, tile: int = 128, corpus_kind: str = "mixed",
    measure_roofline: bool = False,
) -> dict:
    """Throughput over the corpus, dispatched in ``tile``-chunk sub-batches.

    Intermediate buffers scale with the batch dim, and oversized batches
    degrade superlinearly from HBM pressure (PERF.md); a pipelined caller
    dispatches sweet-spot tiles.  The bench folds the tile loop into ONE
    jitted lax.map per iteration: round-3 profiling showed per-tile host
    dispatch (~2.5 ms through the tunnel) exceeded decode's ~1.2 ms/tile
    device time, so the per-tile-dispatch bench was host-bound and read
    ~half the true device rate.  Round 5 widened a dispatch to 256 MB: the
    fast-path rates (tens of GB/s) would otherwise be bounded by the
    ~2.5 ms host dispatch itself, not the device.

    ``measure_roofline`` also times a bare slice copy of the compressed
    tiles through the identical harness -- the memcpy ceiling any
    decompress formulation could reach -- reported as ``memcpy_gbps``.
    """
    import jax
    import jax.numpy as jnp

    from tpucomp.codecs import cascaded as cc
    from tpucomp.core.options import CascadedOpts

    opts = CascadedOpts()  # 4KB internal chunks, INT
    chunk = 64 * 1024  # BASELINE partition size
    total = total_mb * 1024 * 1024
    corpus = runheavy_corpus(total) if corpus_kind == "runheavy" else load_corpus(total)
    b = total // chunk
    tile = min(tile, b)
    b = b // tile * tile
    total = b * chunk
    data = np.frombuffer(corpus, np.uint8)[: b * chunk].reshape(b // tile, tile, chunk)
    lengths = np.full((tile,), chunk, np.int32)
    tiles = jnp.asarray(data)  # [T, tile, chunk], resident once
    l = jnp.asarray(lengths)

    enc_all = jax.jit(lambda ts: jax.lax.map(lambda t: cc.compress(t, l, opts), ts))
    dec_all = jax.jit(
        lambda cs, ss: jax.lax.map(
            lambda a: cc.decompress(a[0], a[1], opts, chunk), (cs, ss)
        )
    )

    # device_get of a small result forces real completion (block_until_ready
    # can return early through remote-device tunnels).  The tunnel sync
    # itself costs ~35 ms; iters amortize it.
    comps = enc_all(tiles)  # compile + warm
    jax.device_get(comps[1][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        comps = enc_all(tiles)
    jax.device_get(comps[1][-1])
    enc_s = (time.perf_counter() - t0) / iters

    outs = dec_all(comps[0], comps[1])
    jax.device_get(outs[2][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = dec_all(comps[0], comps[1])
    jax.device_get(outs[2][-1])
    dec_s = (time.perf_counter() - t0) / iters

    ok = bool(
        (np.asarray(outs[0]) == data).all() and (np.asarray(outs[2]) == 0).all()
    )
    comp_total = float(np.asarray(comps[1]).sum())
    gb = total / 1e9
    res = {
        "encode_gbps": gb / enc_s,
        "decode_gbps": gb / dec_s,
        "ratio": total / comp_total,
        "roundtrip_ok": ok,
    }
    if measure_roofline:
        cp = jax.jit(lambda cs: jax.lax.map(lambda c: c[:, 8 : 8 + chunk], cs))
        out = cp(comps[0])
        jax.device_get(out[-1, -1, -1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = cp(comps[0])
        jax.device_get(out[-1, -1, -1])
        res["memcpy_gbps"] = gb / ((time.perf_counter() - t0) / iters)
    return res


def bench_lz(codec_name: str, total_mb: int = 8, iters: int = 8, tile: int = 128) -> dict:
    """LZ4 / Snappy batched throughput (64KB chunks, tiled dispatch)."""
    import jax
    import jax.numpy as jnp

    if codec_name == "lz4":
        from tpucomp.codecs import lz4 as codec
    else:
        from tpucomp.codecs import snappy as codec

    chunk = 64 * 1024
    total = total_mb * 1024 * 1024
    corpus = load_corpus(total, seed=1)
    b = total // chunk
    tile = min(tile, b)
    b = b // tile * tile
    total = b * chunk
    data = np.frombuffer(corpus, np.uint8)[: b * chunk].reshape(b // tile, tile, chunk)
    tiles = jnp.asarray(data)
    l = jnp.full((tile,), chunk, jnp.int32)

    enc_all = jax.jit(lambda ts: jax.lax.map(lambda t: codec.compress(t, l), ts))
    dec_all = jax.jit(
        lambda cs, ss: jax.lax.map(
            lambda a: codec.decompress(a[0], a[1], out_capacity=chunk), (cs, ss)
        )
    )

    comps = enc_all(tiles)
    jax.device_get(comps[1][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        comps = enc_all(tiles)
    jax.device_get(comps[1][-1])
    enc_s = (time.perf_counter() - t0) / iters

    outs = dec_all(comps[0], comps[1])
    jax.device_get(outs[2][-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        outs = dec_all(comps[0], comps[1])
    jax.device_get(outs[2][-1])
    dec_s = (time.perf_counter() - t0) / iters

    ok = bool(
        (np.asarray(outs[0]) == data).all() and (np.asarray(outs[2]) == 0).all()
    )
    comp_total = float(np.asarray(comps[1]).sum())
    return {
        "encode_gbps": total / 1e9 / enc_s,
        "decode_gbps": total / 1e9 / dec_s,
        "ratio": total / comp_total,
        "roundtrip_ok": ok,
    }


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument(
        "--codec",
        choices=["cascaded", "cascaded-runheavy", "lz4", "snappy", "all", "main"],
        default="main",
    )
    p.add_argument("--mb", type=int, default=None)
    args = p.parse_args()

    target = 0.5 * _chip_roofline()
    if args.codec == "main":  # the BASELINE north-star pair: cascaded + lz4
        rc = bench_cascaded(total_mb=args.mb or 256, measure_roofline=True)
        rr = bench_cascaded(total_mb=min(args.mb or 64, 64), iters=8,
                            corpus_kind="runheavy")
        rl = bench_lz("lz4", total_mb=min(args.mb or 8, 8))
        vals = [min(r["encode_gbps"], r["decode_gbps"]) for r in (rc, rl)]
        geo = float(np.prod(vals)) ** 0.5
        print(
            json.dumps(
                {
                    "metric": "geomean min(enc,dec) GB/s/chip, cascaded+lz4, mixed_v1 corpus (vendored Silesia-profile stand-in), 64KB chunks "
                    f"(cascaded-mixed:enc={rc['encode_gbps']:.3f},dec={rc['decode_gbps']:.3f},"
                    f"ratio={rc['ratio']:.2f},ok={rc['roundtrip_ok']},"
                    f"memcpy-roofline={rc['memcpy_gbps']:.1f} "
                    f"cascaded-runheavy:enc={rr['encode_gbps']:.3f},dec={rr['decode_gbps']:.3f},"
                    f"ratio={rr['ratio']:.2f},ok={rr['roundtrip_ok']} "
                    f"lz4:enc={rl['encode_gbps']:.4f},dec={rl['decode_gbps']:.4f},"
                    f"ratio={rl['ratio']:.2f},ok={rl['roundtrip_ok']})",
                    "value": round(geo, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(geo / target, 5),
                    "harness": "r5-256MB-dispatch",
                }
            )
        )
        return
    if args.codec in ("cascaded", "cascaded-runheavy"):
        kind = "runheavy" if args.codec.endswith("runheavy") else "mixed"
        r = bench_cascaded(total_mb=args.mb or (64 if kind == "runheavy" else 256),
                           corpus_kind=kind)
        label = args.codec
    elif args.codec in ("lz4", "snappy"):
        r = bench_lz(args.codec, total_mb=args.mb or 8)
        label = args.codec
    else:  # all: geomean over codecs
        rs = {
            "cascaded": bench_cascaded(total_mb=args.mb or 256),
            "lz4": bench_lz("lz4", total_mb=args.mb or 8),
            "snappy": bench_lz("snappy", total_mb=args.mb or 8),
        }
        vals = [min(r["encode_gbps"], r["decode_gbps"]) for r in rs.values()]
        geo = float(np.prod(vals)) ** (1 / len(vals))
        detail = " ".join(
            f"{k}:enc={v['encode_gbps']:.3f},dec={v['decode_gbps']:.3f},"
            f"ratio={v['ratio']:.2f},ok={v['roundtrip_ok']}"
            for k, v in rs.items()
        )
        print(
            json.dumps(
                {
                    "metric": f"geomean min(enc,dec) GB/s/chip over codecs ({detail})",
                    "value": round(geo, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(geo / target, 5),
                    "harness": "r5-256MB-dispatch",
                }
            )
        )
        return
    value = round(min(r["encode_gbps"], r["decode_gbps"]), 3)
    print(
        json.dumps(
            {
                "metric": f"{label} 64KB-chunk batch min(encode,decode) GB/s/chip "
                f"(enc={r['encode_gbps']:.2f} dec={r['decode_gbps']:.2f} "
                f"ratio={r['ratio']:.2f} ok={r['roundtrip_ok']})",
                "value": value,
                "unit": "GB/s",
                "vs_baseline": round(value / target, 4),
                "harness": "r5-256MB-dispatch",
            }
        )
    )


if __name__ == "__main__":
    main()
