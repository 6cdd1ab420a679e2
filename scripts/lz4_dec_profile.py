"""Profile the LZ4 Pallas decode kernel across data profiles.

Each profile isolates a kernel path:
  random  -> 1 seq/chunk, pure 512B literal granules (granule machinery cost)
  runs1   -> few seqs, long period-1 matches (period-fill cost)
  period500 -> few seqs, offset ~500 matches (fill at near-granule period)
  far     -> long matches at offset > 512 (VMEM history reads, no fill)
  text    -> many short seqs (parse + small-granule cost)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/lz4_dec_profile.py
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/jax_tpucomp"))
import jax, numpy as np, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tpucomp.kernels import lz_pallas as lzp
from oracles.lz4_oracle import lz4_compress_oracle

print("devices", jax.devices(), flush=True)
rng = np.random.default_rng(7)
C = 65536
B = 64


def profile(name, row_bytes):
    comp_rows = []
    nseq = 0
    for _ in range(B):
        enc = lz4_compress_oracle(row_bytes, max_match=1 << 30)
        comp_rows.append(np.frombuffer(enc, np.uint8))
        # count sequences: walk tokens
        i, s = 0, 0
        b = enc
        while i < len(b):
            tok = b[i]; i += 1
            ll = tok >> 4
            if ll == 15:
                while b[i] == 255: ll += 255; i += 1
                ll += b[i]; i += 1
            i += ll
            s += 1
            if i >= len(b): break
            i += 2
            ml = tok & 15
            if ml == 15:
                while b[i] == 255: ml += 255; i += 1
                i += 1
        nseq = s
        break  # same data each row
    cmax = max(len(r) for r in comp_rows) if comp_rows else 0
    enc0 = comp_rows[0]
    comp = np.zeros((B, len(enc0)), np.uint8)
    comp[:] = enc0
    sizes = np.full(B, len(enc0), np.int32)
    dc, ds = jnp.asarray(comp), jnp.asarray(sizes)
    out, lens, st = lzp.decompress(dc, ds, C)
    jax.device_get(st)
    assert (np.asarray(st) == 0).all(), name
    assert np.asarray(out)[0, :C].tobytes() == row_bytes, name
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out, lens, st = lzp.decompress(dc, ds, C)
    jax.device_get(st)
    dt = (time.perf_counter() - t0) / reps
    mb = B * C / 1e6
    per_chunk_us = dt / B * 1e6
    print(f"{name:10s} seqs/chunk={nseq:6d} comp={len(enc0):6d}B "
          f"{mb/1e3/dt:7.4f} GB/s  {per_chunk_us:8.0f} us/chunk "
          f"{per_chunk_us*1e3/max(nseq,1):8.1f} ns/seq", flush=True)


# pure random: ~1 sequence, all literals
profile("random", rng.integers(0, 256, C, np.uint8).tobytes())
# period-1 runs: long self-overlap matches, period fill every granule
profile("runs1", (b"A" * 4096 + b"B" * 4096) * 8)
# period-500: fill path with near-granule period
blk = rng.integers(0, 256, 500, np.uint8).tobytes()
profile("period500", (blk * (C // 500 + 1))[:C])
# far: 4KB random block repeated -> offset 4096 > 512, no fill, VMEM history
blk = rng.integers(0, 256, 4096, np.uint8).tobytes()
profile("far4k", (blk * (C // 4096))[:C])
# text-like: many short matches
words = [bytes(rng.integers(97, 122, rng.integers(3, 9))) for _ in range(60)]
text = b" ".join(words[rng.integers(0, 60)] for _ in range(C // 5))[:C]
profile("text", text)
print("DONE", flush=True)
