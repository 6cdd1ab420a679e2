"""Build the vendored benchmark corpus (corpus/mixed_v1.bin.gz).

The true Silesia corpus is not reachable from this environment (no network),
so the bench uses a vendored, deterministic stand-in with the same *profile
mix* as Silesia (text, source code, executable binary, structured records,
highly-redundant database text, near-incompressible data).  The blob is
committed so the headline number is comparable across rounds; bench.py names
it truthfully ("mixed_v1", not "Silesia").

Run once: python scripts/build_corpus.py
The output is deterministic given this container's file set; the committed
blob is the source of truth afterwards (the builder is provenance).
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "corpus", "mixed_v1.bin.gz")
TARGET = 12 * 1024 * 1024  # 12 MiB raw


def _slice(parts, want):
    buf = b"".join(parts)
    return buf[:want]


def text_sources(want: int) -> bytes:
    """English-ish text + source code: Python stdlib sources (dickens/samba
    analogue)."""
    import email, json, http, unittest  # noqa: F401  (anchor stdlib paths)

    stdlib = os.path.dirname(os.__file__)
    names = sorted(glob.glob(os.path.join(stdlib, "*.py")))
    parts = []
    got = 0
    for n in names:
        try:
            with open(n, "rb") as f:
                b = f.read()
        except OSError:
            continue
        parts.append(b)
        got += len(b)
        if got >= want:
            break
    return _slice(parts, want)


def binary_exe(want: int) -> bytes:
    """Executable binary (mozilla/ooffice analogue): a big ELF from the
    container's numpy install."""
    import numpy.core  # noqa: F401

    cand = sorted(
        glob.glob(os.path.join(os.path.dirname(np.__file__), "**", "*.so"), recursive=True),
        key=os.path.getsize,
        reverse=True,
    )
    with open(cand[0], "rb") as f:
        return f.read(want)


def structured_records(want: int) -> bytes:
    """Star-catalog-like records (sao/osdb analogue): fixed-width rows of
    slowly-varying ints and floats."""
    rng = np.random.default_rng(1234)
    n = want // 28 + 1
    ra = (np.cumsum(rng.integers(0, 2000, n)) % (360 * 10**6)).astype(np.int32)
    dec = (np.cumsum(rng.integers(-500, 500, n))).astype(np.int32)
    mag = (rng.normal(9.0, 2.0, n) * 100).astype(np.int16)
    idx = np.arange(n, dtype=np.int32)
    flags = rng.integers(0, 16, n, dtype=np.uint8)
    pm = rng.normal(0, 1e-3, n).astype(np.float64)
    rec = np.zeros(n, dtype=[("i", "i4"), ("ra", "i4"), ("de", "i4"), ("m", "i2"), ("f", "u1"), ("p", "u1"), ("pm", "f8")])
    rec["i"], rec["ra"], rec["de"], rec["m"], rec["f"], rec["pm"] = idx, ra, dec, mag, flags, pm
    return rec.tobytes()[:want]


def redundant_db(want: int) -> bytes:
    """Highly-redundant database text (nci analogue)."""
    rng = np.random.default_rng(99)
    rows = []
    atoms = [b"C", b"N", b"O", b"H", b"S", b"P"]
    for i in range(want // 64 + 1):
        a = atoms[int(rng.integers(0, len(atoms)))]
        rows.append(
            b"  %6d  %s  %8.4f %8.4f %8.4f  0  0  0  0  0\n"
            % (i, a, rng.integers(0, 10000) / 1000.0, rng.integers(0, 10000) / 1000.0, 0.0)
        )
    return _slice(rows, want)


def near_random(want: int) -> bytes:
    """Near-incompressible (x-ray analogue): 12-bit noise in 16-bit words."""
    rng = np.random.default_rng(7)
    return (rng.integers(0, 4096, want // 2 + 1).astype("<u2")).tobytes()[:want]


def main():
    mix = [
        (text_sources, 3 * TARGET // 12),
        (binary_exe, 3 * TARGET // 12),
        (structured_records, 2 * TARGET // 12),
        (redundant_db, 2 * TARGET // 12),
        (near_random, 2 * TARGET // 12),
    ]
    parts = [fn(want) for fn, want in mix]
    blob = b"".join(parts)[:TARGET]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=9, mtime=0) as f:
            f.write(blob)
    print(f"{len(blob)} raw bytes -> {os.path.getsize(OUT)} compressed")
    print("sha256(raw) =", hashlib.sha256(blob).hexdigest())


if __name__ == "__main__":
    main()
