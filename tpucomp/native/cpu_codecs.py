"""CPU reference codec paths backed by the native library.

Fast host-side LZ4 block compress/decompress: golden-vector generation for
tests and a no-accelerator fallback.  The matcher family matches the
device compressor (nearest previous occurrence, interior insertions,
offsets <= 8 exact) so outputs are directly comparable.
"""

from __future__ import annotations

import ctypes

import numpy as np

from tpucomp import native
from tpucomp.core.sizing import lz4_max_compressed_chunk_size


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def lz4_compress(data: bytes | np.ndarray, max_match: int = -1) -> bytes:
    """Compress one LZ4 block on the host.  max_match < 0 = unbounded."""
    src = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
    lib = native.load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    cap = lz4_max_compressed_chunk_size(src.size) + 16
    dst = np.empty(cap, np.uint8)
    n = lib.tc_lz4_compress(_u8p(src), src.size, _u8p(dst), cap, max_match)
    if n < 0:
        raise RuntimeError("lz4 compress overflow")
    return dst[:n].tobytes()


def lz4_decompress(comp: bytes | np.ndarray, max_out: int) -> bytes:
    src = np.frombuffer(comp, np.uint8) if isinstance(comp, (bytes, bytearray)) else np.ascontiguousarray(comp, np.uint8)
    lib = native.load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dst = np.empty(max_out, np.uint8)
    n = lib.tc_lz4_decompress(_u8p(src), src.size, _u8p(dst), max_out)
    if n < 0:
        raise ValueError("corrupt LZ4 stream")
    return dst[:n].tobytes()
