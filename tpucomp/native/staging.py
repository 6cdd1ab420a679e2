"""Fast ragged <-> dense staging using the native library when present.

Drop-in accelerations of tpucomp.core.chunking's host edges; used
automatically by pack_chunks/unpack_chunks for large batches.
"""

from __future__ import annotations

import ctypes

import numpy as np

from tpucomp import native


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def pack_ragged(concat: np.ndarray, sizes: np.ndarray, capacity: int) -> np.ndarray:
    """Contiguous concatenation + sizes -> dense uint8[b, capacity]."""
    concat = np.ascontiguousarray(concat, np.uint8)
    sizes = np.ascontiguousarray(sizes, np.int64)
    b = sizes.shape[0]
    dst = np.empty((b, capacity), np.uint8)
    lib = native.load()
    if lib is not None:
        lib.tc_pack_ragged(_u8p(concat), _i64p(sizes), b, capacity, _u8p(dst))
        return dst
    dst[:] = 0
    off = 0
    for i in range(b):
        n = min(int(sizes[i]), capacity)
        dst[i, :n] = concat[off : off + n]
        off += int(sizes[i])
    return dst


def unpack_ragged(dense: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Dense rows + sizes -> contiguous concatenation of valid prefixes."""
    dense = np.ascontiguousarray(dense, np.uint8)
    sizes = np.ascontiguousarray(sizes, np.int64)
    b, cap = dense.shape
    total = int(np.minimum(sizes, cap).sum())
    dst = np.empty(total, np.uint8)
    lib = native.load()
    if lib is not None:
        wrote = lib.tc_unpack_ragged(_u8p(dense), _i64p(sizes), b, cap, _u8p(dst))
        assert wrote == total
        return dst
    off = 0
    for i in range(b):
        n = min(int(sizes[i]), cap)
        dst[off : off + n] = dense[i, :n]
        off += n
    return dst


def split_stream(stream: np.ndarray, chunk: int, num_chunks: int) -> np.ndarray:
    stream = np.ascontiguousarray(stream, np.uint8)
    dst = np.empty((num_chunks, chunk), np.uint8)
    lib = native.load()
    if lib is not None:
        lib.tc_split_stream(_u8p(stream), stream.size, chunk, num_chunks, _u8p(dst))
        return dst
    dst[:] = 0
    flat = dst.reshape(-1)
    flat[: stream.size] = stream[: num_chunks * chunk]
    return dst


def crc32(data: np.ndarray | bytes, seed: int = 0) -> int:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) else np.ascontiguousarray(data, np.uint8)
    lib = native.load()
    if lib is not None:
        return int(lib.tc_crc32(_u8p(arr), arr.size, seed))
    import zlib

    return zlib.crc32(arr.tobytes(), seed)
