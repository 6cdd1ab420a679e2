"""Native host runtime: lazily-built C++ shared library + ctypes bindings.

Where the reference uses C++ for its host-side runtime (staging, buffer
bookkeeping, verification), tpucomp builds this small native library with
the system toolchain on first use and falls back to pure numpy when no
compiler is available.  Public entry points live in
tpucomp.native.staging / tpucomp.native.cpu_codecs.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "src", "tpucomp_native.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SO = os.path.join(_BUILD_DIR, "libtpucomp_native.so")


def _build() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except Exception:
        return None


def load():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tc_pack_ragged.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.tc_pack_ragged.restype = None
        lib.tc_unpack_ragged.argtypes = [u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.tc_unpack_ragged.restype = ctypes.c_int64
        lib.tc_split_stream.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p]
        lib.tc_split_stream.restype = None
        lib.tc_lz4_compress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64, ctypes.c_int64]
        lib.tc_lz4_compress.restype = ctypes.c_int64
        lib.tc_lz4_decompress.argtypes = [u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.tc_lz4_decompress.restype = ctypes.c_int64
        lib.tc_crc32.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]
        lib.tc_crc32.restype = ctypes.c_uint32
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None
