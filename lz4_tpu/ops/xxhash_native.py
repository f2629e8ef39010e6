"""ctypes binding to the lz4t_native host library (fast XXH32/64).

The shared library is built lazily from ``native/lz4t_native.c`` with the
system compiler and cached next to the source; everything degrades to the
pure-Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

from . import xxhash_np

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "lz4t_native.c"
_SO = _SRC.with_suffix(".so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["cc", "-O3", "-fPIC", "-shared", str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True, timeout=60)
        lib = ctypes.CDLL(str(_SO))
        lib.lz4t_xxh32.restype = ctypes.c_uint32
        lib.lz4t_xxh32.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_uint32]
        lib.lz4t_xxh64.restype = ctypes.c_uint64
        lib.lz4t_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                   ctypes.c_uint64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def xxh32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        return xxhash_np.xxh32(data, seed)
    data = bytes(data)
    return lib.lz4t_xxh32(data, len(data), seed & 0xFFFFFFFF)


def xxh64(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        return xxhash_np.xxh64(data, seed)
    data = bytes(data)
    return lib.lz4t_xxh64(data, len(data), seed & 0xFFFFFFFFFFFFFFFF)
