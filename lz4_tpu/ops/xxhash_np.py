"""XXH32 / XXH64 host implementations (one-shot + streaming).

Capability parity with the reference's checksum layer (reference
``lib/xxhash.h:119-167``: ``XXH32/64``, ``XXHnn_reset/update/digest``).
Implemented from the public xxHash algorithm definition; validated
bit-exactly against the reference library in ``tests/test_xxhash.py``.

These are the *host oracles*.  The device path lives in
``lz4_tpu.kernels.xxhash_kernel`` and the fast host path in the
``lz4t_native`` C extension (``native/``).
"""

from __future__ import annotations

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF

P32_1 = 2654435761
P32_2 = 2246822519
P32_3 = 3266489917
P32_4 = 668265263
P32_5 = 374761393

P64_1 = 11400714785074694791
P64_2 = 14029467366897019727
P64_3 = 1609587929392839161
P64_4 = 9650029242287828579
P64_5 = 2870177450012600261


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round32(acc: int, lane: int) -> int:
    return (_rotl32((acc + lane * P32_2) & M32, 13) * P32_1) & M32


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * P64_2) & M64, 31) * P64_1) & M64


def xxh32(data: bytes, seed: int = 0) -> int:
    """One-shot XXH32 of ``data`` with ``seed``."""
    data = bytes(data)
    n = len(data)
    i = 0
    if n >= 16:
        v1 = (seed + P32_1 + P32_2) & M32
        v2 = (seed + P32_2) & M32
        v3 = seed & M32
        v4 = (seed - P32_1) & M32
        lim = n - 16
        while i <= lim:
            v1 = _round32(v1, int.from_bytes(data[i:i + 4], "little"))
            v2 = _round32(v2, int.from_bytes(data[i + 4:i + 8], "little"))
            v3 = _round32(v3, int.from_bytes(data[i + 8:i + 12], "little"))
            v4 = _round32(v4, int.from_bytes(data[i + 12:i + 16], "little"))
            i += 16
        h = (_rotl32(v1, 1) + _rotl32(v2, 7) + _rotl32(v3, 12) + _rotl32(v4, 18)) & M32
    else:
        h = (seed + P32_5) & M32
    h = (h + n) & M32
    while i + 4 <= n:
        h = (_rotl32((h + int.from_bytes(data[i:i + 4], "little") * P32_3) & M32, 17) * P32_4) & M32
        i += 4
    while i < n:
        h = (_rotl32((h + data[i] * P32_5) & M32, 11) * P32_1) & M32
        i += 1
    h ^= h >> 15
    h = (h * P32_2) & M32
    h ^= h >> 13
    h = (h * P32_3) & M32
    h ^= h >> 16
    return h


def xxh64(data: bytes, seed: int = 0) -> int:
    """One-shot XXH64 of ``data`` with ``seed``."""
    data = bytes(data)
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P64_1 + P64_2) & M64
        v2 = (seed + P64_2) & M64
        v3 = seed & M64
        v4 = (seed - P64_1) & M64
        lim = n - 32
        while i <= lim:
            v1 = _round64(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round64(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round64(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round64(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round64(0, v)) * P64_1 + P64_4) & M64
    else:
        h = (seed + P64_5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        k = _round64(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl64(h ^ k, 27) * P64_1 + P64_4) & M64
        i += 8
    if i + 4 <= n:
        h = (_rotl64(h ^ (int.from_bytes(data[i:i + 4], "little") * P64_1) & M64, 23) * P64_2 + P64_3) & M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ (data[i] * P64_5) & M64, 11) * P64_1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P64_2) & M64
    h ^= h >> 29
    h = (h * P64_3) & M64
    h ^= h >> 32
    return h


class XXH32State:
    """Streaming XXH32 (reset/update/digest), parity with reference
    ``XXH32_reset/update/digest`` (lib/xxhash.c:588+)."""

    def __init__(self, seed: int = 0):
        self.reset(seed)

    def reset(self, seed: int = 0) -> None:
        self.seed = seed & M32
        self.v1 = (seed + P32_1 + P32_2) & M32
        self.v2 = (seed + P32_2) & M32
        self.v3 = seed & M32
        self.v4 = (seed - P32_1) & M32
        self.buf = b""
        self.total = 0

    def update(self, data: bytes) -> None:
        data = bytes(data)
        self.total += len(data)
        data = self.buf + data
        i = 0
        lim = len(data) - 16
        while i <= lim:
            self.v1 = _round32(self.v1, int.from_bytes(data[i:i + 4], "little"))
            self.v2 = _round32(self.v2, int.from_bytes(data[i + 4:i + 8], "little"))
            self.v3 = _round32(self.v3, int.from_bytes(data[i + 8:i + 12], "little"))
            self.v4 = _round32(self.v4, int.from_bytes(data[i + 12:i + 16], "little"))
            i += 16
        self.buf = data[i:]

    def digest(self) -> int:
        if self.total >= 16:
            h = (_rotl32(self.v1, 1) + _rotl32(self.v2, 7)
                 + _rotl32(self.v3, 12) + _rotl32(self.v4, 18)) & M32
        else:
            h = (self.seed + P32_5) & M32
        h = (h + self.total) & M32
        data, i, n = self.buf, 0, len(self.buf)
        while i + 4 <= n:
            h = (_rotl32((h + int.from_bytes(data[i:i + 4], "little") * P32_3) & M32, 17) * P32_4) & M32
            i += 4
        while i < n:
            h = (_rotl32((h + data[i] * P32_5) & M32, 11) * P32_1) & M32
            i += 1
        h ^= h >> 15
        h = (h * P32_2) & M32
        h ^= h >> 13
        h = (h * P32_3) & M32
        h ^= h >> 16
        return h


class XXH64State:
    """Streaming XXH64 (reset/update/digest)."""

    def __init__(self, seed: int = 0):
        self.reset(seed)

    def reset(self, seed: int = 0) -> None:
        self.seed = seed & M64
        self.v1 = (seed + P64_1 + P64_2) & M64
        self.v2 = (seed + P64_2) & M64
        self.v3 = seed & M64
        self.v4 = (seed - P64_1) & M64
        self.buf = b""
        self.total = 0

    def update(self, data: bytes) -> None:
        data = bytes(data)
        self.total += len(data)
        data = self.buf + data
        i = 0
        lim = len(data) - 32
        while i <= lim:
            self.v1 = _round64(self.v1, int.from_bytes(data[i:i + 8], "little"))
            self.v2 = _round64(self.v2, int.from_bytes(data[i + 8:i + 16], "little"))
            self.v3 = _round64(self.v3, int.from_bytes(data[i + 16:i + 24], "little"))
            self.v4 = _round64(self.v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        self.buf = data[i:]

    def digest(self) -> int:
        if self.total >= 32:
            h = (_rotl64(self.v1, 1) + _rotl64(self.v2, 7)
                 + _rotl64(self.v3, 12) + _rotl64(self.v4, 18)) & M64
            for v in (self.v1, self.v2, self.v3, self.v4):
                h = ((h ^ _round64(0, v)) * P64_1 + P64_4) & M64
        else:
            h = (self.seed + P64_5) & M64
        h = (h + self.total) & M64
        data, i, n = self.buf, 0, len(self.buf)
        while i + 8 <= n:
            k = _round64(0, int.from_bytes(data[i:i + 8], "little"))
            h = (_rotl64(h ^ k, 27) * P64_1 + P64_4) & M64
            i += 8
        if i + 4 <= n:
            h = (_rotl64(h ^ (int.from_bytes(data[i:i + 4], "little") * P64_1) & M64, 23) * P64_2 + P64_3) & M64
            i += 4
        while i < n:
            h = (_rotl64(h ^ (data[i] * P64_5) & M64, 11) * P64_1) & M64
            i += 1
        h ^= h >> 33
        h = (h * P64_2) & M64
        h ^= h >> 29
        h = (h * P64_3) & M64
        h ^= h >> 32
        return h
