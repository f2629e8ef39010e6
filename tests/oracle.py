"""ctypes binding to the reference LZ4 library, used ONLY as a test oracle.

The reference sources at ``/root/reference`` are read-only public content;
we compile them out-of-tree (in /tmp) and bind the public entry points to
cross-check our independent implementation.  No reference code is copied
into this repository.  Tests that need the oracle skip when it is
unavailable (golden fixtures under ``tests/fixtures`` still cover interop).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

REF_DIR = Path(os.environ.get("LZ4TPU_REFERENCE", "/root/reference"))
BUILD_DIR = Path("/tmp/lz4t_oracle")
LIB_PATH = BUILD_DIR / "liblz4ref.so"
CLI_PATH = BUILD_DIR / "lz4"

_lib = None


def _build() -> bool:
    if LIB_PATH.exists():
        return True
    srcs = [REF_DIR / "lib" / f
            for f in ("lz4.c", "lz4hc.c", "lz4frame.c", "lz4sg.c", "xxhash.c")]
    if not all(s.exists() for s in srcs):
        return False
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-DXXH_NAMESPACE=LZ4_",
           *(str(s) for s in srcs), "-o", str(LIB_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return True


def get_lib():
    """Return the ctypes CDLL for the reference library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not _build():
        return None
    lib = ctypes.CDLL(str(LIB_PATH))
    lib.LZ4_compress_default.restype = ctypes.c_int
    lib.LZ4_compress_fast.restype = ctypes.c_int
    lib.LZ4_decompress_safe.restype = ctypes.c_int
    lib.LZ4_XXH32.restype = ctypes.c_uint32
    lib.LZ4_XXH64.restype = ctypes.c_uint64
    lib.LZ4_compress_HC.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# block layer
# ---------------------------------------------------------------------------

def ref_compress(src: bytes, acceleration: int = 1) -> bytes:
    lib = get_lib()
    bound = len(src) + len(src) // 255 + 32
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_fast(src, dst, len(src), bound, acceleration)
    assert n > 0, "reference compression failed"
    return dst.raw[:n]


def ref_compress_hc(src: bytes, level: int = 9) -> bytes:
    lib = get_lib()
    bound = len(src) + len(src) // 255 + 32
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4_compress_HC(src, dst, len(src), bound, level)
    assert n > 0, "reference HC compression failed"
    return dst.raw[:n]


def ref_decompress(comp: bytes, out_size: int) -> bytes:
    lib = get_lib()
    dst = ctypes.create_string_buffer(max(out_size, 1))
    n = lib.LZ4_decompress_safe(comp, dst, len(comp), out_size)
    if n < 0:
        raise ValueError(f"reference decode error {n}")
    return dst.raw[:n]


def ref_decompress_usingdict(comp: bytes, out_size: int, dict_: bytes) -> bytes:
    lib = get_lib()
    lib.LZ4_decompress_safe_usingDict.restype = ctypes.c_int
    dst = ctypes.create_string_buffer(max(out_size, 1))
    n = lib.LZ4_decompress_safe_usingDict(
        comp, dst, len(comp), out_size, dict_, len(dict_))
    if n < 0:
        raise ValueError(f"reference dict decode error {n}")
    return dst.raw[:n]


def ref_compress_dest_size(src: bytes, capacity: int):
    """Returns (consumed, block) via LZ4_compress_destSize."""
    lib = get_lib()
    lib.LZ4_compress_destSize.restype = ctypes.c_int
    src_size = ctypes.c_int(len(src))
    dst = ctypes.create_string_buffer(max(capacity, 1))
    n = lib.LZ4_compress_destSize(src, dst, ctypes.byref(src_size), capacity)
    return src_size.value, dst.raw[:n]


def ref_xxh32(data: bytes, seed: int = 0) -> int:
    return get_lib().LZ4_XXH32(data, len(data), ctypes.c_uint32(seed))


def ref_xxh64(data: bytes, seed: int = 0) -> int:
    return get_lib().LZ4_XXH64(data, len(data), ctypes.c_uint64(seed))


# ---------------------------------------------------------------------------
# frame layer
# ---------------------------------------------------------------------------

class _LZ4FPrefs(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("reserved_frameinfo", ctypes.c_uint * 2),
        ("compressionLevel", ctypes.c_uint),
        ("autoFlush", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 4),
    ]


def ref_compress_frame(src: bytes, block_size_id: int = 0, block_mode: int = 0,
                       content_checksum: int = 0, content_size: int = 0,
                       level: int = 0) -> bytes:
    """LZ4F_compressFrame via the reference (lz4frame.c:297)."""
    lib = get_lib()
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_isError.restype = ctypes.c_uint
    prefs = _LZ4FPrefs()
    prefs.blockSizeID = block_size_id
    prefs.blockMode = block_mode
    prefs.contentChecksumFlag = content_checksum
    prefs.contentSize = content_size
    prefs.compressionLevel = level
    bound = lib.LZ4F_compressFrameBound(ctypes.c_size_t(len(src)),
                                        ctypes.byref(prefs))
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(dst, bound, src, len(src), ctypes.byref(prefs))
    assert not lib.LZ4F_isError(ctypes.c_size_t(n)), "LZ4F_compressFrame failed"
    return dst.raw[:n]


def ref_decompress_frame(frame: bytes, out_size: int) -> bytes:
    """One-shot LZ4F_decompress via the reference (lz4frame.c:1064)."""
    lib = get_lib()
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    lib.LZ4F_isError.restype = ctypes.c_uint
    ctx = ctypes.c_void_p()
    err = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx), 100)
    assert not lib.LZ4F_isError(ctypes.c_size_t(err))
    out = bytearray()
    dst_cap = max(out_size, 1) + 16
    dst = ctypes.create_string_buffer(dst_cap)
    src_off = 0
    try:
        while src_off < len(frame):
            dst_sz = ctypes.c_size_t(dst_cap)
            src_sz = ctypes.c_size_t(len(frame) - src_off)
            hint = lib.LZ4F_decompress(ctx, dst, ctypes.byref(dst_sz),
                                       frame[src_off:], ctypes.byref(src_sz),
                                       None)
            if lib.LZ4F_isError(ctypes.c_size_t(hint)):
                raise ValueError(f"LZ4F_decompress error {hint}")
            out += dst.raw[:dst_sz.value]
            src_off += src_sz.value
            if hint == 0 and src_off >= len(frame):
                break
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)
    return bytes(out)


def build_cli() -> Path | None:
    """Build the reference lz4 CLI out-of-tree; return its path or None."""
    if CLI_PATH.exists():
        return CLI_PATH
    srcs = [REF_DIR / "programs" / f
            for f in ("lz4cli.c", "lz4io.c", "bench.c", "datagen.c")]
    srcs += [REF_DIR / "lib" / f
             for f in ("lz4.c", "lz4hc.c", "lz4frame.c", "lz4sg.c", "xxhash.c")]
    if not all(s.exists() for s in srcs):
        return None
    BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = ["gcc", "-O2", "-DXXH_NAMESPACE=LZ4_",
           "-I", str(REF_DIR / "lib"), "-I", str(REF_DIR / "programs"),
           *(str(s) for s in srcs), "-o", str(CLI_PATH)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except Exception:
        return None
    return CLI_PATH


def ref_cli_decompress(data: bytes) -> bytes:
    """Decode a (possibly multi-frame) .lz4 stream with the reference CLI."""
    cli = build_cli()
    assert cli is not None, "reference CLI unavailable"
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "in.lz4"
        src.write_bytes(data)
        p = subprocess.run([str(cli), "-d", "-c", str(src)],
                           capture_output=True, timeout=120)
        assert p.returncode == 0, p.stderr.decode()
        return p.stdout


def ref_cli_compress(data: bytes, args: tuple = ()) -> bytes:
    """Compress with the reference CLI (stdin -> stdout)."""
    cli = build_cli()
    assert cli is not None, "reference CLI unavailable"
    p = subprocess.run([str(cli), "-z", "-c", *args], input=data,
                       capture_output=True, timeout=120)
    assert p.returncode == 0, p.stderr.decode()
    return p.stdout


# ---------------------------------------------------------------------------
# scatter-gather layer
# ---------------------------------------------------------------------------

class _SGin(ctypes.Structure):
    _fields_ = [("sg_base", ctypes.c_void_p), ("sg_len", ctypes.c_size_t)]


class _SGout(ctypes.Structure):
    _fields_ = [("sg_base", ctypes.c_void_p), ("sg_len", ctypes.c_size_t)]


def ref_sg_compress(in_bufs, out_caps):
    """LZ4_SG_compress (lz4sg.c:701). Returns (ret, out_bufs_bytes, sizes)."""
    lib = get_lib()
    lib.LZ4_SG_compress.restype = ctypes.c_int
    n_in, n_out = len(in_bufs), len(out_caps)
    keep = [ctypes.create_string_buffer(bytes(b), len(b)) for b in in_bufs]
    outs = [ctypes.create_string_buffer(c) for c in out_caps]
    sgi = (_SGin * n_in)()
    sgo = (_SGout * n_out)()
    for i, b in enumerate(keep):
        sgi[i].sg_base = ctypes.cast(b, ctypes.c_void_p)
        sgi[i].sg_len = len(in_bufs[i])
    for i, b in enumerate(outs):
        sgo[i].sg_base = ctypes.cast(b, ctypes.c_void_p)
        sgo[i].sg_len = out_caps[i]
    lib.LZ4_SG_compress.argtypes = [
        ctypes.POINTER(_SGin), ctypes.c_size_t,
        ctypes.POINTER(_SGout), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_size_t, ctypes.c_int]
    src_size = ctypes.c_size_t(sum(len(b) for b in in_bufs))
    max_out = ctypes.c_size_t(sum(out_caps))
    ret = lib.LZ4_SG_compress(sgi, n_in, sgo, n_out,
                              ctypes.byref(src_size), max_out, 1)
    return ret, [o.raw for o in outs], src_size.value


def ref_sg_decompress(in_bufs, out_caps):
    """LZ4_SG_decompress (lz4sg.c:766). Returns (ret, out_bytes_list)."""
    lib = get_lib()
    lib.LZ4_SG_decompress.restype = ctypes.c_int
    n_in, n_out = len(in_bufs), len(out_caps)
    keep = [ctypes.create_string_buffer(bytes(b), len(b)) for b in in_bufs]
    outs = [ctypes.create_string_buffer(max(c, 1)) for c in out_caps]
    sgi = (_SGin * n_in)()
    sgo = (_SGout * n_out)()
    for i, b in enumerate(keep):
        sgi[i].sg_base = ctypes.cast(b, ctypes.c_void_p)
        sgi[i].sg_len = len(in_bufs[i])
    for i, b in enumerate(outs):
        sgo[i].sg_base = ctypes.cast(b, ctypes.c_void_p)
        sgo[i].sg_len = out_caps[i]
    lib.LZ4_SG_decompress.argtypes = [
        ctypes.POINTER(_SGin), ctypes.c_size_t,
        ctypes.POINTER(_SGout), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_size_t]
    src_size = ctypes.c_size_t(sum(len(b) for b in in_bufs))
    max_out = ctypes.c_size_t(sum(out_caps))
    ret = lib.LZ4_SG_decompress(sgi, n_in, sgo, n_out,
                                ctypes.byref(src_size), max_out)
    return ret, [outs[i].raw[:out_caps[i]] for i in range(n_out)]
