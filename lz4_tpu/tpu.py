"""TPU-native frame codec: LZ4F frames driven through the Pallas kernels.

This is the production pipeline (reference call stacks 3.1/3.2 re-imagined
for TPU): all block compute runs on-device, batched over a block grid; the
host only assembles/parses the byte-exact frame container (headers are a
few bytes per 64KB -- negligible, and inherently sequential).

Layout notes:
* block-independent frames only on this path (perfect grid parallelism,
  reference lz4frame.c:546-555 fast/indep variant); linked/SG paths use
  the host codec or the dict-capable decode kernel per chain step
* blocks <= 64KB (kernel SMEM budget); any LZ4F block-size ID is still
  decodable because partial blocks are legal anywhere in a frame
"""

from __future__ import annotations

import dataclasses
import struct
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import spec
from .frame import FrameInfo, FramePreferences, Lz4FrameError, \
    decode_frame_header, encode_frame_header
from .kernels.common import np_pack_rows
from .kernels.decode_kernel import decode_blocks
from .kernels.encode_kernel import bytes_to_val32_rows, encode_blocks
from .ops.xxhash_native import xxh32 as xxh32_fast

BLOCK = 65536  # device-path block granularity


def _split_blocks(data: bytes, block_size: int) -> List[bytes]:
    if not data:
        return [b""]
    return [data[i:i + block_size] for i in range(0, len(data), block_size)]


# ---------------------------------------------------------------------------
# device batch codec (arrays in, arrays out) -- building block for frames
# and for the mesh-parallel path in lz4_tpu.parallel
# ---------------------------------------------------------------------------

def encode_batch(buffers: List[bytes], block_size: int = BLOCK,
                 acceleration: int = 1):
    """Compress a list of <=block_size buffers on device.

    Returns (comp_rows int32 np [B, M], comp_lens np [B]).
    """
    packed, lens = np_pack_rows(buffers, block_size)
    val = bytes_to_val32_rows(jnp.asarray(packed), block_size)
    out, olen = encode_blocks(val, jnp.asarray(lens), acceleration)
    return np.asarray(out), np.asarray(olen)


def decode_batch(comp_list: List[bytes], out_cap: int,
                 out_lens: Optional[List[int]] = None):
    """Decompress a list of independent blocks on device.

    Returns list of byte strings; raises Lz4FrameError on any -1 row.
    """
    M = max((len(c) for c in comp_list), default=1)
    M = -(-max(M, 1) // 128) * 128
    B = len(comp_list)
    arr = np.zeros((B, M), np.int32)
    lens = np.zeros((B,), np.int32)
    for i, c in enumerate(comp_list):
        arr[i, :len(c)] = np.frombuffer(bytes(c), np.uint8)
        lens[i] = len(c)
    caps = None
    if out_lens is not None:
        caps = jnp.asarray(np.asarray(out_lens, np.int32))
    out, olen = decode_blocks(jnp.asarray(arr), jnp.asarray(lens), out_cap,
                              out_caps=caps)
    out, olen = np.asarray(out), np.asarray(olen)
    if (olen < 0).any():
        bad = int(np.nonzero(olen < 0)[0][0])
        raise Lz4FrameError(f"device decode failed on block {bad}")
    return [bytes(out[i, :olen[i]].astype(np.uint8)) for i in range(B)]


# ---------------------------------------------------------------------------
# frame pipeline
# ---------------------------------------------------------------------------

def compress_frame_device(data: bytes,
                          prefs: Optional[FramePreferences] = None,
                          block_size: int = BLOCK,
                          acceleration: int = 1) -> bytes:
    """One-shot frame compression with all block compute on TPU.

    Emits a block-independent LZ4F frame (any standard decoder reads it;
    parity target: LZ4F_compressFrame with blockMode=independent).
    """
    prefs = dataclasses.replace(prefs) if prefs else FramePreferences()
    prefs.block_independent = True
    if prefs.block_size_id == 0:
        prefs.block_size_id = spec.optimal_block_size_id(block_size)
    if block_size > spec.BLOCK_SIZES[prefs.block_size_id]:
        raise Lz4FrameError("block_size exceeds frame block maximum")
    if prefs.content_size is not None and prefs.content_size != len(data):
        raise Lz4FrameError("content_size does not match data")

    data = bytes(data)
    blocks = _split_blocks(data, block_size)
    comp_rows, comp_lens = encode_batch(blocks, block_size, acceleration)

    parts = [encode_frame_header(prefs)]
    pos = 0
    for i, blk in enumerate(blocks):
        if not blk:
            continue
        clen = int(comp_lens[i])
        if clen >= len(blk):
            # stored-block fallback (lz4frame.c:518-524)
            payload = blk
            header = struct.pack("<I", len(blk) | spec.UNCOMPRESSED_BIT)
        else:
            payload = comp_rows[i, :clen].astype(np.uint8).tobytes()
            header = struct.pack("<I", clen)
        parts.append(header)
        parts.append(payload)
        if prefs.block_checksum:
            parts.append(struct.pack("<I", xxh32_fast(payload, 0)))
        pos += len(blk)
    parts.append(struct.pack("<I", 0))
    if prefs.content_checksum:
        parts.append(struct.pack("<I", xxh32_fast(data, 0)))
    return b"".join(parts)


def decompress_frame_device(frame: bytes) -> Tuple[bytes, int]:
    """One-shot frame decompression with block compute on TPU.

    Requires a block-independent frame (the reference's multithread-able
    mode); linked frames raise and should take the host/streaming path.
    Returns (content, bytes_consumed).
    """
    info = decode_frame_header(frame)
    if not info.block_independent:
        raise Lz4FrameError("device path requires independent blocks")
    if info.block_size > BLOCK:
        raise Lz4FrameError("block size exceeds device kernel maximum")
    pos = info.header_size
    comp_blocks: List[bytes] = []
    stored: List[Optional[bytes]] = []
    while True:
        if pos + 4 > len(frame):
            raise Lz4FrameError("truncated frame")
        raw = struct.unpack_from("<I", frame, pos)[0]
        pos += 4
        if raw == 0:
            break
        size = raw & ~spec.UNCOMPRESSED_BIT
        if pos + size > len(frame):
            raise Lz4FrameError("truncated block")
        payload = frame[pos:pos + size]
        pos += size
        if info.block_checksum:
            want = struct.unpack_from("<I", frame, pos)[0]
            pos += 4
            if xxh32_fast(payload, 0) != want:
                raise Lz4FrameError("block checksum mismatch")
        if raw & spec.UNCOMPRESSED_BIT:
            stored.append(payload)
            comp_blocks.append(None)
        else:
            stored.append(None)
            comp_blocks.append(payload)

    todo = [c for c in comp_blocks if c is not None]
    decoded = decode_batch(todo, info.block_size) if todo else []
    it = iter(decoded)
    content = b"".join(s if s is not None else next(it) for s in stored)

    if info.content_checksum:
        if pos + 4 > len(frame):
            raise Lz4FrameError("truncated content checksum")
        want = struct.unpack_from("<I", frame, pos)[0]
        pos += 4
        if xxh32_fast(content, 0) != want:
            raise Lz4FrameError("content checksum mismatch")
    if info.content_size is not None and info.content_size != len(content):
        raise Lz4FrameError("frame content size mismatch")
    return content, pos
