"""LZ4F frame layer: encode/decode of LZ4 Frame spec v1.5.1.

Capability parity with the reference frame layer (reference
``lib/lz4frame.c``): one-shot and incremental compression
(``LZ4F_compressFrame``/``Begin/Update/flush/End``, lz4frame.c:297-764),
resumable decompression (``LZ4F_decompress`` state machine,
lz4frame.c:1064-1500), ``getFrameInfo``, skippable frames, the legacy
frame format (lz4io.c:344-413, 730-779), linked/independent blocks, and
both checksums.

The block codec is pluggable: the host oracle by default, the TPU kernel
codec (``lz4_tpu.kernels``) in the production path.  Orchestration is
host-side by design -- framing is bytes-plumbing; the compute lives in the
block codec.
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Callable, Optional

from . import spec
from .ops import block_np
from .ops.xxhash_np import XXH32State, xxh32


class Lz4FrameError(ValueError):
    pass


# A block compressor: (src, dict_, acceleration, level) -> compressed bytes.
BlockCompressor = Callable[[bytes, bytes, int, int], bytes]
# A block decompressor: (comp, out_size, dict_) -> bytes.
BlockDecompressor = Callable[[bytes, int, bytes], bytes]


def _default_block_compress(src: bytes, dict_: bytes, acceleration: int,
                            level: int) -> bytes:
    if level >= 3:
        from .hc import compress_hc_block
        return compress_hc_block(src, level=level, dict_=dict_)
    return block_np.compress_block(src, acceleration=acceleration, dict_=dict_)


def _default_block_decompress(comp: bytes, out_size: int, dict_: bytes) -> bytes:
    return block_np.decompress_block(comp, out_size, dict_=dict_)


@dataclasses.dataclass
class FramePreferences:
    """Parity with ``LZ4F_preferences_t`` (reference lz4frame.h:111-125)."""

    block_size_id: int = 0          # 0 = default(4MB); else 4..7
    block_independent: bool = False
    content_checksum: bool = False
    block_checksum: bool = False    # spec v1.5 field; reference r132 has no
                                    # encoder knob but the decoder must cope
    content_size: Optional[int] = None  # embed content size when not None
    level: int = 0                  # >=3 selects the HC block codec
    auto_flush: bool = False
    acceleration: int = 1

    def resolved_bsid(self, src_hint: int = 0) -> int:
        if self.block_size_id == 0:
            return spec.DEFAULT_BLOCK_SIZE_ID
        if self.block_size_id not in spec.BLOCK_SIZES:
            raise Lz4FrameError(f"invalid blockSizeID {self.block_size_id}")
        return self.block_size_id


@dataclasses.dataclass
class FrameInfo:
    """Parity with ``LZ4F_frameInfo_t`` (lz4frame.h:98-106)."""

    block_size_id: int = 7
    block_independent: bool = False
    content_checksum: bool = False
    block_checksum: bool = False
    content_size: Optional[int] = None
    header_size: int = 0

    @property
    def block_size(self) -> int:
        return spec.BLOCK_SIZES[self.block_size_id]


# ---------------------------------------------------------------------------
# header encode / decode
# ---------------------------------------------------------------------------

def encode_frame_header(prefs: FramePreferences) -> bytes:
    """Magic + FLG/BD(/contentSize) + HC byte (lz4frame.c:457-478 parity)."""
    flg = (spec.FLG_VERSION << 6)
    if prefs.block_independent:
        flg |= 1 << 5
    if prefs.block_checksum:
        flg |= 1 << 4
    if prefs.content_size is not None:
        flg |= 1 << 3
    if prefs.content_checksum:
        flg |= 1 << 2
    bd = prefs.resolved_bsid() << 4
    desc = bytes([flg, bd])
    if prefs.content_size is not None:
        desc += struct.pack("<Q", prefs.content_size)
    hc = (xxh32(desc, 0) >> 8) & 0xFF
    return struct.pack("<I", spec.FRAME_MAGIC) + desc + bytes([hc])


def decode_frame_header(data: bytes) -> FrameInfo:
    """Parse + validate a frame header (parity: LZ4F_decodeHeader,
    lz4frame.c:830-935).  ``data`` must contain the whole header."""
    if len(data) < spec.MIN_FRAME_HEADER_SIZE:
        raise Lz4FrameError("frame header too small")
    magic = struct.unpack_from("<I", data)[0]
    if magic != spec.FRAME_MAGIC:
        raise Lz4FrameError(f"bad magic {magic:#x}")
    flg = data[4]
    bd = data[5]
    if (flg >> 6) != spec.FLG_VERSION:
        raise Lz4FrameError("unsupported frame version")
    if flg & 0b11:
        raise Lz4FrameError("reserved FLG bits set")
    if bd & 0b10001111:
        raise Lz4FrameError("reserved BD bits set")
    info = FrameInfo(
        block_size_id=(bd >> 4) & 0b111,
        block_independent=bool(flg & (1 << 5)),
        block_checksum=bool(flg & (1 << 4)),
        content_checksum=bool(flg & (1 << 2)),
    )
    if info.block_size_id not in spec.BLOCK_SIZES:
        raise Lz4FrameError(f"invalid block size id {info.block_size_id}")
    pos = 6
    if flg & (1 << 3):
        if len(data) < pos + 9:
            raise Lz4FrameError("frame header too small for content size")
        info.content_size = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
    hc = (xxh32(data[4:pos], 0) >> 8) & 0xFF
    if data[pos] != hc:
        raise Lz4FrameError("header checksum mismatch")
    info.header_size = pos + 1
    return info


def header_size_hint(prefix: bytes) -> int:
    """How many bytes the full header occupies, from >=6 prefix bytes
    (parity: LZ4F_headerSize logic inside LZ4F_getFrameInfo)."""
    if len(prefix) < 6:
        return spec.MIN_FRAME_HEADER_SIZE
    flg = prefix[4]
    return spec.MIN_FRAME_HEADER_SIZE + (8 if flg & (1 << 3) else 0)


def get_frame_info(prefix: bytes) -> FrameInfo:
    """Parity with LZ4F_getFrameInfo (lz4frame.c:948-970)."""
    return decode_frame_header(prefix)


# ---------------------------------------------------------------------------
# compression
# ---------------------------------------------------------------------------

class FrameCompressor:
    """Incremental frame compression.

    Parity with ``LZ4F_compressBegin/Update/flush/End``
    (lz4frame.c:405-764): buffers partial blocks, maintains the 64 KB
    linked-mode window, emits whole blocks, supports autoFlush, applies the
    stored-block fallback for incompressible data, and verifies an embedded
    content size at ``end()``.
    """

    def __init__(self, prefs: Optional[FramePreferences] = None,
                 block_compress: BlockCompressor = _default_block_compress):
        self.prefs = prefs or FramePreferences()
        self._compress = block_compress
        self._block_size = spec.BLOCK_SIZES[self.prefs.resolved_bsid()]
        self._buf = bytearray()      # pending (unemitted) plaintext
        self._window = b""           # last <=64KB of emitted plaintext
        self._xxh = XXH32State(0)
        self._total_in = 0
        self._begun = False
        self._ended = False

    # -- api ---------------------------------------------------------------
    def begin(self) -> bytes:
        if self._begun:
            raise Lz4FrameError("begin() called twice")
        self._begun = True
        return encode_frame_header(self.prefs)

    def update(self, data: bytes) -> bytes:
        if not self._begun or self._ended:
            raise Lz4FrameError("update() outside begin/end")
        data = bytes(data)
        self._total_in += len(data)
        if self.prefs.content_checksum:
            self._xxh.update(data)
        self._buf += data
        out = bytearray()
        while len(self._buf) >= self._block_size:
            block = bytes(self._buf[:self._block_size])
            del self._buf[:self._block_size]
            out += self._emit_block(block)
        if self.prefs.auto_flush and self._buf:
            out += self.flush()
        return bytes(out)

    def flush(self) -> bytes:
        """Emit any buffered partial block (parity: LZ4F_flush,
        lz4frame.c:693-722)."""
        if not self._buf:
            return b""
        block = bytes(self._buf)
        self._buf.clear()
        return self._emit_block(block)

    def end(self) -> bytes:
        """Flush + endmark + optional content checksum (LZ4F_compressEnd,
        lz4frame.c:734-764)."""
        if self._ended:
            raise Lz4FrameError("end() called twice")
        out = bytearray(self.flush())
        out += struct.pack("<I", 0)
        if self.prefs.content_checksum:
            out += struct.pack("<I", self._xxh.digest())
        self._ended = True
        if (self.prefs.content_size is not None
                and self.prefs.content_size != self._total_in):
            raise Lz4FrameError("content size mismatch at end()"
                                f" ({self._total_in} != {self.prefs.content_size})")
        return bytes(out)

    # -- internals -----------------------------------------------------------
    def _emit_block(self, block: bytes) -> bytes:
        dict_ = b"" if self.prefs.block_independent else self._window
        comp = self._compress(block, dict_, self.prefs.acceleration,
                              self.prefs.level)
        if len(comp) >= len(block):
            # stored-block fallback (lz4frame.c:518-524)
            payload = block
            header = struct.pack("<I", len(block) | spec.UNCOMPRESSED_BIT)
        else:
            payload = comp
            header = struct.pack("<I", len(comp))
        if not self.prefs.block_independent:
            self._window = (self._window + block)[-spec.WINDOW_SIZE:]
        out = header + payload
        if self.prefs.block_checksum:
            out += struct.pack("<I", xxh32(payload, 0))
        return out


def compress_frame(data: bytes, prefs: Optional[FramePreferences] = None,
                   block_compress: BlockCompressor = _default_block_compress,
                   ) -> bytes:
    """One-shot frame compression (parity: LZ4F_compressFrame,
    lz4frame.c:297-353; like the reference, a frame that fits one block is
    auto-switched to blockIndependent)."""
    prefs = dataclasses.replace(prefs) if prefs else FramePreferences()
    if prefs.content_size is not None and prefs.content_size != len(data):
        raise Lz4FrameError("content_size does not match data")
    bsid = prefs.resolved_bsid()
    if len(data) <= spec.BLOCK_SIZES[bsid]:
        prefs.block_independent = True  # single block: linking is meaningless
    c = FrameCompressor(prefs, block_compress)
    return c.begin() + c.update(data) + c.end()


def compress_frame_bound(src_size: int,
                         prefs: Optional[FramePreferences] = None) -> int:
    """Worst-case frame size (parity: LZ4F_compressFrameBound,
    lz4frame.c:269-285)."""
    prefs = prefs or FramePreferences()
    bsize = spec.BLOCK_SIZES[prefs.resolved_bsid()]
    nblocks = max(1, -(-src_size // bsize))
    per_block = spec.BLOCK_HEADER_SIZE + (4 if prefs.block_checksum else 0)
    return (spec.MAX_FRAME_HEADER_SIZE + src_size + nblocks * per_block
            + bsize  # partial-block worst case
            + spec.ENDMARK_SIZE + 4)


# ---------------------------------------------------------------------------
# decompression
# ---------------------------------------------------------------------------

class FrameDecompressor:
    """Resumable frame decoder: feed arbitrary input slices, collect output.

    Parity with the LZ4F_decompress state machine + srcExpect contract
    (lz4frame.c:1064-1500): ``feed`` never over-reads, returns the number of
    bytes it consumed plus a hint of how many bytes it wants next;
    ``finished`` flips once the full frame (incl. suffix) was consumed.
    Skippable frames are consumed transparently when ``skip_skippable``.
    """

    def __init__(self, block_decompress: BlockDecompressor = _default_block_decompress,
                 skip_skippable: bool = True):
        self._decompress = block_decompress
        self._skip_skippable = skip_skippable
        self.reset()

    def reset(self) -> None:
        self._stage = "magic"
        self._need = 4
        self._acc = bytearray()      # staging for the current unit
        self._window = b""
        self._xxh = XXH32State(0)
        self.info: Optional[FrameInfo] = None
        self.finished = False
        self._block_len = 0
        self._block_stored = False
        self._skip_left = 0
        self._total_out = 0

    # how many more input bytes we'd like (0 when finished)
    @property
    def src_hint(self) -> int:
        if self.finished:
            return 0
        if self._stage == "skip_body":
            return self._skip_left
        return max(1, self._need - len(self._acc))

    def feed(self, chunk: bytes) -> tuple[int, bytes]:
        """Consume from ``chunk``; return (bytes_consumed, output_bytes)."""
        if self.finished:
            return 0, b""
        chunk = bytes(chunk)
        pos = 0
        out = bytearray()
        while pos < len(chunk) and not self.finished:
            if self._stage == "skip_body":
                take = min(self._skip_left, len(chunk) - pos)
                pos += take
                self._skip_left -= take
                if self._skip_left == 0:
                    self._stage, self._need = "magic", 4
                    self._acc.clear()
                continue
            take = min(self._need - len(self._acc), len(chunk) - pos)
            self._acc += chunk[pos:pos + take]
            pos += take
            if len(self._acc) < self._need:
                break
            out += self._advance()
        return pos, bytes(out)

    # -- state transitions ---------------------------------------------------
    def _advance(self) -> bytes:
        unit = bytes(self._acc)
        self._acc.clear()
        stage = self._stage

        if stage == "magic":
            magic = struct.unpack("<I", unit)[0]
            if magic == spec.FRAME_MAGIC:
                self._stage, self._need = "flg", 2
                self._hdr = unit
            elif ((magic & spec.SKIPPABLE_MAGIC_MASK) == spec.SKIPPABLE_MAGIC_MIN
                  and self._skip_skippable):
                self._stage, self._need = "skip_size", 4
            else:
                raise Lz4FrameError(f"bad magic {magic:#x}")
            return b""

        if stage == "skip_size":
            self._skip_left = struct.unpack("<I", unit)[0]
            if self._skip_left == 0:
                self._stage, self._need = "magic", 4
            else:
                self._stage = "skip_body"
            return b""

        if stage == "flg":
            self._hdr += unit
            self._stage = "hdr_rest"
            self._need = header_size_hint(self._hdr) - len(self._hdr)
            return b""

        if stage == "hdr_rest":
            self._hdr += unit
            self.info = decode_frame_header(self._hdr)
            self._window = b""
            self._xxh.reset(0)
            self._stage, self._need = "block_header", 4
            return b""

        if stage == "block_header":
            raw = struct.unpack("<I", unit)[0]
            if raw == 0:  # endmark
                if self.info.content_checksum:
                    self._stage, self._need = "content_checksum", 4
                else:
                    self._finish_frame()
                return b""
            self._block_stored = bool(raw & spec.UNCOMPRESSED_BIT)
            self._block_len = raw & ~spec.UNCOMPRESSED_BIT
            if self._block_len > self.info.block_size and not self._block_stored:
                raise Lz4FrameError("block larger than block maximum size")
            self._stage = "block_body"
            self._need = self._block_len + (4 if self.info.block_checksum else 0)
            return b""

        if stage == "block_body":
            payload = unit[:self._block_len]
            if self.info.block_checksum:
                want = struct.unpack("<I", unit[self._block_len:])[0]
                if xxh32(payload, 0) != want:
                    raise Lz4FrameError("block checksum mismatch")
            if self._block_stored:
                decoded = payload
            else:
                dict_ = b"" if self.info.block_independent else self._window
                try:
                    decoded = self._decompress(payload, self.info.block_size,
                                               dict_)
                except block_np.Lz4BlockError as e:
                    raise Lz4FrameError(f"block decode failed: {e}") from e
            if not self.info.block_independent:
                self._window = (self._window + decoded)[-spec.WINDOW_SIZE:]
            if self.info.content_checksum:
                self._xxh.update(decoded)
            self._total_out += len(decoded)
            self._stage, self._need = "block_header", 4
            return decoded

        if stage == "content_checksum":
            want = struct.unpack("<I", unit)[0]
            if self._xxh.digest() != want:
                raise Lz4FrameError("content checksum mismatch")
            self._finish_frame()
            return b""

        raise AssertionError(f"bad stage {stage}")

    def _finish_frame(self) -> None:
        if (self.info.content_size is not None
                and self.info.content_size != self._total_out):
            raise Lz4FrameError("frame content size mismatch")
        self.finished = True


def decompress_frame(data: bytes,
                     block_decompress: BlockDecompressor = _default_block_decompress,
                     ) -> tuple[bytes, int]:
    """Decode one frame from ``data``; returns (content, bytes_consumed)."""
    d = FrameDecompressor(block_decompress)
    consumed, out = d.feed(data)
    if not d.finished:
        raise Lz4FrameError("truncated frame")
    return out, consumed


def decompress_concatenated(data: bytes,
                            block_decompress: BlockDecompressor = _default_block_decompress,
                            ) -> bytes:
    """Decode a sequence of concatenated frames (lz4io.c:973-979 behavior)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        content, used = decompress_frame(data[pos:], block_decompress)
        out += content
        pos += used
    return bytes(out)


# ---------------------------------------------------------------------------
# skippable + legacy frames
# ---------------------------------------------------------------------------

def make_skippable_frame(user_data: bytes, sub_id: int = 0) -> bytes:
    if not 0 <= sub_id <= 15:
        raise Lz4FrameError("skippable sub id out of range")
    return (struct.pack("<I", spec.SKIPPABLE_MAGIC_MIN + sub_id)
            + struct.pack("<I", len(user_data)) + user_data)


def compress_legacy(data: bytes, acceleration: int = 1, level: int = 0,
                    block_compress: BlockCompressor = _default_block_compress,
                    ) -> bytes:
    """Legacy frame format (magic 0x184C2102, fixed 8MB independent blocks,
    always-compressed; parity: LZ4IO_compressFilename_Legacy,
    lz4io.c:344-413)."""
    out = bytearray(struct.pack("<I", spec.LEGACY_MAGIC))
    for off in range(0, len(data), spec.LEGACY_BLOCK_SIZE) or [0]:
        block = data[off:off + spec.LEGACY_BLOCK_SIZE]
        comp = block_compress(block, b"", acceleration, level)
        out += struct.pack("<I", len(comp)) + comp
    return bytes(out)


def decompress_legacy(data: bytes,
                      block_decompress: BlockDecompressor = _default_block_decompress,
                      ) -> tuple[bytes, int]:
    """Decode a legacy frame; stops at EOF or a known magic (lz4io.c:730-779).
    Returns (content, bytes_consumed)."""
    if len(data) < 4 or struct.unpack_from("<I", data)[0] != spec.LEGACY_MAGIC:
        raise Lz4FrameError("not a legacy frame")
    pos = 4
    out = bytearray()
    while pos + 4 <= len(data):
        size = struct.unpack_from("<I", data, pos)[0]
        if size == spec.FRAME_MAGIC or size == spec.LEGACY_MAGIC or \
                (size & spec.SKIPPABLE_MAGIC_MASK) == spec.SKIPPABLE_MAGIC_MIN:
            break  # next frame begins
        pos += 4
        if pos + size > len(data):
            raise Lz4FrameError("truncated legacy block")
        out += block_decompress(data[pos:pos + size],
                                spec.LEGACY_BLOCK_SIZE, b"")
        pos += size
    return bytes(out), pos
