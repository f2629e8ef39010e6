"""Streaming block compression/decompression with dictionary windows.

Capability parity with the reference streaming APIs:

* :class:`BlockCompressStream` -- ``LZ4_createStream/loadDict/
  compress_fast_continue/saveDict/resetStream`` (reference lz4.c:856-1085)
  plus the fork's ``LZ4_compress_fast_destSize_continue`` (lz4.c:990-1045)
* :class:`BlockDecompressStream` -- ``LZ4_createStreamDecode/
  setStreamDecode/decompress_safe_continue`` (lz4.c:1416-1520)

Design difference (documented, deliberate): the reference tracks its window
via pointers into caller buffers, which imposes the prefix/ext-dict rules
and ring-buffer disciplines of lz4.h:271-286.  This implementation owns a
copy of the last 64 KB of stream history, so any caller buffer layout
(double-buffer, ring, line-by-line) is valid with no aliasing constraints;
the produced/accepted byte streams are identical.  The match index is
threaded across calls like the reference's ``LZ4_stream_t`` hash table,
with stale entries aged out by the 64 KB distance check.
"""

from __future__ import annotations

from . import spec
from .ops import block_np


class BlockCompressStream:
    """Chained block compression over a sliding 64 KB window."""

    def __init__(self, acceleration: int = 1):
        self.acceleration = max(1, acceleration)
        self.reset()

    def reset(self) -> None:
        """Parity: LZ4_resetStream (lz4.c:900-903)."""
        self._window = b""
        self._table: dict = {}
        self._stream_pos = 0  # absolute position in the virtual stream

    def load_dict(self, dictionary: bytes) -> int:
        """Prime the window with a dictionary; returns loaded size.
        Parity: LZ4_loadDict (lz4.c:920-951)."""
        self.reset()
        d = bytes(dictionary)[-spec.WINDOW_SIZE:]
        self._window = d
        self._stream_pos = len(d)
        # index dictionary positions (reference seeds every 3rd position;
        # our exact index affords seeding all of them)
        for pos in range(0, len(d) - 4):
            self._table[block_np._read40(d, pos)] = pos
        return len(d)

    def save_dict(self, max_size: int = spec.WINDOW_SIZE) -> bytes:
        """Snapshot of the current window (most recent last).
        Parity: LZ4_saveDict (lz4.c:1071-1085)."""
        return self._window[-max_size:]

    def compress_continue(self, chunk: bytes, capacity=None) -> bytes:
        """Compress the next chunk of the stream.  With ``capacity`` set,
        behaves like limitedOutput (returns b"" if it cannot fit).
        Parity: LZ4_compress_fast_continue (lz4.c:976-1045)."""
        chunk = bytes(chunk)
        table_base = self._stream_pos - len(self._window)
        consumed, out = block_np._compress_core(
            chunk, capacity, self.acceleration, self._window,
            table=self._table, table_base=table_base)
        if capacity is not None and consumed != len(chunk):
            return b""
        self._advance(chunk)
        return out

    def compress_dest_size_continue(self, chunk: bytes, capacity: int):
        """destSize variant: (consumed, block).  Parity:
        LZ4_compress_fast_destSize_continue (lz4.c:990-1045)."""
        chunk = bytes(chunk)
        table_base = self._stream_pos - len(self._window)
        consumed, out = block_np._compress_core(
            chunk, capacity, self.acceleration, self._window,
            table=self._table, table_base=table_base)
        self._advance(chunk[:consumed])
        return consumed, out

    def _advance(self, consumed_bytes: bytes) -> None:
        self._window = (self._window + consumed_bytes)[-spec.WINDOW_SIZE:]
        self._stream_pos += len(consumed_bytes)


class BlockDecompressStream:
    """Chained block decompression mirroring a compress stream."""

    def __init__(self, dictionary: bytes = b""):
        self.set_stream_decode(dictionary)

    def set_stream_decode(self, dictionary: bytes = b"") -> None:
        """Parity: LZ4_setStreamDecode (lz4.c:1416-1424)."""
        self._window = bytes(dictionary)[-spec.WINDOW_SIZE:]

    def decompress_continue(self, comp: bytes, out_size: int) -> bytes:
        """Decode the next block of the stream.
        Parity: LZ4_decompress_safe_continue (lz4.c:1433-1460)."""
        out = block_np.decompress_block(comp, out_size, dict_=self._window)
        self._window = (self._window + out)[-spec.WINDOW_SIZE:]
        return out

    def decompress_dest_size_continue(self, comp: bytes, dest_capacity: int):
        """Resumable destSize decode within a chained stream: fill at most
        ``dest_capacity`` bytes, stop at a token boundary, and report the
        input consumed.  The produced bytes join the stream window, so
        calling again with ``comp[consumed:]`` (plus any further input)
        continues the SAME block across destination buffers — the
        fork's scatter-gather enabler (reference lz4.c:1316-1319 rewind +
        LZ4_decompress_safe_continue dict threading, lz4.c:1433-1460).

        Returns ``(consumed_src, produced_bytes)``.
        """
        consumed, out = block_np.decompress_block_dest_size(
            comp, dest_capacity, dict_=self._window)
        self._window = (self._window + out)[-spec.WINDOW_SIZE:]
        return consumed, out
