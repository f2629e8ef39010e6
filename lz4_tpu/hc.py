"""LZ4HC: high-compression block codec (levels 3-16).

Capability parity with the reference HC layer (reference ``lib/lz4hc.c``):
a match finder that examines up to ``1 << (level-1)`` previous candidate
positions per probe (lz4hc.c:374-376), with backward extension and a lazy
parse resolving overlap between consecutive candidate matches
(lz4hc.c:342-543).  Output is standard LZ4 block format, decodable by any
LZ4 decoder; ratio is gated against the reference in tests.

Design difference (deliberate, better): the reference chains positions
through a 32K-bucket hash of 4 bytes (lz4hc.c:138-157); this oracle keeps
an exact per-4-byte-value candidate list, so every candidate is a true
4-byte match and search effort goes entirely into length maximization.
"""

from __future__ import annotations

from . import spec
from .ops.block_np import (
    _emit_final,
    _emit_sequence,
    _max_final_literals,
    _read32,
    _final_run_size,
    _seq_size,
)

DEFAULT_CLEVEL = 9
MAX_CLEVEL = 16


def _find_best(buf, ip: int, anchor: int, chains: dict, end_match: int,
               max_attempts: int, base: int):
    """Longest match for position ip among recent candidates.

    Returns (mp, q, ml) after backward extension, or None.  ``mp`` is the
    (possibly backed-up) match start, ``q`` the source, ``ml`` the length.
    """
    cands = chains.get(_read32(buf, ip))
    if not cands:
        return None
    best = None
    attempts = max_attempts
    for q0 in reversed(cands):
        if q0 >= ip:
            continue  # ip itself may already be indexed (lazy re-probe)
        if ip - q0 > spec.MAX_DISTANCE:
            break
        if attempts <= 0:
            break
        attempts -= 1
        # forward length from ip (first 4 bytes guaranteed equal)
        ml = 4
        while ip + ml < end_match and buf[q0 + ml] == buf[ip + ml]:
            ml += 1
        # backward extension
        mp, q = ip, q0
        while mp > anchor and q > 0 and buf[mp - 1] == buf[q - 1]:
            mp -= 1
            q -= 1
            ml += 1
        if best is None or ml > best[2]:
            best = (mp, q, ml)
    return best


def compress_hc_block(src, level: int = DEFAULT_CLEVEL, dict_: bytes = b"",
                      capacity=None) -> bytes:
    """Compress one block at HC quality.

    Parity: ``LZ4_compress_HC`` (lz4hc.c:548-563); ``dict_`` provides the
    streaming window (``LZ4_compress_HC_continue``, lz4hc.c:658-664).
    """
    consumed, out = compress_hc_dest_size(src, None if capacity is None
                                          else capacity, level, dict_)
    if capacity is not None and consumed != len(bytes(src)):
        return b""
    return out


def compress_hc_dest_size(src, capacity, level: int = DEFAULT_CLEVEL,
                          dict_: bytes = b""):
    """HC compression with optional destination bound; (consumed, bytes)."""
    src = bytes(src)
    dict_ = bytes(dict_)
    buf = dict_ + src
    base = len(dict_)
    n = len(src)
    end = base + n
    out = bytearray()

    level = max(1, min(MAX_CLEVEL, level or DEFAULT_CLEVEL))
    max_attempts = 1 << (level - 1)  # lz4hc.c:374-376

    chains: dict[int, list[int]] = {}

    def insert(pos: int) -> None:
        chains.setdefault(_read32(buf, pos), []).append(pos)

    for pos in range(0, base - 3):
        insert(pos)

    anchor = base
    if n >= spec.LZ4_MINLENGTH:
        mflimit = end - spec.MFLIMIT
        matchlimit = end - spec.LASTLITERALS
        ip = base
        while ip <= mflimit:
            m0 = _find_best(buf, ip, anchor, chains, matchlimit,
                            max_attempts, base)
            insert(ip)
            if m0 is None:
                ip += 1
                continue
            # lazy step: would starting one byte later give a longer match?
            mp, q, ml = m0
            while ip + 1 <= mflimit:
                insert(ip + 1)
                m1 = _find_best(buf, ip + 1, anchor, chains, matchlimit,
                                max_attempts, base)
                if m1 is not None and m1[2] > ml + 1:
                    ip += 1
                    mp, q, ml = m1
                    continue
                break
            litlen = mp - anchor
            if capacity is not None:
                tail = min(spec.LASTLITERALS, end - (mp + ml))
                if len(out) + _seq_size(litlen, ml) + _final_run_size(tail) > capacity:
                    break
            _emit_sequence(out, buf, anchor, litlen, mp - q, ml)
            # index the matched region (sparsely, for chain continuity)
            step = 1 if ml < 64 else 4
            for p2 in range(max(ip + 1, mp), min(mp + ml, mflimit), step):
                insert(p2)
            ip = mp + ml
            anchor = ip

    avail = end - anchor
    if capacity is None:
        _emit_final(out, buf, anchor, avail)
        consumed = n
    else:
        lit = _max_final_literals(capacity - len(out), avail)
        if lit < 0:
            return 0, b""
        if anchor > base and avail > lit and lit < spec.LASTLITERALS:
            return compress_hc_dest_size(src[:anchor - base + max(lit, 0)],
                                         capacity, level, dict_)
        _emit_final(out, buf, anchor, lit)
        consumed = anchor - base + lit
    return consumed, bytes(out)


class HcCompressStream:
    """Streaming HC compression over a sliding 64 KB window.

    Parity: ``LZ4_streamHC_t`` + ``LZ4_createStreamHC/loadDictHC/
    compress_HC_continue/saveDictHC/resetStreamHC`` (reference
    lz4hc.c:591-686).  Like :class:`lz4_tpu.stream.BlockCompressStream`,
    the window is an owned copy of the last 64 KB of stream history, so
    any caller buffer discipline (double-buffer, ring) is valid; produced
    streams decode with ``LZ4_decompress_safe_usingDict`` / our decoders.
    """

    def __init__(self, level: int = DEFAULT_CLEVEL):
        self.level = max(1, min(MAX_CLEVEL, level or DEFAULT_CLEVEL))
        self.reset()

    def reset(self, level: int | None = None) -> None:
        """Parity: LZ4_resetStreamHC (lz4hc.c:591-596)."""
        if level is not None:
            self.level = max(1, min(MAX_CLEVEL, level))
        self._window = b""

    def load_dict(self, dictionary: bytes) -> int:
        """Prime the window; returns loaded size.
        Parity: LZ4_loadDictHC (lz4hc.c:598-606)."""
        self._window = bytes(dictionary)[-spec.WINDOW_SIZE:]
        return len(self._window)

    def save_dict(self, max_bytes: int = spec.WINDOW_SIZE) -> bytes:
        """Return (up to) the last ``max_bytes`` of window history.
        Parity: LZ4_saveDictHC (lz4hc.c:669-686)."""
        return self._window[-max_bytes:] if max_bytes > 0 else b""

    def compress_continue(self, src, capacity: int | None = None) -> bytes:
        """Compress the next chunk against the stream window.

        Parity: LZ4_compress_HC_continue (lz4hc.c:658-664);
        ``capacity`` gives limitedOutput semantics (b"" if it cannot fit).
        """
        src = bytes(src)
        out = compress_hc_block(src, self.level, dict_=self._window,
                                capacity=capacity)
        if capacity is not None and out == b"" and src:
            return b""
        self._window = (self._window + src)[-spec.WINDOW_SIZE:]
        return out
