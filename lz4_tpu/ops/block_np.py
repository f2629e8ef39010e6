"""LZ4 block-format host codec (oracle + host fallback).

Implements, from the public block spec (``lz4_Block_format.md``), the
capabilities of the reference block layer (reference ``lib/lz4.c``):

* greedy hash-probe compression with skip acceleration and backward
  match extension (parity with ``LZ4_compress_default/fast``,
  lz4.c:510-800)
* ``destSize`` compression: fill a fixed-size destination and report the
  number of source bytes consumed (parity with
  ``LZ4_compress_fast_destSize_extState``, lz4.c:809-830)
* safe decompression with bounds checks, dictionary windows and partial
  decode (parity with ``LZ4_decompress_safe/_partial/_usingDict``,
  lz4.c:1098-1374)

This is a *host oracle*: clarity over speed.  The production TPU path is
``lz4_tpu.kernels``; the fast host path is the ``lz4t_native`` extension.
The encoder here uses an exact most-recent-occurrence match index (a
perfect single-probe "hash table"), which is a valid LZ4 parse and
compresses at least as well as the reference's 4096-entry table.
"""

from __future__ import annotations

from ..spec import (
    LASTLITERALS,
    LZ4_MINLENGTH,
    MAX_DISTANCE,
    MFLIMIT,
    MINMATCH,
)

SKIP_TRIGGER = 6  # dynamic step growth: step doubles every 2**6 failed probes


class Lz4BlockError(ValueError):
    """Malformed block or insufficient output room during decode."""


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _length_header_size(extra: int) -> int:
    """Bytes needed for a length >= 15 beyond the token nibble."""
    return extra // 255 + 1


def _seq_size(litlen: int, mlen: int) -> int:
    """Encoded size of one full sequence (token, lengths, literals, offset)."""
    size = 1 + litlen + 2
    if litlen >= 15:
        size += _length_header_size(litlen - 15)
    if mlen - MINMATCH >= 15:
        size += _length_header_size(mlen - MINMATCH - 15)
    return size


def _final_run_size(litlen: int) -> int:
    """Encoded size of a terminating literals-only run."""
    size = 1 + litlen
    if litlen >= 15:
        size += _length_header_size(litlen - 15)
    return size


def _max_final_literals(room: int, avail: int) -> int:
    """Largest L <= avail with _final_run_size(L) <= room (-1 if none fits)."""
    if room < 1:
        return -1
    # L < 15: needs 1 + L bytes
    best = min(room - 1, 14, avail)
    if avail >= 15:
        # L >= 15: needs 1 + 1 + (L-15)//255 + L  => solve for L
        lo, hi = 15, avail
        while lo <= hi:
            mid = (lo + hi) // 2
            if _final_run_size(mid) <= room:
                best = max(best, mid)
                lo = mid + 1
            else:
                hi = mid - 1
    return best


def _emit_length_tail(out: bytearray, extra: int) -> None:
    while extra >= 255:
        out.append(255)
        extra -= 255
    out.append(extra)


def _emit_sequence(out: bytearray, buf, lit_start: int, litlen: int,
                   offset: int, mlen: int) -> None:
    """Append one full sequence (with a match) to ``out``."""
    ml_code = mlen - MINMATCH
    token_lit = 15 if litlen >= 15 else litlen
    token_ml = 15 if ml_code >= 15 else ml_code
    out.append((token_lit << 4) | token_ml)
    if litlen >= 15:
        _emit_length_tail(out, litlen - 15)
    out += buf[lit_start:lit_start + litlen]
    out.append(offset & 0xFF)
    out.append(offset >> 8)
    if ml_code >= 15:
        _emit_length_tail(out, ml_code - 15)


def _emit_final(out: bytearray, buf, lit_start: int, litlen: int) -> None:
    """Append the terminating literals-only run."""
    token_lit = 15 if litlen >= 15 else litlen
    out.append(token_lit << 4)
    if litlen >= 15:
        _emit_length_tail(out, litlen - 15)
    out += buf[lit_start:lit_start + litlen]


def _read32(buf, i: int) -> int:
    return buf[i] | (buf[i + 1] << 8) | (buf[i + 2] << 16) | (buf[i + 3] << 24)


def _read40(buf, i: int) -> int:
    """5-byte little-endian read: the encoder indexes 5-byte sequences, like
    the reference's 64-bit hash (lz4.c:462-468 ``prime5bytes``), which avoids
    marginal 4-byte matches and improves ratio."""
    return (buf[i] | (buf[i + 1] << 8) | (buf[i + 2] << 16)
            | (buf[i + 3] << 24) | (buf[i + 4] << 32))


# ---------------------------------------------------------------------------
# compression
# ---------------------------------------------------------------------------

def _compress_core(src: bytes, capacity, acceleration: int, dict_: bytes,
                   table=None, table_base: int = 0):
    """Greedy LZ4 parse of ``src`` with history ``dict_``.

    Returns ``(consumed, compressed_bytes)``.  ``capacity=None`` means
    unbounded destination (consumed == len(src)).

    ``table``/``table_base`` allow a caller (the streaming layer) to thread a
    persistent match index across chained blocks: keys are 4-byte values,
    values are absolute positions ``table_base + pos_in_buf``.
    """
    src = bytes(src)
    dict_ = bytes(dict_)
    buf = dict_ + src
    base = len(dict_)
    n = len(src)
    end = base + n
    out = bytearray()

    def tput(pos: int) -> None:
        table[_read40(buf, pos)] = table_base + pos

    def tget(pos: int) -> int:
        cand = table.get(_read40(buf, pos), -1)
        return cand - table_base if cand >= 0 else -(1 << 60)

    if table is None:
        table = {}
        if base > 0:
            # seed the index with dictionary positions (parity with
            # LZ4_loadDict, lz4.c:920-951; we insert every position since the
            # oracle index is exact)
            for pos in range(0, base - 4):
                tput(pos)

    anchor = base

    if n >= LZ4_MINLENGTH:
        mflimit = end - MFLIMIT          # matches may start while ip <= mflimit
        matchlimit = end - LASTLITERALS  # matches may extend to here (excl.)
        ip = base if base > 0 else 1
        if base == 0:
            tput(0)
        search_cnt = acceleration << SKIP_TRIGGER

        while ip <= mflimit:
            cand = tget(ip)
            tput(ip)
            if cand >= 0 and ip - cand <= MAX_DISTANCE:
                # candidate guaranteed equal on 5 bytes (exact 5-byte index)
                # backward extension (reference lz4.c:635 "catch up")
                mp, q = ip, cand
                while mp > anchor and q > 0 and buf[mp - 1] == buf[q - 1]:
                    mp -= 1
                    q -= 1
                # forward extension (first 5 bytes at ip already equal)
                ml = ip + MINMATCH + 1 - mp
                while mp + ml < matchlimit and buf[q + ml] == buf[mp + ml]:
                    ml += 1
                litlen = mp - anchor
                if capacity is not None:
                    # must still fit a >=5-literal terminator afterwards
                    tail = min(LASTLITERALS, end - (mp + ml))
                    need = _seq_size(litlen, ml) + _final_run_size(tail)
                    if len(out) + need > capacity:
                        break
                _emit_sequence(out, buf, anchor, litlen, mp - q, ml)
                ip = mp + ml
                anchor = ip
                if ip - 2 > base:  # densify index near match end (lz4.c idiom)
                    tput(ip - 2)
                search_cnt = acceleration << SKIP_TRIGGER
            else:
                step = search_cnt >> SKIP_TRIGGER
                search_cnt += 1
                ip += step

    # terminating literals
    avail = end - anchor
    if capacity is None:
        _emit_final(out, buf, anchor, avail)
        consumed = n
    else:
        lit = _max_final_literals(capacity - len(out), avail)
        if lit < 0:
            return 0, b""
        if anchor > base and avail > lit and lit < LASTLITERALS:
            # cannot truncate below the 5-literal tail rule; drop to the
            # previous safe state by re-compressing the shorter input
            return _compress_core(src[:anchor - base + max(lit, 0)], capacity,
                                  acceleration, dict_)
        _emit_final(out, buf, anchor, lit)
        consumed = anchor - base + lit
    return consumed, bytes(out)


def compress_block(src, acceleration: int = 1, dict_: bytes = b"") -> bytes:
    """Compress ``src`` into a standalone LZ4 block (unbounded destination).

    Parity: ``LZ4_compress_default/fast`` (reference lz4.c:866-918) and
    ``*_usingDict`` via ``dict_``.
    """
    _, out = _compress_core(src, None, max(1, acceleration), dict_)
    return out


def compress_block_limited(src, capacity: int, acceleration: int = 1,
                           dict_: bytes = b"") -> bytes:
    """Compress with a hard destination bound; b"" if it cannot fit whole src.

    Parity: ``LZ4_compress_limitedOutput`` semantics (fail, don't truncate).
    """
    consumed, out = _compress_core(src, capacity, max(1, acceleration), dict_)
    if consumed != len(src):
        return b""
    return out


def compress_block_dest_size(src, capacity: int, acceleration: int = 1,
                             dict_: bytes = b""):
    """Fill up to ``capacity`` output bytes, returning (consumed, block).

    Parity: ``LZ4_compress_fast_destSize`` (reference lz4.c:809-830,
    fork-merged destSize path).
    """
    return _compress_core(src, capacity, max(1, acceleration), dict_)


# ---------------------------------------------------------------------------
# decompression
# ---------------------------------------------------------------------------

def decompress_block(comp, max_output: int, dict_: bytes = b"",
                     partial: bool = False) -> bytes:
    """Decode one LZ4 block safely.

    Raises :class:`Lz4BlockError` on malformed input, offset out of range, or
    output overflow.  With ``partial=True``, stops once ``max_output`` bytes
    are produced even mid-sequence (parity: ``LZ4_decompress_safe_partial``,
    reference lz4.c:1367).  ``dict_`` is the window immediately preceding the
    output (parity: ``LZ4_decompress_safe_usingDict``, lz4.c:1512).
    """
    comp = bytes(comp)
    dict_ = bytes(dict_)
    n = len(comp)
    nd = len(dict_)
    out = bytearray()
    i = 0
    if n == 0:
        raise Lz4BlockError("empty input")
    while True:
        if i >= n:
            raise Lz4BlockError("truncated: missing token")
        token = comp[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                if i >= n:
                    raise Lz4BlockError("truncated literal length")
                b = comp[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        if i + litlen > n:
            raise Lz4BlockError("truncated literals")
        if len(out) + litlen > max_output:
            if partial:
                take = max_output - len(out)
                out += comp[i:i + take]
                return bytes(out)
            raise Lz4BlockError("output too small (literals)")
        out += comp[i:i + litlen]
        i += litlen
        if i == n:
            return bytes(out)  # last sequence stops right after literals
        if partial and len(out) >= max_output:
            return bytes(out)
        if i + 2 > n:
            raise Lz4BlockError("truncated offset")
        offset = comp[i] | (comp[i + 1] << 8)
        i += 2
        if offset == 0:
            raise Lz4BlockError("invalid offset 0")
        mlen = token & 15
        if mlen == 15:
            while True:
                if i >= n:
                    raise Lz4BlockError("truncated match length")
                b = comp[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += MINMATCH
        if offset > len(out) + nd:
            raise Lz4BlockError("offset beyond window")
        copy_len = mlen
        if len(out) + copy_len > max_output:
            if partial:
                copy_len = max_output - len(out)
            else:
                raise Lz4BlockError("output too small (match)")
        src_pos = len(out) - offset
        if src_pos < 0:
            # splice from dictionary (and possibly into fresh output)
            from_dict = min(-src_pos, copy_len)
            seg = dict_[nd + src_pos:nd + src_pos + from_dict]
            out += seg
            copy_len -= from_dict
        if copy_len > 0:
            if offset >= copy_len:
                start = len(out) - offset
                out += out[start:start + copy_len]
            else:
                pattern = out[len(out) - offset:]
                reps = copy_len // offset + 1
                out += (bytes(pattern) * reps)[:copy_len]
        if partial and len(out) >= max_output:
            return bytes(out[:max_output])


def decompress_block_dest_size(comp, dest_capacity: int, dict_: bytes = b"",
                               expect_more_input: bool = False):
    """Resumable destSize decode: fill at most ``dest_capacity`` output
    bytes, stopping at a TOKEN BOUNDARY, and report the source bytes
    consumed up to that boundary.

    This is the fork's signature decoder contract (reference
    ``LZ4_decompress_destSize_generic``, lz4.c:1098-1320: ``token_ip`` /
    ``token_op`` are saved at 1161-1163 and the ``_early_end`` rewind at
    1316-1319 restores them), the property that makes scatter-gather
    possible: a caller can stop on either a full destination or exhausted
    input and RESUME — pass ``comp[consumed:]`` (plus any further input)
    and a fresh destination, with ``dict_`` = the bytes already produced
    — and the concatenated output equals a whole-buffer decode.

    Returns ``(consumed_src, produced_bytes)``.  The block is DONE when
    ``consumed_src == len(comp)`` (the final literal run ended exactly at
    the input end).  Early stops are clean: nothing of the unfinished
    sequence is consumed or emitted.  Raises :class:`Lz4BlockError` only
    for non-resumable corruption (offset 0 / beyond window).

    ``expect_more_input``: a literal run that ends exactly at the input
    end is indistinguishable from a block terminator (the reference has
    the same ambiguity — lz4sg.c resolves it with exact block extents,
    lz4sg.c:575-579).  When the caller KNOWS this is not the block's
    tail (more input follows), pass True and such a run is rewound like
    any other truncated sequence instead of being consumed as an end.
    """
    comp = bytes(comp)
    dict_ = bytes(dict_)
    n = len(comp)
    nd = len(dict_)
    out = bytearray()
    i = 0
    while True:
        tok_i = i                      # token boundary (lz4.c:1161-1163)
        if i >= n:
            return tok_i, bytes(out)   # input exhausted at a boundary
        token = comp[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                if i >= n:
                    return tok_i, bytes(out)
                b = comp[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        if i + litlen > n:
            return tok_i, bytes(out)   # literals truncated: rewind
        if i + litlen == n and expect_more_input:
            return tok_i, bytes(out)   # ambiguous tail: caller says more
        if len(out) + litlen > dest_capacity:
            return tok_i, bytes(out)   # destination full: rewind
        out += comp[i:i + litlen]
        i += litlen
        if i == n:
            return n, bytes(out)       # clean final literal run
        if i + 2 > n:
            del out[len(out) - litlen:]
            return tok_i, bytes(out)   # offset truncated: rewind
        offset = comp[i] | (comp[i + 1] << 8)
        i += 2
        if offset == 0:
            raise Lz4BlockError("invalid offset 0")
        mlen = token & 15
        if mlen == 15:
            while True:
                if i >= n:
                    del out[len(out) - litlen:]
                    return tok_i, bytes(out)
                b = comp[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += MINMATCH
        if offset > len(out) + nd:
            raise Lz4BlockError("offset beyond window")
        if len(out) + mlen > dest_capacity:
            del out[len(out) - litlen:]
            return tok_i, bytes(out)   # destination full: rewind
        src_pos = len(out) - offset
        if src_pos < 0:
            from_dict = min(-src_pos, mlen)
            out += dict_[nd + src_pos:nd + src_pos + from_dict]
            mlen -= from_dict
        if mlen > 0:
            if offset >= mlen:
                start = len(out) - offset
                out += out[start:start + mlen]
            else:
                pattern = out[len(out) - offset:]
                reps = mlen // offset + 1
                out += (bytes(pattern) * reps)[:mlen]


def get_decompressed_size(comp) -> int:
    """Walk a block's headers and return its decoded size (validates shape)."""
    comp = bytes(comp)
    n = len(comp)
    i = 0
    total = 0
    while True:
        if i >= n:
            raise Lz4BlockError("truncated: missing token")
        token = comp[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                if i >= n:
                    raise Lz4BlockError("truncated literal length")
                b = comp[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        i += litlen
        total += litlen
        if i == n:
            return total
        if i > n:
            raise Lz4BlockError("truncated literals")
        i += 2
        mlen = token & 15
        if mlen == 15:
            while True:
                if i >= n:
                    raise Lz4BlockError("truncated match length")
                b = comp[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        total += mlen + MINMATCH
