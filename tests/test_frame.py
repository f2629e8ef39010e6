"""Frame layer vs the reference LZ4F implementation.

Mirrors frametest.c's core coverage (programs/frametest.c:232-773):
every block size x checksum x linkage combination, byte-by-byte feeding,
skippable frames, wrong-content-size rejection, truncation rejection, and
bidirectional interop with the reference.
"""

import struct

import pytest

from lz4_tpu import spec
from lz4_tpu.frame import (
    FrameCompressor,
    FrameDecompressor,
    FramePreferences,
    Lz4FrameError,
    compress_frame,
    compress_frame_bound,
    compress_legacy,
    decode_frame_header,
    decompress_concatenated,
    decompress_frame,
    decompress_legacy,
    encode_frame_header,
    get_frame_info,
    make_skippable_frame,
)
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle unavailable")

DATA = gen_buffer(300_000, 0.7, 100)   # spans several 64KB/256KB blocks
SMALL = gen_buffer(5_000, 0.6, 101)


def test_header_roundtrip_all_variants():
    for bsid in (4, 5, 6, 7):
        for indep in (False, True):
            for csum in (False, True):
                for csize in (None, 0, 12345):
                    p = FramePreferences(block_size_id=bsid,
                                         block_independent=indep,
                                         content_checksum=csum,
                                         content_size=csize)
                    hdr = encode_frame_header(p)
                    info = decode_frame_header(hdr)
                    assert info.block_size_id == bsid
                    assert info.block_independent == indep
                    assert info.content_checksum == csum
                    assert info.content_size == csize
                    assert info.header_size == len(hdr)


@pytest.mark.parametrize("bsid", [4, 5])
@pytest.mark.parametrize("indep", [False, True])
@pytest.mark.parametrize("csum", [False, True])
def test_roundtrip_matrix(bsid, indep, csum):
    prefs = FramePreferences(block_size_id=bsid, block_independent=indep,
                             content_checksum=csum, content_size=len(DATA))
    frame = compress_frame(DATA, prefs)
    out, used = decompress_frame(frame)
    assert used == len(frame)
    assert out == DATA


def test_reference_decodes_our_frames():
    for bsid in (4, 7):
        for indep in (False, True):
            for csum in (False, True):
                prefs = FramePreferences(block_size_id=bsid,
                                         block_independent=indep,
                                         content_checksum=csum)
                frame = compress_frame(DATA, prefs)
                assert oracle.ref_decompress_frame(frame, len(DATA)) == DATA


def test_we_decode_reference_frames():
    # reference defaults + every bsid + checksums + HC level
    for kwargs in (dict(),
                   dict(block_size_id=4),
                   dict(block_size_id=5, block_mode=1),
                   dict(content_checksum=1),
                   dict(block_size_id=6, content_checksum=1),
                   dict(content_size=len(DATA)),
                   dict(level=9)):
        frame = oracle.ref_compress_frame(DATA, **kwargs)
        out, used = decompress_frame(frame)
        assert out == DATA
        assert used == len(frame)


def test_incompressible_uses_stored_blocks():
    noise = incompressible(200_000)
    frame = compress_frame(noise, FramePreferences(block_size_id=4))
    # must be close to raw size: stored blocks + headers only
    assert len(frame) < len(noise) + 4 * (len(noise) // 65536 + 2) + 32
    out, _ = decompress_frame(frame)
    assert out == noise
    assert oracle.ref_decompress_frame(frame, len(noise)) == noise


def test_streaming_compressor_matches_oneshot():
    prefs = FramePreferences(block_size_id=4, content_checksum=True)
    c = FrameCompressor(prefs)
    parts = [c.begin()]
    for i in range(0, len(DATA), 7777):
        parts.append(c.update(DATA[i:i + 7777]))
    parts.append(c.end())
    streamed = b"".join(parts)
    out, _ = decompress_frame(streamed)
    assert out == DATA
    assert oracle.ref_decompress_frame(streamed, len(DATA)) == DATA


def test_flush_produces_valid_partial_blocks():
    prefs = FramePreferences(block_size_id=4)
    c = FrameCompressor(prefs)
    buf = bytearray(c.begin())
    for i in range(0, len(SMALL), 997):
        buf += c.update(SMALL[i:i + 997])
        buf += c.flush()  # arbitrary flush anytime (spec: partial blocks ok)
    buf += c.end()
    out, _ = decompress_frame(bytes(buf))
    assert out == SMALL
    assert oracle.ref_decompress_frame(bytes(buf), len(SMALL)) == SMALL


def test_decompressor_byte_by_byte():
    frame = compress_frame(SMALL, FramePreferences(block_size_id=4,
                                                   content_checksum=True))
    d = FrameDecompressor()
    out = bytearray()
    for i in range(len(frame)):
        used, produced = d.feed(frame[i:i + 1])
        assert used == 1
        out += produced
    assert d.finished
    assert out == SMALL


def test_decompressor_random_slices():
    import random
    rng = random.Random(7)
    frame = compress_frame(DATA, FramePreferences(content_checksum=True))
    d = FrameDecompressor()
    out = bytearray()
    pos = 0
    while pos < len(frame):
        step = rng.randint(1, 50_000)
        used, produced = d.feed(frame[pos:pos + step])
        out += produced
        pos += used
        assert used > 0 or d.finished
    assert d.finished and out == DATA


def test_skippable_frames_and_concatenation():
    f1 = compress_frame(SMALL, FramePreferences())
    sk = make_skippable_frame(b"user-metadata" * 10, sub_id=3)
    f2 = compress_frame(DATA[:10_000], FramePreferences(content_checksum=True))
    empty = compress_frame(b"", FramePreferences())
    stream = f1 + sk + empty + f2
    assert decompress_concatenated(stream) == SMALL + DATA[:10_000]
    # the real consumer of concatenated streams is the CLI (lz4io.c:973-979)
    assert oracle.ref_cli_decompress(stream) == SMALL + DATA[:10_000]


def test_zero_size_skippable():
    sk = make_skippable_frame(b"")
    f = compress_frame(SMALL)
    assert decompress_concatenated(sk + f) == SMALL


def test_wrong_content_size_rejected():
    prefs = FramePreferences(content_size=len(SMALL))
    frame = bytearray(compress_frame(SMALL, prefs))
    # tamper: bump embedded content size, fix header checksum
    csize = struct.unpack_from("<Q", frame, 6)[0]
    struct.pack_into("<Q", frame, 6, csize + 1)
    from lz4_tpu.ops.xxhash_np import xxh32
    frame[14] = (xxh32(bytes(frame[4:14]), 0) >> 8) & 0xFF
    with pytest.raises(Lz4FrameError, match="content size"):
        decompress_frame(bytes(frame))


def test_header_checksum_rejected():
    frame = bytearray(compress_frame(SMALL))
    frame[6] ^= 0xFF  # corrupt HC byte
    with pytest.raises(Lz4FrameError):
        decompress_frame(bytes(frame))


def test_content_checksum_rejected():
    frame = bytearray(compress_frame(SMALL,
                                     FramePreferences(content_checksum=True)))
    frame[-1] ^= 0xFF
    with pytest.raises(Lz4FrameError, match="content checksum"):
        decompress_frame(bytes(frame))


def test_truncation_rejected():
    frame = compress_frame(SMALL, FramePreferences(content_checksum=True))
    for cut in (5, 6, len(frame) // 2, len(frame) - 1):
        with pytest.raises(Lz4FrameError):
            decompress_frame(frame[:cut])


def test_get_frame_info_prefix():
    prefs = FramePreferences(content_size=len(DATA), content_checksum=True)
    frame = compress_frame(DATA, prefs)
    info = get_frame_info(frame[:15])
    assert info.content_size == len(DATA)
    assert info.content_checksum


def test_frame_bound_holds():
    for data in (b"", SMALL, incompressible(100_000)):
        prefs = FramePreferences(block_size_id=4)
        assert len(compress_frame(data, prefs)) \
            <= compress_frame_bound(len(data), prefs)


def test_empty_frame():
    frame = compress_frame(b"", FramePreferences(content_checksum=True))
    out, used = decompress_frame(frame)
    assert out == b"" and used == len(frame)
    assert oracle.ref_decompress_frame(frame, 0) == b""


def test_legacy_roundtrip():
    for data in (b"", SMALL, DATA):
        leg = compress_legacy(data)
        out, used = decompress_legacy(leg)
        assert out == data and used == len(leg)


def test_hc_levels_in_frames():
    for level in (3, 9):
        prefs = FramePreferences(block_size_id=4, level=level)
        frame = compress_frame(SMALL, prefs)
        out, _ = decompress_frame(frame)
        assert out == SMALL
        assert oracle.ref_decompress_frame(frame, len(SMALL)) == SMALL
