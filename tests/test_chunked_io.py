"""Chunked device-path file IO: bounded host state for any file size
(reference 4MB-read discipline, lz4io.c:497-542; the shell tests go to
6GB, programs/Makefile:230-246 — here a multi-chunk file exercises the
same mechanics at CI scale)."""

import io as pyio

import pytest

from lz4_tpu.io import IoPrefs, compress_stream, decompress_stream
from lz4_tpu.tpu import DeviceFrameCompressor
from lz4_tpu.frame import FramePreferences, decompress_frame
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle


def test_device_frame_compressor_window_carry():
    """Chunk-fed linked compression matches whole-buffer ratio (the 64KB
    window carries across update() calls) and decodes everywhere."""
    from lz4_tpu.tpu import compress_frame_device
    data = gen_buffer(900_000, 0.75, 66)
    comp = DeviceFrameCompressor(
        FramePreferences(block_independent=False, content_size=None),
        min_match=4)
    parts = [comp.begin()]
    for i in range(0, len(data), 200_000):   # NOT block-aligned chunks
        parts.append(comp.update(data[i:i + 200_000]))
    parts.append(comp.end())
    frame = b"".join(parts)

    content, used = decompress_frame(frame)
    assert content == data and used == len(frame)

    whole = compress_frame_device(
        data, FramePreferences(block_independent=False, content_size=None))
    # chunk-boundary tables are re-seeded from the 64KB prefix at every
    # 3rd position (LZ4_loadDict parity) vs the whole-buffer run's full
    # index, so allow a ~0.5% ratio difference
    assert abs(len(frame) - len(whole)) <= max(64, len(whole) // 200)

    if oracle.available():
        assert oracle.ref_decompress_frame(frame, len(data)) == data


@pytest.mark.parametrize("linked", [False, True])
def test_compress_stream_chunked(linked, monkeypatch):
    import lz4_tpu.io as lio
    monkeypatch.setattr(lio, "CHUNK", 300_000)  # force multiple chunks
    data = gen_buffer(1_000_000, 0.7, 91)
    prefs = IoPrefs(block_linked=linked, use_device=True,
                    content_size=True)
    dst = pyio.BytesIO()
    r, w = compress_stream(pyio.BytesIO(data), dst, prefs,
                           src_size=len(data))
    frame = dst.getvalue()
    assert (r, w) == (len(data), len(frame))
    out = pyio.BytesIO()
    decompress_stream(pyio.BytesIO(frame), out, IoPrefs())
    assert out.getvalue() == data
    if oracle.available():
        assert oracle.ref_decompress_frame(frame, len(data)) == data


def test_device_frame_compressor_flush():
    """LZ4F_flush parity (lz4frame.c:693-722): interleaved flushes emit
    the buffered remainder as short linked blocks with the window still
    carrying; the flushed frame decodes bit-exactly here AND at the
    reference library."""
    data = gen_buffer(150_000, 0.7, 4242)
    prefs = FramePreferences(block_size_id=4, content_checksum=True)
    c = DeviceFrameCompressor(prefs)
    parts = [c.begin()]
    cuts = [0, 10_000, 70_000, 70_100, 131_072, 150_000]
    for a, b in zip(cuts, cuts[1:]):
        parts.append(c.update(data[a:b]))
        out = c.flush()
        parts.append(out)
    assert c.flush() == b""          # nothing buffered after a flush
    parts.append(c.end())
    frame = b"".join(parts)
    out, used = decompress_frame(frame)
    assert out == data and used == len(frame)
    from lz4_tpu.tpu import decompress_frame_device
    out2, _ = decompress_frame_device(frame)
    assert out2 == data
    if oracle.available():
        assert oracle.ref_decompress_frame(frame, len(data)) == data
