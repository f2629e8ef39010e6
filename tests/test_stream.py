"""Streaming dictionary modes: double-buffer, ring, dict chaining.

Mirrors the reference's streaming examples and fuzzer streaming scenarios
(examples/blockStreaming_{doubleBuffer,ringBuffer}.c, fuzzer.c:752-1075):
chained blocks must exploit cross-block history, round-trip through a
mirrored decode stream, and interop with the reference streaming decoder.
"""

import pytest

from lz4_tpu.ops.block_np import compress_block
from lz4_tpu.stream import BlockCompressStream, BlockDecompressStream
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle unavailable")

DATA = gen_buffer(200_000, 0.7, 600)


def chunked(data, size):
    for i in range(0, len(data), size):
        yield data[i:i + size]


@pytest.mark.parametrize("chunk_size", [4096, 65536, 100_000])
def test_chained_roundtrip(chunk_size):
    enc = BlockCompressStream()
    dec = BlockDecompressStream()
    out = bytearray()
    total_comp = 0
    for chunk in chunked(DATA, chunk_size):
        blk = enc.compress_continue(chunk)
        total_comp += len(blk)
        out += dec.decompress_continue(blk, len(chunk))
    assert bytes(out) == DATA
    # chaining must beat independent blocks (shared history)
    indep = sum(len(compress_block(c)) for c in chunked(DATA, chunk_size))
    assert total_comp < indep


def test_linked_blocks_decode_with_reference_stream():
    """Our chained blocks decode with LZ4_decompress_safe_usingDict."""
    enc = BlockCompressStream()
    window = b""
    for chunk in chunked(DATA[:100_000], 17_000):
        blk = enc.compress_continue(chunk)
        got = oracle.ref_decompress_usingdict(blk, len(chunk), window)
        assert got == chunk
        window = (window + chunk)[-65536:]


def test_dictionary_priming():
    dict_ = gen_buffer(30_000, 0.7, 601)
    sample = dict_[5000:9000] + gen_buffer(1000, 0.5, 602) + dict_[20_000:24_000]
    enc = BlockCompressStream()
    enc.load_dict(dict_)
    blk = enc.compress_continue(sample)
    plain = compress_block(sample)
    assert len(blk) < len(plain)  # dictionary must help on dict-derived data
    dec = BlockDecompressStream(dict_)
    assert dec.decompress_continue(blk, len(sample)) == sample
    assert oracle.ref_decompress_usingdict(blk, len(sample), dict_) == sample


def test_save_dict_resume():
    """saveDict -> new stream -> loadDict preserves the chain
    (fuzzer.c saveDict scenarios)."""
    first, second = DATA[:80_000], DATA[80_000:120_000]
    enc = BlockCompressStream()
    b1 = enc.compress_continue(first)
    saved = enc.save_dict()
    enc2 = BlockCompressStream()
    enc2.load_dict(saved)
    b2 = enc2.compress_continue(second)
    dec = BlockDecompressStream()
    out1 = dec.decompress_continue(b1, len(first))
    out2 = dec.decompress_continue(b2, len(second))
    assert out1 + out2 == first + second


def test_double_buffer_discipline():
    """Two alternating 64KB slots (examples/blockStreaming_doubleBuffer.c)."""
    slot = [bytearray(65536), bytearray(65536)]
    enc = BlockCompressStream()
    dec = BlockDecompressStream()
    result = bytearray()
    for i, chunk in enumerate(chunked(DATA, 65536)):
        s = i % 2
        slot[s][:len(chunk)] = chunk  # caller reuses alternating buffers
        blk = enc.compress_continue(bytes(slot[s][:len(chunk)]))
        result += dec.decompress_continue(blk, len(chunk))
    assert bytes(result) == DATA


def test_ring_buffer_discipline():
    """Small ring with wraparound (examples/blockStreaming_ringBuffer.c)."""
    ring_size = 8192
    msg_max = 1024
    ring = bytearray(ring_size)
    pos = 0
    enc = BlockCompressStream()
    dec = BlockDecompressStream()
    result = bytearray()
    src = DATA[:50_000]
    off = 0
    while off < len(src):
        n = min(msg_max, len(src) - off)
        if pos + n > ring_size:
            pos = 0  # wrap
        ring[pos:pos + n] = src[off:off + n]
        blk = enc.compress_continue(bytes(ring[pos:pos + n]))
        result += dec.decompress_continue(blk, n)
        pos += n
        off += n
    assert bytes(result) == src


def test_reset():
    enc = BlockCompressStream()
    enc.compress_continue(DATA[:10_000])
    enc.reset()
    blk = enc.compress_continue(DATA[:10_000])
    assert blk == compress_block(DATA[:10_000])
