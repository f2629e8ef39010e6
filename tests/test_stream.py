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


# ---------------------------------------------------------------------------
# HC streaming (LZ4_streamHC_t parity, lz4hc.c:591-686)
# ---------------------------------------------------------------------------

def test_hc_stream_double_buffer():
    """HC double-buffer discipline: chunks chained with the HC stream
    compress smaller than independent HC blocks, and both our decoder and
    the reference decode them with the running window."""
    from lz4_tpu.hc import HcCompressStream, compress_hc_block
    data = gen_buffer(200_000, 0.75, 404)
    chunks = [data[i:i + 32768] for i in range(0, len(data), 32768)]

    enc = HcCompressStream(level=9)
    dec = BlockDecompressStream()
    linked_total = 0
    for c in chunks:
        blk = enc.compress_continue(c)
        linked_total += len(blk)
        assert dec.decompress_continue(blk, len(c)) == c

    indep_total = sum(len(compress_hc_block(c, 9)) for c in chunks)
    assert linked_total < indep_total

    if oracle.available():
        enc2 = HcCompressStream(level=9)
        window = b""
        for c in chunks:
            blk = enc2.compress_continue(c)
            assert oracle.ref_decompress_usingdict(blk, len(c), window) == c
            window = (window + c)[-65536:]


def test_hc_stream_save_load_dict():
    from lz4_tpu.hc import HcCompressStream
    base = gen_buffer(100_000, 0.8, 17)
    dict_, payload = base[:65536], base[60_000:90_000]

    enc = HcCompressStream(level=8)
    enc.load_dict(dict_)
    saved = enc.save_dict()
    assert saved == dict_[-65536:]
    blk = enc.compress_continue(payload)
    dec = BlockDecompressStream()
    dec.set_stream_decode(dict_)
    assert dec.decompress_continue(blk, len(payload)) == payload

    # resume from a saved dict in a fresh stream: same window semantics
    enc2 = HcCompressStream(level=8)
    enc2.load_dict(saved)
    assert enc2.compress_continue(payload) == blk


def test_hc_stream_limited_output():
    from lz4_tpu.hc import HcCompressStream
    data = gen_buffer(20_000, 0.6, 3)
    enc = HcCompressStream(level=9)
    full = enc.compress_continue(data)
    enc.reset()
    assert enc.compress_continue(data, capacity=len(full) - 1) == b""
    enc.reset()
    assert enc.compress_continue(data, capacity=len(full)) == full
