"""Block-codec oracle vs the reference library.

Mirrors the reference fuzzer's core assertions (programs/fuzzer.c:313-745):
round-trips, cross-decoding in both directions, destSize fill, dictionary
modes, malformed-input rejection, and ratio sanity.
"""

import pytest

from lz4_tpu.ops.block_np import (
    Lz4BlockError,
    compress_block,
    compress_block_dest_size,
    compress_block_limited,
    decompress_block,
    get_decompressed_size,
)
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle unavailable")

BUFFERS = [
    b"",
    b"x",
    b"hello world",
    b"aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    gen_buffer(100, 0.5, 11),
    gen_buffer(5000, 0.7, 12),
    gen_buffer(65536, 0.8, 13),
    gen_buffer(131072, 0.6, 14),
    incompressible(4096),
    b"\x00" * 100000,
]


def test_roundtrip_self():
    for data in BUFFERS:
        comp = compress_block(data)
        assert decompress_block(comp, len(data)) == data


def test_reference_decodes_ours():
    for data in BUFFERS:
        comp = compress_block(data)
        assert oracle.ref_decompress(comp, len(data)) == data


def test_we_decode_reference():
    for data in BUFFERS:
        if not data:
            continue
        comp = oracle.ref_compress(data)
        assert decompress_block(comp, len(data)) == data
        assert get_decompressed_size(comp) == len(data)


def test_ratio_not_worse_than_reference():
    for data in BUFFERS:
        if len(data) < 1000:
            continue
        ours = len(compress_block(data))
        ref = len(oracle.ref_compress(data))
        assert ours <= ref * 1.01 + 16, (len(data), ours, ref)


def test_acceleration_levels():
    data = gen_buffer(65536, 0.75, 21)
    sizes = []
    for acc in (1, 2, 8, 32):
        comp = compress_block(data, acceleration=acc)
        assert decompress_block(comp, len(data)) == data
        assert oracle.ref_decompress(comp, len(data)) == data
        sizes.append(len(comp))
    assert sizes == sorted(sizes), "higher acceleration should not shrink output"


def test_dest_size_fill():
    data = gen_buffer(65536, 0.7, 31)
    for cap in (64, 700, 5000, 30000):
        consumed, comp = compress_block_dest_size(data, cap)
        assert len(comp) <= cap
        assert 0 <= consumed <= len(data)
        if consumed:
            assert decompress_block(comp, consumed) == data[:consumed]
            assert oracle.ref_decompress(comp, consumed) == data[:consumed]
            # should fill the destination reasonably well
            if consumed < len(data):
                assert len(comp) >= cap - 300


def test_limited_output():
    data = gen_buffer(20000, 0.6, 41)
    full = compress_block(data)
    assert compress_block_limited(data, len(full)) == full
    assert compress_block_limited(data, len(full) - 1) == b""


def test_dict_mode_roundtrip():
    dict_ = gen_buffer(8192, 0.7, 51)
    # data shares structure with the dict so matches reach into it
    data = dict_[1000:3000] + gen_buffer(2000, 0.5, 52) + dict_[4000:4500]
    comp = compress_block(data, dict_=dict_)
    plain = compress_block(data)
    assert len(comp) <= len(plain)
    assert decompress_block(comp, len(data), dict_=dict_) == data
    assert oracle.ref_decompress_usingdict(comp, len(data), dict_) == data


def test_we_decode_reference_hc():
    for data in BUFFERS:
        if len(data) < 13:
            continue
        for level in (3, 9, 16):
            comp = oracle.ref_compress_hc(data, level)
            assert decompress_block(comp, len(data)) == data


def test_partial_decode():
    data = gen_buffer(10000, 0.7, 61)
    comp = compress_block(data)
    for target in (0, 1, 100, 5000, 9999):
        assert decompress_block(comp, target, partial=True) == data[:target]


def test_decode_rejects_short_output():
    data = gen_buffer(10000, 0.7, 71)
    comp = compress_block(data)
    with pytest.raises(Lz4BlockError):
        decompress_block(comp, len(data) - 1)


def test_decode_rejects_truncated_input():
    data = gen_buffer(10000, 0.7, 81)
    comp = compress_block(data)
    for cut in (1, len(comp) // 2, len(comp) - 1):
        with pytest.raises(Lz4BlockError):
            decompress_block(comp[:cut], len(data))


def test_decode_rejects_bad_offset():
    # token: 1 literal then match with offset 5 while only 1 byte exists
    bad = bytes([0x11, ord("A"), 0x05, 0x00, 0x10])
    with pytest.raises(Lz4BlockError):
        decompress_block(bad, 100)


def test_malicious_overflow_lengths():
    # huge literal length with no literals behind it (fuzzer.c:205-289 class)
    bad = bytes([0xF0]) + b"\xff" * 100 + bytes([0x10])
    with pytest.raises(Lz4BlockError):
        decompress_block(bad, 1 << 20)


def test_empty_input_roundtrip():
    comp = compress_block(b"")
    assert comp == b"\x00"
    assert decompress_block(comp, 0) == b""


# ---------------------------------------------------------------------------
# resumable destSize decode (fork contract: lz4.c:1161-1163, 1316-1319)
# ---------------------------------------------------------------------------

def test_dest_size_decode_whole_in_one_call():
    from lz4_tpu.ops.block_np import decompress_block_dest_size
    for data in BUFFERS:
        if not data:
            continue
        comp = compress_block(data)
        consumed, out = decompress_block_dest_size(comp, len(data) + 64)
        assert consumed == len(comp)
        assert out == data


def test_dest_size_decode_resume_across_outputs():
    """Stop-and-resume across split OUTPUT buffers reproduces the
    whole-buffer decode (the SG property: one block filling several
    destination buffers)."""
    from lz4_tpu.stream import BlockDecompressStream
    for data in BUFFERS:
        if len(data) < 64:
            continue
        comp = compress_block(data)
        for cap0 in (97, 1024, 4099):
            dec = BlockDecompressStream()
            pos, pieces = 0, []
            cap = cap0
            while pos < len(comp):
                consumed, out = dec.decompress_dest_size_continue(
                    comp[pos:], cap)
                if consumed == 0 and not out:
                    cap *= 2          # one sequence larger than cap
                    continue
                pos += consumed
                pieces.append(out)
                cap = cap0
            assert b"".join(pieces) == data


def test_dest_size_decode_resume_across_inputs():
    """Early input end rewinds to a token boundary; feeding the
    unconsumed tail plus more input continues exactly."""
    from lz4_tpu.ops.block_np import decompress_block_dest_size
    data = gen_buffer(65536, 0.7, 99)
    comp = compress_block(data)
    for split in (3, 17, len(comp) // 3, len(comp) - 2):
        fed = comp[:split]
        c1, out1 = decompress_block_dest_size(fed, len(data),
                                              expect_more_input=True)
        assert c1 <= split
        c2, out2 = decompress_block_dest_size(
            comp[c1:], len(data) - len(out1), dict_=out1)
        assert c1 + c2 == len(comp)
        assert out1 + out2 == data


def test_dest_size_decode_rejects_corruption():
    from lz4_tpu.ops.block_np import decompress_block_dest_size
    data = gen_buffer(4096, 0.6, 5)
    comp = bytearray(compress_block(data))
    # force an offset of zero at the first match header
    i = comp[0] >> 4
    comp[1 + i] = 0
    comp[2 + i] = 0
    with pytest.raises(Lz4BlockError):
        decompress_block_dest_size(bytes(comp), 1 << 20)
