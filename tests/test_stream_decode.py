"""Ring-buffered stream decoder: >64KB blocks (the reference CLI default,
-B7 4MB, lz4io.c:182-188) decoded on device — linked and independent
frames, stored-block splices, partial blocks, corruption verdicts."""

import numpy as np
import pytest

from lz4_tpu.kernels.decode_kernel import decode_stream
from lz4_tpu.ops.block_np import compress_block
from lz4_tpu.tpu import decompress_frame_device
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle


def test_stream_decode_independent_256k():
    data = gen_buffer(700_000, 0.7, 55)
    BS = 262144
    blocks = [data[i:i + BS] for i in range(0, len(data), BS)]
    payloads = [compress_block(b) for b in blocks]
    out, olen = decode_stream(payloads, BS, len(data), linked=False)
    assert (np.asarray(olen) == [len(b) for b in blocks]).all()
    flat = np.asarray(out).astype(np.uint8).reshape(-1)
    assert bytes(flat[:len(data)]) == data


def test_stream_decode_linked_1m():
    data = gen_buffer(2_500_000, 0.8, 77)
    BS = 1 << 20
    blocks = [data[i:i + BS] for i in range(0, len(data), BS)]
    payloads = [compress_block(b, dict_=(blocks[j - 1][-65536:] if j
                                         else b""))
                for j, b in enumerate(blocks)]
    out, olen = decode_stream(payloads, BS, len(data), linked=True)
    assert (np.asarray(olen) == [len(b) for b in blocks]).all()
    flat = np.asarray(out).astype(np.uint8).reshape(-1)
    assert bytes(flat[:len(data)]) == data


@pytest.mark.skipif(not oracle.available(), reason="no reference")
@pytest.mark.parametrize("args", [(), ("-B7", "-BD"), ("-B5",),
                                  ("-B6", "-BD")])
def test_reference_cli_files_decode_on_device(args):
    """Reference-CLI-produced files at every >64KB block size run through
    the device stream kernel (no host-codec fallback)."""
    data = gen_buffer(6 << 20, 0.7, 42) + incompressible(100_000, 3)
    frame = oracle.ref_cli_compress(data, args)
    out, used = decompress_frame_device(frame)
    assert out == data


def test_stream_decode_corruption_reports_error():
    data = gen_buffer(500_000, 0.7, 9)
    BS = 262144
    blocks = [data[i:i + BS] for i in range(0, len(data), BS)]
    payloads = [bytearray(compress_block(b)) for b in blocks]
    payloads[1][len(payloads[1]) // 2] ^= 0x55
    out, olen = decode_stream([bytes(p) for p in payloads], BS, len(data),
                              linked=False)
    olen = np.asarray(olen)
    assert olen[0] == len(blocks[0])
    assert olen[1] == -1
