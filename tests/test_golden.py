"""Golden-fixture interop: decode artifacts produced by the reference
implementation bit-exactly, with no reference build required (the
versionsTest analog, versionsTest/test-lz4-versions.py:85-142)."""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from lz4_tpu.frame import decompress_frame, decompress_legacy
from lz4_tpu.ops.block_np import decompress_block
from lz4_tpu.sg import sg_decompress
from lz4_tpu.utils.datagen import gen_buffer

FX = Path(__file__).parent / "fixtures"
DATA = (FX / "golden_input.bin").read_bytes()


def test_golden_input_is_reproducible():
    # the corpus itself is pinned by datagen determinism
    assert DATA == gen_buffer(100_000, 0.7, 0xBEEF)


def test_decode_reference_frames():
    for name in ("default.lz4", "hc9_b5_linked.lz4", "b4_content_size.lz4"):
        frame = (FX / name).read_bytes()
        out, used = decompress_frame(frame)
        assert out == DATA, name
        assert used == len(frame), name


def test_decode_reference_legacy():
    out, _ = decompress_legacy((FX / "legacy.lz4").read_bytes())
    assert out == DATA


def test_decode_reference_blocks():
    blk = (FX / "golden_block_64k.bin").read_bytes()
    assert decompress_block(blk, 65536) == DATA[:65536]
    hc = (FX / "golden_block_hc9.bin").read_bytes()
    assert decompress_block(hc, 65536) == DATA[:65536]


def test_decode_reference_block_with_kernel():
    from lz4_tpu.kernels.decode_kernel import decode_blocks
    blk = (FX / "golden_block_64k.bin").read_bytes()
    M = ((len(blk) + 127) // 128) * 128
    arr = np.zeros((1, M), np.int32)
    arr[0, :len(blk)] = np.frombuffer(blk, np.uint8)
    out, olen = decode_blocks(jnp.asarray(arr),
                              jnp.asarray([len(blk)], dtype=np.int32), 65536)
    assert int(olen[0]) == 65536
    assert bytes(np.asarray(out)[0].astype(np.uint8)) == DATA[:65536]


def test_decode_reference_sg_frame():
    manifest = json.loads((FX / "manifest.json").read_text())
    frame = (FX / "golden_sg_16x4k.lz4").read_bytes()
    in_sizes = manifest["golden_sg_16x4k.lz4"]["in_sizes"]
    # as a plain frame
    out, _ = decompress_frame(frame)
    assert out == DATA[:sum(in_sizes)]
    # as a mirrored scatter-gather list (single input buffer is valid)
    n, decoded = sg_decompress([frame], in_sizes)
    assert n == sum(in_sizes)
    assert b"".join(decoded) == DATA[:sum(in_sizes)]
