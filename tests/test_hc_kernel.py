"""Device HC kernel: valid output, ratio ahead of fast, reference interop."""

import numpy as np
import pytest
import jax.numpy as jnp

from lz4_tpu.hc import compress_hc_block
from lz4_tpu.kernels.common import np_pack_rows
from lz4_tpu.kernels.encode_kernel import bytes_to_val32_rows, encode_blocks
from lz4_tpu.kernels.hc_kernel import encode_blocks_hc
from lz4_tpu.ops.block_np import compress_block, decompress_block
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

NS = 4096
BLOCKS = ([gen_buffer(NS, p, 10 + i) for i, p in
           enumerate([0.4, 0.6, 0.8, 0.95])]
          + [b"", b"x" * 13, b"\x00" * NS, b"ab" * (NS // 2),
             incompressible(NS),
             (b"needle in a haystack " * 40 + incompressible(100)) * 3])


def encode(blocks, level=9):
    packed, lens = np_pack_rows(blocks, NS)
    val = bytes_to_val32_rows(jnp.asarray(packed), NS)
    out, olen = encode_blocks_hc(val, jnp.asarray(lens), level)
    out, olen = np.asarray(out), np.asarray(olen)
    return [bytes(out[i, :olen[i]].astype(np.uint8)) for i in range(len(blocks))]


def test_hc_kernel_roundtrips_and_reference_decodes():
    comps = encode(BLOCKS)
    for i, (b, c) in enumerate(zip(BLOCKS, comps)):
        assert decompress_block(c, len(b)) == b, i
        if oracle.available() and b:
            assert oracle.ref_decompress(c, len(b)) == b, i


def test_hc_kernel_beats_fast_ratio():
    blocks = [gen_buffer(NS, p, 77 + i) for i, p in
              enumerate([0.5, 0.7, 0.85, 0.95])]
    hc = encode(blocks, level=9)
    packed, lens = np_pack_rows(blocks, NS)
    val = bytes_to_val32_rows(jnp.asarray(packed), NS)
    fout, flen = encode_blocks(val, jnp.asarray(lens))
    flen = np.asarray(flen)
    assert sum(map(len, hc)) < flen.sum()
    # and should land within 2% of the host exact-parity HC (iterative
    # lazy deferral vs lz4hc.c's three-state machine)
    host = sum(len(compress_hc_block(b, 9)) for b in blocks)
    assert sum(map(len, hc)) <= host * 1.02


def test_hc_kernel_levels_monotone_attempts():
    blocks = [gen_buffer(NS, 0.85, 5)] * 2
    lo = encode(blocks, level=2)
    hi = encode(blocks, level=12)
    assert sum(map(len, hi)) <= sum(map(len, lo))
    for c in (lo[0], hi[0]):
        assert decompress_block(c, NS) == blocks[0]
