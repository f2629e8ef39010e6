"""lz4_tpu.block — the lz4.h simple-API analog (reference lz4.h:112-220).

Round-trips, destSize/partial semantics, batch device paths, and
bidirectional interop with the reference library.
"""

import numpy as np
import pytest

from lz4_tpu import block
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle


def test_simple_roundtrip():
    data = gen_buffer(50_000, 0.7, 1)
    comp = block.compress_default(data)
    assert block.decompress_safe(comp, len(data)) == data


def test_compress_fast_acceleration():
    data = gen_buffer(60_000, 0.8, 2)
    c1 = block.compress_fast(data, 1)
    c8 = block.compress_fast(data, 8)
    assert block.decompress_safe(c8, len(data)) == data
    assert len(c8) >= len(c1)  # acceleration trades ratio


def test_capacity_limit():
    data = gen_buffer(30_000, 0.5, 3)
    assert block.compress_default(data, capacity=100) == b""
    full = block.compress_default(data)
    assert block.compress_default(data, capacity=len(full)) == full


def test_dest_size():
    data = gen_buffer(40_000, 0.6, 4)
    comp, consumed = block.compress_dest_size(data, 1000)
    assert len(comp) <= 1000 and 0 < consumed <= len(data)
    assert block.decompress_safe(comp, consumed) == data[:consumed]


def test_partial():
    data = gen_buffer(20_000, 0.7, 5)
    comp = block.compress_default(data)
    assert block.decompress_safe_partial(comp, 500) == data[:500]


def test_compress_bound_holds():
    data = bytes(np.random.default_rng(6).integers(0, 256, 4000,
                                                   dtype=np.uint8))
    assert len(block.compress_default(data)) <= block.compress_bound(
        len(data))


@pytest.mark.skipif(not oracle.available(), reason="oracle not built")
def test_interop_with_reference():
    lib = oracle.get_lib()
    import ctypes
    data = gen_buffer(50_000, 0.75, 7)
    comp = block.compress_default(data)
    out = ctypes.create_string_buffer(len(data))
    n = lib.LZ4_decompress_safe(comp, out, len(comp), len(data))
    assert n == len(data) and out.raw[:n] == data

    bound = block.compress_bound(len(data))
    dst = ctypes.create_string_buffer(bound)
    m = lib.LZ4_compress_default(data, dst, len(data), bound)
    assert m > 0
    assert block.decompress_safe(dst.raw[:m], len(data)) == data


def test_batch_device_paths():
    bufs = [gen_buffer(65536, p, 10 + i)
            for i, p in enumerate((0.5, 0.7, 0.9))] + [b"tail-block"]
    comps = block.compress_batch(bufs)
    outs = block.decompress_batch(comps, 65536,
                                  out_lens=[len(b) for b in bufs])
    assert outs == bufs


def test_decompress_fast_consumed():
    """LZ4_decompress_fast parity: exact original_size decode reports the
    compressed bytes consumed, so concatenated blocks can be walked."""
    a = gen_buffer(4096, 0.7, 71)
    b = gen_buffer(2048, 0.6, 72)
    ca, cb = block.compress_default(a), block.compress_default(b)
    blob = ca + cb + b"garbage-tail"
    out, consumed = block.decompress_fast(blob, len(a))
    assert out == a and consumed == len(ca)
    out2, consumed2 = block.decompress_fast(blob[consumed:], len(b))
    assert out2 == b and consumed2 == len(cb)
    # wrong original_size fails loudly
    import pytest
    from lz4_tpu.ops.block_np import Lz4BlockError
    with pytest.raises(Lz4BlockError):
        block.decompress_fast(ca, len(a) - 1)
