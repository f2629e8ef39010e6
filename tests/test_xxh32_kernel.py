"""Batched VPU XXH32 kernel vs the reference LZ4_XXH32 (bit-exact)."""

import numpy as np
import pytest

from lz4_tpu.kernels.xxh32_kernel import xxh32_batch
from lz4_tpu.ops.xxhash_np import xxh32 as xxh32_np
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle


def pack(bufs):
    W = max((-(-len(b) // 4) for b in bufs), default=1) or 1
    arr = np.zeros((len(bufs), W * 4), np.uint8)
    lens = np.zeros((len(bufs),), np.int64)
    for i, b in enumerate(bufs):
        arr[i, :len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    words = arr.reshape(len(bufs), W, 4).astype(np.uint32)
    packed = (words[..., 0] | (words[..., 1] << 8) | (words[..., 2] << 16)
              | (words[..., 3] << 24)).astype(np.int32)
    return packed, lens


LENGTHS = [0, 1, 3, 4, 5, 15, 16, 17, 31, 32, 63, 64, 100, 1000, 4096,
           65536, 65537, 100001]


@pytest.mark.parametrize("seed", [0, 1, 0x9E3779B1])
def test_xxh32_batch_matches_oracle(seed):
    bufs = [gen_buffer(n, 0.6, n + 1) if n else b"" for n in LENGTHS]
    bufs += [incompressible(n) for n in (7, 50, 5000)]
    packed, lens = pack(bufs)
    got = xxh32_batch(packed, lens, seed)
    for i, b in enumerate(bufs):
        assert int(got[i]) == xxh32_np(b, seed), (i, len(b))
        if oracle.available():
            assert int(got[i]) == oracle.ref_xxh32(b, seed), (i, len(b))


def test_xxh32_batch_large_batch():
    bufs = [gen_buffer(512 + 13 * i, 0.7, i) for i in range(200)]
    packed, lens = pack(bufs)
    got = xxh32_batch(packed, lens, 0)
    for i in (0, 57, 199):
        assert int(got[i]) == xxh32_np(bufs[i], 0)
