"""Batched VPU XXH64 vs the reference's LZ4_XXH64: every tail length,
ragged batches, seeds (reference xxhash.c XXH64)."""

import numpy as np
import pytest

from lz4_tpu.kernels.common import np_pack_rows
from lz4_tpu.kernels.xxh64_kernel import xxh64_batch
from lz4_tpu.ops.xxhash_np import xxh64 as xxh64_np
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle


def run_batch(bufs, seed=0):
    W = max(-(-max((len(b) for b in bufs), default=1) // 4), 1) * 4
    packed, lens = np_pack_rows(bufs, W)
    return xxh64_batch(packed, lens, seed)


def test_every_tail_length():
    base = gen_buffer(200, 0.5, 1)
    bufs = [base[:n] for n in range(0, 70)]
    got = run_batch(bufs)
    for n, g in zip(range(0, 70), got):
        assert int(g) == xxh64_np(base[:n]), n


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF, (1 << 63) + 12345])
def test_seeds_and_sizes(seed):
    import random
    rng = random.Random(7)
    bufs = [gen_buffer(rng.randint(0, 5000), rng.uniform(0.3, 0.9), i)
            for i in range(40)]
    got = run_batch(bufs, seed)
    for b, g in zip(bufs, got):
        assert int(g) == xxh64_np(b, seed)


def test_against_reference():
    if not oracle.available():
        pytest.skip("no reference lib")
    bufs = [gen_buffer(n, 0.6, n) for n in (0, 1, 31, 32, 33, 1000, 65536)]
    got = run_batch(bufs)
    for b, g in zip(bufs, got):
        assert int(g) == oracle.ref_xxh64(b)
