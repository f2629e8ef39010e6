"""XXH32/64 vs the reference library (bit-exact)."""

import pytest

from lz4_tpu.ops.xxhash_np import XXH32State, XXH64State, xxh32, xxh64
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="reference oracle unavailable")

CASES = [
    b"",
    b"a",
    b"abc",
    b"0123456789abcde",          # 15: just under one stripe
    b"0123456789abcdef",         # 16: exactly one stripe
    gen_buffer(1000, 0.5, 1),
    gen_buffer(4096, 0.9, 2),
    incompressible(65536 + 7),
]


@pytest.mark.parametrize("seed", [0, 1, 0xDEADBEEF])
def test_xxh32_oneshot(seed):
    for data in CASES:
        assert xxh32(data, seed) == oracle.ref_xxh32(data, seed)


@pytest.mark.parametrize("seed", [0, 1, 0x0102030405060708])
def test_xxh64_oneshot(seed):
    for data in CASES:
        assert xxh64(data, seed) == oracle.ref_xxh64(data, seed)


def test_xxh32_streaming_split_points():
    data = gen_buffer(10000, 0.6, 3)
    want = oracle.ref_xxh32(data, 0)
    for splits in ([0], [1], [15], [16], [17], [1, 2, 3], [5000], [9999]):
        st = XXH32State(0)
        prev = 0
        for s in splits:
            st.update(data[prev:s])
            prev = s
        st.update(data[prev:])
        assert st.digest() == want, splits


def test_xxh64_streaming_split_points():
    data = gen_buffer(10000, 0.6, 4)
    want = oracle.ref_xxh64(data, 0)
    for splits in ([0], [31], [32], [33], [100, 200, 300], [9999]):
        st = XXH64State(0)
        prev = 0
        for s in splits:
            st.update(data[prev:s])
            prev = s
        st.update(data[prev:])
        assert st.digest() == want, splits
