"""destSize encode kernel: capacity contract, token-boundary stop, consumed
report, dict-prefix mode — checked against the host oracle's semantics and
decodability (reference LZ4_compress_fast_destSize, lz4.c:809-830)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lz4_tpu.kernels.destsize_kernel import encode_blocks_dest_size
from lz4_tpu.kernels.encode_kernel import bytes_to_val32_rows
from lz4_tpu.kernels.common import np_pack_rows
from lz4_tpu.ops.block_np import decompress_block
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle


def run_destsize(buffers, caps, prefixes=None, min_match=4):
    """Helper: returns [(consumed, block_bytes)] per buffer."""
    NS = -(-max(len(p or b"") + len(b)
                for p, b in zip(prefixes or [b""] * len(buffers),
                                buffers)) // 128) * 128
    NS = max(NS, 128)
    rows = []
    slens, wlens = [], []
    for i, b in enumerate(buffers):
        p = (prefixes[i] if prefixes else b"") or b""
        rows.append(p + b)
        slens.append(len(b))
        wlens.append(len(p))
    packed, _ = np_pack_rows(rows, NS)
    val = bytes_to_val32_rows(jnp.asarray(packed), NS)
    out, olen, consumed = encode_blocks_dest_size(
        val, jnp.asarray(np.asarray(slens, np.int32)),
        jnp.asarray(np.asarray(caps, np.int32)),
        window_lens=jnp.asarray(np.asarray(wlens, np.int32)),
        min_match=min_match)
    out, olen, consumed = np.asarray(out), np.asarray(olen), \
        np.asarray(consumed)
    return [(int(consumed[i]),
             bytes(out[i, :olen[i]].astype(np.uint8)))
            for i in range(len(buffers))]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_destsize_contract(seed):
    import random
    rng = random.Random(seed)
    bufs, caps = [], []
    for i in range(12):
        n = rng.randint(20, 30_000)
        bufs.append(gen_buffer(n, rng.uniform(0.4, 0.95), seed * 50 + i))
        caps.append(rng.randint(10, max(12, n)))
    res = run_destsize(bufs, caps)
    for (consumed, block), src, cap in zip(res, bufs, caps):
        assert len(block) <= cap, "capacity overrun"
        assert 0 <= consumed <= len(src)
        if consumed:
            # the block decodes to exactly the consumed prefix
            assert decompress_block(block, consumed) == src[:consumed]
        if cap >= len(src) + len(src) // 255 + 32:
            assert consumed == len(src), "unbounded cap must consume all"


def test_destsize_tiny_capacities():
    src = gen_buffer(1000, 0.6, 7)
    res = run_destsize([src] * 6, [1, 2, 5, 6, 10, 17])
    for (consumed, block), cap in zip(res, [1, 2, 5, 6, 10, 17]):
        assert len(block) <= cap
        if consumed:
            assert decompress_block(block, consumed) == src[:consumed]
    # cap=1: only a bare token fits -> 0 literals is legal but useless;
    # host oracle consumes 0 there too
    assert res[0][0] == 0
    # cap>=2 fits token + 1 literal
    assert res[1][0] >= 1


def test_destsize_prefix_window():
    """With a dictionary prefix, the same capacity packs more source."""
    base = gen_buffer(40_000, 0.8, 11)
    prefix, src = base[:20_000], base[15_000:]
    cap = 4_000
    (c_plain, b_plain), = run_destsize([src], [cap])
    (c_dict, b_dict), = run_destsize([src], [cap], prefixes=[prefix])
    assert len(b_plain) <= cap and len(b_dict) <= cap
    assert c_dict >= c_plain  # window can only help
    # dict-mode block decodes with the prefix as the window
    assert decompress_block(b_dict, c_dict, dict_=prefix) == src[:c_dict]


def test_destsize_reference_decodes():
    """The reference C library decodes destSize output (usingDict for the
    prefix variant)."""
    if not oracle.available():
        pytest.skip("no reference lib")
    src = gen_buffer(30_000, 0.7, 21)
    (consumed, block), = run_destsize([src], [8_000])
    assert 0 < consumed < len(src)
    got = oracle.ref_decompress(block, consumed)
    assert got == src[:consumed]


def test_destsize_respects_min_match():
    src = gen_buffer(20_000, 0.7, 31)
    (c, block), = run_destsize([src], [len(src) * 2], min_match=12)
    assert c == len(src)
    assert decompress_block(block, c) == src
    i, end = 0, len(block)
    while i < end:
        tok = block[i]; i += 1
        ll = tok >> 4
        if ll == 15:
            while True:
                b = block[i]; i += 1; ll += b
                if b != 255:
                    break
        i += ll
        if i >= end:
            break
        i += 2
        ml = tok & 15
        if ml == 15:
            while True:
                b = block[i]; i += 1; ml += b
                if b != 255:
                    break
        assert ml + 4 >= 12


def test_device_dest_size_decode_resume():
    """Device-side resumable destSize DECODE (lz4.c:1316-1319 rewind):
    rows stop at token boundaries when out of room; host-orchestrated
    resume with the produced bytes as the window reproduces the
    whole-buffer decode; corruption still reports -1."""
    import numpy as np
    import jax.numpy as jnp
    from lz4_tpu.kernels.decode_kernel import (decode_blocks,
                                               decode_blocks_dest_size)
    from lz4_tpu.ops.block_np import compress_block
    from lz4_tpu.utils.datagen import gen_buffer

    blocks = [gen_buffer(4096, 0.7, 70 + i) for i in range(3)]
    comps = [compress_block(b) for b in blocks]
    M = -(-max(map(len, comps)) // 128) * 128
    arr = np.zeros((len(comps), M), np.int32)
    clens = np.zeros((len(comps),), np.int32)
    for i, c in enumerate(comps):
        arr[i, :len(c)] = np.frombuffer(c, np.uint8)
        clens[i] = len(c)
    arr_j, clens_j = jnp.asarray(arr), jnp.asarray(clens)

    # full-capacity: must behave like decode_blocks with cons == len
    caps = jnp.full((3,), 4096, jnp.int32)
    out, olen, cons = decode_blocks_dest_size(arr_j, clens_j, caps, 4096)
    out, olen, cons = map(np.asarray, (out, olen, cons))
    for i, b in enumerate(blocks):
        assert olen[i] == len(b) and cons[i] == len(comps[i])
        assert bytes(out[i, :4096].astype(np.uint8)) == b

    # constrained capacity: token-boundary stop, then resume with the
    # produced bytes as a dictionary window
    caps = jnp.asarray([1000, 2000, 3000], jnp.int32)
    out, olen, cons = decode_blocks_dest_size(arr_j, clens_j, caps, 4096)
    out, olen, cons = map(np.asarray, (out, olen, cons))
    for i, b in enumerate(blocks):
        assert 0 <= olen[i] <= int(caps[i])
        assert 0 <= cons[i] < len(comps[i])
        piece1 = bytes(out[i, :olen[i]].astype(np.uint8))
        assert piece1 == b[:olen[i]]
        # resume on device: remaining compressed bytes + window
        rest = comps[i][cons[i]:]
        M2 = -(-len(rest) // 128) * 128
        a2 = np.zeros((1, M2), np.int32)
        a2[0, :len(rest)] = np.frombuffer(rest, np.uint8)
        win = piece1[-65536:]
        P = -(-len(win) // 128) * 128
        d2 = np.zeros((1, P), np.int32)
        d2[0, P - len(win):] = np.frombuffer(win, np.uint8)
        out2, olen2, cons2 = decode_blocks_dest_size(
            jnp.asarray(a2), jnp.asarray([len(rest)], jnp.int32),
            jnp.full((1,), 4096, jnp.int32), 4096,
            dict_rows=jnp.asarray(d2),
            dict_lens=jnp.asarray([len(win)], jnp.int32))
        olen2, cons2 = int(np.asarray(olen2)[0]), int(np.asarray(cons2)[0])
        assert cons2 == len(rest)
        piece2 = bytes(np.asarray(out2)[0, :olen2].astype(np.uint8))
        assert piece1 + piece2 == b

    # corruption: offset 0 must report -1, not a clean stop
    bad = bytearray(comps[0])
    i0 = bad[0] >> 4
    bad[1 + i0] = 0
    bad[2 + i0] = 0
    a3 = np.zeros((1, M), np.int32)
    a3[0, :len(bad)] = np.frombuffer(bytes(bad), np.uint8)
    _, olen3, cons3 = decode_blocks_dest_size(
        jnp.asarray(a3), jnp.asarray([len(bad)], jnp.int32),
        jnp.full((1,), 4096, jnp.int32), 4096)
    assert int(np.asarray(olen3)[0]) == -1
    assert int(np.asarray(cons3)[0]) == -1
