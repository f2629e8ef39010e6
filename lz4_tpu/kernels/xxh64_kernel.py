"""Batched XXH64 on the TPU vector unit.

Same shape as the XXH32 kernel (transpose to [words, blocks], lane b
carries block b's accumulators; reference xxhash.c XXH64 core), with
64-bit arithmetic emulated as uint32 (hi, lo) pairs: TPU vector lanes are
32-bit, so a 64x64->low64 multiply is six 16/32-bit multiplies plus
carries, an add is add-with-carry (unsigned compare), and rotl64 is four
shifts.  The stripe loop stays pure VPU work; the <32-byte tail, merge
rounds and avalanche are finished vectorized on the host in numpy uint64
(a few bytes per block).

Parity: XXH64 with any seed, bit-exact against the reference's LZ4_XXH64
for every length (tests/test_xxh64_kernel.py sweeps tails 0..64).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_cpu

P1 = np.uint64(11400714785074694791)
P2 = np.uint64(14029467366897019727)
P3 = np.uint64(1609587929392839161)
P4 = np.uint64(9650029242287828579)
P5 = np.uint64(2870177450012600261)

CHUNK = 8           # stripes per grid step (rows per step = 8*CHUNK)


def _split(c: np.uint64):
    return (np.uint32(int(c) >> 32), np.uint32(int(c) & 0xFFFFFFFF))


def _mul64_const(ah, al, c: np.uint64):
    """(ah, al) * c mod 2**64, c a compile-time constant."""
    bh, bl = _split(c)
    bH = np.uint32(int(bl) >> 16)
    bL = np.uint32(int(bl) & 0xFFFF)
    aH = al >> 16
    aL = al & 0xFFFF
    t = aL * bL
    u = aH * bL + (t >> 16)
    v = aL * bH + (u & 0xFFFF)
    low = (v << 16) | (t & 0xFFFF)
    high = aH * bH + (u >> 16) + (v >> 16)
    high = high + ah * bl + al * bh
    return high, low


def _add64(ah, al, bh, bl):
    lo = al + bl
    carry = (lo < al).astype(jnp.uint32)
    return ah + bh + carry, lo


def _rotl64(ah, al, r: int):
    if r < 32:
        hi = (ah << r) | (al >> (32 - r))
        lo = (al << r) | (ah >> (32 - r))
        return hi, lo
    r -= 32
    hi = (al << r) | (ah >> (32 - r))
    lo = (ah << r) | (al >> (32 - r))
    return hi, lo


def _round(ah, al, xh, xl):
    """acc = rotl64(acc + x*P2, 31) * P1 (xxhash.c XXH64_round)."""
    mh, ml = _mul64_const(xh, xl, P2)
    ah, al = _add64(ah, al, mh, ml)
    ah, al = _rotl64(ah, al, 31)
    return _mul64_const(ah, al, P1)


def _make_kernel(B: int):
    def kernel(ns_ref, words_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            sh = ns_ref[1:2, :].astype(jnp.uint32)   # seed hi
            sl = ns_ref[2:3, :].astype(jnp.uint32)   # seed lo
            init_cs = (np.uint64((int(P1) + int(P2)) & ((1 << 64) - 1)),
                       P2, np.uint64(0), np.uint64(0))
            for k, c in enumerate(init_cs):
                ch, cl = _split(np.uint64((int(c)) & ((1 << 64) - 1)))
                if k == 3:
                    ch, cl = _split(np.uint64((-int(P1)) % (1 << 64)))
                h, l = _add64(sh, sl, jnp.broadcast_to(ch, sh.shape),
                              jnp.broadcast_to(cl, sl.shape))
                acc_ref[2 * k:2 * k + 1, :] = h.astype(jnp.int32)
                acc_ref[2 * k + 1:2 * k + 2, :] = l.astype(jnp.int32)

        nstripes = ns_ref[0:1, :]
        accs = []
        for k in range(4):
            ah = acc_ref[2 * k:2 * k + 1, :].astype(jnp.uint32)
            al = acc_ref[2 * k + 1:2 * k + 2, :].astype(jnp.uint32)
            accs.append((ah, al))
        for t in range(CHUNK):
            s = i * CHUNK + t
            live = nstripes > s
            for k in range(4):
                xl = words_ref[8 * t + 2 * k:8 * t + 2 * k + 1, :] \
                    .astype(jnp.uint32)
                xh = words_ref[8 * t + 2 * k + 1:8 * t + 2 * k + 2, :] \
                    .astype(jnp.uint32)
                ah, al = accs[k]
                nh, nl = _round(ah, al, xh, xl)
                accs[k] = (jnp.where(live, nh, ah),
                           jnp.where(live, nl, al))
        for k in range(4):
            acc_ref[2 * k:2 * k + 1, :] = accs[k][0].astype(jnp.int32)
            acc_ref[2 * k + 1:2 * k + 2, :] = accs[k][1].astype(jnp.int32)

    return kernel


@functools.partial(jax.jit, static_argnames=("T", "B", "interpret"))
def _xxh64_stripes(wordsT, ns_rows, *, T, B, interpret):
    grid = (max(T // CHUNK, 1),)
    acc = pl.pallas_call(
        _make_kernel(B),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((8, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8 * CHUNK, B), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, B), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.int32),
        interpret=interpret,
    )(ns_rows, wordsT)
    return acc


@jax.jit
def _tail_words8(packed_words, lens):
    """[B0, 8] tail words via masked reductions (see xxh32_kernel's
    _tail_words4 for rationale)."""
    B0, W0 = packed_words.shape
    base = (lens // 32 * 8).astype(jnp.int32)
    iota = jnp.arange(W0, dtype=jnp.int32)[None, :]
    pw = packed_words.astype(jnp.int32)
    cols = []
    for j in range(8):
        sel = iota == jnp.minimum(base + j, W0 - 1)[:, None]
        cols.append(jnp.sum(jnp.where(sel, pw, 0), axis=1))
    return jnp.stack(cols, axis=1)


def _xxh64_device(packed_words, lens, ns_rows, *, T, B, interpret):
    """Device path: eager pad/transpose + stripe kernel + [B0,8] tail
    extraction (see xxh32_kernel._xxh32_device for why the three are
    not fused into one jit)."""
    B0, W0 = packed_words.shape
    w = jnp.pad(packed_words.astype(jnp.int32),
                ((0, B - B0), (0, 8 * T - W0)))
    acc = _xxh64_stripes(w.T, ns_rows, T=T, B=B, interpret=interpret)
    tailw = _tail_words8(packed_words, lens)
    return acc, tailw


def xxh64_batch(packed_words, lens, seed: int = 0):
    """XXH64 of B independent buffers, 32-byte stripes on the VPU.

    Args:
      packed_words: [B, W] int32/uint32 LE words (zero padded rows).
      lens: [B] byte lengths.
      seed: common seed.

    Returns np.ndarray [B] uint64 digests (bit-exact XXH64).
    """
    packed_words = jnp.asarray(packed_words)
    lens_np = np.asarray(lens).astype(np.int64)
    B0, W0 = packed_words.shape
    B = -(-B0 // 128) * 128
    T = max(-(-W0 // (8 * CHUNK)), 1) * CHUNK
    ns = np.zeros((8, B), np.int32)
    ns[0, :B0] = (lens_np // 32).astype(np.int32)
    seed64 = np.uint64(seed)
    ns[1, :] = np.uint32(int(seed64) >> 32).view(np.int32)
    ns[2, :] = np.uint32(int(seed64) & 0xFFFFFFFF).view(np.int32)
    acc_d, tailw_d = _xxh64_device(
        packed_words, jnp.asarray(lens_np.astype(np.int32)),
        jnp.asarray(ns), T=T, B=B, interpret=on_cpu())
    # ONE flat fetch (each sync costs a tunnel round trip)
    flat = np.asarray(jnp.concatenate(
        [acc_d.reshape(-1), tailw_d.reshape(-1)]))
    acc = flat[:8 * B].reshape(8, B)
    tailw = flat[8 * B:].reshape(B0, 8).astype(np.uint32) \
        .astype(np.uint64)
    acc = np.ascontiguousarray(acc[:, :B0]).view(np.uint32)\
        .astype(np.uint64)
    v = [(acc[2 * k] << np.uint64(32)) | acc[2 * k + 1] for k in range(4)]

    # ---- host finish (numpy uint64): converge, tail, avalanche ----------
    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def mround(h, vk):
        vk = rotl(vk * P2, 31) * P1
        h ^= vk
        return h * P1 + P4

    big = lens_np >= 32
    h_big = rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12) + rotl(v[3], 18)
    for k in range(4):
        h_big = mround(h_big, v[k])
    h = np.where(big, h_big, seed64 + P5)
    h = (h + lens_np.astype(np.uint64))

    # tail content lives in the 8 words at the last stripe boundary
    # (rem <= 31), exactly what tailw holds: index relative to base_w
    idx = np.arange(B0)
    base_w = (lens_np // 32 * 8).astype(np.int64)
    pos = (lens_np // 32 * 32).astype(np.int64)

    def tw(wi):
        return tailw[idx, np.clip(wi - base_w, 0, 7)]

    # 8-byte groups
    for j in range(3):
        m = lens_np - pos >= 8
        wi = pos // 4
        k8 = tw(wi) | (tw(wi + 1) << np.uint64(32))
        cand = h ^ (rotl(k8 * P2, 31) * P1)
        cand = rotl(cand, 27) * P1 + P4
        h = np.where(m, cand, h)
        pos = np.where(m, pos + 8, pos)

    # 4-byte group
    m = lens_np - pos >= 4
    k4 = tw(pos // 4) & np.uint64(0xFFFFFFFF)
    cand = h ^ (k4 * P1)
    cand = rotl(cand, 23) * P2 + P3
    h = np.where(m, cand, h)
    pos = np.where(m, pos + 4, pos)

    # single bytes
    for j in range(3):
        m = lens_np - pos >= 1
        sh = ((pos % 4) * 8).astype(np.uint64)
        b = (tw(pos // 4) >> sh) & np.uint64(0xFF)
        cand = h ^ (b * P5)
        cand = rotl(cand, 11) * P1
        h = np.where(m, cand, h)
        pos = np.where(m, pos + 1, pos)

    h ^= h >> np.uint64(33)
    h = h * P2
    h ^= h >> np.uint64(29)
    h = h * P3
    h ^= h >> np.uint64(32)
    return h.astype(np.uint64)
