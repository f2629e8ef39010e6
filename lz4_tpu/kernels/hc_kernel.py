"""Pallas TPU high-compression (HC) block encoder.

Chain match finder with a one-step lazy parse, batched over blocks via
the grid.  Parity model: reference lz4hc.c — candidate chains per
position (`LZ4HC_Insert`, lz4hc.c:138-157), walk bounded by
``maxNbAttempts = 1 << (level - 1)`` (lz4hc.c:374-376), forward +
backward scoring (LZ4HC_InsertAndGetWiderMatch, lz4hc.c:214-288), lazy
deferral (lz4hc.c:342-529).  The bit-parity implementation is the host
``lz4_tpu.hc``; this kernel targets ratio parity at device speed.

TPU-shaped choices (round 3):
* The chain is PRECOMPUTED by the VPU as a sorted-candidate pass
  (encode_kernel.cand_delta4_rows): delta[p] = distance to the nearest
  previous position with the same 4 bytes.  Walking ``p - d[p] - d[.]
  - ...`` enumerates exactly the true 4-byte-match candidates, newest
  first — the same order a collision-free version of lz4hc.c's hash
  chain would produce, denser than its 15-bit-hash chains.  The scalar
  loop therefore has NO hash table, NO chain maintenance, and no
  interior re-insert loop after matches (lz4hc.c:146-156's role is
  subsumed: every position already has its delta).
* Each attempt pays full extension only if it can beat the best so far:
  prune when the word at ``cand + best - 3`` differs AND the byte before
  the candidate differs (then fwd <= best and backward = 0, so its score
  cannot exceed best) — the lossless analog of lz4hc.c:183-187.
* The walk stops early once best >= SUFFICIENT_LEN (64): on long-match
  data deeper candidates almost never pay (role of lz4hc.c's OPTIMAL_ML
  trimming, :428-441).  This is the one lossy knob; the ratio gate
  (tests/test_hc_kernel.py, 0.5% of lz4hc.c) bounds its cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_cpu
from .emit import make_emitters
from ..spec import compress_bound

MAX_BLOCK = 1 << 16           # one 64KB block per window
DEFAULT_LEVEL = 9
import os as _os
# (sweep harnesses may pass a comma list; the module default is the
# first entry, and scratch/hc_ab.py rebinds + clears the jit cache)
SUFFICIENT_LEN = int(
    _os.environ.get("LZ4T_HC_SUFF", "64").split(",")[0])


@jax.jit
def cand_delta4_rows(val: jax.Array) -> jax.Array:
    """[B, N] val32 rows -> [B, N] int32 deltas to the nearest previous
    position with the same 4 bytes (0 = none within 65535).  4-byte key:
    HC chains must enumerate every 4-byte match (lz4hc.c hashes 4 bytes,
    :85), unlike the fast path's 5-byte bias."""
    B, N = val.shape
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    sk, sp = lax.sort((val, pos), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((B, 1), bool), sk[:, 1:] == sk[:, :-1]], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), sp[:, :-1]], axis=1)
    d = jnp.where(same, sp - prev, 0)
    d = jnp.where(d <= 65535, d, 0)
    _, dd = lax.sort((sp, d), dimension=1, num_keys=1)
    return dd


@jax.jit
def cand_delta48_rows(val: jax.Array) -> jax.Array:
    """[B, N] val32 rows -> [B, N] int32 with the 4-byte-key chain delta
    in the low 16 bits and an 8-byte-key chain delta in the high 16: lane
    p's high half is the distance to the nearest previous position whose
    EIGHT bytes equal p's (0 = none within 65535).

    The 8-chain is the walk accelerator: once the best match is >= 8
    bytes, candidates matching fewer than 8 forward bytes cannot beat it
    forward, so the scalar walk steps the (much sparser) 8-chain instead
    of visiting every 4-byte collision.  Packing both chains in one
    int32 row keeps the kernel's SMEM budget unchanged."""
    B, N = val.shape
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    val4 = jnp.roll(val, -4, axis=1)
    # 4-byte chain (order within equal val is by pos: num_keys=2)
    sk, sp = lax.sort((val, pos), dimension=1, num_keys=2)
    same = jnp.concatenate(
        [jnp.zeros((B, 1), bool), sk[:, 1:] == sk[:, :-1]], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), sp[:, :-1]], axis=1)
    d4 = jnp.where(same, sp - prev, 0)
    d4 = jnp.where(d4 <= 65535, d4, 0)
    _, dd4 = lax.sort((sp, d4), dimension=1, num_keys=1)
    # 8-byte chain (sort by (val, val+4, pos) so equal 8-byte sequences
    # are adjacent in position order)
    sk8a, sk8b, sp8 = lax.sort((val, val4, pos), dimension=1, num_keys=3)
    same8 = jnp.concatenate(
        [jnp.zeros((B, 1), bool),
         jnp.logical_and(sk8a[:, 1:] == sk8a[:, :-1],
                         sk8b[:, 1:] == sk8b[:, :-1])], axis=1)
    prev8 = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), sp8[:, :-1]], axis=1)
    d8 = jnp.where(same8, sp8 - prev8, 0)
    d8 = jnp.where(d8 <= 65535, d8, 0)
    _, dd8 = lax.sort((sp8, d8), dimension=1, num_keys=1)
    return dd4 | (dd8 << 16)


def _make_hc_kernel(NS: int, M: int, max_attempts: int):
    def kernel(slen_ref, val_hbm, d_hbm, out_hbm, olen_ref,
               vsmem, dsmem, osmem, sem_in, sem_d, sem_out):
        b = pl.program_id(0)
        n = slen_ref[b]

        cp_in = pltpu.make_async_copy(val_hbm.at[b], vsmem.at[:, 0:NS],
                                      sem_in)
        cp_in.start()
        cp_d = pltpu.make_async_copy(d_hbm.at[b], dsmem.at[:, 0:NS],
                                     sem_d)
        cp_d.start()
        cp_in.wait()
        cp_d.wait()

        def val(p):
            return vsmem[0, p]

        def byte(p):
            return vsmem[0, p] & 0xFF

        def delta(p):
            """Low 16 bits: 4-byte chain; high 16: 8-byte chain."""
            return dsmem[0, p]

        mflimit = n - 12
        matchlimit = n - 5

        def extend(q, p, init):
            """Forward match length from (q, p) starting at init bytes.
            Stride-8 (two val32 tests per iteration): the walk's cost is
            while-loop iteration count (docs/SOL.md), same recipe as the
            fast encoder's extension."""
            def f8cond(ml):
                return jnp.logical_and(
                    p + ml + 8 <= matchlimit,
                    jnp.logical_and(val(q + ml) == val(p + ml),
                                    val(q + ml + 4) == val(p + ml + 4)))

            ml = lax.while_loop(f8cond, lambda ml: ml + 8, init)
            step4 = jnp.logical_and(p + ml + 4 <= matchlimit,
                                    val(q + ml) == val(p + ml))
            ml = ml + jnp.where(step4, 4, 0)
            diff = val(q + ml) ^ val(p + ml)
            tail = (jnp.where((diff & 0xFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFFFF) == 0, 1, 0))
            return jnp.minimum(ml + tail, matchlimit - p)

        def search(p, anchor):
            """Walk p's candidate chain for the *widest* match
            (forward + backward score).  Returns (score, fwd_len,
            best_pos); score < 4 means none.

            Tiered walk: steps the 4-byte chain until the best score
            reaches ``8 + (p - anchor)``, then switches to the sparser
            8-byte chain.  The switch is LOSSLESS: a skipped candidate
            matches < 8 forward bytes and its backward extension is
            bounded by ``p - anchor``, so its score is < the best —
            exactly the candidates lz4hc.c would walk and discard."""
            dp = delta(p)
            d0 = dp & 0xFFFF
            cand0 = jnp.where(d0 > 0, p - d0, p)  # p = stop sentinel
            vp4 = val(p + 4)
            tier8 = 8 + p - anchor

            def cond(st):
                att, cand, bs_, bf, bp = st
                return jnp.logical_and(
                    jnp.logical_and(att > 0, bs_ < SUFFICIENT_LEN),
                    jnp.logical_and(cand >= 0,
                                    jnp.logical_and(cand < p,
                                                    p - cand <= 65535)))

            def body(st):
                att, cand, bs_, bf, bp = st
                candc = jnp.maximum(cand, 0)
                # beat-gate (lossless): this candidate can only exceed
                # the best score if its bytes still match at the best
                # frontier, or it can extend backward.  The frontier
                # probe is clamped to matchlimit (fwd is clamped there
                # too, so a mismatch at the clamp still bounds fwd)
                gpos = jnp.clip(bs_ - 3, 0, matchlimit - p - 1)
                fwd_ok = val(candc + gpos) == val(p + gpos)
                bwd_ok = jnp.logical_and(
                    jnp.logical_and(p > anchor, candc > 0),
                    byte(candc - 1) == byte(p - 1))

                def score():
                    fwd = extend(candc, p, jnp.int32(4))

                    def bcond(k):
                        return jnp.logical_and(
                            jnp.logical_and(p - k > anchor,
                                            candc - k > 0),
                            byte(p - k - 1) == byte(candc - k - 1))

                    back = lax.while_loop(bcond, lambda k: k + 1,
                                          jnp.int32(0))
                    return fwd + back, fwd

                sc, fwd = lax.cond(
                    jnp.logical_or(fwd_ok, bwd_ok), score,
                    lambda: (jnp.int32(0), jnp.int32(0)))
                better = sc > bs_
                bs_ = jnp.where(better, sc, bs_)
                bf = jnp.where(better, fwd, bf)
                bp = jnp.where(better, cand, bp)
                dpair = delta(candc)
                use8 = jnp.logical_and(bs_ >= tier8,
                                       val(candc + 4) == vp4)
                step = jnp.where(use8, (dpair >> 16) & 0xFFFF,
                                 dpair & 0xFFFF)
                nxt = jnp.where(step > 0, cand - step, p)  # 0 ends chain
                return att - 1, nxt, bs_, bf, bp

            _, _, bs_, bf, bp = lax.while_loop(
                cond, body,
                (jnp.int32(max_attempts), cand0, jnp.int32(0),
                 jnp.int32(0), jnp.int32(0)))
            return bs_, bf, bp

        # emission: shared wire-format emitters (kernels/emit.py)
        copy_lit4, emit_ext, emit_seq, _emit_final = \
            make_emitters(val, osmem)

        # --- main lazy loop ---------------------------------------------

        def backward(mp, qq, anchor):
            def bcond(c):
                m, q = c
                return jnp.logical_and(
                    jnp.logical_and(m > anchor, q > 0),
                    byte(m - 1) == byte(q - 1))

            def bbody(c):
                m, q = c
                return m - 1, q - 1

            return lax.while_loop(bcond, bbody, (mp, qq))

        def take_match(ip, op, anchor, ml, mpos):
            mp, q2 = backward(ip, mpos, anchor)
            ml = ml + (ip - mp)
            op2 = emit_seq(op, anchor, mp - anchor, ip - mpos, ml - 4)
            new_ip = mp + ml
            return new_ip, op2, new_ip

        def main_body(state):
            ip, op, anchor = state
            sc, ml, mpos = search(ip, anchor)

            def no_match():
                return ip + 1, op, anchor

            def matched():
                # iterative lazy: keep deferring while the next position
                # yields a strictly wider match (role of the reference's
                # _Search2/_Search3 deferral chain, lz4hc.c:342-529)
                def lcond(st):
                    cur, sc_, ml_, mp_, go = st
                    return jnp.logical_and(go, cur + 1 <= mflimit)

                def lbody(st):
                    cur, sc_, ml_, mp_, go = st
                    sc2, ml2, mp2 = search(cur + 1, anchor)
                    better = sc2 > sc_
                    cur = jnp.where(better, cur + 1, cur)
                    sc_ = jnp.where(better, sc2, sc_)
                    ml_ = jnp.where(better, ml2, ml_)
                    mp_ = jnp.where(better, mp2, mp_)
                    return cur, sc_, ml_, mp_, better

                cur, _, mlf, mpf, _ = lax.while_loop(
                    lcond, lbody, (ip, sc, ml, mpos, jnp.bool_(True)))
                return take_match(cur, op, anchor, mlf, mpf)

            return lax.cond(sc >= 4, matched, no_match)

        run = n >= 13
        ip, op, anchor = lax.while_loop(
            lambda st: jnp.logical_and(run, st[0] <= mflimit), main_body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        op = _emit_final(op, anchor, n)
        olen_ref[b] = op

        cp_out = pltpu.make_async_copy(osmem.at[:, 0:M], out_hbm.at[b],
                                       sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NS", "M", "max_attempts", "interpret"))
def _encode_blocks_hc(val_rows, slen, *, NS, M, max_attempts, interpret):
    B = val_rows.shape[0]
    d_rows = cand_delta48_rows(val_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, NS + 24), jnp.int32),
            pltpu.SMEM((1, NS + 24), jnp.int32),
            pltpu.SMEM((1, M + 24), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, olen = pl.pallas_call(
        _make_hc_kernel(NS, M, max_attempts),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slen, val_rows.reshape(B, 1, NS), d_rows.reshape(B, 1, NS))
    return out.reshape(B, M), olen


def encode_blocks_hc(val32_rows: jax.Array, src_lens: jax.Array,
                     level: int = DEFAULT_LEVEL):
    """HC-compress a batch of independent blocks on device.

    Args:
      val32_rows: [B, NS] int32 val32 lanes (see bytes_to_val32_rows).
      src_lens: [B] int32 lengths (<= 64KB blocks).
      level: 1-16; chain attempts = 1 << (level - 1) (lz4hc.c:374-376).

    Returns (out [B, M] int32 bytes, olen [B]).
    """
    B, NS = val32_rows.shape
    if NS % 128:
        raise ValueError("NS must be a multiple of 128")
    if NS > MAX_BLOCK:
        raise ValueError(f"block too large for HC kernel ({NS})")
    level = max(1, min(int(level), 16))
    M = -(-compress_bound(NS) // 128) * 128
    return _encode_blocks_hc(val32_rows, src_lens.astype(jnp.int32),
                             NS=NS, M=M,
                             max_attempts=1 << (level - 1),
                             interpret=on_cpu())
