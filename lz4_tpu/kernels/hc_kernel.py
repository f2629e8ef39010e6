"""Pallas TPU high-compression (HC) block encoder.

Chain-table match finder with a one-step lazy parse, batched over blocks
via the grid.  Parity model: reference lz4hc.c — 32K-entry hash into a
64K chain of u16 deltas (`LZ4HC_Insert`, lz4hc.c:138-157), candidate walk
bounded by ``maxNbAttempts = 1 << (level - 1)`` (lz4hc.c:374-376),
backward extension (lz4hc.c:238-244), and a lazy overlap check at ip+1
(the core of `_Search2`, lz4hc.c:342-529; the device kernel uses the
single-step lazy variant, so its parse can differ from lz4hc.c's
three-state machine while staying firmly ahead of the fast encoder's
ratio — the bit-parity implementation is the host `lz4_tpu.hc`).

TPU-shaped choices:
* every structure lives in SMEM; the chain table holds full int32
  positions tagged with the block index (like the fast kernel), so stale
  cross-block entries never validate and nothing is re-zeroed per block —
  a 256 KB memset per 64 KB block would dominate the runtime.
* match candidates are content-verified (val32 compare), so hash/chain
  collisions — including stale-delta artifacts — only cost attempts.
* forward extension reuses the branchless XOR tail count.
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

HASH_LOG = 15                 # lz4hc.c:83 HASH_LOG 15
HASH_SIZE = 1 << HASH_LOG
POS_BITS = 18
POS_MASK = (1 << POS_BITS) - 1
CHAIN_SIZE = 1 << 16          # lz4hc.c:79 DICTIONARY_LOGSIZE 16

MAX_BLOCK = 1 << 16           # one 64KB block per chain-table window
DEFAULT_LEVEL = 9


def _hash4(v32):
    """15-bit 4-byte hash (role of lz4hc.c HASH_FUNCTION, :85)."""
    return ((v32 * jnp.int32(-1640531535)) >> (32 - HASH_LOG)) \
        & (HASH_SIZE - 1)


def _make_hc_kernel(NS: int, M: int, max_attempts: int):
    def kernel(slen_ref, val_hbm, out_hbm, olen_ref,
               vsmem, osmem, htab, chain, sem_in, sem_out):
        b = pl.program_id(0)
        n = slen_ref[b]
        # wrap tags at 8192 blocks and re-zero on wrap (int32 overflow)
        bt = b & 8191

        @pl.when(bt == 0)
        def _zero():
            def z(i, _):
                htab[i] = -1
                return 0
            lax.fori_loop(0, HASH_SIZE, z, 0)

        cp_in = pltpu.make_async_copy(val_hbm.at[b], vsmem.at[:, 0:NS],
                                      sem_in)
        cp_in.start()
        cp_in.wait()

        tag = bt << POS_BITS

        def val(p):
            return vsmem[0, p]

        def byte(p):
            return vsmem[0, p] & 0xFF

        def insert(p):
            """LZ4HC_Insert one position (lz4hc.c:138-157); idempotent —
            re-inserting the chain head keeps its true link instead of
            writing a self-delta that would sever the chain."""
            h = _hash4(val(p))
            e = htab[h]
            prev = e & POS_MASK
            fresh = jnp.logical_and((e >> POS_BITS) == bt, e >= 0)
            already = jnp.logical_and(fresh, prev == p)
            delta = jnp.where(fresh, jnp.clip(p - prev, 1, 65535),
                              jnp.int32(65535))
            chain[p] = jnp.where(already, chain[p], delta)
            htab[h] = tag | p

        mflimit = n - 12
        matchlimit = n - 5

        def extend(q, p, init):
            """Forward match length from (q, p) starting at init bytes."""
            def f4cond(ml):
                return jnp.logical_and(p + ml + 4 <= matchlimit,
                                       val(q + ml) == val(p + ml))

            ml = lax.while_loop(f4cond, lambda ml: ml + 4, init)
            diff = val(q + ml) ^ val(p + ml)
            tail = (jnp.where((diff & 0xFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFFFF) == 0, 1, 0))
            return jnp.minimum(ml + tail, matchlimit - p)

        def search(p, anchor):
            """Insert p, then walk its chain for the *widest* match.

            Candidates are scored forward + backward extension
            (LZ4HC_InsertAndGetWiderMatch, lz4hc.c:214-288), which is what
            lets the lazy step prefer matches that reach back over the
            pending literals.  Returns (score, fwd_len, best_pos);
            score < 4 means none.
            """
            h = _hash4(val(p))
            e = htab[h]
            cand0 = e & POS_MASK
            fresh = jnp.logical_and((e >> POS_BITS) == bt, e >= 0)
            cand0 = jnp.where(fresh, cand0, p)  # p = sentinel: stops walk

            def cond(st):
                att, cand, bs_, bf, bp = st
                # stale chain deltas may throw cand anywhere: stop on any
                # out-of-window value (candidates are content-verified, so
                # stale-but-in-window ones only cost attempts)
                return jnp.logical_and(
                    jnp.logical_and(att > 0, cand >= 0),
                    jnp.logical_and(cand < p, p - cand <= 65535))

            def body(st):
                att, cand, bs_, bf, bp = st
                candc = jnp.maximum(cand, 0)
                ok4 = val(candc) == val(p)

                def score():
                    fwd = extend(cand, p, jnp.int32(4))

                    def bcond(k):
                        return jnp.logical_and(
                            jnp.logical_and(p - k > anchor, cand - k > 0),
                            byte(p - k - 1) == byte(cand - k - 1))

                    back = lax.while_loop(bcond, lambda k: k + 1,
                                          jnp.int32(0))
                    return fwd + back, fwd

                sc, fwd = lax.cond(
                    ok4, score, lambda: (jnp.int32(0), jnp.int32(0)))
                better = sc > bs_
                bs_ = jnp.where(better, sc, bs_)
                bf = jnp.where(better, fwd, bf)
                bp = jnp.where(better, cand, bp)
                step = chain[candc]
                return att - 1, cand - step, bs_, bf, bp

            _, _, bs_, bf, bp = lax.while_loop(
                cond, body,
                (jnp.int32(max_attempts), cand0, jnp.int32(0),
                 jnp.int32(0), jnp.int32(0)))
            insert(p)
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
            # insert interior positions so later chains see this region
            # (LZ4HC_Insert over the match span, lz4hc.c:146-156)
            def ins(p, _):
                insert(p)
                return 0
            lax.fori_loop(ip + 1, jnp.minimum(new_ip, mflimit + 1), ins, 0)
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
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, NS + 8), jnp.int32),
            pltpu.SMEM((1, M + 8), jnp.int32),
            pltpu.SMEM((HASH_SIZE,), jnp.int32),
            pltpu.SMEM((CHAIN_SIZE,), jnp.int32),
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
    )(slen, val_rows.reshape(B, 1, NS))
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
