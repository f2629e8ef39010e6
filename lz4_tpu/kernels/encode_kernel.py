"""Pallas TPU block encoder (fast/greedy) with sorted-candidate matching.

Parity: ``LZ4_compress_fast`` semantics (reference lz4.c:510-800) — greedy
parse, skip acceleration (lz4.c:586-594), backward extension (lz4.c:635),
spec parsing restrictions (last 5 literals, 12-byte match tail).  Output
is a valid LZ4 block stream; byte-identity with the C encoder is NOT a
goal (the spec allows any parse), ratio parity is.

TPU-first design (round 3): the reference's serial hash table — probe,
validate, insert at every scanned position — is the wrong structure for
this core: a scalar SMEM store per position serializes the issue pipeline
(measured: ~28ns/position, docs/ARCHITECTURE.md).  Instead the match
index is built by the VPU as a *sorted-candidate pass* before the scan:

  cand_delta_rows: sort (val32, position) per row — equal 4-byte words
  become sort-neighbours, so each position's nearest previous occurrence
  is one neighbour diff; a second sort un-permutes the deltas back to
  position order.

The scalar kernel then reads ``delta[p]`` (0 = no candidate in window):
EXACT candidates (no hash collisions, no validation load), no table, no
stores in the scan loop — every load pipelines.  Emitted offsets are
``delta`` itself, in [1, 65535] by construction, which structurally
excludes the offset-0 corruption class (docs/STRIDE2_BUG.md).  Candidate
density also beats the reference's table (every position is indexed; the
C encoder skips inserts inside matches, lz4.c:598-612 vs 733-736).

The scalar core remains issue-bound, so the loop stays organised around
op count:

* Input bytes arrive as ``val32`` lanes: val32[p] = LE32 word at byte p;
  4-byte match verification and stride-4 extension are single loads.
* The match tail (<4 equal bytes) is computed branchlessly from the XOR
  of the mismatching words instead of a byte loop.
* Sequence emission takes a straight-line fast path when both lengths fit
  their token nibbles (the common case); length extensions branch out,
  and literal copies move 16 bytes per loop iteration (the scan's cost
  is while-loop iteration count, docs/SOL.md).
* min_match mode (the decode-speed knob: fewer sequences, see bench.py)
  pre-filters candidates on the VPU for ANY mm >= 6: XOR byte-run
  counts between sort neighbours give exact forward/backward length
  bounds, so provably-rejectable candidates never reach the scan (see
  cand_delta_rows); ``reject_step`` bounds the rescan density of the
  rejects that survive.
* The linked path sorts [window | K blocks] TILES (ENC_TILE_BLOCKS)
  instead of per-block [window | block] rows — bit-identical deltas at
  (K+1)/K elements per byte instead of 2x.

``_hash5``/``hash_rows`` remain exported for the destSize/SG chain kernel
(kernels/destsize_kernel.py), whose incremental cross-buffer walk still
uses a persistent table.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_cpu
from .emit import make_emitters
from ..spec import compress_bound

HASH_LOG = 14
HASH_SIZE = 1 << HASH_LOG
POS_BITS = 18          # positions < 2^18 (blocks <= 256KB in this kernel)
POS_MASK = (1 << POS_BITS) - 1
SKIP_TRIGGER = 6

MAX_BLOCK = 1 << POS_BITS

# linked-path sort tiling: blocks per sorted tile (1 = per-block
# [window|block] rows; >1 amortizes the window duplication).  Chip sweep
# at mm=8 on real text: K=1 47.4, 2 46.1, 4 46.0, 5 52.6, 6 53.3,
# 7 53.1 MB/s — the dip below 5 is an XLA sort shape effect, not
# tiling math; 6 is the measured knee (docs/SOL.md).
ENC_TILE_BLOCKS = int(os.environ.get("LZ4TPU_ENC_TILE", "6"))
# cand_delta_rows packs positions into POS_BITS+1-bit fields, so a sorted
# tile may not exceed 2^19 lanes: WINDOW (64KB) + K*64KB <= 1<<19 => K<=7.
if not 1 <= ENC_TILE_BLOCKS <= 7:
    raise ValueError(
        f"LZ4TPU_ENC_TILE={ENC_TILE_BLOCKS} out of range: tile width "
        "window+K*64KB must stay within the kernel's 2^19-lane position "
        "packing, so K must be in 1..7")


@functools.partial(jax.jit, static_argnames=("row_bytes",))
def bytes_to_val32_rows(packed_words: jax.Array, row_bytes: int) -> jax.Array:
    """[B, W] int32 packed LE words -> [B, row_bytes] int32 where lane p is
    the LE32 read at byte offset p (4-byte lookahead packed per lane).

    Pure vector work: unpack bytes then recombine with shifts of rolled
    lanes (jnp.roll on the minor axis).
    """
    w = packed_words.astype(jnp.int32)
    b0 = w & 0xFF
    b1 = (w >> 8) & 0xFF
    b2 = (w >> 16) & 0xFF
    b3 = (w >> 24) & 0xFF
    by = jnp.stack([b0, b1, b2, b3], axis=-1).reshape(w.shape[0], row_bytes)
    v = (by
         + (jnp.roll(by, -1, axis=1) << 8)
         + (jnp.roll(by, -2, axis=1) << 16)
         + (jnp.roll(by, -3, axis=1) << 24))
    return v


def _hash5(v32, b4):
    """Hash of 5 bytes (role of lz4.c:462-468) — used by the destSize/SG
    chain kernel's persistent table."""
    x = (v32 ^ (b4 * jnp.int32(-1640531535))) * jnp.int32(-1640531535)
    return (x >> (32 - HASH_LOG)) & (HASH_SIZE - 1)


@jax.jit
def hash_rows(val: jax.Array) -> jax.Array:
    """Vectorized per-position _hash5 over val32 rows (VPU)."""
    b4 = jnp.roll(val, -4, axis=-1) & 0xFF
    x = (val ^ (b4 * jnp.int32(-1640531535))) * jnp.int32(-1640531535)
    return (x >> (32 - HASH_LOG)) & (HASH_SIZE - 1)


@jax.jit
def cand_delta_rows(val: jax.Array, filter_mm=None) -> jax.Array:
    """[B, N] val32 rows -> [B, N] int32 candidate deltas: lane p holds
    ``p - p'`` for the NEAREST p' < p whose 5 bytes equal p's within the
    65535-byte match window, or 0 when none exists.

    Two lax.sorts per row: sorting (val32, b5<<18|pos) groups equal
    5-byte sequences adjacently — the nearest previous occurrence is the
    sort predecessor — then sorting (pos, delta) un-permutes.  This is
    the TPU-native replacement for the reference's scalar hash table
    (lz4.c:454-477, 598-612): exact — no hash collisions — and computed
    at VPU rates.  The key is 5 bytes like the reference's 64-bit build
    (lz4.c:462-468): a 4-byte key finds nearest-but-weak candidates
    (common 4-grams are everywhere) and was measured 4-10% worse on
    ratio; 5 bytes biases candidates toward longer matches.

    ``filter_mm`` (optional [B] int32 per-row min_match): rows with
    mm >= 6 get a NECESSARY-condition pre-filter applied HERE, on the
    VPU, instead of in the scalar scan.  The sort carries val32@+4 and
    val32@-4 as passenger operands; XOR byte-run counts between the
    neighbour pair give the EXACT forward match length up to 8 (bytes
    0..4 equal by the 5-byte key; bytes 5..7 tested individually) and
    the EXACT backward run up to 4 — so a candidate is zeroed precisely
    when fwd < 8 AND bwd < 4 AND fwd + bwd < mm, which the scalar scan
    would provably reject anyway.  The scan's rejected-candidate
    extension walks disappear, and the barren-jump table (built from
    the filtered deltas) jumps the whole rejected region.  Survivors
    still get the exact ``ml >= min_match`` test in-kernel.  (The
    wrapped-lane compares at row edges are heuristic in exactly the way
    the in-kernel clamped loads were — necessary-only either way; a
    false byte EQUALITY at a wrapped lane only keeps a candidate, and
    positions near the row end never start matches.)
    """
    B, N = val.shape
    assert N <= (1 << 19)
    pos_bits = 18 if N <= (1 << 18) else 19
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    b5 = jnp.roll(val, -4, axis=-1) & 0xFF
    k2 = (b5 << pos_bits) | pos
    if filter_mm is None:
        sk, sk2 = lax.sort((val, k2), dimension=1, num_keys=2)
        keep = None
    else:
        v4 = jnp.roll(val, -4, axis=-1)
        vm4 = jnp.roll(val, 4, axis=-1)
        sk, sk2, sv4, svm4 = lax.sort((val, k2, v4, vm4), dimension=1,
                                      num_keys=2)
        tf = sv4[:, 1:] ^ sv4[:, :-1]      # bytes +4..+7 (byte +4 = key)
        tb = svm4[:, 1:] ^ svm4[:, :-1]    # bytes -4..-1
        # forward run: 5 key bytes + bytes +5, +6, +7 (prefix tests)
        m5 = (tf & 0x00FF00) == 0
        m6 = (tf & 0xFFFF00) == 0
        m7 = tf == 0
        fwd = (5 + m5.astype(jnp.int32) + m6.astype(jnp.int32)
               + m7.astype(jnp.int32))            # exact up to 8
        # backward run from byte -1 downward (suffix tests, top first)
        n1 = ((tb >> 24) & 0xFF) == 0
        n2 = ((tb >> 16) & 0xFFFF) == 0
        n3 = ((tb >> 8) & 0xFFFFFF) == 0
        n4 = tb == 0
        bwd = (n1.astype(jnp.int32) + n2.astype(jnp.int32)
               + n3.astype(jnp.int32) + n4.astype(jnp.int32))  # exact to 4
        mm_row = filter_mm.reshape(B, 1).astype(jnp.int32)
        keep = jnp.logical_or(
            jnp.logical_or(m7, n4),               # length caps reached:
            fwd + bwd >= mm_row)                  # true length unknown

    sp = sk2 & ((1 << pos_bits) - 1)
    same = jnp.logical_and(
        sk[:, 1:] == sk[:, :-1],
        (sk2 >> pos_bits)[:, 1:] == (sk2 >> pos_bits)[:, :-1])
    if keep is not None:
        same = jnp.logical_and(same, keep)
    same = jnp.concatenate([jnp.zeros((B, 1), bool), same], axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), sp[:, :-1]], axis=1)
    d = jnp.where(same, sp - prev, 0)
    d = jnp.where(d <= 65535, d, 0)
    _, dd = lax.sort((sp, d), dimension=1, num_keys=1)
    return dd


@jax.jit
def _jump_rows(d: jax.Array) -> jax.Array:
    """[R, N] candidate deltas -> [R, N] int32 distance from each lane to
    the NEXT lane (>= itself) holding a candidate (N-pos when none, so a
    barren tail jumps straight out of the scan), clipped to 65535.

    The scan's skip path advances by max(accel step, jump): lanes between
    a barren position and its next candidate can produce neither a match
    nor a probe, so jumping them never skips a candidate; probe density
    is equal or better (fewer visits grow the accel step more slowly, so
    the parse can differ from the unjumped scan — ratio-neutral-or-better,
    not byte-identical).  The reference's skip trigger (lz4.c:586-594)
    gambles geometrically on barren runs; the sorted pass has already
    measured them."""
    R, N = d.shape
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (R, N))
    cand = jnp.where(d > 0, pos, N)
    nextc = jnp.flip(lax.cummin(jnp.flip(cand, axis=1), axis=1), axis=1)
    return jnp.minimum(nextc - pos, 65535)


def _make_encode_kernel(NS: int, M: int, acceleration: int,
                        min_match: int = 4, reject_step: int = 1):
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
            return dsmem[0, p]

        copy_lit4, emit_ext, emit_seq, _emit_final = \
            make_emitters(val, osmem)

        mflimit = n - 12      # last position a match may start (inclusive)
        matchlimit = n - 5    # matches may extend up to here (exclusive)

        def with_match(ip, op, anchor, scnt, q):
            # backward extension (catch-up, lz4.c:635)
            def bcond(c):
                mp, qq = c
                return jnp.logical_and(
                    jnp.logical_and(mp > anchor, qq > 0),
                    byte(mp - 1) == byte(qq - 1))

            def bbody(c):
                mp, qq = c
                return mp - 1, qq - 1

            mp, q2 = lax.while_loop(bcond, bbody, (ip, q))

            # forward extension: stride-4 val32 equality...
            def f8cond(ml):
                # stride-8: two val32 equality tests per iteration — the
                # scan's cost is while-loop iteration count (docs/SOL.md)
                return jnp.logical_and(
                    mp + ml + 8 <= matchlimit,
                    jnp.logical_and(val(q2 + ml) == val(mp + ml),
                                    val(q2 + ml + 4) == val(mp + ml + 4)))

            ml = lax.while_loop(f8cond, lambda ml: ml + 8, ip + 4 - mp)
            step4 = jnp.logical_and(mp + ml + 4 <= matchlimit,
                                    val(q2 + ml) == val(mp + ml))
            ml = ml + jnp.where(step4, 4, 0)
            # ...then a branchless <4-byte tail from the XOR of the first
            # mismatching words (diff==0 means limit-stopped: tail=3 and
            # the min() clamp does the bounding), lz4.c LZ4_count's role
            diff = val(q2 + ml) ^ val(mp + ml)
            tail = (jnp.where((diff & 0xFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFFFF) == 0, 1, 0))
            ml = jnp.minimum(ml + tail, matchlimit - mp)

            def emit(ip, op, anchor, scnt):
                op2 = emit_seq(op, anchor, mp - anchor, ip - q, ml - 4)
                new_ip = mp + ml
                return (new_ip, op2, new_ip,
                        jnp.int32(acceleration << SKIP_TRIGGER))

            if min_match <= 4:
                return emit(ip, op, anchor, scnt)
            # min-match knob: short matches stay literal (fewer sequences
            # = proportionally faster per-chip decode; the decoder is
            # sequence-bound).  ml includes the backward extension, which
            # funds a large share of accepted matches; on reject the scan
            # advances by at most reject_step (keeping probe density:
            # jumping the whole rejected region was measured to cost 20%+
            # ratio — long matches are FOUND by dense probing, and the
            # measured ratio cost of step 2-4 is <1.5%).
            return lax.cond(ml >= min_match,
                            lambda: emit(ip, op, anchor, scnt),
                            lambda: (ip + jnp.maximum(scnt >> SKIP_TRIGGER,
                                                      reject_step),
                                     op, anchor, scnt + 1))

        def main_body(state):
            ip, op, anchor, scnt = state
            w = delta(ip)
            d = w & 0xFFFF
            q = ip - d
            # d > 0 <=> a previous equal val32 within 65535 bytes exists;
            # no validation load — the candidate is exact by construction,
            # and in min_match>=11 mode the VPU sorted pass already zeroed
            # candidates failing the necessary-condition pre-filter
            # (cand_delta_rows filter_rows), so the scan pays nothing.
            # High 16 bits: distance to the next candidate (_jump_rows) —
            # a barren position jumps the whole candidate-free run.
            good = d > 0

            def skip():
                step = jnp.maximum(scnt >> SKIP_TRIGGER,
                                   (w >> 16) & 0xFFFF)
                return ip + step, op, anchor, scnt + 1

            return lax.cond(good,
                            lambda: with_match(ip, op, anchor, scnt, q),
                            skip)

        def main_cond(state):
            ip, op, anchor, scnt = state
            return ip <= mflimit

        init = (jnp.int32(1), jnp.int32(0), jnp.int32(0),
                jnp.int32(acceleration << SKIP_TRIGGER))
        run = n >= 13
        ip, op, anchor, _ = lax.while_loop(
            lambda s: jnp.logical_and(run, main_cond(s)), main_body, init)

        op = _emit_final(op, anchor, n)
        olen_ref[b] = op

        cp_out = pltpu.make_async_copy(osmem.at[:, 0:M], out_hbm.at[b],
                                       sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NS", "M", "acceleration", "interpret",
                                    "min_match", "reject_step"))
def _encode_blocks(val_rows, slen, *, NS, M, acceleration, interpret,
                   min_match=4, reject_step=1):
    B = val_rows.shape[0]
    prefiltered = min_match >= 6     # below 6 the filter keeps everything
    d_rows = cand_delta_rows(
        val_rows,
        jnp.full((B,), min_match, jnp.int32) if prefiltered else None)
    # barren-jump distances ride the spare high 16 bits (deltas <= 65535).
    # jump = 65535 intentionally wraps into the int32 sign bit; the kernel
    # recovers it as (w >> 16) & 0xFFFF (arithmetic shift then mask), so
    # the two's-complement wrap is part of the contract — keep the
    # extraction in sync if the packing ever changes.
    d_rows = d_rows | (_jump_rows(d_rows) << 16)
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
        _make_encode_kernel(NS, M, acceleration, min_match, reject_step),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slen, val_rows.reshape(B, 1, NS), d_rows.reshape(B, 1, NS))
    return out.reshape(B, M), olen


def encode_blocks(val32_rows: jax.Array, src_lens: jax.Array,
                  acceleration: int = 1, min_match: int = 4,
                  reject_step: int = 1):
    """Compress a batch of independent blocks.

    Args:
      val32_rows: [B, NS] int32, lane p = LE32 word at byte p (see
        ``bytes_to_val32_rows``); NS must be a multiple of 128.
      src_lens: [B] int32 source lengths (each <= NS, < 2^18).
      min_match: shortest match to emit (4 = LZ4 default; larger values
        trade ratio for fewer sequences = faster decode).
      reject_step: scan advance on a rejected short match (min_match
        mode); >1 trades a sliver of ratio for encode speed.

    Returns (out [B, M] int32 bytes, olen [B] int32 compressed lengths),
    with M = 128-aligned compress_bound(NS).
    """
    B, NS = val32_rows.shape
    if NS % 128:
        raise ValueError("NS must be a multiple of 128")
    if NS > MAX_BLOCK:
        raise ValueError(f"block too large for kernel ({NS} > {MAX_BLOCK})")
    M = -(-compress_bound(NS) // 128) * 128
    return _encode_blocks(val32_rows, src_lens.astype(jnp.int32),
                          NS=NS, M=M, acceleration=int(acceleration),
                          interpret=on_cpu(), min_match=int(min_match),
                          reject_step=int(reject_step))


# ---------------------------------------------------------------------------
# linked / streaming mode: LZ4_compress_fast_continue parity on device
# ---------------------------------------------------------------------------

WINDOW = 65536


@jax.jit
def cand_frac8_rows(val: jax.Array) -> jax.Array:
    """[B, N] val32 rows -> [B] float32: fraction of positions whose
    nearest previous 5-byte-equal candidate also matches 8 forward bytes
    (i.e. would survive a min_match pre-filter) — a one-sort VPU
    statistic of long-match density used to pick a per-block min_match
    (adaptive mode).  Rides the same sort as ``cand_delta_rows`` with
    val32@+4 carried as a passenger operand, so no gather is needed to
    compare candidate bytes."""
    B, N = val.shape
    pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    b5 = jnp.roll(val, -4, axis=-1) & 0xFF
    v4 = jnp.roll(val, -4, axis=-1)
    k2 = (b5 << 18) | pos
    sk, sk2, sv4 = lax.sort((val, k2, v4), dimension=1, num_keys=2)
    sp = sk2 & ((1 << 18) - 1)
    same = jnp.logical_and(sk[:, 1:] == sk[:, :-1],
                           (sk2 >> 18)[:, 1:] == (sk2 >> 18)[:, :-1])
    near = (sp[:, 1:] - sp[:, :-1]) <= 65535
    m8 = jnp.logical_and(jnp.logical_and(same, near),
                         sv4[:, 1:] == sv4[:, :-1])
    return jnp.mean(m8.astype(jnp.float32), axis=1)


def _make_encode_linked_kernel(NS: int, M: int, acceleration: int,
                               min_match: int = 4, reject_step: int = 1,
                               dynamic_mm: bool = False):
    """Chained-block encoder: grid (streams, blocks); each grid step's
    SMEM val window covers [prev block | current block] and the sorted-
    candidate pass runs over the whole window, so matches reach into the
    previous block exactly like ``LZ4_compress_fast_continue`` prefix
    mode (lz4.c:990-1045).

    A stream may start with a pre-existing 64 KB dictionary prefix
    (prefix_ref[s] > 0): block 0's window rows hold it, and candidate
    deltas pointing into it come straight from the sorted pass (the
    LZ4_loadDict table-seeding of lz4.c:944-948 has no analog to run —
    the prefix bytes ARE in the candidate domain).  This is what lets
    ONE huge linked frame be encoded data-parallel across a mesh with
    full window ratio and zero communication: each shard's prefix is
    simply the preceding 64 KB of input, which the host replicates into
    the shard's rows.

    Candidate deltas for the NS block lanes ride packed two per int32
    (16-bit halves — deltas are <= 65535): the window vals + output row
    leave no SMEM room for an unpacked row (chip cap is 1MB).

    ``dynamic_mm``: min_match comes per block from a third prefetch
    scalar row instead of the compile-time constant (adaptive mode: each
    block trades ratio for decode speed according to its own long-match
    density; see ``cand_frac8_rows``).
    """
    W = WINDOW + NS    # SMEM byte window per step

    def kernel(slen_ref, prefix_ref, *rest):
        if dynamic_mm:
            (mm_ref, val_hbm, d_hbm, j_hbm, out_hbm, olen_ref,
             vsmem, dsmem, jsmem, osmem,
             sem_in, sem_d, sem_j, sem_out) = rest
        else:
            (val_hbm, d_hbm, j_hbm, out_hbm, olen_ref,
             vsmem, dsmem, jsmem, osmem,
             sem_in, sem_d, sem_j, sem_out) = rest
        s = pl.program_id(0)
        k = pl.program_id(1)
        nb = pl.num_programs(1)
        n = slen_ref[s * nb + k]
        mm_b = mm_ref[s * nb + k] if dynamic_mm else jnp.int32(min_match)

        cp_in = pltpu.make_async_copy(val_hbm.at[s, k], vsmem.at[:, 0:W],
                                      sem_in)
        cp_in.start()
        cp_d = pltpu.make_async_copy(d_hbm.at[s, k],
                                     dsmem.at[:, 0:NS // 2], sem_d)
        cp_d.start()
        cp_j = pltpu.make_async_copy(j_hbm.at[s, k],
                                     jsmem.at[:, 0:NS // 4], sem_j)
        cp_j.start()
        cp_in.wait()
        cp_d.wait()
        cp_j.wait()

        start = k * WINDOW              # global position of block start
        base = start - WINDOW           # global position of SMEM lane 0
        prefix = jnp.where(k == 0, prefix_ref[s], WINDOW)

        def val(p):
            return vsmem[0, p - base]

        def byte(p):
            return vsmem[0, p - base] & 0xFF

        def delta(p):
            j = p - start
            return (dsmem[0, j >> 1] >> ((j & 1) << 4)) & 0xFFFF

        copy_lit4, emit_ext, emit_seq, _emit_final = \
            make_emitters(val, osmem)

        n_end = start + n           # global end of this block
        mflimit = n_end - 12
        matchlimit = n_end - 5
        low = start - prefix        # lowest readable global position

        def with_match(ip, op, anchor, scnt, q):
            def bcond(c):
                mp, qq = c
                return jnp.logical_and(
                    jnp.logical_and(mp > anchor, qq > low),
                    byte(mp - 1) == byte(qq - 1))

            def bbody(c):
                mp, qq = c
                return mp - 1, qq - 1

            mp, q2 = lax.while_loop(bcond, bbody, (ip, q))

            def f8cond(ml):
                # stride-8: two val32 equality tests per iteration — the
                # scan's cost is while-loop iteration count (docs/SOL.md)
                return jnp.logical_and(
                    mp + ml + 8 <= matchlimit,
                    jnp.logical_and(val(q2 + ml) == val(mp + ml),
                                    val(q2 + ml + 4) == val(mp + ml + 4)))

            ml = lax.while_loop(f8cond, lambda ml: ml + 8, ip + 4 - mp)
            step4 = jnp.logical_and(mp + ml + 4 <= matchlimit,
                                    val(q2 + ml) == val(mp + ml))
            ml = ml + jnp.where(step4, 4, 0)
            diff = val(q2 + ml) ^ val(mp + ml)
            tail = (jnp.where((diff & 0xFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFFFF) == 0, 1, 0))
            ml = jnp.minimum(ml + tail, matchlimit - mp)

            def emit(ip, op, anchor, scnt):
                op2 = emit_seq(op, anchor, mp - anchor, ip - q, ml - 4)
                new_ip = mp + ml
                return (new_ip, op2, new_ip,
                        jnp.int32(acceleration << SKIP_TRIGGER))

            if not dynamic_mm and min_match <= 4:
                return emit(ip, op, anchor, scnt)
            # min-match knob: see _make_encode_kernel
            return lax.cond(ml >= mm_b,
                            lambda: emit(ip, op, anchor, scnt),
                            lambda: (ip + jnp.maximum(scnt >> SKIP_TRIGGER,
                                                      reject_step),
                                     op, anchor, scnt + 1))

        def skip(ip, op, anchor, scnt):
            # barren-jump (see _jump_rows): jsmem[k] holds the block-
            # relative position of the next candidate at/after lane 4k
            # (4-granular: a full-resolution row would not fit SMEM
            # beside the 128KB val window).  nextc is monotone, so
            # jsmem[j>>2] = nextc[4*(j>>2)] is a valid lower bound for
            # ANY landing j: whenever it lands at/after j there is no
            # candidate in [j, snap), so max(ip2, snap) never skips one
            # (unaligned landings included — no parity trap).
            step = scnt >> SKIP_TRIGGER
            ip2 = ip + step
            j = ip2 - start
            snap = start + jsmem[0, jnp.minimum(j >> 2, NS // 4 - 1)]
            ip2 = jnp.where(j < NS, jnp.maximum(ip2, snap), ip2)
            return ip2, op, anchor, scnt + 1

        def main_body(state):
            ip, op, anchor, scnt = state
            d = delta(ip)
            q = ip - d
            # q >= low guards block 0's zero padding: a partial prefix
            # leaves synthetic zero lanes below ``low`` whose val32
            # equals real zero runs — matches must not reach them.
            # (In min_match>=11 / dynamic mode the VPU sorted pass has
            # already zeroed candidates failing the necessary-condition
            # pre-filter — cand_delta_rows filter_rows.)
            good = jnp.logical_and(d > 0, q >= low)
            return lax.cond(good,
                            lambda: with_match(ip, op, anchor, scnt, q),
                            lambda: skip(ip, op, anchor, scnt))

        def main_cond(state):
            ip, op, anchor, scnt = state
            return ip <= mflimit

        # a block with any window may match from its first byte; only a
        # windowless stream start must skip position 0
        init = (start + jnp.where(prefix > 0, 0, 1).astype(jnp.int32),
                jnp.int32(0), jnp.int32(start),
                jnp.int32(acceleration << SKIP_TRIGGER))
        run = n >= 13
        ip, op, anchor, _ = lax.while_loop(
            lambda st: jnp.logical_and(run, main_cond(st)), main_body, init)

        op = _emit_final(op, anchor, n_end)
        olen_ref[s * nb + k] = jnp.where(n > 0, op, 0)

        cp_out = pltpu.make_async_copy(osmem.at[:, 0:M], out_hbm.at[s, k],
                                       sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NS", "M", "acceleration", "interpret",
                                    "min_match", "reject_step",
                                    "dynamic_mm"))
def _encode_blocks_linked(val_rows, slen, prefix, mm_rows=None, *, NS, M,
                          acceleration, interpret, min_match=4,
                          reject_step=1, dynamic_mm=False):
    S, NB = val_rows.shape[0], val_rows.shape[1]
    W = WINDOW + NS
    # candidate deltas over the whole [window | block] row — candidates
    # reach into the previous block / dictionary prefix by construction;
    # only the NS block lanes ship to the kernel, packed 2 per int32.
    # The min_match>=11 pre-filter rides the same sorted pass (per-row
    # gated in dynamic mode so static mm=K and mm_rows=[K..] stay
    # bit-identical).
    if dynamic_mm:
        # per-block mm: the filter threshold varies per row, so sort the
        # per-block [window | block] rows (filter rides per-row)
        filter_mm = mm_rows.reshape(S * NB).astype(jnp.int32)
        d_full = cand_delta_rows(val_rows.reshape(S * NB, W),
                                 filter_mm)[:, WINDOW:]
    else:
        # TILE SORTS: the per-block [window | block] rows sort every byte
        # twice; sorting [window | K blocks] tiles instead keeps the
        # exact same candidate reach (any lane still sees <= 65535 bytes
        # back, which never crosses more than one 64KB block boundary)
        # at 1.25x elements per byte instead of 2x — bit-identical
        # deltas, ~25-30% less sort work (docs/SOL.md).
        K = min(ENC_TILE_BLOCKS, NB)
        T = -(-NB // K)
        vr = val_rows
        if T * K != NB:
            vr = jnp.pad(val_rows, ((0, 0), (0, T * K - NB), (0, 0)))
        heads = vr[:, ::K, :WINDOW]                       # [S, T, WINDOW]
        bodies = vr[:, :, WINDOW:]                        # [S, T*K, NS]
        # repair every block's last 3 lanes: their val32 lookahead
        # wrapped at the SOURCE row's edge, but mid-tile those lanes
        # must see the next block's bytes — which the next row's window
        # part carries with real lookahead (positions WINDOW-3..WINDOW-1
        # are mid-row there).  The final row keeps its wrapped tail:
        # nothing after it in any tile can link to it.
        tails = jnp.concatenate(
            [vr[:, 1:, WINDOW - 3:WINDOW], vr[:, -1:, W - 3:W]], axis=1)
        bodies = jnp.concatenate([bodies[:, :, :NS - 3], tails], axis=2)
        bodies = bodies.reshape(S, T, K * NS)
        tiles = jnp.concatenate([heads, bodies], axis=2)
        filter_mm = (jnp.full((S * T,), min_match, jnp.int32)
                     if min_match >= 6 else None)
        d_tiles = cand_delta_rows(
            tiles.reshape(S * T, WINDOW + K * NS), filter_mm)
        d_full = d_tiles[:, WINDOW:].reshape(
            S, T * K, NS)[:, :NB].reshape(S * NB, NS)
    # zero the last 12 lanes' deltas: positions past mflimit are never
    # probed (lz4.c:539 parity — matches may not start in the last 12
    # bytes), and the filter's wrapped-lane reads make those lanes the
    # only place the window- and tile-sort layouts can disagree; masking
    # them keeps the parse (and the barren-jump table) bit-identical
    # across layouts
    posr12 = jnp.arange(NS, dtype=jnp.int32)
    d_full = jnp.where(posr12[None, :] < NS - 12, d_full, 0)
    dp = d_full.reshape(S, NB, NS // 2, 2)
    d_rows = dp[..., 0] | (dp[..., 1] << 16)
    # barren-jump side table (4-granular; see the kernel's skip()):
    # block-relative position of the next candidate at/after lane 4k
    posr = jnp.arange(NS, dtype=jnp.int32)
    cand = jnp.where(d_full > 0, posr[None, :], NS)
    nextc = jnp.flip(lax.cummin(jnp.flip(cand, axis=1), axis=1), axis=1)
    j_rows = nextc[:, ::4]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3 if dynamic_mm else 2,
        grid=(S, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, W + 24), jnp.int32),
            pltpu.SMEM((1, NS // 2 + 8), jnp.int32),
            pltpu.SMEM((1, NS // 4 + 8), jnp.int32),
            pltpu.SMEM((1, M + 24), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    scalars = (slen.reshape(S * NB), prefix)
    if dynamic_mm:
        scalars = scalars + (mm_rows.reshape(S * NB).astype(jnp.int32),)
    out, olen = pl.pallas_call(
        _make_encode_linked_kernel(NS, M, acceleration, min_match,
                                   reject_step, dynamic_mm),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, NB, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((S * NB,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*scalars, val_rows.reshape(S, NB, 1, W),
      d_rows.reshape(S, NB, 1, NS // 2),
      j_rows.reshape(S, NB, 1, NS // 4))
    return out.reshape(S, NB, M), olen.reshape(S, NB)


def encode_blocks_linked(val32_rows: jax.Array, src_lens: jax.Array,
                         acceleration: int = 1,
                         prefix_lens: jax.Array | None = None,
                         min_match: int = 4, reject_step: int = 1,
                         mm_rows: jax.Array | None = None):
    """Compress streams of linked 64 KB blocks (device streaming mode).

    Args:
      val32_rows: [S, NB, 65536 + NS] int32 val32 lanes; row (s, k) covers
        stream s's bytes [(k-1)*64K, (k+1)*64K) (zeros pad the front of
        k=0 and the tail of the final partial block).  NS = 65536.
      src_lens: [S, NB] int32 block lengths (all 65536 except the last
        nonzero block per stream; zero rows are padding).
      prefix_lens: optional [S] int32 dictionary-prefix length for each
        stream's first block (0 or 65536; the prefix bytes live in row
        (s, 0)'s leading window lanes).
      min_match / reject_step: see ``encode_blocks``.
      mm_rows: optional [S, NB] int32 per-block min_match (adaptive
        mode); overrides ``min_match`` when given.

    Returns (out [S, NB, M] int32 bytes, olen [S, NB]).
    """
    S, NB, W = val32_rows.shape
    NS = W - WINDOW
    if NS != WINDOW:
        raise ValueError("linked kernel uses 64KB blocks")
    if prefix_lens is None:
        prefix_lens = jnp.zeros((S,), jnp.int32)
    M = -(-compress_bound(NS) // 128) * 128
    return _encode_blocks_linked(val32_rows, src_lens.astype(jnp.int32),
                                 prefix_lens.astype(jnp.int32), mm_rows,
                                 NS=NS, M=M, acceleration=int(acceleration),
                                 interpret=on_cpu(),
                                 min_match=int(min_match),
                                 reject_step=int(reject_step),
                                 dynamic_mm=mm_rows is not None)
