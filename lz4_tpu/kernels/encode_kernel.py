"""Pallas TPU block encoder (fast/greedy).

Greedy single-probe hash compression on the TPU scalar core, batched over
blocks via the grid.  Parity: ``LZ4_compress_fast`` semantics (reference
lz4.c:510-800) — 5-byte match index (as the reference's 64-bit build,
lz4.c:462-468), skip acceleration (lz4.c:586-594), backward extension
(lz4.c:635), spec parsing restrictions (last 5 literals, 12-byte match
tail).  Output is a valid LZ4 block stream; byte-identity with the C
encoder is NOT a goal (the spec allows any parse), ratio parity is.

The scalar core is issue-bound, so the loop is organised around op count:

* Input bytes arrive as ``val32`` lanes: val32[p] = LE32 word at byte p
  (computed with vector ops on device).  Hash, 4-byte match verification
  and stride-4 extension are all single loads.
* The match tail (<4 equal bytes) is computed branchlessly from the XOR
  of the mismatching words instead of a byte loop.
* Sequence emission takes a straight-line fast path when both lengths fit
  their token nibbles (the common case); length extensions branch out.
* The hash table lives in SMEM and is shared across grid steps: entries
  are tagged with the block index (entry = (b & 8191) << 18 | pos), so
  stale entries from earlier blocks never validate; the table re-zeroes
  only when the tag space wraps (every 8192 blocks).

Cited reference behaviour: hash insert of every scanned position
(lz4.c:598-612), catch-up backward extension (lz4.c:635), extra insert
near the match end (lz4.c:733-736), acceleration step growth
``searchMatchNb >> LZ4_skipTrigger`` (lz4.c:586-594).
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

HASH_LOG = 13
HASH_SIZE = 1 << HASH_LOG
POS_BITS = 18          # positions < 2^18 (blocks <= 256KB in this kernel)
POS_MASK = (1 << POS_BITS) - 1
SKIP_TRIGGER = 6

MAX_BLOCK = 1 << POS_BITS


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
    """13-bit hash of 5 bytes (our own mix; role of lz4.c:462-468)."""
    x = (v32 ^ (b4 * jnp.int32(-1640531535))) * jnp.int32(-1640531535)
    return (x >> (32 - HASH_LOG)) & (HASH_SIZE - 1)


def _make_encode_kernel(NS: int, M: int, acceleration: int,
                        min_match: int = 4):
    def kernel(slen_ref, val_hbm, out_hbm, olen_ref,
               vsmem, osmem, table, sem_in, sem_out):
        b = pl.program_id(0)
        n = slen_ref[b]
        # tags live in bits [POS_BITS, 31): wrap at 8192 blocks and re-zero
        # the table on wrap so tag collisions with stale entries are
        # impossible (b << POS_BITS would overflow int32 at b >= 8192)
        bt = b & 8191

        @pl.when(bt == 0)
        def _zero_table():
            def z(i, _):
                table[i] = -1
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
            def f4cond(ml):
                return jnp.logical_and(mp + ml + 4 <= matchlimit,
                                       val(q2 + ml) == val(mp + ml))

            ml = lax.while_loop(f4cond, lambda ml: ml + 4, ip + 4 - mp)
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
                # densify the index near the match end (lz4.c:733-736)
                p2 = new_ip - 2
                table[_hash5(val(p2), val(p2 + 4) & 0xFF)] = tag | p2
                return (new_ip, op2, new_ip,
                        jnp.int32(acceleration << SKIP_TRIGGER))

            if min_match <= 4:
                return emit(ip, op, anchor, scnt)
            # min-match knob: short matches are skipped (kept as literals),
            # trading ratio for fewer sequences — the decoder's cost is
            # per-sequence, so this is the encode-side speed lever (like
            # acceleration, reference lz4.c:62, but on the match side).
            # On reject, keep scanning from the next byte: jumping the
            # whole rejected region would double encode speed but costs
            # ~5% ratio (positions inside it anchor longer matches via
            # other candidates), and the ratio gate wins that trade.
            return lax.cond(ml >= min_match,
                            lambda: emit(ip, op, anchor, scnt),
                            lambda: skip(ip, op, anchor, scnt))

        def skip(ip, op, anchor, scnt):
            step = scnt >> SKIP_TRIGGER
            return ip + step, op, anchor, scnt + 1

        def main_body(state):
            ip, op, anchor, scnt = state
            h = _hash5(val(ip), val(ip + 4) & 0xFF)
            e = table[h]
            table[h] = tag | ip
            q = e & POS_MASK
            # logical_and does not short-circuit: clamp q before loading so
            # stale-entry probes never index outside the SMEM row
            qc = jnp.minimum(q, NS - 1)
            good = jnp.logical_and(
                (e >> POS_BITS) == bt,
                jnp.logical_and(ip - q <= 65535, val(qc) == val(ip)))

            return lax.cond(good,
                            lambda: with_match(ip, op, anchor, scnt, q),
                            lambda: skip(ip, op, anchor, scnt))

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
                                    "min_match"))
def _encode_blocks(val_rows, slen, *, NS, M, acceleration, interpret,
                   min_match=4):
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
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, olen = pl.pallas_call(
        _make_encode_kernel(NS, M, acceleration, min_match),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slen, val_rows.reshape(B, 1, NS))
    return out.reshape(B, M), olen


def encode_blocks(val32_rows: jax.Array, src_lens: jax.Array,
                  acceleration: int = 1, min_match: int = 4):
    """Compress a batch of independent blocks.

    Args:
      val32_rows: [B, NS] int32, lane p = LE32 word at byte p (see
        ``bytes_to_val32_rows``); NS must be a multiple of 128.
      src_lens: [B] int32 source lengths (each <= NS, < 2^18).

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
                          interpret=on_cpu(), min_match=int(min_match))


# ---------------------------------------------------------------------------
# linked / streaming mode: LZ4_compress_fast_continue parity on device
# ---------------------------------------------------------------------------

WINDOW = 65536


def _make_encode_linked_kernel(NS: int, M: int, acceleration: int,
                               min_match: int = 4):
    """Chained-block encoder: grid (streams, blocks); the hash table holds
    *global* stream positions and persists across a stream's blocks, so
    matches reach into the previous block exactly like
    ``LZ4_compress_fast_continue`` prefix mode (lz4.c:990-1045).  Each grid
    step's SMEM val window covers [prev block | current block].

    A stream may start with a pre-existing 64 KB dictionary prefix
    (prefix_ref[s] > 0): block 0's window rows hold it and the table is
    seeded with every 3rd prefix position, mirroring LZ4_loadDict
    (lz4.c:944-948).  This is what lets ONE huge linked frame be encoded
    data-parallel across a mesh with full window ratio and zero
    communication: each shard's prefix is simply the preceding 64 KB of
    input, which the host replicates into the shard's rows.
    """
    W = WINDOW + NS    # SMEM byte window per step

    def kernel(slen_ref, prefix_ref, val_hbm, out_hbm, olen_ref,
               vsmem, osmem, table, sem_in, sem_out):
        s = pl.program_id(0)
        k = pl.program_id(1)
        nb = pl.num_programs(1)
        n = slen_ref[s * nb + k]

        @pl.when(k == 0)
        def _zero_table():
            def z(i, _):
                table[i] = -1
                return 0
            lax.fori_loop(0, HASH_SIZE, z, 0)

        cp_in = pltpu.make_async_copy(val_hbm.at[s, k], vsmem.at[:, 0:W],
                                      sem_in)
        cp_in.start()
        cp_in.wait()

        start = k * WINDOW              # global position of block start
        base = start - WINDOW           # global position of SMEM lane 0
        prefix = jnp.where(k == 0, prefix_ref[s], WINDOW)

        def val(p):
            return vsmem[0, p - base]

        def byte(p):
            return vsmem[0, p - base] & 0xFF

        copy_lit4, emit_ext, emit_seq, _emit_final = \
            make_emitters(val, osmem)

        n_end = start + n           # global end of this block
        mflimit = n_end - 12
        matchlimit = n_end - 5
        low = start - prefix        # lowest readable global position

        @pl.when(jnp.logical_and(k == 0, prefix > 0))
        def _seed_prefix():
            # LZ4_loadDict parity: insert every 3rd dictionary position
            def ins(i, _):
                p = low + 3 * i
                table[_hash5(val(p), val(p + 4) & 0xFF)] = p
                return 0
            lax.fori_loop(0, jnp.maximum((prefix - 4) // 3 + 1, 0), ins, 0)


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

            def f4cond(ml):
                return jnp.logical_and(mp + ml + 4 <= matchlimit,
                                       val(q2 + ml) == val(mp + ml))

            ml = lax.while_loop(f4cond, lambda ml: ml + 4, ip + 4 - mp)
            diff = val(q2 + ml) ^ val(mp + ml)
            tail = (jnp.where((diff & 0xFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFF) == 0, 1, 0)
                    + jnp.where((diff & 0xFFFFFF) == 0, 1, 0))
            ml = jnp.minimum(ml + tail, matchlimit - mp)

            def emit(ip, op, anchor, scnt):
                op2 = emit_seq(op, anchor, mp - anchor, ip - q, ml - 4)
                new_ip = mp + ml
                p2 = new_ip - 2
                table[_hash5(val(p2), val(p2 + 4) & 0xFF)] = p2
                return (new_ip, op2, new_ip,
                        jnp.int32(acceleration << SKIP_TRIGGER))

            if min_match <= 4:
                return emit(ip, op, anchor, scnt)
            # min-match knob: see _make_encode_kernel
            return lax.cond(ml >= min_match,
                            lambda: emit(ip, op, anchor, scnt),
                            lambda: skip(ip, op, anchor, scnt))

        def skip(ip, op, anchor, scnt):
            step = scnt >> SKIP_TRIGGER
            return ip + step, op, anchor, scnt + 1

        def main_body(state):
            ip, op, anchor, scnt = state
            h = _hash5(val(ip), val(ip + 4) & 0xFF)
            e = table[h]
            table[h] = ip
            # clamp the candidate into the readable window before loading
            qc = jnp.clip(e, low, n_end - 1)
            good = jnp.logical_and(
                e >= low,
                jnp.logical_and(ip - e <= 65535, val(qc) == val(ip)))

            return lax.cond(good,
                            lambda: with_match(ip, op, anchor, scnt, qc),
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
                                    "min_match"))
def _encode_blocks_linked(val_rows, slen, prefix, *, NS, M, acceleration,
                          interpret, min_match=4):
    S, NB = val_rows.shape[0], val_rows.shape[1]
    W = WINDOW + NS
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, W + 8), jnp.int32),
            pltpu.SMEM((1, M + 8), jnp.int32),
            pltpu.SMEM((HASH_SIZE,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, olen = pl.pallas_call(
        _make_encode_linked_kernel(NS, M, acceleration, min_match),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((S, NB, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((S * NB,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slen.reshape(S * NB), prefix, val_rows.reshape(S, NB, 1, W))
    return out.reshape(S, NB, M), olen.reshape(S, NB)


def encode_blocks_linked(val32_rows: jax.Array, src_lens: jax.Array,
                         acceleration: int = 1,
                         prefix_lens: jax.Array | None = None,
                         min_match: int = 4):
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
                                 prefix_lens.astype(jnp.int32),
                                 NS=NS, M=M, acceleration=int(acceleration),
                                 interpret=on_cpu(),
                                 min_match=int(min_match))
