"""Pallas TPU destSize block encoder: fill a bounded destination, stop at
a token boundary, report consumed source bytes.

Parity: ``LZ4_compress_fast_destSize`` (reference lz4.c:809-830 and the
fork's destSize-merged generic path, lz4.c:539-541 oMax* clamps).  The
contract mirrors the host oracle ``block_np._compress_core(capacity=...)``:

* before emitting a sequence, require room for the sequence AND a minimal
  terminating literal run (``min(5, bytes-after-match)`` literals), so a
  valid last-literals tail always fits afterwards (lz4.c destSize semantics
  via the oMaxLit/oMaxMatch budget, expressed as a pre-check like the
  host's);
* on stop (or natural end), emit the largest final literal run that fits,
  and report ``consumed = anchor + final_literals``.

Like the host oracle, a match is never *shortened* to fill the tail —
compression stops at the previous token boundary instead (output is a hair
less packed than the C encoder's in the stop case, but every output byte
is a valid stream and the consumed contract holds).

The kernel is the batch (independent blocks) variant; each row has its own
capacity.  An optional dictionary prefix can be packed before the source
in the same val32 row (``window_lens``), giving
``LZ4_compress_fast_destSize_continue`` prefix-mode semantics
(lz4.c:990-1045) without a separate dict buffer.
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
from .encode_kernel import HASH_SIZE, POS_BITS, POS_MASK, SKIP_TRIGGER, \
    _hash5
from ..spec import compress_bound


def _div255(y):
    """Exact y // 255 for 0 <= y < 2**19 (verified magic)."""
    q0 = (y * 32897) >> 23
    r = y - q0 * 255
    return q0 - jnp.where(r < 0, 1, 0)


def _ext_bytes(x):
    """Length-extension byte count for a nibble value x (0 when < 15)."""
    return jnp.where(x < 15, 0, 1 + _div255(x - 15))


def _seq_size(litlen, mlc):
    """Encoded size of one sequence (block_np._seq_size parity)."""
    return 1 + litlen + 2 + _ext_bytes(litlen) + _ext_bytes(mlc)


def _final_run_size(litlen):
    return 1 + litlen + _ext_bytes(litlen)


def _max_final_literals(room, avail):
    """Largest L <= avail with _final_run_size(L) <= room (-1 if none).

    Closed-form guess minus a tiny fix-up loop (<= 2 iterations: the
    extension-byte count changes by at most 1 per correction)."""
    best14 = jnp.minimum(jnp.minimum(room - 1, 14), avail)
    # L >= 15 branch: L + 2 + (L-15)//255 <= room
    guess = jnp.minimum(avail, room - 2 - _div255(jnp.maximum(room - 17, 0)))

    def fix(g):
        return jnp.where(
            jnp.logical_and(g >= 15, _final_run_size(g) > room), g - 1, g)

    guess = fix(fix(guess))
    big_ok = jnp.logical_and(guess >= 15, _final_run_size(guess) <= room)
    best = jnp.where(big_ok, jnp.maximum(guess, best14), best14)
    return jnp.where(room < 1, -1, best)


def _make_destsize_kernel(NS: int, M: int, acceleration: int,
                          min_match: int = 4):
    def kernel(slen_ref, cap_ref, wlen_ref, val_hbm, out_hbm, olen_ref,
               consumed_ref, vsmem, osmem, table, sem_in, sem_out):
        b = pl.program_id(0)
        wlen = wlen_ref[b]          # dictionary prefix bytes in the row
        n = wlen + slen_ref[b]      # row-relative end of source
        cap = jnp.minimum(cap_ref[b], M)
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

        start = wlen                # first source byte (after the prefix)
        mflimit = n - 12
        matchlimit = n - 5

        @pl.when(wlen > 0)
        def _seed_prefix():
            # LZ4_loadDict parity: every 3rd prefix position (lz4.c:944-948)
            def ins(i, _):
                p = 3 * i
                table[_hash5(val(p), val(p + 4) & 0xFF)] = tag | p
                return 0
            lax.fori_loop(0, jnp.maximum((wlen - 4) // 3 + 1, 0), ins, 0)

        STOP = jnp.int32(NS + 16)   # ip sentinel: capacity reached

        def with_match(ip, op, anchor, scnt, q):
            def bcond(c):
                mp, qq = c
                return jnp.logical_and(
                    jnp.logical_and(mp > anchor, qq > 0),
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

            litlen = mp - anchor
            # capacity pre-check (host oracle block_np.py:195-200 parity):
            # the sequence plus a minimal final run must fit
            tail_lits = jnp.minimum(5, n - (mp + ml))
            need = _seq_size(litlen, ml - 4) + _final_run_size(tail_lits)

            def emit(ip, op, anchor, scnt):
                op2 = emit_seq(op, anchor, litlen, ip - q, ml - 4)
                new_ip = mp + ml
                p2 = new_ip - 2
                table[_hash5(val(p2), val(p2 + 4) & 0xFF)] = tag | p2
                return (new_ip, op2, new_ip,
                        jnp.int32(acceleration << SKIP_TRIGGER))

            def stop(ip, op, anchor, scnt):
                return STOP, op, anchor, scnt

            ok = op + need <= cap
            if min_match > 4:
                ok = jnp.logical_and(ok, ml >= min_match)
                # a too-short match is a skip, not a stop
                return lax.cond(
                    ml >= min_match,
                    lambda: lax.cond(op + need <= cap,
                                     lambda: emit(ip, op, anchor, scnt),
                                     lambda: stop(ip, op, anchor, scnt)),
                    lambda: skip(ip, op, anchor, scnt))
            return lax.cond(ok,
                            lambda: emit(ip, op, anchor, scnt),
                            lambda: stop(ip, op, anchor, scnt))

        def skip(ip, op, anchor, scnt):
            step = scnt >> SKIP_TRIGGER
            return ip + step, op, anchor, scnt + 1

        def main_body(state):
            ip, op, anchor, scnt = state
            h = _hash5(val(ip), val(ip + 4) & 0xFF)
            e = table[h]
            table[h] = tag | ip
            q = e & POS_MASK
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

        first = start + jnp.where(wlen > 0, 0, 1).astype(jnp.int32)
        init = (first, jnp.int32(0), jnp.int32(start),
                jnp.int32(acceleration << SKIP_TRIGGER))
        run = n - start >= 13
        ip, op, anchor, _ = lax.while_loop(
            lambda s: jnp.logical_and(run, main_cond(s)), main_body, init)

        # capacity-clamped final literal run (block_np.py:211-226 parity)
        avail = n - anchor
        lit = _max_final_literals(cap - op, avail)
        ok = lit >= 0

        @pl.when(ok)
        def _emit_tail():
            litlen = lit
            tok_lit = jnp.minimum(litlen, 15)
            osmem[0, op] = tok_lit << 4
            op1 = op + 1
            op2 = lax.cond(litlen >= 15,
                           lambda o: emit_ext(o, litlen - 15),
                           lambda o: o, op1)
            lit_end = op2 + litlen
            copy_lit4(op2, anchor, lit_end)
            olen_ref[b] = lit_end
            consumed_ref[b] = anchor - start + litlen

        @pl.when(jnp.logical_not(ok))
        def _none():
            olen_ref[b] = 0
            consumed_ref[b] = 0

        cp_out = pltpu.make_async_copy(osmem.at[:, 0:M], out_hbm.at[b],
                                       sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("NS", "M", "acceleration", "interpret",
                                    "min_match"))
def _encode_dest_size(val_rows, slen, caps, wlen, *, NS, M, acceleration,
                      interpret, min_match=4):
    B = val_rows.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((1, NS + 24), jnp.int32),
            pltpu.SMEM((1, M + 24), jnp.int32),
            pltpu.SMEM((HASH_SIZE,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, olen, consumed = pl.pallas_call(
        _make_destsize_kernel(NS, M, acceleration, min_match),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(slen, caps, wlen, val_rows.reshape(B, 1, NS))
    return out.reshape(B, M), olen, consumed


def encode_blocks_dest_size(val32_rows: jax.Array, src_lens: jax.Array,
                            capacities: jax.Array,
                            acceleration: int = 1,
                            window_lens: jax.Array | None = None,
                            min_match: int = 4):
    """destSize-compress a batch of blocks (LZ4_compress_fast_destSize).

    Args:
      val32_rows: [B, NS] int32 val32 lanes covering ``[prefix | source]``
        per row (prefix optional, see ``window_lens``).
      src_lens: [B] source lengths.
      capacities: [B] destination byte budgets.
      window_lens: optional [B] dictionary-prefix lengths; row i's source
        starts at lane window_lens[i] and may match into the prefix
        (prefix-mode LZ4_compress_fast_destSize_continue, lz4.c:990-1045).

    Returns (out [B, M] int32 bytes, olen [B], consumed [B]): each row is a
    complete valid LZ4 block of olen bytes covering ``consumed`` source
    bytes (0/0 when even one literal cannot fit).
    """
    B, NS = val32_rows.shape
    if NS % 128:
        raise ValueError("NS must be a multiple of 128")
    if NS > (1 << POS_BITS):
        raise ValueError("block too large for kernel")
    if window_lens is None:
        window_lens = jnp.zeros((B,), jnp.int32)
    M = -(-compress_bound(NS) // 128) * 128
    return _encode_dest_size(val32_rows, src_lens.astype(jnp.int32),
                             capacities.astype(jnp.int32),
                             window_lens.astype(jnp.int32),
                             NS=NS, M=M, acceleration=int(acceleration),
                             interpret=on_cpu(), min_match=int(min_match))


# ---------------------------------------------------------------------------
# scatter-gather chain encoder: the LZ4_compress_fast_sg_extState walk
# (reference lz4sg.c:385-534) run ON DEVICE, one block per grid step with
# persistent walk state + hash table in SMEM.
# ---------------------------------------------------------------------------

SG_HEADER = 15          # fixed SG frame header (lz4sg.c:115)
BH = 4                  # LE32 block header
CHAIN_BLOCK = 65536     # per-step source cap (kernel SMEM window unit)
LEAD = 65536            # zero lead bytes before global position 0


def _make_sg_chain_kernel(M: int, acceleration: int, min_match: int):
    W = 2 * CHAIN_BLOCK          # SMEM val window bytes per step
    ROWS = W // 128 + 2

    def kernel(in_ends_ref, caps_ref, misc_ref, vals_hbm, out_hbm,
               blen_ref, consumed_ref, isz_ref, osz_ref,
               vsmem, osmem, table, state, sem_in, sem_out):
        t = pl.program_id(0)
        n_in = in_ends_ref.shape[0] - 1
        n_out = caps_ref.shape[0]
        content_size = misc_ref[0]
        max_dest = misc_ref[1]

        @pl.when(t == 0)
        def _init():
            def z(i, _):
                table[i] = -1
                return 0
            lax.fori_loop(0, HASH_SIZE, z, 0)
            state[0] = 0           # ipos (global input byte consumed)
            state[1] = 0           # ibuf
            state[2] = 0           # oidx
            state[3] = SG_HEADER   # opos within current out buffer
            state[4] = SG_HEADER   # ototal
            state[5] = 0           # done

        ipos, ibuf = state[0], state[1]
        oidx, opos, ototal = state[2], state[3], state[4]
        live = jnp.logical_and(
            state[5] == 0,
            jnp.logical_and(ipos < content_size,
                            ototal + BH < max_dest))
        blen_ref[t] = -1           # sentinel: no block this step
        consumed_ref[t] = 0
        isz_ref[t] = 0
        osz_ref[t] = 0

        @pl.when(jnp.logical_not(live))
        def _skip():
            state[5] = 1

        @pl.when(live)
        def _step():
            # reserve the block header (walk parity: sg.py/lz4sg.c:432-436)
            opos_h = opos + BH
            ototal_h = ototal + BH
            irem = content_size - ipos
            i_size = jnp.minimum(in_ends_ref[ibuf + 1] - ipos, irem)
            i_take = jnp.minimum(i_size, CHAIN_BLOCK)
            o_size = jnp.minimum(caps_ref[oidx] - opos_h,
                                 max_dest - ototal_h)
            cap = jnp.minimum(o_size, M)

            # window DMA: global bytes [ipos-64K, ipos+64K) live at HBM
            # rows (g + LEAD) >> 7 (the zero lead absorbs negatives)
            fstart = ipos >> 7
            cp_in = pltpu.make_async_copy(
                vals_hbm.at[pl.ds(fstart, ROWS), :],
                vsmem.at[pl.ds(0, ROWS), :], sem_in)
            cp_in.start()
            cp_in.wait()
            base = (fstart << 7) - LEAD   # global byte of SMEM lane 0

            def val(p):
                return vsmem[(p - base) >> 7, (p - base) & 127]

            def byte(p):
                return val(p) & 0xFF

            copy_lit4, emit_ext, emit_seq, _emit_final = \
                make_emitters(val, osmem)

            start = ipos
            n_end = ipos + i_take
            mflimit = n_end - 12
            matchlimit = n_end - 5
            # window floor: the reference SG *decoder* keeps only the
            # current prefix + ONE external dict segment (the previous
            # buffer, lz4.h:271-286 ring rules; lz4sg.c decode 630-638),
            # so matches must not reach beyond the previous input buffer.
            prev_start = jnp.where(ibuf > 0,
                                   in_ends_ref[jnp.maximum(ibuf - 1, 0)], 0)
            low = jnp.maximum(jnp.maximum(ipos - 65535, prev_start), 0)

            STOP = n_end + CHAIN_BLOCK  # ip sentinel

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

                litlen = mp - anchor
                tail_lits = jnp.minimum(5, n_end - (mp + ml))
                need = _seq_size(litlen, ml - 4) + _final_run_size(tail_lits)

                def emit(ip, op, anchor, scnt):
                    op2 = emit_seq(op, anchor, litlen, ip - q, ml - 4)
                    new_ip = mp + ml
                    p2 = new_ip - 2
                    table[_hash5(val(p2), val(p2 + 4) & 0xFF)] = p2
                    return (new_ip, op2, new_ip,
                            jnp.int32(acceleration << SKIP_TRIGGER))

                def stop(ip, op, anchor, scnt):
                    return STOP, op, anchor, scnt

                def fits(ip, op, anchor, scnt):
                    return lax.cond(op + need <= cap,
                                    lambda: emit(ip, op, anchor, scnt),
                                    lambda: stop(ip, op, anchor, scnt))

                if min_match <= 4:
                    return fits(ip, op, anchor, scnt)
                return lax.cond(ml >= min_match,
                                lambda: fits(ip, op, anchor, scnt),
                                lambda: skip_pos(ip, op, anchor, scnt))

            def skip_pos(ip, op, anchor, scnt):
                step = scnt >> SKIP_TRIGGER
                return ip + step, op, anchor, scnt + 1

            def main_body(st):
                ip, op, anchor, scnt = st
                h = _hash5(val(ip), val(ip + 4) & 0xFF)
                e = table[h]
                table[h] = ip
                qc = jnp.clip(e, low, n_end - 1)
                # e < ip is NOT implied here: a capacity-stopped step has
                # already inserted positions at and beyond this ip (its
                # scan frontier passed the consumed point), so a probe can
                # hit its own position (offset 0) or a future one
                good = jnp.logical_and(
                    jnp.logical_and(e >= low, e < ip),
                    jnp.logical_and(ip - e <= 65535, val(qc) == val(ip)))
                return lax.cond(good,
                                lambda: with_match(ip, op, anchor, scnt, qc),
                                lambda: skip_pos(ip, op, anchor, scnt))

            # a step with any window may match from its first byte; only
            # the very start of the stream must skip position 0
            first = start + jnp.where(start > 0, 0, 1).astype(jnp.int32)
            init = (first, jnp.int32(0), start.astype(jnp.int32),
                    jnp.int32(acceleration << SKIP_TRIGGER))
            run = i_take >= 13
            ip, op, anchor, _ = lax.while_loop(
                lambda st2: jnp.logical_and(run, st2[0] <= mflimit),
                main_body, init)

            avail = n_end - anchor
            lit = _max_final_literals(cap - op, avail)
            ok = lit >= 0
            litc = jnp.maximum(lit, 0)
            tok_lit = jnp.minimum(litc, 15)
            osmem[0, jnp.where(ok, op, M)] = tok_lit << 4
            op1 = op + 1
            op2 = lax.cond(jnp.logical_and(ok, litc >= 15),
                           lambda o: emit_ext(o, litc - 15),
                           lambda o: o, op1)
            lit_end = op2 + jnp.where(ok, litc, 0)
            copy_lit4(op2, anchor, lit_end)
            o_written = jnp.where(ok, lit_end, 0)
            consumed = jnp.where(ok, anchor - start + litc, 0)

            blen_ref[t] = o_written
            consumed_ref[t] = consumed
            isz_ref[t] = i_size
            osz_ref[t] = o_size

            cp_out = pltpu.make_async_copy(osmem.at[:, 0:M], out_hbm.at[t],
                                           sem_out)
            cp_out.start()
            cp_out.wait()

            # ---- walk state update (parity: sg.py sg_compress 203-247 /
            # lz4sg.c:483-519) --------------------------------------------
            no_progress = jnp.logical_or(consumed == 0, o_written == 0)
            ipos2 = ipos + consumed
            in_done = consumed == i_size      # full buffer piece consumed
            ibuf2 = jnp.where(in_done, ibuf + 1, ibuf)
            input_exhausted = jnp.logical_and(in_done, ibuf2 >= n_in)

            # output advance
            adv_out = o_written + 1 + BH >= o_size
            cur_rem = o_size - o_written
            oidx2 = jnp.where(adv_out, oidx + 1, oidx)
            out_exhausted = jnp.logical_and(adv_out, oidx2 >= n_out)
            zero_pad = jnp.logical_and(
                jnp.logical_and(adv_out, o_written != o_size),
                ototal_h + o_written + BH < max_dest)
            opos3 = jnp.where(
                adv_out,
                jnp.where(zero_pad, 1 + BH - cur_rem, 0),
                opos_h + o_written)
            ototal3 = (ototal_h + o_written
                       + jnp.where(zero_pad, 1 + BH, 0))

            state[0] = ipos2
            state[1] = jnp.minimum(ibuf2, n_in)
            state[2] = jnp.minimum(oidx2, n_out - 1)
            state[3] = opos3
            state[4] = ototal3
            state[5] = jnp.where(
                jnp.logical_or(
                    no_progress,
                    jnp.logical_or(input_exhausted, out_exhausted)),
                1, 0)
            # (when the input is exhausted mid-step the host's own walk —
            # which re-derives all positions from the per-step records —
            # handles the endmark placement; the kernel's ototal/opos are
            # only read again if the walk continues, which it doesn't)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("T", "M", "acceleration", "interpret",
                                    "min_match"))
def _sg_encode_chain(vals_rows, in_ends, caps, misc, *, T, M, acceleration,
                     interpret, min_match):
    NI = in_ends.shape[0]
    NO = caps.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((2 * CHAIN_BLOCK // 128 + 2, 128), jnp.int32),
            pltpu.SMEM((1, M + 24), jnp.int32),
            pltpu.SMEM((HASH_SIZE,), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, blen, consumed, isz, osz = pl.pallas_call(
        _make_sg_chain_kernel(M, acceleration, min_match),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((T, 1, M), jnp.int32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
            jax.ShapeDtypeStruct((T,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(in_ends, caps, misc, vals_rows)
    return out.reshape(T, M), blen, consumed, isz, osz


def sg_chain_statics(total: int, n_in: int, n_out: int):
    """Static kernel shapes (grid steps T, block slot width M) for one SG
    chain walk — exposed so mesh callers can invoke _sg_encode_chain under
    trace (shard_map lifts closure constants, so the wrapper's int() on
    in_ends would fail there)."""
    T = n_in + n_out + total // CHAIN_BLOCK + 4
    M = -(-compress_bound(CHAIN_BLOCK) // 128) * 128
    return T, M


def sg_encode_chain(vals_rows: jax.Array, in_ends, out_caps,
                    max_dest: int, acceleration: int = 1,
                    min_match: int = 4):
    """Run the SG compression walk on device.

    Args:
      vals_rows: [(LEAD + total + W + pad)/128, 128] int32 val32 lanes of
        ``zeros(64KB) | concat(in_bufs) | zeros(tail)`` (val32[g] = LE32 at
        continuous-input byte g - 64KB).
      in_ends: cumulative input-buffer end offsets, [n_in + 1] (in_ends[0]
        == 0).
      out_caps: [n_out] output buffer capacities.
      max_dest: total output budget.

    Returns (blocks [T, M] int32 bytes, blen [T], consumed [T], isz [T],
    osz [T]); steps with blen < 0 are no-ops past the end of the walk.
    """
    in_ends = jnp.asarray(in_ends, jnp.int32)
    caps = jnp.asarray(out_caps, jnp.int32)
    total = int(in_ends[-1])
    T, M = sg_chain_statics(total, in_ends.shape[0] - 1, caps.shape[0])
    misc = jnp.asarray([total, int(max_dest)], jnp.int32)
    return _sg_encode_chain(vals_rows, in_ends, caps, misc, T=T, M=M,
                            acceleration=int(acceleration),
                            interpret=on_cpu(), min_match=int(min_match))
