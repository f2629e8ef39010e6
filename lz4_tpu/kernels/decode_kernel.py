"""Pallas TPU block decoder.

The LZ4 token stream is inherently sequential *within* a block, so the
decode loop runs on the TPU scalar core over SMEM-resident byte lanes;
throughput comes from the grid dimension (one block per grid step) and,
at the frame layer, from sharding batches of blocks over a device mesh.

Semantics parity: ``LZ4_decompress_safe`` (reference lz4.c:1098-1320 via
the 1360 wrapper) -- bounds-checked literal/match copies, overlap-safe
match copy, dictionary window support (``_usingDict``, lz4.c:1512), error
reporting as negative lengths.

Memory plan per grid step (shapes static; all byte data int32, one byte
per lane):
  comp row  [1, M]  HBM --DMA--> SMEM scratch
  dict row  [1, P]  HBM --DMA--> first P lanes of the output scratch
                    (host right-aligns the dictionary in its row)
  out row   [1, P+N] SMEM scratch; decoded bytes start at lane P
            --DMA--> HBM [1, N]
  olen      whole [B] vector lives in SMEM, one lane written per step
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import on_cpu

ERR_MALFORMED = -1


def _decode_body(comp, out, n, op_start, low_limit, M, plim):
    """Shared sequence loop: decode comp[:n] into out starting at op_start.

    ``low_limit`` is the lowest lane match offsets may reach (dictionary
    start).  Returns (op_end, ok).
    """

    def load(ip):
        return comp[0, jnp.minimum(ip, M - 1)]

    def read_ext(nibble, ip):
        """Length-extension bytes.  Runs zero iterations when nibble < 15
        (initial ``stop`` already true), avoiding a branch region."""
        def cond(c):
            _, _, ok, stop = c
            return jnp.logical_and(ok, jnp.logical_not(stop))

        def body(c):
            extra, ip2, ok, _ = c
            ok2 = ip2 < n
            b = jnp.where(ok2, load(ip2), 0)
            return (extra + b, ip2 + jnp.int32(1),
                    jnp.logical_and(ok, ok2), b != 255)

        extra, ip2, ok, _ = lax.while_loop(
            cond, body, (jnp.int32(0), ip, jnp.bool_(True), nibble != 15))
        return extra, ip2, ok

    def seq_body(state):
        ip, op, status = state
        token = load(ip)
        ip = ip + 1
        litlen = token >> 4

        ext, ip, ok = read_ext(litlen, ip)
        litlen = litlen + ext

        ok = jnp.logical_and(ok, ip + litlen <= n)
        ok = jnp.logical_and(ok, op + litlen <= plim)

        # wildcopy: 4-wide, over-copies <=3 bytes that the next sequence (or
        # the slack lanes past PN) overwrite -- the reference decoder's
        # LZ4_wildCopy idiom (lz4.c:257-270)
        src_base = ip - op
        lit_end = jnp.where(ok, op + litlen, op)

        def lit4(k):
            out[0, k] = comp[0, src_base + k]
            out[0, k + 1] = comp[0, src_base + k + 1]
            out[0, k + 2] = comp[0, src_base + k + 2]
            out[0, k + 3] = comp[0, src_base + k + 3]
            return k + 4
        lax.while_loop(lambda k: k < lit_end, lit4, op)
        ip = ip + litlen
        op = op + litlen

        ended = jnp.logical_and(ok, ip == n)  # last sequence: literals only

        ok_m = jnp.logical_and(ok, ip + 2 <= n)
        offset = jnp.where(ok_m, load(ip) + (load(ip + 1) << 8), 1)
        ip_m = ip + 2
        mlen = token & 15
        ext2, ip_m, ok_e2 = read_ext(mlen, ip_m)
        mlen = mlen + ext2 + 4
        ok_m = jnp.logical_and(ok_m, ok_e2)
        ok_m = jnp.logical_and(ok_m, offset > 0)
        ok_m = jnp.logical_and(ok_m, offset <= op - low_limit)
        ok_m = jnp.logical_and(ok_m, op + mlen <= plim)

        do_match = jnp.logical_and(jnp.logical_not(ended), ok_m)

        m_end = jnp.where(do_match, op + mlen, op)

        # stride-4 wildcopy is overlap-safe only when offset >= 4; short
        # offsets (RLE-style) take the byte loop (cf. lz4.c:1272-1282)
        wide = jnp.logical_and(do_match, offset >= 4)
        m_end4 = jnp.where(wide, m_end, op)

        def m4(k):
            out[0, k] = out[0, k - offset]
            out[0, k + 1] = out[0, k + 1 - offset]
            out[0, k + 2] = out[0, k + 2 - offset]
            out[0, k + 3] = out[0, k + 3 - offset]
            return k + 4
        lax.while_loop(lambda k: k < m_end4, m4, op)

        def m1(k):
            out[0, k] = out[0, k - offset]
            return k + 1
        lax.while_loop(lambda k: k < m_end, m1, jnp.where(wide, m_end, op))

        op = jnp.where(do_match, op + mlen, op)
        ip = jnp.where(do_match, ip_m, ip)

        new_status = jnp.where(ended, 1, jnp.where(do_match, 0, 2))
        return (ip.astype(jnp.int32), op.astype(jnp.int32),
                new_status.astype(jnp.int32))

    def seq_cond(state):
        ip, op, status = state
        return jnp.logical_and(status == 0, ip < n)

    ip, op, status = lax.while_loop(
        seq_cond, seq_body,
        (jnp.int32(0), jnp.int32(op_start), jnp.int32(0)))
    ok_final = jnp.logical_and(status == 1, n > 0)
    return op, ok_final


def _make_decode_kernel(M: int, N: int, P: int):
    PN = P + N

    def kernel(clen_ref, plen_ref, ocap_ref, comp_hbm, dict_hbm, out_hbm,
               olen_ref, csmem, osmem, sem_in, sem_dict, sem_out):
        b = pl.program_id(0)
        n = clen_ref[b]
        plen = plen_ref[b]
        plim = jnp.int32(P) + jnp.minimum(ocap_ref[b], N)

        cp_in = pltpu.make_async_copy(comp_hbm.at[b], csmem.at[:, 0:M],
                                      sem_in)
        cp_in.start()
        if P:
            cp_d = pltpu.make_async_copy(dict_hbm.at[b], osmem.at[:, 0:P],
                                         sem_dict)
            cp_d.start()
            cp_d.wait()
        cp_in.wait()

        op, ok = _decode_body(csmem, osmem, n, jnp.int32(P),
                              jnp.int32(P) - plen, M, plim)
        olen_ref[b] = jnp.where(ok, op - P, ERR_MALFORMED)

        cp_out = pltpu.make_async_copy(osmem.at[:, P:P + N], out_hbm.at[b],
                                       sem_out)
        cp_out.start()
        cp_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("M", "N", "P", "interpret"))
def _decode_blocks(comp, clen, dict_rows, plen, ocap, *, M, N, P, interpret):
    B = comp.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            # +8 slack lanes: the 4-wide wildcopy over-reads/writes <=3
            pltpu.SMEM((1, M + 8), jnp.int32),
            pltpu.SMEM((1, P + N + 8), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out, olen = pl.pallas_call(
        _make_decode_kernel(M, N, P),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, 1, N), jnp.int32),
            jax.ShapeDtypeStruct((B,), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(clen, plen, ocap, comp.reshape(B, 1, M), dict_rows)
    return out.reshape(B, N), olen


def decode_blocks(comp_bytes_i32: jax.Array, comp_lens: jax.Array,
                  out_cap: int,
                  dict_rows: jax.Array | None = None,
                  dict_lens: jax.Array | None = None,
                  out_caps: jax.Array | None = None):
    """Decode a batch of independent (or dict-prefixed) LZ4 blocks.

    Args:
      comp_bytes_i32: [B, M] int32 bytes (zero padded rows).
      comp_lens: [B] int32 lengths.
      out_cap: static decoded capacity per row.
      dict_rows: optional [B, P] int32 dictionary bytes, RIGHT-aligned in
        each row (row i holds its dict in lanes [P-dict_lens[i], P)).
      dict_lens: [B] int32 dictionary lengths.

      out_caps: optional [B] per-row exact output capacity (defaults to
        out_cap); decoding past it reports -1, like LZ4_decompress_safe.

    Returns (out [B, out_cap] int32 bytes, olen [B] int32; -1 = malformed).
    """
    B, M = comp_bytes_i32.shape
    # DMA slices must be 128-lane aligned: pad M / N / P
    if M % 128:
        pad = 128 - M % 128
        comp_bytes_i32 = jnp.pad(comp_bytes_i32, ((0, 0), (0, pad)))
        M += pad
    N = -(-out_cap // 128) * 128
    if dict_rows is None:
        P = 0
        dict_rows = jnp.zeros((B, 1, 1), jnp.int32)
        dict_lens = jnp.zeros((B,), jnp.int32)
    else:
        P = dict_rows.shape[-1]
        if P % 128:  # pad LEFT to preserve right alignment
            pad = 128 - P % 128
            dict_rows = jnp.pad(dict_rows, ((0, 0), (pad, 0)))
            P += pad
        dict_rows = dict_rows.reshape(B, 1, P)
    if out_caps is None:
        ocap = jnp.full((B,), out_cap, jnp.int32)
    else:
        ocap = out_caps.astype(jnp.int32)
    out, olen = _decode_blocks(comp_bytes_i32, comp_lens.astype(jnp.int32),
                               dict_rows, dict_lens.astype(jnp.int32), ocap,
                               M=M, N=N, P=P, interpret=on_cpu())
    return out[:, :out_cap], olen
