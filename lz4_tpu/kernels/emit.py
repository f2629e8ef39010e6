"""Shared sequence-emission helpers for the encoder kernels.

The fast, linked/streaming and HC kernels all write the same wire format
(token, length extensions, literal run, LE16 offset) into an SMEM output
row; they differ only in how input bytes are addressed.  ``make_emitters``
closes over the kernel's val32 accessor and output ref and returns the
emitter set, so the byte-level encoding lives in exactly one place.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def make_emitters(val, osmem):
    """Build (copy_lit4, emit_ext, emit_seq, emit_final_fn).

    Args:
      val: function p -> int32 LE32 word at *source* byte p (the caller's
        address space; literal source positions are passed through it).
      osmem: SMEM output ref [1, M+slack] (int32 byte lanes).
    """

    def copy_lit4(dst, src, end):
        """16-wide literal wildcopy (slack lanes absorb the over-copy;
        callers allocate >= 15 lanes of slack on both the source val
        window and the output row).  Wide because the scan's cost is
        while-loop iteration count (docs/SOL.md): one iteration moves
        16 bytes with four val32 loads."""
        off = src - dst

        def lit16(k):
            w0 = val(off + k)
            w1 = val(off + k + 4)
            w2 = val(off + k + 8)
            w3 = val(off + k + 12)
            osmem[0, k] = w0 & 0xFF
            osmem[0, k + 1] = (w0 >> 8) & 0xFF
            osmem[0, k + 2] = (w0 >> 16) & 0xFF
            osmem[0, k + 3] = (w0 >> 24) & 0xFF
            osmem[0, k + 4] = w1 & 0xFF
            osmem[0, k + 5] = (w1 >> 8) & 0xFF
            osmem[0, k + 6] = (w1 >> 16) & 0xFF
            osmem[0, k + 7] = (w1 >> 24) & 0xFF
            osmem[0, k + 8] = w2 & 0xFF
            osmem[0, k + 9] = (w2 >> 8) & 0xFF
            osmem[0, k + 10] = (w2 >> 16) & 0xFF
            osmem[0, k + 11] = (w2 >> 24) & 0xFF
            osmem[0, k + 12] = w3 & 0xFF
            osmem[0, k + 13] = (w3 >> 8) & 0xFF
            osmem[0, k + 14] = (w3 >> 16) & 0xFF
            osmem[0, k + 15] = (w3 >> 24) & 0xFF
            return k + 16

        lax.while_loop(lambda k: k < end, lit16, dst)

    def emit_ext(op, extra):
        """255-run length-extension bytes (value 15 already in token)."""
        def cond(c):
            e, _ = c
            return e >= 255

        def body(c):
            e, op2 = c
            osmem[0, op2] = 255
            return e - 255, op2 + 1

        extra, op = lax.while_loop(cond, body, (extra, op))
        osmem[0, op] = extra
        return op + 1

    def emit_seq(op, anchor, litlen, offset, ml_code):
        """Token + literals + LE16 offset + match-length extension.

        Single straight-line fast path when both lengths fit their
        nibbles (the common case); one branch to the general emitter.
        """
        def fast(op):
            osmem[0, op] = (litlen << 4) | ml_code
            op = op + 1
            lit_end = op + litlen
            copy_lit4(op, anchor, lit_end)
            osmem[0, lit_end] = offset & 0xFF
            osmem[0, lit_end + 1] = offset >> 8
            return lit_end + 2

        def general(op):
            tok_lit = jnp.minimum(litlen, 15)
            tok_ml = jnp.minimum(ml_code, 15)
            osmem[0, op] = (tok_lit << 4) | tok_ml
            op = op + 1
            op = lax.cond(litlen >= 15,
                          lambda o: emit_ext(o, litlen - 15),
                          lambda o: o, op)
            lit_end = op + litlen
            copy_lit4(op, anchor, lit_end)
            op = lit_end
            osmem[0, op] = offset & 0xFF
            osmem[0, op + 1] = offset >> 8
            op = op + 2
            op = lax.cond(ml_code >= 15,
                          lambda o: emit_ext(o, ml_code - 15),
                          lambda o: o, op)
            return op

        return lax.cond(jnp.logical_and(litlen < 15, ml_code < 15),
                        fast, general, op)

    def emit_final(op, anchor, n_end):
        """Trailing literal-only sequence up to n_end."""
        litlen = n_end - anchor
        tok_lit = jnp.minimum(litlen, 15)
        osmem[0, op] = tok_lit << 4
        op = op + 1
        op = lax.cond(litlen >= 15,
                      lambda o: emit_ext(o, litlen - 15),
                      lambda o: o, op)
        lit_end = op + litlen
        copy_lit4(op, anchor, lit_end)
        return lit_end

    return copy_lit4, emit_ext, emit_seq, emit_final
