"""Shared helpers for the Pallas TPU kernels.

Byte streams cross the kernel boundary as int32 *unpacked bytes* (one byte
per 32-bit lane).  TPU vector lanes are 32-bit; int8 elementwise work is
~30x slower than int32 on v5e (measured), so bytes are widened on-device
with vector shifts once and kept wide throughout the compute path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def on_cpu() -> bool:
    """True when running on the CPU backend (kernels use interpret mode)."""
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("row_bytes",))
def bytes_to_i32_rows(packed: jax.Array, row_bytes: int) -> jax.Array:
    """[B, row_bytes//4] int32 packed words -> [B, row_bytes] int32 bytes.

    Unpack is pure vector work (shifts/masks + minor-dim reshape).
    """
    w = packed.astype(jnp.int32)
    b0 = w & 0xFF
    b1 = (w >> 8) & 0xFF
    b2 = (w >> 16) & 0xFF
    b3 = (w >> 24) & 0xFF
    stacked = jnp.stack([b0, b1, b2, b3], axis=-1)  # [B, W, 4]
    return stacked.reshape(packed.shape[0], row_bytes)


@jax.jit
def i32_rows_to_bytes(rows: jax.Array) -> jax.Array:
    """[B, N] int32 bytes -> [B, N//4] int32 packed words (LE)."""
    B, N = rows.shape
    r = rows.reshape(B, N // 4, 4)
    return (r[..., 0] | (r[..., 1] << 8) | (r[..., 2] << 16)
            | (r[..., 3] << 24))


def np_pack_rows(buffers, row_bytes: int):
    """Host helper: list of byte strings -> ([B, row_bytes//4] int32 words,
    [B] int32 lengths).  Rows are zero padded."""
    import numpy as np
    B = len(buffers)
    row_words = row_bytes // 4
    arr = np.zeros((B, row_bytes), dtype=np.uint8)
    lens = np.zeros((B,), dtype=np.int32)
    for i, b in enumerate(buffers):
        arr[i, :len(b)] = np.frombuffer(bytes(b), dtype=np.uint8)
        lens[i] = len(b)
    words = arr.view(np.uint32).astype(np.int32) if False else \
        arr.reshape(B, row_words, 4).astype(np.uint32)
    packed = (words[..., 0] | (words[..., 1] << 8) | (words[..., 2] << 16)
              | (words[..., 3] << 24)).astype(np.int32)
    return packed, lens


def np_unpack_rows(packed, lens, row_bytes: int):
    """Host helper: inverse of np_pack_rows -> list of byte strings."""
    import numpy as np
    packed = np.asarray(packed).astype(np.uint32)
    B = packed.shape[0]
    out = []
    b0 = (packed & 0xFF).astype(np.uint8)
    b1 = ((packed >> 8) & 0xFF).astype(np.uint8)
    b2 = ((packed >> 16) & 0xFF).astype(np.uint8)
    b3 = ((packed >> 24) & 0xFF).astype(np.uint8)
    allb = np.stack([b0, b1, b2, b3], axis=-1).reshape(B, row_bytes)
    for i in range(B):
        out.append(allb[i, :int(lens[i])].tobytes())
    return out
