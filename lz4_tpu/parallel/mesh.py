"""Device-mesh data parallelism for the block codec.

The parallelism model (SURVEY 2.5): frames and independent blocks are
embarrassingly parallel with variable-length outputs.  Batches of blocks
are sharded over a 1-D mesh with ``shard_map``; each device runs the
Pallas kernels on its shard; compressed lengths travel with the rows so
the host (or an all_gather) can assemble frames in order.  Dictionaries
are replicated (broadcast over ICI by GSPMD).

The reference has no distribution layer at all (its multi-core story is
8 independent processes, README.md:39-45); this module is the TPU-native
replacement.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.decode_kernel import decode_blocks
from ..kernels.encode_kernel import bytes_to_val32_rows, encode_blocks

AXIS = "blocks"


def default_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over available devices (ICI-contiguous order)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def pad_batch(n_rows: int, mesh: Mesh) -> int:
    """Rows must divide evenly over the mesh; callers pad with empty rows."""
    per = mesh.shape[AXIS]
    return -(-n_rows // per) * per


def encode_blocks_sharded(mesh: Mesh, val_rows: jax.Array, lens: jax.Array,
                          acceleration: int = 1):
    """Shard-mapped batch encode: rows split over the mesh axis.

    val_rows [B, NS] (B divisible by mesh size), lens [B].
    Returns (comp_rows [B, M], comp_lens [B]) with the same sharding.
    """
    fn = functools.partial(encode_blocks, acceleration=acceleration)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS)),
        check_vma=False,
    )
    return mapped(val_rows, lens)


def decode_blocks_sharded(mesh: Mesh, comp_rows: jax.Array, lens: jax.Array,
                          out_cap: int,
                          dict_rows: Optional[jax.Array] = None,
                          dict_lens: Optional[jax.Array] = None):
    """Shard-mapped batch decode (dictionaries sharded with their rows)."""
    if dict_rows is None:
        fn = functools.partial(decode_blocks, out_cap=out_cap)
        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS)),
            out_specs=(P(AXIS, None), P(AXIS)),
            check_vma=False,
        )
        return mapped(comp_rows, lens)
    fn = functools.partial(decode_blocks, out_cap=out_cap)
    mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS), P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS)),
        check_vma=False,
    )
    return mapped(comp_rows, lens, dict_rows, dict_lens)


def roundtrip_step(mesh: Mesh, packed_words: jax.Array, lens: jax.Array,
                   block_bytes: int, acceleration: int = 1):
    """One full data-parallel codec step: unpack -> encode -> decode.

    This is the framework's "training step" analog: the whole pipeline
    jitted over the mesh.  Returns (comp_lens, decoded_lens, ok) where ok
    is a replicated scalar (psum of mismatches == 0).
    """
    def step(words, ln):
        val = bytes_to_val32_rows(words, block_bytes)
        comp, clen = encode_blocks(val, ln, acceleration)
        out, olen = decode_blocks(comp, clen, block_bytes)
        bad = jnp.sum(jnp.where(olen == ln, 0, 1))
        bad = jax.lax.psum(bad, AXIS)
        return clen, olen, bad

    mapped = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_vma=False,
    )
    return mapped(packed_words, lens)


def shard_rows(mesh: Mesh, arr: jax.Array) -> jax.Array:
    """Place a [B, ...] array row-sharded over the mesh."""
    ndim = arr.ndim
    spec = P(AXIS, *([None] * (ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
