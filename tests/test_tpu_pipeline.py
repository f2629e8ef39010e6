"""Device frame pipeline + mesh parallelism (CPU interpret + 8-dev mesh)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lz4_tpu.frame import FramePreferences, decompress_frame
from lz4_tpu.kernels.common import np_pack_rows
from lz4_tpu.parallel.mesh import (
    decode_blocks_sharded,
    default_mesh,
    encode_blocks_sharded,
    roundtrip_step,
    shard_rows,
)
from lz4_tpu.kernels.encode_kernel import bytes_to_val32_rows
from lz4_tpu.tpu import compress_frame_device, decompress_frame_device
from lz4_tpu.utils.datagen import gen_buffer, incompressible

from . import oracle

DATA = gen_buffer(20_000, 0.7, 900)
BS = 2048  # small device blocks keep interpret-mode tests fast


def test_device_frame_roundtrip():
    prefs = FramePreferences(block_size_id=4, content_checksum=True,
                             content_size=len(DATA))
    frame = compress_frame_device(DATA, prefs, block_size=BS)
    out, used = decompress_frame_device(frame)
    assert out == DATA and used == len(frame)


def test_device_frame_decodes_on_host_and_reference():
    frame = compress_frame_device(DATA, block_size=BS)
    out, _ = decompress_frame(frame)  # host decoder
    assert out == DATA
    if oracle.available():
        assert oracle.ref_decompress_frame(frame, len(DATA)) == DATA


def test_device_decodes_host_frames():
    from lz4_tpu.frame import compress_frame
    prefs = FramePreferences(block_size_id=4, block_independent=True)
    frame = compress_frame(DATA, prefs)
    out, _ = decompress_frame_device(frame)
    assert out == DATA


def test_device_frame_stored_blocks():
    noise = incompressible(8192)
    frame = compress_frame_device(noise, block_size=BS)
    out, _ = decompress_frame_device(frame)
    assert out == noise
    assert len(frame) < len(noise) + 128


def test_device_frame_empty():
    frame = compress_frame_device(b"", block_size=BS)
    out, _ = decompress_frame_device(frame)
    assert out == b""


def test_mesh_roundtrip_step():
    mesh = default_mesh(8)
    B = 16
    bufs = [gen_buffer(512, 0.7, i) for i in range(B)]
    packed, lens = np_pack_rows(bufs, 512)
    pw = shard_rows(mesh, jnp.asarray(packed))
    ln = shard_rows(mesh, jnp.asarray(lens))
    clen, olen, bad = jax.jit(
        lambda w, l: roundtrip_step(mesh, w, l, 512))(pw, ln)
    assert int(np.asarray(bad)) == 0
    assert (np.asarray(olen) == np.asarray(lens)).all()


def test_mesh_sharded_encode_decode_match_single_device():
    mesh = default_mesh(8)
    B = 8
    bufs = [gen_buffer(1024, 0.6, 50 + i) for i in range(B)]
    packed, lens = np_pack_rows(bufs, 1024)
    val = bytes_to_val32_rows(jnp.asarray(packed), 1024)
    comp, clen = encode_blocks_sharded(mesh, shard_rows(mesh, val),
                                       shard_rows(mesh, jnp.asarray(lens)))
    out, olen = decode_blocks_sharded(mesh, comp, clen, 1024)
    out, olen = np.asarray(out), np.asarray(olen)
    for i, b in enumerate(bufs):
        assert olen[i] == len(b)
        assert bytes(out[i, :olen[i]].astype(np.uint8)) == b


def test_graft_entry():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    comp, clen = jax.jit(fn)(*args)
    assert comp.shape[0] == args[0].shape[0]
    __graft_entry__.dryrun_multichip(8)
