"""versionsTest analog: a parameterized cross-decode matrix.

The reference's versionsTest builds every historical tag and cross-decodes
every archive with every version (versionsTest/test-lz4-versions.py:85-142).
With one reference version available, the matrix axes become *format
options*: level x block size x block mode x content-size flag, decoded in
BOTH directions (reference-CLI frames by us, our frames by the reference
CLI), byte-compared.
"""

import io as pyio
import itertools

import pytest

from lz4_tpu.io import IoPrefs, compress_stream, decompress_stream
from lz4_tpu.utils.datagen import gen_buffer

from . import oracle

pytestmark = pytest.mark.skipif(not oracle.available(),
                                reason="no reference library")

DATA = gen_buffer(300_000, 0.97, 1234) + gen_buffer(50_000, 0.6, 77)

LEVELS = ["-1", "-9"]
BSIDS = ["-B4", "-B5", "-B6", "-B7"]
MODES = [(), ("-BD",)]
CSIZE = [(), ("--content-size",)]


def _our_decompress(frame: bytes) -> bytes:
    prefs = IoPrefs(overwrite=True, use_device=False)
    src, dst = pyio.BytesIO(frame), pyio.BytesIO()
    decompress_stream(src, dst, prefs)
    return dst.getvalue()


def _our_compress(level: int, bsid: int, linked: bool,
                  content_size: bool) -> bytes:
    prefs = IoPrefs(level=level, block_size_id=bsid, block_linked=linked,
                    content_size=content_size, overwrite=True,
                    use_device=False)
    src, dst = pyio.BytesIO(DATA), pyio.BytesIO()
    compress_stream(src, dst, prefs,
                    src_size=len(DATA) if content_size else None)
    return dst.getvalue()


@pytest.mark.parametrize(
    "level,bsid,mode,csize",
    list(itertools.product(LEVELS, BSIDS, MODES, CSIZE)))
def test_reference_frames_decode_here(level, bsid, mode, csize):
    frame = oracle.ref_cli_compress(DATA, (level, bsid, *mode, *csize))
    assert _our_decompress(frame) == DATA


@pytest.mark.parametrize(
    "bsid,mode,csize",
    list(itertools.product([4, 5, 6, 7], [False, True], [False, True])))
def test_our_frames_decode_at_reference(bsid, mode, csize):
    frame = _our_compress(1, bsid, mode, csize)
    assert oracle.ref_cli_decompress(frame) == DATA


@pytest.mark.parametrize("bsid,mode", [(4, False), (7, True)])
def test_our_hc_frames_decode_at_reference(bsid, mode):
    # HC rows kept small: the host HC oracle is exact-but-slow, and the
    # level axis is already covered by the reference->us direction above
    small = DATA[:49152]
    prefs = IoPrefs(level=9, block_size_id=bsid, block_linked=mode,
                    overwrite=True, use_device=False)
    src, dst = pyio.BytesIO(small), pyio.BytesIO()
    compress_stream(src, dst, prefs)
    assert oracle.ref_cli_decompress(dst.getvalue()) == small
