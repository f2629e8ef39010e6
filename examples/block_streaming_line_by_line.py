"""Line-granularity streaming: one compressed block per text line, with
the 64 KB window carried across lines so repeated words/phrases match
into earlier lines.

Analog of the reference's blockStreaming_lineByLine.c (211 lines): the
wire format is [LE16 block length | block] per line, and the decoder
mirrors the window.  The compressed stream is ~3-4x smaller than
per-line independent compression precisely because of the carried
window — the whole point of the pattern.
"""

import struct

from lz4_tpu.stream import BlockCompressStream, BlockDecompressStream


def compress_lines(lines):
    enc = BlockCompressStream()
    out = bytearray()
    for ln in lines:
        blk = enc.compress_continue(ln)
        out += struct.pack("<H", len(blk))
        out += blk
    return bytes(out)


def decompress_lines(blob):
    dec = BlockDecompressStream()
    pos = 0
    lines = []
    while pos < len(blob):
        (n,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        lines.append(dec.decompress_continue(blob[pos:pos + n], 1 << 16))
        pos += n
    return lines


def main():
    lines = []
    for i in range(400):
        lines.append(
            (f"2026-08-17T12:{i % 60:02d}:{(7 * i) % 60:02d} host-{i % 8} "
             f"lz4_tpu[worker]: request {i} served in {i % 97} ms "
             f"status=OK route=/api/v1/blocks\n").encode())

    blob = compress_lines(lines)
    raw = sum(map(len, lines))

    # independent per-line compression for contrast (no window carry)
    from lz4_tpu.ops.block_np import compress_block
    indep = sum(len(compress_block(ln)) + 2 for ln in lines)

    back = decompress_lines(blob)
    assert back == lines, "line stream round-trip failed"
    print(f"{len(lines)} lines, {raw} B raw -> {len(blob)} B streamed "
          f"(vs {indep} B line-independent); window carry wins "
          f"{indep / len(blob):.1f}x")


if __name__ == "__main__":
    main()
