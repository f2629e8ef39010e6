"""Ring-buffer streaming (examples/blockStreaming_ringBuffer.c analog):
variable-size messages flow through a small ring; compressor and
decompressor stay synchronized across wraparounds."""

import io

from lz4_tpu.stream import BlockCompressStream, BlockDecompressStream
from lz4_tpu.utils.datagen import gen_buffer

RING_SIZE = 8192
MSG_MAX = 1024


def main():
    data = gen_buffer(100_000, 0.7, 2)
    ring = bytearray(RING_SIZE)
    enc = BlockCompressStream()
    dec = BlockDecompressStream()
    wire = io.BytesIO()
    out = bytearray()

    pos = off = 0
    while off < len(data):
        n = min(MSG_MAX, len(data) - off)
        if pos + n > RING_SIZE:
            pos = 0                       # wrap
        ring[pos:pos + n] = data[off:off + n]
        block = enc.compress_continue(bytes(ring[pos:pos + n]))
        wire.write(len(block).to_bytes(2, "little"))
        wire.write(block)
        out += dec.decompress_continue(block, n)
        pos += n
        off += n

    assert bytes(out) == data
    print(f"ring-buffer: {len(data)} -> {wire.tell()} bytes, round-trip OK")


if __name__ == "__main__":
    main()
