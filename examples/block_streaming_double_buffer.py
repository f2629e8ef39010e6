"""Double-buffer streaming (examples/blockStreaming_doubleBuffer.c analog).

Two alternating 64KB input slots feed a chained compress stream; the
decoder mirrors it.  Because lz4_tpu's streams own their window, the
caller may reuse buffers freely (no pointer-aliasing rules to respect).
"""

import io

from lz4_tpu.stream import BlockCompressStream, BlockDecompressStream
from lz4_tpu.utils.datagen import gen_buffer

SLOT = 65536


def compress_file(src: io.BufferedIOBase, dst: io.BufferedIOBase) -> None:
    slots = [bytearray(SLOT), bytearray(SLOT)]
    enc = BlockCompressStream()
    i = 0
    while True:
        chunk = src.read(SLOT)
        if not chunk:
            break
        slots[i % 2][:len(chunk)] = chunk          # reuse alternating slots
        block = enc.compress_continue(bytes(slots[i % 2][:len(chunk)]))
        dst.write(len(block).to_bytes(4, "little"))
        dst.write(block)
        i += 1
    dst.write((0).to_bytes(4, "little"))


def decompress_file(src: io.BufferedIOBase, dst: io.BufferedIOBase) -> None:
    dec = BlockDecompressStream()
    while True:
        size = int.from_bytes(src.read(4), "little")
        if size == 0:
            break
        dst.write(dec.decompress_continue(src.read(size), SLOT))


def main():
    data = gen_buffer(300_000, 0.7, 1)
    comp = io.BytesIO()
    compress_file(io.BytesIO(data), comp)
    out = io.BytesIO()
    comp.seek(0)
    decompress_file(comp, out)
    assert out.getvalue()[:len(data)] == data
    print(f"double-buffer: {len(data)} -> {comp.tell()} bytes, round-trip OK")


if __name__ == "__main__":
    main()
