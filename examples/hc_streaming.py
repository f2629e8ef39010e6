"""HC compression of chained blocks (examples/HCStreaming_ringBuffer.c
analog): high-compression blocks with a shared dictionary window."""

from lz4_tpu.hc import compress_hc_block
from lz4_tpu.stream import BlockDecompressStream
from lz4_tpu.utils.datagen import gen_buffer


def main():
    data = gen_buffer(80_000, 0.7, 3)
    chunk = 16384
    window = b""
    dec = BlockDecompressStream()
    out = bytearray()
    total = 0
    for i in range(0, len(data), chunk):
        piece = data[i:i + chunk]
        block = compress_hc_block(piece, level=9, dict_=window)
        total += len(block)
        out += dec.decompress_continue(block, len(piece))
        window = (window + piece)[-65536:]
    assert bytes(out) == data
    print(f"HC streaming: {len(data)} -> {total} bytes "
          f"({100 * total / len(data):.1f}%), round-trip OK")


if __name__ == "__main__":
    main()
