"""In-memory block compression round trip (examples/simple_buffer.c analog)."""

from lz4_tpu.ops.block_np import compress_block, decompress_block


def main():
    src = (b"Lorem ipsum dolor sit amet, consectetur adipiscing elit. "
           * 40)
    comp = compress_block(src)
    back = decompress_block(comp, len(src))
    assert back == src
    print(f"compressed {len(src)} -> {len(comp)} bytes "
          f"({100 * len(comp) / len(src):.1f}%), round-trip OK")


if __name__ == "__main__":
    main()
