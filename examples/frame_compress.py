"""LZ4F frame file round trip (examples/frameCompress.c analog)."""

import tempfile
from pathlib import Path

from lz4_tpu.frame import FramePreferences, compress_frame, decompress_frame
from lz4_tpu.utils.datagen import gen_buffer


def main():
    data = gen_buffer(200_000, 0.7, 4)
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "file.bin"
        src.write_bytes(data)
        prefs = FramePreferences(block_size_id=4, content_checksum=True,
                                 content_size=len(data))
        frame = compress_frame(src.read_bytes(), prefs)
        dst = Path(td) / "file.bin.lz4"
        dst.write_bytes(frame)
        out, used = decompress_frame(dst.read_bytes())
        assert out == data and used == len(frame)
        print(f"frame: {len(data)} -> {len(frame)} bytes, round-trip OK")


if __name__ == "__main__":
    main()
