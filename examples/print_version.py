"""Print the library version (examples/printVersion.c analog)."""

import lz4_tpu


def main():
    print(f"lz4_tpu library version {lz4_tpu.__version__} "
          f"(wire-compatible with LZ4 r132 / frame spec v1.5.1)")


if __name__ == "__main__":
    main()
