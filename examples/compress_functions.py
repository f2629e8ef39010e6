"""Tour of the compression entry points (compress_functions.c analog).

The reference example (examples/compress_functions.c) walks the call
stack under LZ4_compress_default — default / fast / extState — and the
two decoders, timing each to show what (little) each layer costs.  Our
stack is shallower and the layers are different by design: the host
oracle is the spec-exact path, the batch/destSize entries are the
device paths, and HC is its own level family.  This example exercises
every public *compression* entry point on the same buffer, checks each
round-trips through `decompress_safe`, and reports sizes.
"""

import time

from lz4_tpu.block import (compress_default, compress_fast,
                           compress_dest_size, decompress_safe,
                           decompress_safe_partial)
from lz4_tpu.hc import compress_hc_block
from lz4_tpu.ops.block_np import decompress_block


def run(name, fn, src):
    t0 = time.perf_counter()
    out = fn(src)
    dt = time.perf_counter() - t0
    print(f"  {name:28s} {len(src):6d} -> {len(out):6d} bytes  "
          f"({1e3 * dt:6.2f} ms)")
    return out


def main():
    src = (b"Far out in the uncharted backwaters of the unfashionable "
           b"end of the western spiral arm of the Galaxy lies a small "
           b"unregarded yellow sun. " * 150)

    print("compression entry points:")
    c_def = run("compress_default", compress_default, src)
    c_fast = run("compress_fast(accel=4)",
                 lambda s: compress_fast(s, acceleration=4), src)
    # destSize: fill exactly half the default output budget, then decode
    # the consumed prefix (LZ4_compress_destSize semantics)
    budget = max(64, len(c_def) // 2)
    c_ds, consumed = compress_dest_size(src, budget)
    print(f"  {'compress_dest_size':28s} consumed {consumed} of "
          f"{len(src)} src bytes into {len(c_ds)} (budget {budget})")
    c_hc = run("compress_hc_block(level=9)",
               lambda s: compress_hc_block(s, level=9), src)

    print("decoders:")
    assert decompress_safe(c_def, len(src)) == src
    assert decompress_safe(c_fast, len(src)) == src
    assert decompress_safe(c_ds, consumed) == src[:consumed]
    assert decompress_block(c_hc, len(src)) == src
    partial = decompress_safe_partial(c_def, 100)
    assert partial == src[:100]
    print("  decompress_safe round-trips every entry point; "
          "decompress_safe_partial(100) OK")
    print(f"  hc vs default size: {len(c_hc)} vs {len(c_def)} "
          f"({100 * len(c_hc) / len(c_def):.1f}%)")


if __name__ == "__main__":
    main()
