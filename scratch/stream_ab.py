"""Stream-kernel A/B: decode a reference-CLI-encoded -B7 (4MB-block)
file with decode_stream_raw on the chip, timed kernel-only (VERDICT #4:
this is the layout typical `.lz4` files have)."""
import os
import struct
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4t_jax_cache")
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MB = int(os.environ.get("LZ4TPU_AB_MB", "32"))
BSID = os.environ.get("LZ4TPU_AB_BSID", "7")
RUNS = 5


def main():
    os.environ["LZ4TPU_BENCH_CORPUS"] = "pytext"
    os.environ["LZ4TPU_BENCH_MB"] = str(MB)
    import bench
    data = bench.get_corpus()
    raw = Path("/tmp/stream_ab.bin")
    raw.write_bytes(data)
    lz4 = Path("/tmp/stream_ab.bin.lz4")
    subprocess.run(["/tmp/refbuild/programs/lz4", f"-B{BSID}", "-z", "-f",
                    str(raw), str(lz4)], check=True, capture_output=True)
    frame = lz4.read_bytes()
    from lz4_tpu import spec
    from lz4_tpu.frame import decode_frame_header
    info = decode_frame_header(frame)
    pos = info.header_size
    bstart, clen, stored = [], [], []
    while True:
        size = struct.unpack_from("<I", frame, pos)[0]
        pos += 4
        if size == 0:
            break
        st = 1 if size & spec.UNCOMPRESSED_BIT else 0
        size &= ~spec.UNCOMPRESSED_BIT
        bstart.append(pos)
        clen.append(size)
        stored.append(st)
        pos += size
    print(f"ref -B{BSID} frame: {len(frame)} bytes, {len(bstart)} blocks, "
          f"linked={not info.block_independent}", flush=True)

    from lz4_tpu.kernels.decode_kernel import decode_stream_raw
    from lz4_tpu.tpu import fetch_byte_rows
    flat = np.frombuffer(frame, np.uint8)
    bs = info.block_size
    cap = len(data)

    out, olen = decode_stream_raw(flat, bstart, clen, stored, bs, cap,
                                  linked=not info.block_independent,
                                  out_caps=None)
    ol = np.asarray(olen)
    assert (ol >= 0).all(), ol
    flat_out = fetch_byte_rows(out).reshape(-1)
    assert bytes(flat_out[:len(data)]) == data, "MISMATCH"
    print("roundtrip vs reference frame OK", flush=True)

    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _, ol2 = decode_stream_raw(flat, bstart, clen, stored, bs, cap,
                                   linked=not info.block_independent)
        _ = np.asarray(ol2)
        ts.append(time.perf_counter() - t0)
    mb = len(data) / 1e6
    print(f"stream decode (incl. host prep+upload): {mb / min(ts):7.1f} "
          f"MB/s  (all {[f'{t*1e3:.0f}' for t in ts]})", flush=True)

    # kernel-only: pre-uploaded vals (mirror _decode_stream's prep)
    from lz4_tpu.kernels.decode_kernel import _decode_stream, PAGE, \
        PAGE_ROWS
    from lz4_tpu.kernels.common import words_to_val32_2d
    import jax.numpy as jnp

    def _pow2(x, lo):
        n_ = lo
        while n_ < x:
            n_ *= 2
        return n_

    total = _pow2(len(flat) + 2 * PAGE + 256, 4 * PAGE)
    arr = np.zeros((total,), np.uint8)
    arr[:len(flat)] = flat
    packed = jnp.asarray(arr.view("<i4").reshape(total // 128, 32))
    vals = words_to_val32_2d(packed)
    B = len(bstart)
    BP = _pow2(max(B, 4), 4)
    bst = np.zeros((BP,), np.int32); bst[:B] = bstart
    cl = np.zeros((BP,), np.int32); cl[:B] = clen
    stp = np.ones((BP,), np.int32); stp[:B] = stored
    ocaps = np.zeros((BP,), np.int32); ocaps[:B] = bs
    OR = -(-B * bs // 128) + PAGE_ROWS + 2
    OR = _pow2(-(-OR // PAGE_ROWS) * PAGE_ROWS, 4 * PAGE_ROWS)
    args = (vals, jnp.asarray(bst), jnp.asarray(cl), jnp.asarray(ocaps),
            jnp.asarray(stp))
    kw = dict(TR=total // 128, OR=OR,
              linked=not info.block_independent, interpret=False)
    _, ol3 = _decode_stream(*args, **kw)
    _ = np.asarray(ol3)
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _, ol3 = _decode_stream(*args, **kw)
        _ = np.asarray(ol3)
        ts.append(time.perf_counter() - t0)
    print(f"stream decode (kernel-only, warm device bufs): "
          f"{mb / min(ts):7.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
