"""HC kernel chip measurement (VERDICT #5): level-9 throughput + ratio
vs lz4hc.c on the real-text corpus."""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4t_jax_cache")
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MB = int(os.environ.get("LZ4TPU_AB_MB", "8"))
LEVEL = int(os.environ.get("LZ4TPU_AB_LEVEL", "9"))


def main():
    os.environ["LZ4TPU_BENCH_CORPUS"] = "pytext"
    os.environ["LZ4TPU_BENCH_MB"] = str(MB)
    import bench
    data = bench.get_corpus()
    mb = len(data) / 1e6
    import jax.numpy as jnp
    from lz4_tpu.kernels.common import np_pack_rows
    from lz4_tpu.kernels.encode_kernel import bytes_to_val32_rows
    from lz4_tpu.kernels.hc_kernel import encode_blocks_hc

    bs = 65536
    blocks = [data[i:i + bs] for i in range(0, len(data), bs)]
    packed, lens = np_pack_rows(blocks, bs)
    val = bytes_to_val32_rows(jnp.asarray(packed), bs)
    lens_d = jnp.asarray(lens)
    # LZ4T_HC_SUFF accepts a comma list: sweep SUFFICIENT_LEN values in
    # ONE process (one device init; the jit cache is cleared per point)
    from lz4_tpu.kernels import hc_kernel as hk
    suffs = [int(x) for x in
             os.environ.get("LZ4T_HC_SUFF", str(hk.SUFFICIENT_LEN))
             .split(",")]
    for suff in suffs:
        hk.SUFFICIENT_LEN = suff
        hk._encode_blocks_hc.clear_cache()
        out, olen = encode_blocks_hc(val, lens_d, LEVEL)
        olen_np = np.asarray(olen)
        ratio = olen_np.sum() / len(data)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, o2 = encode_blocks_hc(val, lens_d, LEVEL)
            _ = np.asarray(o2)
            ts.append(time.perf_counter() - t0)
        print(f"HC{LEVEL} device (SUFF={suff}): {mb / min(ts):6.1f} MB/s"
              f"  ratio={ratio:.4f} ({mb:.0f}MB corpus)", flush=True)
    sys.path.insert(0, str(REPO / "tests"))
    from tests import oracle
    if oracle.available():
        import ctypes
        lib = oracle.get_lib()
        bound = bs + bs // 255 + 32
        dst = ctypes.create_string_buffer(bound)
        t0 = time.perf_counter()
        csum = 0
        for b in blocks:
            csum += lib.LZ4_compress_HC(b, dst, len(b), bound, LEVEL)
        dt = time.perf_counter() - t0
        print(f"lz4hc.c HC{LEVEL}: {mb / dt:6.1f} MB/s  "
              f"ratio={csum / len(data):.4f}", flush=True)


if __name__ == "__main__":
    main()
