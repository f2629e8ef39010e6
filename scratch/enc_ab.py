"""Encode-side A/B: split the sorted-candidate pass from the scan kernel
and measure each on the chip; try un-permute alternatives."""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4t_jax_cache")
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MB = int(os.environ.get("LZ4TPU_AB_MB", "32"))
MM = int(os.environ.get("LZ4TPU_AB_MM", "8"))
RUNS = 5


def timeit(name, fn, mb):
    fn()  # warm
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"{name:42s} {mb / min(ts):7.1f} MB/s-equiv "
          f"({min(ts)*1e3:6.1f} ms)", flush=True)
    return min(ts)


def main():
    os.environ["LZ4TPU_BENCH_CORPUS"] = "pytext"
    os.environ["LZ4TPU_BENCH_MB"] = str(MB)
    import bench
    data = bench.get_corpus()
    mb = len(data) / 1e6
    import jax
    import jax.numpy as jnp
    from jax import lax
    from lz4_tpu.kernels.encode_kernel import (cand_delta_rows,
                                               encode_blocks_linked)
    from lz4_tpu.tpu import linked_val_rows

    nb = -(-len(data) // 65536)
    val, lens = linked_val_rows(data, 1, nb)
    lens_d = jnp.asarray(lens)
    W = val.shape[-1]
    flat = val.reshape(nb, W)

    timeit("full encode_blocks_linked", lambda: np.asarray(
        encode_blocks_linked(val, lens_d, 1, min_match=MM)[1]), mb)

    cd = jax.jit(cand_delta_rows)
    timeit("cand_delta_rows (both sorts)", lambda: np.asarray(
        cd(flat)[0, :4]), mb)

    @jax.jit
    def first_sort(v):
        B, N = v.shape
        pos = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
        b5 = jnp.roll(v, -4, axis=-1) & 0xFF
        k2 = (b5 << 18) | pos
        sk, sk2 = lax.sort((v, k2), dimension=1, num_keys=2)
        return sk, sk2

    timeit("first sort only", lambda: np.asarray(
        first_sort(flat)[0][0, :4]), mb)

    @jax.jit
    def second_sort(v):
        sk, sk2 = first_sort(v)
        sp = sk2 & ((1 << 18) - 1)
        same = jnp.logical_and(sk[:, 1:] == sk[:, :-1],
                               (sk2 >> 18)[:, 1:] == (sk2 >> 18)[:, :-1])
        same = jnp.concatenate(
            [jnp.zeros((v.shape[0], 1), bool), same], axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((v.shape[0], 1), jnp.int32), sp[:, :-1]], axis=1)
        d = jnp.where(same, sp - prev, 0)
        d = jnp.where(d <= 65535, d, 0)
        _, dd = lax.sort((sp, d), dimension=1, num_keys=1)
        return dd

    timeit("both sorts (inline)", lambda: np.asarray(
        second_sort(flat)[0, :4]), mb)

    @jax.jit
    def scatter_unpermute(v):
        sk, sk2 = first_sort(v)
        sp = sk2 & ((1 << 18) - 1)
        same = jnp.logical_and(sk[:, 1:] == sk[:, :-1],
                               (sk2 >> 18)[:, 1:] == (sk2 >> 18)[:, :-1])
        same = jnp.concatenate(
            [jnp.zeros((v.shape[0], 1), bool), same], axis=1)
        prev = jnp.concatenate(
            [jnp.zeros((v.shape[0], 1), jnp.int32), sp[:, :-1]], axis=1)
        d = jnp.where(same, sp - prev, 0)
        d = jnp.where(d <= 65535, d, 0)
        B, N = v.shape
        out = jnp.zeros((B, N), jnp.int32)
        dd = jax.vmap(lambda o, i, x: o.at[i].set(
            x, unique_indices=True, indices_are_sorted=False))(out, sp, d)
        return dd

    try:
        timeit("first sort + scatter un-permute", lambda: np.asarray(
            scatter_unpermute(flat)[0, :4]), mb)
    except Exception as e:
        print("scatter un-permute FAILED:", type(e).__name__, flush=True)

    # sanity: scatter result equals sort result
    try:
        a = np.asarray(second_sort(flat[:2]))
        b = np.asarray(scatter_unpermute(flat[:2]))
        print("scatter == sort un-permute:", bool((a == b).all()),
              flush=True)
    except Exception:
        pass


if __name__ == "__main__":
    main()
