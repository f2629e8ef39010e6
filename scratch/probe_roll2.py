"""Do two INDEPENDENT dynamic rolls pipeline on this core/Mosaic?
Careful protocol: non-constant vectors, forced np.array fetch, distinct
input per repetition, marginal slope between two large iteration counts.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make(k_rolls, with_scalar=0):
    def kernel(iters_ref, out_ref, vmem, sem):
        it = iters_ref[0]
        lane = lax.broadcasted_iota(jnp.int32, (2, 128), 1)

        def body(i, st):
            s = st[0]
            vecs = list(st[1:])
            x = s
            for _ in range(with_scalar):
                x = (x * 5 + 1) & 0xFFFFF
            for k in range(k_rolls):
                sl = (s + k * 37) & 127
                vecs[k] = pltpu.roll(vecs[k] + 1, sl, axis=1)
            return (x + i, *vecs)

        init = tuple([jnp.int32(1)] + [lane * (7 + 3 * k) + k
                                       for k in range(k_rolls)])
        res = lax.fori_loop(0, it, body, init)
        acc = res[0]
        for k in range(k_rolls):
            acc = acc + res[1 + k][0, 0] + res[1 + k][1, 127]
        out_ref[0, 0] = acc

    @jax.jit
    def run(iters):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,), in_specs=[],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.int32),
                                pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(iters)

    return run


def measure(name, k_rolls, with_scalar=0, n1=300_000, n2=900_000, reps=5):
    run = make(k_rolls, with_scalar)
    np.array(run(jnp.array([n1], jnp.int32)))
    np.array(run(jnp.array([n2], jnp.int32)))
    t1s, t2s = [], []
    for r in range(reps):
        t0 = time.perf_counter()
        np.array(run(jnp.array([n1 + r], jnp.int32)))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.array(run(jnp.array([n2 + r], jnp.int32)))
        t2s.append(time.perf_counter() - t0)
    dt = (np.median(t2s) - np.median(t1s)) / (n2 - n1)
    print(f"{name:36s} {dt * 1e9:8.2f} ns/iter  "
          f"(t1 {np.median(t1s)*1e3:.1f}ms t2 {np.median(t2s)*1e3:.1f}ms)")
    return dt * 1e9


if __name__ == "__main__":
    print(jax.devices())
    r0 = measure("scalar-only loop (16 ops)", 0, 16)
    r1 = measure("1 roll chain", 1)
    r2 = measure("2 roll chains", 2)
    r3 = measure("3 roll chains", 3)
    r1s = measure("1 roll + scalar16", 1, 16)
    r2s = measure("2 rolls + scalar16", 2, 16)
    print(f"\nroll marginal: 1->2 {r2 - r1:.1f} ns, 2->3 {r3 - r2:.1f} ns")
