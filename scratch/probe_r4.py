"""Round-4 hardware probes (v5e): differential per-op costs inside a
Pallas kernel, on the CURRENT jax/Mosaic version (0.9.0).

Lessons encoded here:
  * the vector carry must be NON-constant (iota-derived), or rolls of a
    uniform vector become loop-invariant and the chain is hoisted;
  * time the marginal slope between two large iteration counts — small
    kernels return anomalously fast through the device tunnel;
  * keep the measured op on a genuine loop-carried dependency chain.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_probe(body_fn, rows=8):
    """body_fn(i, s, vec, vmem, lane) -> (s, vec); vec [2,128] int32."""
    def kernel(iters_ref, out_ref, vmem, sem):
        it = iters_ref[0]
        lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vmem[:, :] = jnp.broadcast_to(
            lax.broadcasted_iota(jnp.int32, (rows, 128), 1) * 3 + 1,
            (rows, 128))
        v0 = jnp.concatenate([lane * 7 + 1, lane * 13 + 5], axis=0)

        def body(i, st):
            s, vec = st
            return body_fn(i, s, vec, vmem, lane)

        s, vec = lax.fori_loop(0, it, body, (jnp.int32(1), v0))
        out_ref[0, 0] = s + vec[0, 0] + vec[1, 127]

    @jax.jit
    def run(iters):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(1,),
                in_specs=[],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                scratch_shapes=[
                    pltpu.VMEM((rows, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(iters)

    return run


def time_probe(name, body_fn, rows=8, n1=200_000, n2=600_000, reps=7):
    run = make_probe(body_fn, rows)
    i1 = jnp.array([n1], jnp.int32)
    i2 = jnp.array([n2], jnp.int32)
    run(i1).block_until_ready()
    run(i2).block_until_ready()
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(i1).block_until_ready()
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(i2).block_until_ready()
        t2s.append(time.perf_counter() - t0)
    dt = (np.median(t2s) - np.median(t1s)) / (n2 - n1)
    print(f"{name:48s} {dt * 1e9:8.2f} ns/iter")
    return dt * 1e9


def main():
    print(jax.devices())

    # -- baselines ---------------------------------------------------------
    def base(i, s, vec, vmem, lane):
        return s + i, vec

    def scalar16(i, s, vec, vmem, lane):
        x = s
        for k in range(16):
            x = (x * 5 + 1) & 0xFFFFF
        return x + i, vec

    def scalar32(i, s, vec, vmem, lane):
        x = s
        for k in range(32):
            x = (x * 5 + 1) & 0xFFFFF
        return x + i, vec

    # -- vector-chain ops (vec is loop-carried, non-constant) --------------
    def vadd(i, s, vec, vmem, lane):
        return s + i, vec + 1

    def roll_dyn(i, s, vec, vmem, lane):
        sl = s & 127
        return s + i, pltpu.roll(vec + 1, sl, axis=1)

    def roll_static(i, s, vec, vmem, lane):
        return s + i, pltpu.roll(vec + 1, 37, axis=1)

    def roll_dyn_x2(i, s, vec, vmem, lane):
        sl = s & 127
        a = pltpu.roll(vec + 1, sl, axis=1)
        b = pltpu.roll(vec + 2, (s >> 1) & 127, axis=1)
        return s + i, a + b

    def roll8_dyn(i, s, vec, vmem, lane):
        sl = s & 127
        w8 = jnp.concatenate([vec + 1, vec + 2, vec + 3, vec + 4], axis=0)
        v = pltpu.roll(w8, sl, axis=1)
        return s + i, v[0:2] + v[6:8]

    # -- roll beside scalar chain: co-issue test ----------------------------
    def roll_plus_scalar16(i, s, vec, vmem, lane):
        x = s
        for k in range(16):
            x = (x * 5 + 1) & 0xFFFFF
        sl = s & 127
        return x + i, pltpu.roll(vec + 1, sl, axis=1)

    def roll_plus_scalar32(i, s, vec, vmem, lane):
        x = s
        for k in range(32):
            x = (x * 5 + 1) & 0xFFFFF
        sl = s & 127
        return x + i, pltpu.roll(vec + 1, sl, axis=1)

    # -- memory ops ----------------------------------------------------------
    def dynsub_load2(i, s, vec, vmem, lane):
        f = s & 3
        w = vmem[pl.ds(f, 2), :]
        return s + i, vec + w

    def dynsub_store1(i, s, vec, vmem, lane):
        vmem[pl.ds(s & 3, 1), :] = vec[0:1] + 1
        return s + i, vec + 1

    def window_full(i, s, vec, vmem, lane):
        # decode's window(): dyn 2-row load + roll + cross-row select
        a = s & 255
        f = a >> 7
        sl = a & 127
        w = vmem[pl.ds(f, 2), :]
        rot = pltpu.roll(w, sl, axis=1)
        v = jnp.where(lane < 128 - sl, rot[0:1], rot[1:2])
        return s + i, vec + v

    def fastpath_sim(i, s, vec, vmem, lane):
        # fast_seq's vector slab: store carry row, window load+roll+select,
        # merge, plus ~16 scalar ops running beside it
        x = s
        for k in range(16):
            x = (x * 5 + 1) & 0xFFFFF
        vmem[pl.ds(s & 3, 1), :] = vec[0:1]
        a = s & 255
        f = a >> 7
        sl = a & 127
        w = vmem[pl.ds(f, 2), :]
        rot = pltpu.roll(w, sl, axis=1)
        v = jnp.where(lane < 128 - sl, rot[0:1], rot[1:2])
        c = (s + 3) & 127
        m = jnp.logical_and(lane >= c, lane < c + 17)
        nv = jnp.where(m, v, vec[0:1])
        return x + i, jnp.concatenate([nv, vec[1:2]], axis=0)

    def s2v(i, s, vec, vmem, lane):
        v = vec + 1
        return s + v[0, 0] + i, v

    def smem_loadchain4(i, s, vec, vmem, lane):
        return s + i, vec  # placeholder (SMEM scratch not plumbed here)

    time_probe("baseline (scalar add)", base)
    time_probe("scalar16 chain", scalar16)
    time_probe("scalar32 chain", scalar32)
    time_probe("vec add [2,128]", vadd)
    time_probe("roll [2,128] dynamic", roll_dyn)
    time_probe("roll [2,128] static", roll_static)
    time_probe("roll [2,128] dynamic x2 independent", roll_dyn_x2)
    time_probe("roll [8,128] dynamic", roll8_dyn)
    time_probe("roll + scalar16 beside", roll_plus_scalar16)
    time_probe("roll + scalar32 beside", roll_plus_scalar32)
    time_probe("dyn-sublane load [2,128]", dynsub_load2)
    time_probe("dyn-sublane store [1,128]", dynsub_store1)
    time_probe("window(): load+roll+select", window_full)
    time_probe("fastpath vector slab + scalar16", fastpath_sim)
    time_probe("vector->scalar read (v[0,0])", s2v)


if __name__ == "__main__":
    main()
