"""A/B harness for decode-kernel changes: encodes the bench corpus once,
then times decode_blocks_linked with forced result fetches (the axon
tunnel's block_until_ready does not block — bench.py's protocol).

Env knobs:
  LZ4TPU_AB_MB       corpus MB (default 32)
  LZ4TPU_AB_CORPUS   pytext|datagen (default pytext)
  LZ4TPU_AB_MM / LZ4TPU_AB_RS   encoder min_match / reject_step
  LZ4TPU_DEC_ABLATE  consumed by decode_kernel.py ablation hooks
"""
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/lz4t_jax_cache")

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

MB = int(os.environ.get("LZ4TPU_AB_MB", "32"))
KIND = os.environ.get("LZ4TPU_AB_CORPUS", "pytext")
# LZ4TPU_AB_MM accepts a comma list ("4,6,8"): all points run in ONE
# process (one device init, shared compile cache)
MMS = [int(x) for x in os.environ.get("LZ4TPU_AB_MM", "14").split(",")]
MM = MMS[0]
RS = int(os.environ.get("LZ4TPU_AB_RS", "3"))
BLOCK = 65536
RUNS = 5


def corpus():
    os.environ["LZ4TPU_BENCH_CORPUS"] = KIND
    os.environ["LZ4TPU_BENCH_MB"] = str(MB)
    import importlib
    import bench
    importlib.reload(bench)
    return bench.get_corpus()


def main():
    data = corpus()
    mb = len(data) / 1e6
    print(f"corpus ready: {KIND} {mb:.1f}MB mm={MMS} rs={RS}", flush=True)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lz4t_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    import jax.numpy as jnp
    from lz4_tpu.kernels.decode_kernel import decode_blocks_linked
    from lz4_tpu.kernels.encode_kernel import encode_blocks_linked
    from lz4_tpu.tpu import linked_val_rows, upload_byte_rows, \
        fetch_byte_rows

    nb = -(-len(data) // BLOCK)
    val, lens = linked_val_rows(data, 1, nb)
    print("uploaded; encoding (compile on first use)...", flush=True)
    for MM in MMS:
        run_point(data, mb, nb, val, lens, MM, jnp,
                  decode_blocks_linked, encode_blocks_linked,
                  upload_byte_rows, fetch_byte_rows)


def run_point(data, mb, nb, val, lens, MM, jnp, decode_blocks_linked,
              encode_blocks_linked, upload_byte_rows, fetch_byte_rows):
    comp, clen = encode_blocks_linked(val, jnp.asarray(lens), 1,
                                      min_match=MM, reject_step=RS)
    clen_np = np.asarray(clen[0])
    print("encode done", flush=True)
    print(f"corpus {KIND} {mb:.1f}MB mm={MM} rs={RS} "
          f"ratio={clen_np.sum() / len(data):.4f}", flush=True)
    outb = fetch_byte_rows(comp[0])
    payloads = [outb[k, :clen_np[k]].tobytes() for k in range(nb)]
    dump = os.environ.get("LZ4TPU_AB_DUMP")
    if dump and len(MMS) > 1:
        dump = f"{dump}_mm{MM}.npz"
    if dump:
        # persist the encoded payloads so host-side policy sims
        # (scratch/pair_sim.py) can replay them without TPU time
        np.savez(dump, nb=nb, block=BLOCK, total=len(data),
                 **{f"p{k}": np.frombuffer(p, np.uint8)
                    for k, p in enumerate(payloads)})
        print(f"payloads dumped to {dump}", flush=True)
    M = -(-max(map(len, payloads)) // 128) * 128
    arr = np.zeros((nb, M), np.uint8)
    clens2 = np.zeros((nb,), np.int32)
    for i, c in enumerate(payloads):
        arr[i, :len(c)] = np.frombuffer(c, np.uint8)
        clens2[i] = len(c)
    if os.environ.get("LZ4TPU_AB_SEQSTATS", "0") == "1":
        nseq = fast = mid = 0
        for blk, p in enumerate(payloads):
            opos = 0
            i, pn = 0, len(p)
            while i < pn:
                nseq += 1
                tok = p[i]
                i += 1
                ll = tok >> 4
                lle = 0
                if ll == 15:
                    while True:
                        b = p[i]; i += 1; ll += b; lle += 1
                        if b != 255:
                            break
                i += ll
                if i >= pn:
                    opos += ll
                    break
                off = p[i] | (p[i + 1] << 8)
                i += 2
                ml = tok & 15
                mle = 0
                if ml == 15:
                    while True:
                        b = p[i]; i += 1; ml += b; mle += 1
                        if b != 255:
                            break
                ml += 4
                cpos = opos & 127
                tot = cpos + ll + ml
                base_ok = lle <= 1 and mle <= 1 and off >= ml
                if base_ok and ll <= 12 and tot <= 123:
                    fast += 1
                elif base_ok and tot <= 251:
                    mid += 1
                opos += ll + ml
        print(f"seqs={nseq} fast={fast} ({100*fast/nseq:.1f}%) "
              f"mid={mid} ({100*mid/nseq:.1f}%) "
              f"slow={nseq-fast-mid} ({100*(nseq-fast-mid)/nseq:.1f}%) "
              f"bytes/seq={len(data)/nseq:.1f}", flush=True)

        # pair-rate telemetry: replay the SHIPPED fast-path admission
        # (lane A fast-class: no extension bytes beyond one match ext,
        # offset >= mlen, ll <= 12, row-local tot <= 123; pair lanes the
        # same within the row budget, sources below A's literal end) and
        # count sequences retired per iteration
        from lz4_tpu.kernels.decode_kernel import PAIR_LANES
        iters = multi = retired_in_multi = 0
        losses = {"next_not_fm": 0, "row": 0, "hazard": 0}
        for blk, p in enumerate(payloads):
            seqs = []
            opos = 0
            i, pn = 0, len(p)
            while i < pn:
                tok = p[i]; i += 1
                ll = tok >> 4; lle = 0
                if ll == 15:
                    while True:
                        b = p[i]; i += 1; ll += b; lle += 1
                        if b != 255:
                            break
                i += ll
                if i >= pn:
                    seqs.append((opos, ll, 0, 0, True, lle, 0))
                    break
                off = p[i] | (p[i + 1] << 8); i += 2
                ml = tok & 15; mle = 0
                if ml == 15:
                    while True:
                        b = p[i]; i += 1; ml += b; mle += 1
                        if b != 255:
                            break
                ml += 4
                seqs.append((opos, ll, ml, off, False, lle, mle))
                opos += ll + ml
            k = 0
            while k < len(seqs):
                iters += 1
                opos, ll, ml, off, end, lle, mle = seqs[k]
                R = opos & ~127
                cpos = opos & 127
                fm_a = (not end and lle == 0 and mle <= 1
                        and off >= ml and ll <= 12
                        and cpos + ll + ml <= 123)
                if not fm_a:
                    k += 1
                    continue
                opos1 = opos + ll
                j = k + 1
                got = 0
                while got < PAIR_LANES and j < len(seqs):
                    o2, ll2, ml2, off2, end2, lle2, mle2 = seqs[j]
                    f2 = (not end2 and lle2 == 0 and mle2 <= 1
                          and off2 >= ml2 and ll2 <= 12)
                    if not f2:
                        losses["next_not_fm"] += 1
                        break
                    c2a = o2 - R
                    if c2a + ll2 + ml2 > 123:
                        losses["row"] += 1
                        break
                    if o2 + ll2 - off2 + ml2 > opos1:
                        losses["hazard"] += 1
                        break
                    got += 1
                    j += 1
                if got:
                    multi += 1
                    retired_in_multi += 1 + got
                k = j if got else k + 1
        print(f"pair telemetry (round-5 admission, PAIR_LANES="
              f"{PAIR_LANES}): iters={iters} multi={multi} "
              f"({100*multi/max(iters,1):.1f}% of iterations retire 2+; "
              f"seq/iter={nseq/iters:.3f}; iter reduction "
              f"{100*(nseq-iters)/nseq:.1f}%) losses={losses}",
              flush=True)

    rows, clens2_d = upload_byte_rows(arr), jnp.asarray(clens2)
    _, dlen = decode_blocks_linked(rows, clens2_d, BLOCK)
    dl = np.asarray(dlen)
    ok = (dl == lens[0]).all()
    print("decode lengths ok:" if ok else "DECODE LENGTHS MISMATCH "
          "(expected under ablation):", dl[:4], flush=True)

    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _, d2 = decode_blocks_linked(rows, clens2_d, BLOCK)
        _ = np.asarray(d2)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"decode: {mb / best:8.1f} MB/s   (best {best * 1e3:.1f} ms; "
          f"all {[f'{t * 1e3:.0f}' for t in ts]})", flush=True)

    ets = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _, c3 = encode_blocks_linked(val, jnp.asarray(lens), 1,
                                     min_match=MM, reject_step=RS)
        _ = np.asarray(c3)
        ets.append(time.perf_counter() - t0)
    print(f"encode: {mb / min(ets):8.1f} MB/s", flush=True)


if __name__ == "__main__":
    main()
