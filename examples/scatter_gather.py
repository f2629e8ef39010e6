"""Scatter-gather compression (the fork's flagship feature): a list of
4KB iovec buffers compressed into one LZ4F-compatible frame with no
intermediate copies, then decompressed back into a mirrored buffer list
AND by a plain frame decoder."""

from lz4_tpu.frame import decompress_frame
from lz4_tpu.sg import sg_compress, sg_compress_bound, sg_decompress
from lz4_tpu.utils.datagen import gen_buffer


def main():
    data = gen_buffer(65536, 0.7, 5)
    ins = [data[i:i + 4096] for i in range(0, len(data), 4096)]
    caps = [4096 + 128] * 17

    total, consumed, outs = sg_compress(ins, caps)
    assert consumed == len(data)
    print(f"SG: {len(ins)}x4KB -> {total} bytes "
          f"(bound {sg_compress_bound(len(data), len(ins), len(caps))})")

    # 1) mirrored scatter-gather decode
    comp_bufs = []
    rem = total
    for b, c in zip(outs, caps):
        if rem <= 0:
            break
        comp_bufs.append(b[:min(c, rem)])
        rem -= min(c, rem)
    n, decoded = sg_decompress(comp_bufs, [len(b) for b in ins])
    assert b"".join(decoded) == data

    # same decode through the device chain kernel (continuous HBM space,
    # window realigned per block)
    n_d, decoded_d = sg_decompress(comp_bufs, [len(b) for b in ins],
                                   use_device=True)
    assert n_d == n and decoded_d == decoded

    # 2) the same bytes are one ordinary LZ4F frame
    out, _ = decompress_frame(b"".join(comp_bufs))
    assert out == data
    print("SG round-trip + plain-LZ4F decode OK")


if __name__ == "__main__":
    main()
