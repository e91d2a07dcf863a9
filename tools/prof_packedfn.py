#!/usr/bin/env python3
"""Time the FULL packed-ABI device program (densify + unpack + derive +
wavefront [+ deblock]) vs the bare wavefront mega-kernel."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from dryv_tpu.gop_pipeline import (_parse_pictures, alloc_packed,
                                       make_packed_gop_fn, U8_STRIDE,
                                       I16_STRIDE)
    from dryv_tpu.kernels.densify import BLK, round_up
    from dryv_tpu.kernels.transform import LS4_FLAT, LS8_FLAT
    from dryv_tpu.native.entropy import decode_pack_picture_islices

    F = 16
    stream = open(os.path.join(HERE, "benchdata",
                               "bench1080p_gop16.264"), "rb").read()
    pics, sps, pps = _parse_pictures(stream)
    mb_w, mb_h = sps.pic_width_in_mbs, sps.frame_height_in_mbs
    n = mb_w * mb_h
    npad = round_up(n, BLK)
    W, ecap, ovcap = 32, 256, 64
    b = {"bmp": np.zeros((F, npad, 51), np.uint8),
         "cnt": np.zeros((F, npad), np.int32),
         "u8": np.zeros((F, n, U8_STRIDE), np.uint8),
         "vals": np.zeros((F, npad, W), np.int8),
         "exc_idx": np.zeros((F, ecap), np.int32),
         "exc_delta": np.zeros((F, ecap), np.int16),
         "ovf_idx": np.full((F, ovcap), npad, np.int32),
         "ovf_rows": np.zeros((F, ovcap, I16_STRIDE), np.int16)}
    deblocked = any(h.deblocking is None or h.deblocking.disable_idc != 1
                    for _, hs in pics for h in hs)
    print("deblocked:", deblocked)
    for i, (slice_datas, headers) in enumerate(pics[:F]):
        ctl = np.zeros((len(headers), 3), np.int32)
        decode_pack_picture_islices(slice_datas, sps, pps, W, ctl,
                                    b["bmp"][i], b["vals"][i], b["cnt"][i],
                                    b["u8"][i], b["exc_idx"][i],
                                    b["exc_delta"][i], b["ovf_idx"][i],
                                    b["ovf_rows"][i], n_threads=2)
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]
    c0, c1 = pps.chroma_qp_index_offset, pps.second_chroma_qp_offset

    arrs = tuple(jnp.asarray(b[k]) for k in
                 ("bmp", "vals", "exc_idx", "exc_delta", "ovf_idx",
                  "ovf_rows", "u8"))
    for dbl in ([False, True] if deblocked else [False]):
        fn = make_packed_gop_fn(mb_w, mb_h, F, dbl, c0, c1, W, ecap, ovcap)
        r = fn(*arrs, *ls)
        jax.block_until_ready(r)
        for _ in range(3):
            t0 = time.perf_counter()
            K = 4
            for _ in range(K - 1):
                fn(*arrs, *ls)
            r = fn(*arrs, *ls)
            np.asarray(r[0][0, 0, :2])
            dt = (time.perf_counter() - t0) / K / F
            print(f"full packed fn (deblock={dbl}): {dt*1e3:.2f} ms/frame "
                  f"({1/dt:.0f} fps)")


if __name__ == "__main__":
    main()
