#!/usr/bin/env python3
"""Measure how much concurrent device dispatch/execution (axon tunnel)
slows the host entropy stage."""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    from dryv_tpu.gop_pipeline import (_parse_pictures, make_packed_gop_fn,
                                       U8_STRIDE, I16_STRIDE)
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
    sdatas = []
    for i, (slice_datas, headers) in enumerate(pics[:F]):
        ctl = np.zeros((len(headers), 3), np.int32)
        sdatas.append((slice_datas, ctl))
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
    fn = make_packed_gop_fn(mb_w, mb_h, F, False, c0, c1, W, ecap, ovcap)
    jax.block_until_ready(fn(*arrs, *ls))

    def entropy_once(i):
        sd, ctl = sdatas[i % F]
        decode_pack_picture_islices(sd, sps, pps, W, ctl,
                                    b["bmp"][i % F], b["vals"][i % F],
                                    b["cnt"][i % F], b["u8"][i % F],
                                    b["exc_idx"][i % F],
                                    b["exc_delta"][i % F],
                                    b["ovf_idx"][i % F],
                                    b["ovf_rows"][i % F], n_threads=2)

    # solo
    t0 = time.perf_counter()
    for i in range(10):
        entropy_once(i)
    print(f"entropy solo: {(time.perf_counter()-t0)/10*1e3:.1f} ms/frame")

    # with one in-flight device batch (dispatch, don't wait)
    r = fn(*arrs, *ls)
    t0 = time.perf_counter()
    for i in range(10):
        entropy_once(i)
    print(f"entropy w/ 1 in-flight dispatch: "
          f"{(time.perf_counter()-t0)/10*1e3:.1f} ms/frame")
    jax.block_until_ready(r)

    # with continuous dispatch loop in background thread
    stop = [False]

    def dispatch_loop():
        while not stop[0]:
            r = fn(*arrs, *ls)
            np.asarray(r[0][0, 0, :2])

    th = threading.Thread(target=dispatch_loop)
    th.start()
    time.sleep(0.2)
    t0 = time.perf_counter()
    for i in range(10):
        entropy_once(i)
    print(f"entropy w/ dispatch loop: "
          f"{(time.perf_counter()-t0)/10*1e3:.1f} ms/frame")
    stop[0] = True
    th.join()


if __name__ == "__main__":
    main()
