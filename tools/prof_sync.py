#!/usr/bin/env python3
"""Emulate a fully synchronous pipeline: per batch, entropy x F (main
thread), ONE synchronous ship, one async dispatch.  No background
threads.  Compare single-buffer vs multi-array ship cost."""
import os
import sys
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
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]
    c0, c1 = pps.chroma_qp_index_offset, pps.second_chroma_qp_offset
    fn = make_packed_gop_fn(mb_w, mb_h, F, False, c0, c1, W, ecap, ovcap)
    SHIP_KEYS = ("bmp", "vals", "exc_idx", "exc_delta", "ovf_idx",
                 "ovf_rows", "u8")

    def entropy_once(i):
        sd, ctl = sdatas[i % F]
        decode_pack_picture_islices(sd, sps, pps, W, ctl,
                                    b["bmp"][i % F], b["vals"][i % F],
                                    b["cnt"][i % F], b["u8"][i % F],
                                    b["exc_idx"][i % F],
                                    b["exc_delta"][i % F],
                                    b["ovf_idx"][i % F],
                                    b["ovf_rows"][i % F], n_threads=2)

    for i in range(F):
        entropy_once(i)
    arrs = tuple(jnp.asarray(b[k]) for k in SHIP_KEYS)
    jax.block_until_ready(fn(*arrs, *ls))

    # single-buffer vs multi-array ship
    big = np.concatenate([b[k].reshape(-1).view(np.uint8) for k in
                          SHIP_KEYS])
    print(f"total ship bytes: {big.nbytes/1e6:.1f} MB")
    jd = jax.block_until_ready(jnp.asarray(big))
    for _ in range(3):
        t0 = time.perf_counter()
        x = jnp.asarray(big)
        t1 = time.perf_counter()
        jax.block_until_ready(x)
        t2 = time.perf_counter()
        print(f"1-buf ship: enqueue={1e3*(t1-t0):.1f} ms "
              f"total={1e3*(t2-t0):.1f} ms")
    for _ in range(3):
        t0 = time.perf_counter()
        x = [jnp.asarray(b[k]) for k in SHIP_KEYS]
        t1 = time.perf_counter()
        jax.block_until_ready(x)
        t2 = time.perf_counter()
        print(f"7-arr ship: enqueue={1e3*(t1-t0):.1f} ms "
              f"total={1e3*(t2-t0):.1f} ms")

    # synchronous pipeline: 4 batches x F frames
    B = 4
    for rep in range(3):
        t_ent = t_ship = t_disp = 0.0
        t0 = time.perf_counter()
        prev = None
        for bi in range(B):
            t = time.perf_counter()
            for i in range(F):
                entropy_once(i)
            t_ent += time.perf_counter() - t
            t = time.perf_counter()
            arrs = tuple(jnp.asarray(b[k]) for k in SHIP_KEYS)
            t_ship += time.perf_counter() - t
            t = time.perf_counter()
            prev = fn(*arrs, *ls)
            t_disp += time.perf_counter() - t
        np.asarray(prev[0][0, 0, :2])
        wall = time.perf_counter() - t0
        nF = B * F
        print(f"sync pipeline: wall={wall/nF*1e3:.2f} ms/f "
              f"({nF/wall:.1f} fps)  ent={t_ent/nF*1e3:.1f} "
              f"ship={t_ship/nF*1e3:.1f} disp={t_disp/nF*1e3:.1f}")


if __name__ == "__main__":
    main()
