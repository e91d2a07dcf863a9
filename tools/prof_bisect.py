#!/usr/bin/env python3
"""Bisect the prof_sync (26 ms/f) vs decode_annexb_gop_pipelined
(100 ms/f) gap: same sync loop, but over 64 distinct parsed pictures
exactly as the real function sees them."""
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
    B = 4
    gop_stream = open(os.path.join(HERE, "benchdata",
                                   "bench1080p_gop16.264"), "rb").read()
    big = gop_stream * B
    pics, sps, pps = _parse_pictures(big)
    print(f"{len(pics)} pictures")
    mb_w, mb_h = sps.pic_width_in_mbs, sps.frame_height_in_mbs
    n = mb_w * mb_h
    npad = round_up(n, BLK)
    W, ecap, ovcap = 32, 2048, 512
    bufs = [{"bmp": np.zeros((F, npad, 51), np.uint8),
             "cnt": np.zeros((F, npad), np.int32),
             "u8": np.zeros((F, n, U8_STRIDE), np.uint8),
             "vals": np.zeros((F, npad, W), np.int8),
             "exc_idx": np.zeros((F, ecap), np.int32),
             "exc_delta": np.zeros((F, ecap), np.int16),
             "ovf_idx": np.full((F, ovcap), npad, np.int32),
             "ovf_rows": np.zeros((F, ovcap, I16_STRIDE), np.int16)}
            for _ in range(2)]
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]
    c0, c1 = pps.chroma_qp_index_offset, pps.second_chroma_qp_offset
    fn = make_packed_gop_fn(mb_w, mb_h, F, False, c0, c1, W, ecap, ovcap)
    SHIP_KEYS = ("bmp", "vals", "exc_idx", "exc_delta", "ovf_idx",
                 "ovf_rows", "u8")
    batches = [pics[b0:b0 + F] for b0 in range(0, len(pics), F)]

    def run_once():
        t_ent = t_ship = 0.0
        results = []
        prev = None
        cur = 0
        t0 = time.perf_counter()
        for batch in batches:
            b = bufs[cur]
            for i, (slice_datas, headers) in enumerate(batch):
                ctl = np.zeros((len(headers), 3), np.int32)
                b["exc_idx"][i] = 0
                b["exc_delta"][i] = 0
                b["ovf_idx"][i] = npad
                t = time.perf_counter()
                out, maxnz, nexc, novf = decode_pack_picture_islices(
                    slice_datas, sps, pps, W, ctl, b["bmp"][i],
                    b["vals"][i], b["cnt"][i], b["u8"][i],
                    b["exc_idx"][i], b["exc_delta"][i],
                    b["ovf_idx"][i], b["ovf_rows"][i], n_threads=2,
                    reuse=True)
                t_ent += time.perf_counter() - t
                assert maxnz >= 0 and nexc <= ecap and novf <= ovcap, (maxnz, nexc, novf)
            t = time.perf_counter()
            arrs = tuple(jnp.asarray(b[k]) for k in SHIP_KEYS)
            t_ship += time.perf_counter() - t
            r = fn(*arrs, *ls)
            if prev is not None:
                results.append(prev)
            prev = r
            cur ^= 1
        results.append(prev)
        np.asarray(results[-1][0][0, 0, :2])
        wall = time.perf_counter() - t0
        nF = B * F
        print(f"wall={wall/nF*1e3:.2f} ms/f ({nF/wall:.1f} fps) "
              f"ent={t_ent/nF*1e3:.1f} ship={t_ship/nF*1e3:.1f}")
        return results

    r = run_once()  # warm
    for _ in range(3):
        del r
        r = run_once()


if __name__ == "__main__":
    main()
