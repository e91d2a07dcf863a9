#!/usr/bin/env python3
"""Breakdown of the entropy-stage time on the 1080p bench stream.

Isolates: (a) Python wrapper allocation overhead, (b) raw C++ decode with
pre-allocated buffers, (c) thread scaling, (d) bins/s.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import ctypes as ct
import numpy as np


def best_of(f, n=7):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from bench import parse_slices, STREAM
    from dryv_tpu.native import entropy as ne

    stream = open(STREAM, "rb").read()
    slice_datas, sps, pps = parse_slices(stream)
    print(f"slices: {len(slice_datas)}", flush=True)

    # (a) full wrapper path, 1 thread
    t_wrap1 = best_of(lambda: ne.decode_picture_islices(
        slice_datas, sps, pps, n_threads=1))
    t_wrap2 = best_of(lambda: ne.decode_picture_islices(
        slice_datas, sps, pps, n_threads=2))

    # (b) raw C++ call with pre-allocated buffers
    full = [(rbsp, bitoff, first, qp, 2, 0, 0, 0)
            for rbsp, bitoff, first, qp in slice_datas]
    mb_w, mb_h = sps.pic_width_in_mbs, sps.frame_height_in_mbs
    n = mb_w * mb_h
    ns = len(full)
    rbsp_all = b"".join(s[0] for s in full)
    sp_arr = (ne.SliceParams * ns)()
    off = 0
    for k, (rbsp, bitoff, first, qp, st, cinit, n0, n1) in enumerate(full):
        sp_arr[k] = ne.SliceParams(off, len(rbsp), bitoff, first, qp, st,
                                   cinit, n0, n1)
        off += len(rbsp)
    out = {
        "kind": np.zeros(n, np.int32), "qp_y": np.zeros(n, np.int32),
        "cbp": np.zeros(n, np.int32), "i16_mode": np.zeros(n, np.int32),
        "chroma_mode": np.zeros(n, np.int32),
        "modes4": np.zeros((n, 16), np.int32),
        "modes8": np.zeros((n, 4), np.int32),
        "luma4": np.zeros((n, 16, 16), np.int32),
        "luma8": np.zeros((n, 4, 64), np.int32),
        "luma_dc": np.zeros((n, 16), np.int32),
        "chroma_dc": np.zeros((n, 2, 8), np.int32),
        "chroma_ac": np.zeros((n, 2, 8, 16), np.int32),
        "pcm_y": np.zeros((n, 256), np.int32),
        "pcm_c": np.zeros((n, 128), np.int32),
        "slice_id": np.zeros(n, np.int32),
        "bin_count": np.zeros(ns, np.int64),
        "mb_type_code": np.zeros(n, np.int32),
        "sub_mb_type": np.zeros((n, 4), np.int32),
        "ref_idx": np.zeros((n, 2, 4), np.int32),
        "mvd": np.zeros((n, 2, 16, 2), np.int32),
    }
    p = ne._ptr
    ostruct = ne.Out(
        p(out["kind"]), p(out["qp_y"]), p(out["cbp"]), p(out["i16_mode"]),
        p(out["chroma_mode"]), p(out["modes4"]), p(out["modes8"]),
        p(out["luma4"]), p(out["luma8"]), p(out["luma_dc"]),
        p(out["chroma_dc"]), p(out["chroma_ac"]), p(out["pcm_y"]),
        p(out["pcm_c"]), p(out["slice_id"]),
        out["bin_count"].ctypes.data_as(ct.POINTER(ct.c_int64)),
        p(out["mb_type_code"]), p(out["sub_mb_type"]), p(out["ref_idx"]),
        p(out["mvd"]))
    pp_s = ne.PicParams(mb_w, mb_h, sps.chroma_array_type,
                        pps.transform_8x8_mode_flag,
                        8 + sps.bit_depth_luma_minus8,
                        8 + sps.bit_depth_chroma_minus8,
                        sps.direct_8x8_inference_flag)
    buf = ct.create_string_buffer(rbsp_all, len(rbsp_all))
    fn = ne.lib().dt_decode_picture_slices

    def raw(th):
        rc = fn(ct.cast(buf, ct.POINTER(ct.c_uint8)), sp_arr,
                ct.c_int32(ns), pp_s, ostruct, ct.c_int32(th))
        assert rc == 0

    t_raw1 = best_of(lambda: raw(1))
    t_raw2 = best_of(lambda: raw(2))
    bins = int(out["bin_count"].sum())
    print(f"wrapper 1t: {t_wrap1*1e3:7.2f} ms   2t: {t_wrap2*1e3:7.2f} ms")
    print(f"raw C++ 1t: {t_raw1*1e3:7.2f} ms   2t: {t_raw2*1e3:7.2f} ms")
    print(f"alloc overhead (wrap - raw, 1t): {(t_wrap1-t_raw1)*1e3:.2f} ms")
    print(f"bins/frame: {bins}  -> {bins/t_raw1/1e6:.1f} Mbins/s 1-thread")
    per_slice = out["bin_count"]
    print(f"per-slice bins: min {per_slice.min()} max {per_slice.max()}")


if __name__ == "__main__":
    main()
