#!/usr/bin/env python3
"""Dump the 1080p bench stream's slice data to a flat binary blob for the
native profiling harness (native/prof_main.cc).

Format (little-endian):
  int32 n_slices, mb_w, mb_h, chroma_array_type, t8x8, bdl, bdc, d8x8
  per slice: int64 rbsp_off, rbsp_len, bit_off
             int32 first_mb, slice_qp, slice_type, cabac_init_idc,
                   nref_l0, nref_l1
  int64 total_rbsp_len
  bytes rbsp_all
"""
import os
import struct
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    from bench import parse_slices, STREAM

    stream = open(STREAM, "rb").read()
    sd, sps, pps = parse_slices(stream)
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_slices.bin"
    rbsp_all = b"".join(s[0] for s in sd)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<8i", len(sd), sps.pic_width_in_mbs,
                            sps.frame_height_in_mbs, sps.chroma_array_type,
                            pps.transform_8x8_mode_flag,
                            8 + sps.bit_depth_luma_minus8,
                            8 + sps.bit_depth_chroma_minus8,
                            sps.direct_8x8_inference_flag))
        off = 0
        for rbsp, bitoff, first, qp in sd:
            f.write(struct.pack("<3q6i", off, len(rbsp), bitoff, first, qp,
                                2, 0, 0, 0))
            off += len(rbsp)
        f.write(struct.pack("<q", len(rbsp_all)))
        f.write(rbsp_all)
    print(out_path)


if __name__ == "__main__":
    main()
