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
    from bench import STREAM
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.avc.slice_header import SliceHeader
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units

    stream = open(STREAM, "rb").read()
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pic = group_access_units(rest)[0]
    # slice params derived from the parsed headers (not hardcoded), so
    # swapping STREAM for an inter stream keeps the blob correct
    rows = []
    sps = pps = None
    for nal in pic:
        rbsp = nal.rbsp
        h0 = SliceHeader.parse(rbsp, nal, next(iter(sd.sps_map.values())),
                               next(iter(sd.pps_map.values())))
        pps = sd.pps_map[h0.pic_parameter_set_id]
        sps = sd.sps_map[pps.seq_parameter_set_id]
        h = SliceHeader.parse(rbsp, nal, sps, pps)
        st = int(h.slice_type)
        nref0 = nref1 = 0
        if not h.slice_type.is_intra:
            nref0 = h.num_ref_idx_l0_active_minus1 + 1
            if h.slice_type.name == "B":
                nref1 = h.num_ref_idx_l1_active_minus1 + 1
        rows.append((rbsp, (h.header_bit_len + 7) & ~7,
                     h.first_mb_in_slice, h.slice_qp_y(pps), st,
                     h.cabac_init_idc or 0, nref0, nref1))
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_slices.bin"
    rbsp_all = b"".join(r[0] for r in rows)
    with open(out_path, "wb") as f:
        f.write(struct.pack("<8i", len(rows), sps.pic_width_in_mbs,
                            sps.frame_height_in_mbs, sps.chroma_array_type,
                            pps.transform_8x8_mode_flag,
                            8 + sps.bit_depth_luma_minus8,
                            8 + sps.bit_depth_chroma_minus8,
                            sps.direct_8x8_inference_flag))
        off = 0
        for rbsp, bitoff, first, qp, st, cinit, nref0, nref1 in rows:
            f.write(struct.pack("<3q6i", off, len(rbsp), bitoff, first, qp,
                                st, cinit, nref0, nref1))
            off += len(rbsp)
        f.write(struct.pack("<q", len(rbsp_all)))
        f.write(rbsp_all)
    print(out_path)


if __name__ == "__main__":
    main()
