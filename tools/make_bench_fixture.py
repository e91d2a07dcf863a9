#!/usr/bin/env python3
"""Generate the 1080p benchmark fixture (cached under temp/bench/).

1920x1088 coded (cropped to 1920x1080), CABAC intra, mixed I16/I4/I8 MBs,
17 slices of 4 MB rows each (slice-parallel CABAC on host threads).
Golden YUV comes from the libavcodec oracle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "temp", "bench")


def build(mb_w=120, mb_h=68, qp=30, rows_per_slice=4, seed=7):
    from dryv_tpu.encoder import default_sps_pps, encode_frame_annexb
    from dryv_tpu.encoder.intra_encoder import IntraEncoder
    from dryv_tpu.testing.oracle import decode_annexb

    os.makedirs(OUT_DIR, exist_ok=True)
    stream_path = os.path.join(OUT_DIR, "bench1080p.264")
    golden_path = os.path.join(OUT_DIR, "bench1080p_golden.npz")
    if os.path.exists(stream_path) and os.path.exists(golden_path):
        print("fixture already cached")
        return

    rng = np.random.RandomState(seed)
    W, H = mb_w * 16, mb_h * 16
    # natural-ish source: smooth gradients + texture + edges
    yy = (np.linspace(0, 180, W)[None, :] + np.linspace(0, 60, H)[:, None]
          + 24 * np.sin(np.arange(W)[None, :] / 17.0)
          + 16 * np.sin(np.arange(H)[:, None] / 23.0)
          + rng.randint(-12, 13, (H, W)))
    src_y = np.clip(yy, 0, 255).astype(np.int64)
    cb = np.clip(110 + 30 * np.sin(np.arange(W // 2)[None, :] / 31.0)
                 + rng.randint(-6, 7, (H // 2, W // 2)), 0, 255).astype(np.int64)
    cr = np.clip(90 + 30 * np.cos(np.arange(W // 2)[None, :] / 29.0)
                 + rng.randint(-6, 7, (H // 2, W // 2)), 0, 255).astype(np.int64)

    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, transform_8x8=True,
                               crop=(0, 0, 0, 4))  # 1088 -> 1080
    policy = lambda a: ["i16", "i4", "i8", "i16", "i4", "i8", "i16"][a % 7]
    enc = IntraEncoder(sps, pps, qp, mb_kind_policy=policy)
    t0 = time.time()
    bounds = list(range(0, mb_w * mb_h, rows_per_slice * mb_w))
    mbs = enc.encode_frame(src_y, cb, cr, slice_bounds=bounds)
    print(f"encoded in {time.time() - t0:.1f}s")
    stream = encode_frame_annexb(sps, pps, rows_per_slice, mbs)
    print(f"stream: {len(stream)} bytes")
    with open(stream_path, "wb") as f:
        f.write(stream)
    gy, gcb, gcr = decode_annexb(stream)[0]
    np.savez_compressed(golden_path, y=gy, cb=gcb, cr=gcr)
    print("golden:", gy.shape, gcb.shape)


if __name__ == "__main__":
    build()
