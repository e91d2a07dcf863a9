#!/usr/bin/env python3
"""Generate the IPB benchmark fixture (committed under benchdata/).

640x368 CABAC IPB sequence with in-loop deblocking enabled: coding order
I P B P B P B P B (display I B P B P ...), quarter-pel motion, skip/
direct/bi MBs, intra escapes.  Exercises the full native host decode
path (entropy + inter recon + deblock) that the upstream reference lacks
entirely.  Golden YUV comes from the libavcodec oracle.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchdata")


def build(mb_w=40, mb_h=23, qp=30, n_gop=4, seed=11):
    from dryv_tpu.encoder import default_sps_pps
    from dryv_tpu.encoder.p_frame import SequenceEncoder
    from dryv_tpu.encoder.slices import encode_sequence_annexb
    from dryv_tpu.testing.oracle import decode_annexb

    os.makedirs(OUT_DIR, exist_ok=True)
    stream_path = os.path.join(OUT_DIR, "bench_ipb.264")
    golden_path = os.path.join(OUT_DIR, "bench_ipb_golden.npz")
    if os.path.exists(stream_path) and os.path.exists(golden_path):
        print("fixture already cached")
        return

    rng = np.random.RandomState(seed)
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(np.linspace(10, 210, W)[None, :]
                     + np.linspace(0, 40, H)[:, None]
                     + 20 * np.sin(np.arange(W)[None, :] / 19.0)
                     + rng.randint(-10, 11, (H, W)), 0, 255).astype(np.int64)
    base_cb = np.clip(110 + 25 * np.sin(np.arange(W // 2)[None, :] / 27.0)
                      + rng.randint(-5, 6, (H // 2, W // 2)),
                      0, 255).astype(np.int64)
    base_cr = np.clip(95 + 25 * np.cos(np.arange(W // 2)[None, :] / 23.0)
                      + rng.randint(-5, 6, (H // 2, W // 2)),
                      0, 255).astype(np.int64)

    def frame_at(t):
        sh = t  # global pan, 1 px/frame, plus a moving block
        y = np.roll(np.roll(base_y, sh, axis=1), sh // 2, axis=0).copy()
        x0 = 40 + 11 * t
        y[60:120, x0:x0 + 80] = 200
        return (y, np.roll(base_cb, sh, axis=1).copy(), base_cr.copy())

    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, qp, deblock=True)
    t0 = time.time()
    frames = [(se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3)]
    fn = 1
    for g in range(n_gop):
        # code P (display t = 2g+2) then B (display t = 2g+1)
        tp, tb = 2 * g + 2, 2 * g + 1
        frames.append((se.encode_p(*frame_at(tp), poc=2 * tp, search=2),
                       5, False, fn, 2 * tp, 3))
        fn += 1
        frames.append((se.encode_b(*frame_at(tb), poc=2 * tb, search=2),
                       6, False, fn, 2 * tb, 0))
        fn += 1
        print(f"gop {g}: encoded P+B ({time.time() - t0:.1f}s)")
    stream = encode_sequence_annexb(sps, pps, frames, deblock_disable=0)
    print(f"encoded {len(frames)} frames, {len(stream)} bytes, "
          f"{time.time() - t0:.1f}s")
    golden = decode_annexb(stream)
    assert len(golden) == len(frames)
    with open(stream_path, "wb") as f:
        f.write(stream)
    np.savez_compressed(golden_path,
                        **{f"f{i}_{c}": p for i, fr in enumerate(golden)
                           for c, p in zip("ybr", fr)})
    print("wrote", stream_path, golden_path)


if __name__ == "__main__":
    build()
