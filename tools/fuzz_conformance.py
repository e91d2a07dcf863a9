#!/usr/bin/env python3
"""Randomized conformance fuzzing vs the libavcodec oracle.

Generates random encoder configurations (content seed, QP, MB policy,
entropy mode, deblocking, slices, GOP structure incl. P/B/WP/multi-ref)
and checks that the scalar and native decode paths reproduce libavcodec
bit-exactly.  Usage: python tools/fuzz_conformance.py [n_cases] [seed0]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(seed: int) -> str:
    from dryv_tpu.decoder import decode_annexb_scalar
    from dryv_tpu.encoder import default_sps_pps
    from dryv_tpu.encoder.p_frame import SequenceEncoder
    from dryv_tpu.encoder.slices import encode_sequence_annexb
    from dryv_tpu.native.full import decode_annexb_native
    from dryv_tpu.testing.oracle import decode_annexb

    rng = np.random.RandomState(seed)
    mb_w = int(rng.randint(2, 7))
    mb_h = int(rng.randint(2, 6))
    qp = int(rng.choice([0, 8, 18, 26, 30, 38, 46, 51]))
    cabac = bool(rng.randint(2))
    deblock = bool(rng.randint(2))
    structure = rng.choice(["I", "IPP", "IPB", "IPPB"])
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(rng.randint(0, 256, (H, W)) * 0.5
                     + np.linspace(0, 128, W)[None, :],
                     0, 255).astype(np.int64)
    base_cb = np.clip(90 + rng.randint(-30, 31, (H // 2, W // 2)),
                      0, 255).astype(np.int64)
    base_cr = np.clip(150 + rng.randint(-30, 31, (H // 2, W // 2)),
                      0, 255).astype(np.int64)

    def frame_at(t):
        y = np.roll(base_y, t, axis=1).copy()
        if W > 40:
            x0 = min(5 * t, W - 24)
            y[8:24, x0:x0 + 24] = int(rng.randint(0, 256))
        return y, np.roll(base_cb, t, axis=1).copy(), base_cr.copy()

    poc_type = 0 if "B" in structure else 2
    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, cabac=cabac,
                               poc_type=poc_type, max_refs=2)
    policies = [None, lambda a: "i16", lambda a: ["i16", "i4"][a % 2]]
    se = SequenceEncoder(sps, pps, qp,
                         intra_policy=policies[rng.randint(3)],
                         deblock=deblock)
    frames = [(se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3)]
    fn = 1
    if structure in ("IPP", "IPPB"):
        for k in (1, 2):
            frames.append((se.encode_p(*frame_at(k), poc=2 * k, search=2),
                           5, False, fn, 2 * k, 3))
            fn += 1
    if structure in ("IPB", "IPPB"):
        base = {"IPB": 0, "IPPB": 4}[structure]
        frames.append((se.encode_p(*frame_at(4), poc=base + 4, search=2),
                       5, False, fn, base + 4, 3))
        fn += 1
        frames.append((se.encode_b(*frame_at(3), poc=base + 2, search=2),
                       6, False, fn, base + 2, 0))
        fn += 1
    stream = encode_sequence_annexb(sps, pps, frames,
                                    deblock_disable=0 if deblock else 1)
    oracle = decode_annexb(stream)
    if len(oracle) != len(frames):
        return f"oracle frame count {len(oracle)} != {len(frames)}"
    for label, fndec in (("scalar", decode_annexb_scalar),
                         ("native", decode_annexb_native)):
        ours = sorted(fndec(stream), key=lambda f: f.poc)
        for i, (oy, ocb, ocr) in enumerate(oracle):
            if not (np.array_equal(ours[i].y, oy)
                    and np.array_equal(ours[i].cb, ocb)
                    and np.array_equal(ours[i].cr, ocr)):
                return (f"{label} frame {i} mismatch (mb {mb_w}x{mb_h} "
                        f"qp{qp} cabac={cabac} dblk={deblock} {structure})")
    return ""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    fails = 0
    for k in range(n):
        err = run_case(seed0 + k)
        status = "ok" if not err else f"FAIL: {err}"
        print(f"case {seed0 + k}: {status}", flush=True)
        fails += bool(err)
    print(f"{n - fails}/{n} passed")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
