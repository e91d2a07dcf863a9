#!/usr/bin/env python3
"""Profile the e2e gop pipeline: account for every ms of wall time.

Usage: python tools/prof_e2e.py [n_threads] [gop]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    nthreads = int(sys.argv[1]) if len(sys.argv) > 1 else (os.cpu_count() or 1)
    gop = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    from dryv_tpu.gop_pipeline import decode_annexb_gop_pipelined
    from dryv_tpu.utils.obs import StageTimers

    gop_stream = open(os.path.join(HERE, "benchdata",
                                   "bench1080p_gop16.264"), "rb").read()
    B = 4
    big = gop_stream * B
    nF = B * 16
    decode_annexb_gop_pipelined(big, gop=gop, n_threads=nthreads,
                                stacked_out=True)  # warm
    for rep in range(3):
        tmr = StageTimers()
        t0 = time.perf_counter()
        res = decode_annexb_gop_pipelined(big, gop=gop, n_threads=nthreads,
                                          stacked_out=True, timers=tmr)
        np.asarray(res[-1][0][0, 0, :2])
        wall = time.perf_counter() - t0
        rep_d = tmr.report()
        stage_ms = {k: round(v["total_s"] / nF * 1e3, 2)
                    for k, v in rep_d.items() if isinstance(v, dict)}
        ssum = sum(stage_ms.values())
        print(f"rep{rep}: wall={wall/nF*1e3:.2f} ms/f  fps={nF/wall:.1f}  "
              f"stage_sum={ssum:.2f}  cover={ssum/(wall/nF*1e3):.2f}")
        print("   ", stage_ms)


if __name__ == "__main__":
    main()
