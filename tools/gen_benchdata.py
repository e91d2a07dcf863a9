"""Generate the extended benchmark fixtures (VERDICT round-1 item 8):
QP-sweep 1080p intra streams and a 1080p IPB stream, x264-encoded.

Goldens are NOT stored for these; bench.py gates them against the
libavcodec oracle at run time (the primary bench stream keeps its
committed golden npz)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dryv_tpu.testing.fixtures import make_source  # noqa: E402
from dryv_tpu.testing.x264 import encode_x264  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchdata")


def sources(n):
    y, cb, cr = make_source(120, 68, seed=9)  # 1920x1088, cropped by x264
    out = []
    for t in range(n):
        out.append((np.roll(y, 5 * t, axis=1)[:1080].astype(np.uint8),
                    np.roll(cb, 2 * t, axis=1)[:540],
                    np.roll(cr, 2 * t, axis=1)[:540]))
    return out


def main():
    one = sources(1)
    for qp in (20, 40):
        bs = encode_x264(one, x264_params=f"qp={qp}:keyint=1:slices=17:nf=1")
        path = os.path.join(OUT, f"bench1080p_qp{qp}.264")
        open(path, "wb").write(bs)
        print(path, len(bs))
    ipb = encode_x264(sources(10),
                      x264_params="qp=28:bframes=3:b-pyramid=normal:"
                                  "slices=4:ref=3")
    path = os.path.join(OUT, "bench1080p_ipb.264")
    open(path, "wb").write(ipb)
    print(path, len(ipb))


if __name__ == "__main__":
    main()
