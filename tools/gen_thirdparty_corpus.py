"""Generate the third-party conformance corpus: x264-encoded streams
(tests/conformance/*.264) that this repo's own encoder did NOT produce.

Every stream decodes bit-exactly vs the libavcodec oracle in
tests/test_thirdparty.py.  Regenerate with:  python tools/gen_thirdparty_corpus.py

The encodes are deterministic (threads=1, fixed sources), so committed
bytes are reproducible given the image's x264 build 164."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.probe_x264 import CASES, make_frames  # noqa: E402
from dryv_tpu.testing.x264 import encode_x264, x264_available  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "conformance")


def main():
    assert x264_available()
    os.makedirs(OUT, exist_ok=True)
    for name, copts, eopts in CASES:
        frames, fmt = make_frames(copts)
        bs = encode_x264(frames, pix_fmt=fmt, **eopts)
        path = os.path.join(OUT, f"{name}.264")
        with open(path, "wb") as f:
            f.write(bs)
        print(f"{name}: {len(bs)} bytes")


if __name__ == "__main__":
    main()
