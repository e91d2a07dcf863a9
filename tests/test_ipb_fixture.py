"""Committed IPB benchmark fixture decodes bit-exactly on the native
path (golden from libavcodec; display order = POC order)."""
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STREAM = os.path.join(ROOT, "benchdata", "bench_ipb.264")
GOLDEN = os.path.join(ROOT, "benchdata", "bench_ipb_golden.npz")


@pytest.mark.skipif(not os.path.exists(STREAM), reason="fixture not built")
def test_ipb_fixture_native_bit_exact():
    from dryv_tpu.native.full import decode_annexb_native
    stream = open(STREAM, "rb").read()
    g = np.load(GOLDEN)
    frames = sorted(decode_annexb_native(stream), key=lambda f: f.poc)
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert np.array_equal(f.y, g[f"f{i}_y"]), f"frame {i} luma"
        assert np.array_equal(f.cb, g[f"f{i}_b"]), f"frame {i} cb"
        assert np.array_equal(f.cr, g[f"f{i}_r"]), f"frame {i} cr"
