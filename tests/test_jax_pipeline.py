"""Bit-exactness of the JAX (stage A + wavefront) reconstruction pipeline.

A subset of fixture configs keeps CI fast (each geometry pays one XLA
compile); the full sweep runs in tools/run_full_conformance.py.
"""
import numpy as np
import pytest

from dryv_tpu.pipeline import decode_annexb_tpu
from dryv_tpu.testing.fixtures import get_fixture

SUBSET = ["mix_qp26", "mix8_qp30", "slices_qp28"]


@pytest.mark.parametrize("name", SUBSET)
def test_jax_decode_bit_exact(name):
    stream, (gy, gcb, gcr), sps, pps = get_fixture(name)
    frame = decode_annexb_tpu(stream)[0]
    assert np.array_equal(frame.y, gy), f"{name}: luma mismatch"
    assert np.array_equal(frame.cb, gcb), f"{name}: cb mismatch"
    assert np.array_equal(frame.cr, gcr), f"{name}: cr mismatch"


@pytest.mark.parametrize("name", ["dblk_mix_qp26", "dblk_i8_qp32",
                                  "dblk_slices_qp28"])
def test_fast_path_deblock_bit_exact(name):
    """decode_annexb_fast keeps deblocking-enabled intra streams on the
    C++ entropy + device recon + C++ deblock path (no scalar fallback)."""
    from dryv_tpu.pipeline import decode_annexb_fast
    stream, (gy, gcb, gcr), sps, pps = get_fixture(name)
    frame = decode_annexb_fast(stream)[0]
    assert np.array_equal(frame.y, gy), f"{name}: luma mismatch"
    assert np.array_equal(frame.cb, gcb), f"{name}: cb mismatch"
    assert np.array_equal(frame.cr, gcr), f"{name}: cr mismatch"
