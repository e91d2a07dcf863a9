"""Bit-exactness of the scalar decode path against the libavcodec oracle.

This is the framework's ground-truth gate (SURVEY.md §4 item 1): fixture
bitstreams produced by our encoder are independently decoded by FFmpeg's
libavcodec; our decoder must reproduce every pixel.
"""
import numpy as np
import pytest

from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.testing.fixtures import all_fixture_names, get_fixture


@pytest.mark.parametrize("name", all_fixture_names())
def test_scalar_decode_bit_exact(name):
    stream, (gy, gcb, gcr), sps, pps = get_fixture(name)
    frame = decode_annexb_scalar(stream)[0]
    assert np.array_equal(frame.y, gy), f"{name}: luma mismatch"
    if frame.cb is None:
        # monochrome: libavcodec synthesizes constant-128 chroma planes
        assert gcb is None or (gcb == 128).all()
    else:
        assert np.array_equal(frame.cb, gcb), f"{name}: cb mismatch"
        assert np.array_equal(frame.cr, gcr), f"{name}: cr mismatch"


def test_parameter_set_roundtrip():
    from dryv_tpu.avc import SPS, PPS
    stream, _, sps, pps = get_fixture("i8_qp26")
    sps2 = SPS.parse(sps.write())
    assert sps2.pic_width_in_mbs == sps.pic_width_in_mbs
    assert sps2.profile_idc == sps.profile_idc
    assert sps2.chroma_format_idc == sps.chroma_format_idc
    pps2 = PPS.parse(pps.write(), sps2)
    assert pps2.transform_8x8_mode_flag == pps.transform_8x8_mode_flag
    assert pps2.pic_init_qp_minus26 == pps.pic_init_qp_minus26


def test_lossless_identity():
    """Transform-bypass streams reconstruct the source exactly (the
    reference leaves lossless as todo!)."""
    from dryv_tpu.testing.fixtures import make_source
    stream, (gy, gcb, gcr), sps, pps = get_fixture("lossless_mix48")
    src_y, src_cb, src_cr = make_source(4, 3)
    frame = decode_annexb_scalar(stream)[0]
    assert np.array_equal(frame.y, src_y)
    assert np.array_equal(frame.cb, src_cb)
    assert np.array_equal(frame.cr, src_cr)
