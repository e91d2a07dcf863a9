"""Full native C++ decode path (entropy + inter recon + deblock) vs the
Python scalar decoder on every inter feature: P partitions, multi-ref,
B spatial/temporal direct, weighted prediction, in-loop deblocking."""
import numpy as np
import pytest

from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.native.full import decode_annexb_native
from dryv_tpu.testing.fixtures import get_fixture

from tests.test_bframes import _sources


def _check(stream):
    ours = decode_annexb_native(stream)
    ref = decode_annexb_scalar(stream)
    assert len(ours) == len(ref) and len(ref) > 0
    for i, (a, b) in enumerate(zip(ours, ref)):
        assert np.array_equal(np.asarray(a.y), np.asarray(b.y)), \
            f"frame {i} luma"
        assert np.array_equal(np.asarray(a.cb), np.asarray(b.cb)), \
            f"frame {i} cb"
        assert np.array_equal(np.asarray(a.cr), np.asarray(b.cr)), \
            f"frame {i} cr"


@pytest.mark.parametrize("name", ["mix_qp26", "dblk_mix_qp26",
                                  "dblk_slices_qp28"])
def test_native_full_intra(name):
    stream, _, _, _ = get_fixture(name)
    _check(stream)


def test_native_full_p_sequence():
    mb_w, mb_h = 6, 4
    frame_at = _sources(61, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(*frame_at(0)), 7, True, 0),
              (se.encode_p(*frame_at(1)), 5, False, 1),
              (se.encode_p(*frame_at(3)), 5, False, 2)]
    _check(encode_sequence_annexb(sps, pps, frames))


def test_native_full_b_deblock():
    mb_w, mb_h = 6, 4
    frame_at = _sources(67, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=29, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, 29, deblock=True)
    frames = [(se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
              (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
              (se.encode_b(*frame_at(2), poc=4), 6, False, 2, 4, 0)]
    _check(encode_sequence_annexb(sps, pps, frames, deblock_disable=0))


def test_native_full_temporal_direct():
    mb_w, mb_h = 6, 4
    frame_at = _sources(71, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
              (se.encode_p(*frame_at(2), poc=4), 5, False, 1, 4, 3),
              (se.encode_p(*frame_at(4), poc=8, max_search_refs=1),
               5, False, 2, 8, 3),
              (se.encode_b(*frame_at(3), poc=6, temporal=True), 6, False,
               3, 6, 0, None, 0)]
    _check(encode_sequence_annexb(sps, pps, frames))


def test_native_full_weighted():
    from dryv_tpu.avc.slice_header import PredWeight, PredWeightTable
    mb_w, mb_h = 5, 4
    frame_at = _sources(73, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, weighted_pred=1)
    se = SequenceEncoder(sps, pps, 28)
    pwt = PredWeightTable(
        luma_log2_weight_denom=5, chroma_log2_weight_denom=6,
        luma_l0=[PredWeight(40, -4)],
        chroma_l0=[(PredWeight(70, 5), PredWeight(60, -6))])
    frames = [(se.encode_idr(*frame_at(0)), 7, True, 0),
              (se.encode_p(*frame_at(1), wp_table=pwt), 5, False, 1, 0, 3,
               pwt)]
    _check(encode_sequence_annexb(sps, pps, frames))


def test_native_full_implicit_wp():
    mb_w, mb_h = 5, 4
    frame_at = _sources(79, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2,
                               weighted_bipred_idc=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
              (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
              (se.encode_b(*frame_at(1), poc=2, implicit_wp=True), 6,
               False, 2, 2, 0)]
    _check(encode_sequence_annexb(sps, pps, frames))
