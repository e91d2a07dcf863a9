"""Weighted prediction conformance (spec 8.4.2.3.2) vs libavcodec:
explicit P (weighted_pred_flag), explicit B (weighted_bipred_idc 1),
implicit B (idc 2, POC-distance weights).  Beyond the reference, which
has no inter reconstruction at all."""
import numpy as np
import pytest

from dryv_tpu.avc.slice_header import PredWeight, PredWeightTable
from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.testing.oracle import decode_annexb

from tests.test_bframes import _sources


def _check(stream, n):
    oracle = decode_annexb(stream)
    assert len(oracle) == n
    ours = sorted(decode_annexb_scalar(stream), key=lambda f: f.poc)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"


def test_explicit_wp_p():
    """IDR + 2 P frames with explicit luma+chroma weights (fade-style)."""
    mb_w, mb_h = 5, 4
    frame_at = _sources(41, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, weighted_pred=1)
    se = SequenceEncoder(sps, pps, 28)
    pwt = PredWeightTable(
        luma_log2_weight_denom=5,
        chroma_log2_weight_denom=6,
        luma_l0=[PredWeight(40, -4)],
        chroma_l0=[(PredWeight(70, 5), PredWeight(60, -6))])
    frames = [
        (se.encode_idr(*frame_at(0)), 7, True, 0),
        (se.encode_p(*frame_at(1), wp_table=pwt), 5, False, 1, 0, 3, pwt),
        (se.encode_p(*frame_at(3), wp_table=pwt), 5, False, 2, 0, 3, pwt),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    _check(stream, 3)


def test_explicit_wp_b():
    """IDR + P + B with distinct explicit weights per list."""
    mb_w, mb_h = 5, 4
    frame_at = _sources(43, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2,
                               weighted_bipred_idc=1)
    se = SequenceEncoder(sps, pps, 28)
    pwt = PredWeightTable(
        luma_log2_weight_denom=5,
        chroma_log2_weight_denom=5,
        luma_l0=[PredWeight(28, 3)],
        chroma_l0=[(PredWeight(30, 2), PredWeight(34, -2))],
        luma_l1=[PredWeight(38, -2)],
        chroma_l1=[(PredWeight(36, 0), PredWeight(28, 4))])
    frames = [
        (se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
        (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
        (se.encode_b(*frame_at(2), poc=4, wp_table=pwt), 6, False, 2, 4, 0,
         pwt),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    _check(stream, 3)


def test_implicit_wp_b():
    """IDR(poc 0) + P(poc 8) + B(poc 2): implicit weights 48/16."""
    mb_w, mb_h = 5, 4
    frame_at = _sources(47, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2,
                               weighted_bipred_idc=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [
        (se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
        (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
        (se.encode_b(*frame_at(1), poc=2, implicit_wp=True), 6, False, 2,
         2, 0),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    _check(stream, 3)
