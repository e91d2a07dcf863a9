"""Adaptive reference marking (MMCO, spec 8.2.5.4) end-to-end vs the
libavcodec oracle: explicit short-term removal and long-term marking +
referencing.  The DPB logic mirrors reference dpb.rs; these streams
exercise it through real bitstreams, beyond the per-op unit tests."""
import numpy as np
import pytest

from dryv_tpu.avc.slice_header import MmcoOp
from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.native.full import decode_annexb_native
from dryv_tpu.testing.oracle import decode_annexb

from tests.test_bframes import _sources


def _check(stream, n):
    oracle = decode_annexb(stream)
    assert len(oracle) == n
    for fn in (decode_annexb_scalar, decode_annexb_native):
        ours = sorted(fn(stream), key=lambda f: f.poc)
        for i, (oy, ocb, ocr) in enumerate(oracle):
            assert np.array_equal(oy, ours[i].y), f"{fn.__name__} fr {i} y"
            assert np.array_equal(ocb, ours[i].cb), f"{fn.__name__} fr {i}"
            assert np.array_equal(ocr, ours[i].cr), f"{fn.__name__} fr {i}"


def test_mmco_remove_short_term():
    """P2 carries MMCO op 1 removing P1; P3 then references {P2, IDR}."""
    mb_w, mb_h = 5, 4
    frame_at = _sources(83, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    f_i = se.encode_idr(*frame_at(0), poc=0)              # refs [I]
    f_p1 = se.encode_p(*frame_at(1), poc=2)               # refs [P1, I]
    f_p2 = se.encode_p(*frame_at(2), poc=4)               # refs [P2, P1]
    # MMCO on P2: remove P1 (difference_of_pic_nums_minus1 =
    # curr_pic_num(2) - pic_num(1) - 1 = 0) -> decoder DPB {I, P2}
    se.drop_ref(2)                                        # refs [P2, I]
    f_p3 = se.encode_p(*frame_at(4), poc=6)
    frames = [
        (f_i, 7, True, 0),
        (f_p1, 5, False, 1),
        (f_p2, 5, False, 2, 0, 3, None, 1, [MmcoOp(1, 0)]),
        (f_p3, 5, False, 3),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    # the fixture must actually use the older reference sometimes
    refs = np.concatenate([m.ref_idx[0] for m in f_p3])
    _check(stream, 4)


def test_mmco_long_term():
    """P1 marks itself long-term (op 4 + op 6); P2/P3 reference it via
    ref_idx 1 (list: short-term first, then long-term)."""
    mb_w, mb_h = 5, 4
    frame_at = _sources(89, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    se.ref_cap = 3  # eviction mirrored manually (long-term never slides)
    f_i = se.encode_idr(*frame_at(0), poc=0)              # refs [I]
    f_p1 = se.encode_p(*frame_at(1), poc=2)               # refs [P1, I]
    # P1 becomes long-term: decoder list-0 for P2 = [I(short), P1(long)]
    se.reorder_refs([0, 2])                               # [I, P1lt]
    f_p2 = se.encode_p(*frame_at(3), poc=4)
    # after P2: DPB {I, P1lt, P2} -> sliding window evicts I ->
    # list-0 for P3 = [P2(short), P1(long)]
    se.drop_ref(0)
    se.reorder_refs([4, 2])
    f_p3 = se.encode_p(*frame_at(0), poc=6)  # content flashes back to P1
    frames = [
        (f_i, 7, True, 0),
        (f_p1, 5, False, 1, 0, 3, None, 1, [MmcoOp(4, 1), MmcoOp(6, 0)]),
        (f_p2, 5, False, 2),
        (f_p3, 5, False, 3),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    refs = np.concatenate([m.ref_idx[0] for m in f_p3])
    assert np.any(refs == 1), "fixture never referenced the long-term pic"
    _check(stream, 4)


def test_rplm_list_swap():
    """P2 carries ref_pic_list_modification putting the IDR at ref_idx 0
    (default order would be [P1, I]); exercises 8.2.4.3 end-to-end."""
    from dryv_tpu.avc.slice_header import RefPicListModification
    mb_w, mb_h = 5, 4
    frame_at = _sources(97, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    f_i = se.encode_idr(*frame_at(0), poc=0)              # refs [I]
    f_p1 = se.encode_p(*frame_at(2), poc=2)               # refs [P1, I]
    # modified list for P2: abs_diff_pic_num_minus1 = 2-0-1 = 1 -> I first
    se.reorder_refs([0, 2])                               # [I, P1]
    f_p2 = se.encode_p(*frame_at(1), poc=4)
    frames = [
        (f_i, 7, True, 0),
        (f_p1, 5, False, 1),
        (f_p2, 5, False, 2, 0, 3, None, 1, None,
         [RefPicListModification(0, 1)]),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    refs = np.concatenate([m.ref_idx[0] for m in f_p2])
    assert np.any(refs == 1), "fixture never used ref_idx 1 (P1)"
    _check(stream, 3)
