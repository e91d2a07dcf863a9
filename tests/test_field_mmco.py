"""Field-picture MMCO (spec 8.2.5.4 with field PicNums) and long-term
field reference-list modification (8.2.4.3.2), oracle-gated against
libavcodec.  The reference cannot decode any field-coded stream, so this
is beyond-reference coverage; the encoder reuses the decoder's own DPB
machinery and the independent oracle breaks the circularity."""
import numpy as np
import pytest

from dryv_tpu.avc import NalUnit, NalUnitType, to_annexb
from dryv_tpu.avc.slice_header import MmcoOp, RefPicListModification
from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.field_seq import FieldSequenceEncoder
from dryv_tpu.encoder.slices import encode_islice_nal
from dryv_tpu.testing.fixtures import make_source
from dryv_tpu.testing.oracle import decode_annexb as oracle_decode


def _encode_field_seq(mb_w, mb_h, qp, plan, max_refs=4, seed=31,
                      src_map=None):
    """plan: list of (kind, frame_index, parity, extras) where extras is a
    dict of code_field kwargs (nref_l0 / mmco / rplm_l0)."""
    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, max_refs=max_refs)
    sps.frame_mbs_only_flag = 0
    sps.pic_height_in_map_units_minus1 = mb_h // 2 - 1
    n_frames = max(fi for _, fi, _, _ in plan) + 1
    srcs = [make_source(mb_w, mb_h,
                        seed=seed + (src_map[i] if src_map else i))
            for i in range(n_frames)]
    enc = FieldSequenceEncoder(sps, pps, qp)
    nals = [NalUnit.build(3, NalUnitType.SPS, sps.write()),
            NalUnit.build(3, NalUnitType.PPS, pps.write())]
    frame_num = 0
    prev_fi = None
    coded = []
    for kind, fi, parity, extras in plan:
        y, cb, cr = srcs[fi]
        src = (y[parity::2], cb[parity::2], cr[parity::2])
        if prev_fi is not None and fi != prev_fi:
            frame_num += 1
        mbs, hdr = enc.code_field(kind, src, parity, frame_num,
                                  poc_lsb=(2 * fi) % 256,
                                  idr=(fi == 0 and parity == 0),
                                  **(extras or {}))
        coded.append(mbs)
        mbs_frame = [None] * (sps.pic_width_in_mbs * enc.fh)
        nals.append(encode_islice_nal(sps, pps, mbs_frame, mbs, 0, 0,
                                      deblock_disable=1, **hdr))
        prev_fi = fi
    return to_annexb(nals), n_frames, coded


def _check(stream, n_frames):
    goldens = oracle_decode(stream)
    assert len(goldens) == n_frames
    frames = decode_annexb_scalar(stream)
    assert len(frames) == n_frames
    for i, (f, (gy, gcb, gcr)) in enumerate(zip(frames, goldens)):
        assert np.array_equal(f.y, gy), f"frame {i} luma"
        assert np.array_equal(f.cb, gcb), f"frame {i} cb"
        assert np.array_equal(f.cr, gcr), f"frame {i} cr"


def test_field_mmco_unmark_short_term():
    """A P field carries MMCO op 1 unmarking one FIELD of the previous
    pair (field PicNum addressing: CurrPicNum = 2*frame_num + 1); the
    reference-list heads of every following field shift, so a marking
    bug would desync from libavcodec immediately."""
    # coding order: IDR pair (frame 0), P pair (frame 1), P pair
    # (frame 2) whose top field unmarks frame 1's TOP field.
    # curr field 4 (top of frame 2): CurrPicNum = 2*2+1 = 5.  Frame 1's
    # top field is same-parity, FrameNumWrap 1 -> PicNum 2*1+1 = 3.
    # difference_of_pic_nums_minus1 = 5 - 3 - 1 = 1.
    plan = [
        ("i", 0, 0, None), ("i", 0, 1, None),
        ("p", 1, 0, dict(nref_l0=2)), ("p", 1, 1, dict(nref_l0=2)),
        ("p", 2, 0, dict(nref_l0=2, mmco=[MmcoOp(1, 1)])),
        ("p", 2, 1, dict(nref_l0=2)),
        ("p", 3, 0, dict(nref_l0=2)), ("p", 3, 1, dict(nref_l0=2)),
    ]
    stream, n, coded = _encode_field_seq(6, 4, 27, plan, max_refs=2)
    _check(stream, n)


def test_field_mmco_dpb_state():
    """Unit check on the state machine itself: MMCO 1 clears exactly the
    addressed field's reference parity; the picture drops once both
    fields are unmarked."""
    from types import SimpleNamespace

    from dryv_tpu.avc.dpb import DecodedPictureBuffer
    from dryv_tpu.avc.slice_header import (DecRefPicMarking, SliceHeader)
    from dryv_tpu.avc.nal import NalUnitType

    sps = SimpleNamespace(max_frame_num=16, max_num_ref_frames=4,
                          log2_max_pic_order_cnt_lsb=8, pic_order_cnt_type=0,
                          max_pic_order_cnt_lsb=256,
                          delta_pic_order_always_zero_flag=0)
    dpb = DecodedPictureBuffer()

    def field(frame_num, par, mmco=None, idr=False):
        h = SliceHeader(frame_num=frame_num, field_pic_flag=1,
                        bottom_field_flag=par,
                        pic_order_cnt_lsb=2 * frame_num)
        if mmco:
            h.dec_ref_pic_marking = DecRefPicMarking(
                adaptive_ref_pic_marking_mode_flag=1, mmco_ops=list(mmco))
        nal = SimpleNamespace(
            type=NalUnitType.IDR_SLICE if idr else NalUnitType.NON_IDR_SLICE,
            ref_idc=3)
        return dpb.store_field(sps, h, nal, 2 * frame_num + par)

    field(0, 0, idr=True)
    field(0, 1)
    field(1, 0)
    field(1, 1)
    assert len(dpb.pictures) == 2
    # current field: frame 2 top; CurrPicNum 5; unmark frame 1 TOP
    # (PicNum 3 -> diff_minus1 = 1)
    field(2, 0, mmco=[MmcoOp(1, 1)])
    p1 = next(p for p in dpb.pictures if p.frame_num == 1)
    assert p1.field_ref == (False, True)
    # second field unmarks frame 1 BOTTOM (same parity now: CurrPicNum 5,
    # PicNum 2*1+1 = 3 -> diff_minus1 = 1) -> picture drops entirely
    field(2, 1, mmco=[MmcoOp(1, 1)])
    assert all(p.frame_num != 1 for p in dpb.pictures)
    assert len(dpb.pictures) == 2  # IDR pair + frame-2 pair


def test_field_long_term_mark_and_rplm():
    """One P pair marks itself long-term (MMCO 4 + 6 on both field
    slices); a later P field front-loads a long-term FIELD via RPLM
    idc 2 (8.2.4.3.2: LongTermPicNum = 2*LongTermFrameIdx for the
    opposite-parity field).  The opposite-parity addressing is used
    because libavcodec — the independent oracle — does not retain the
    FIRST field's long-term marking for same-parity addressing (marking
    a first field LT ahead of its complementary field is a murky corner
    the spec constrains); both decoders agree bit-exactly on this
    conformant pattern."""
    plan = [
        ("i", 0, 0, None), ("i", 0, 1, None),
        # pair 1 -> long-term frame idx 0 (op 6 on both field slices)
        ("p", 1, 0, dict(nref_l0=2, mmco=[MmcoOp(4, 1), MmcoOp(6, 0)])),
        ("p", 1, 1, dict(nref_l0=2, mmco=[MmcoOp(6, 0)])),
        ("p", 2, 0, dict(nref_l0=2)), ("p", 2, 1, dict(nref_l0=2)),
        # long-term opposite-parity field to ref_idx 0 (idc 2, ltpn 0)
        ("p", 3, 0, dict(nref_l0=2,
                         rplm_l0=[RefPicListModification(2, 0)])),
        ("p", 3, 1, dict(nref_l0=2)),
    ]
    stream, n, coded = _encode_field_seq(6, 4, 28, plan)
    _check(stream, n)
