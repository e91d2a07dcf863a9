"""DPB unit tests: POC types, ref list order, sliding window, MMCO."""
from dryv_tpu.avc.dpb import DecodedPictureBuffer, Picture
from dryv_tpu.avc.nal import NalUnit, NalUnitType
from dryv_tpu.avc.slice_header import (DecRefPicMarking, MmcoOp, SliceHeader)
from dryv_tpu.avc.sps import SPS


def _nal(idr=False, ref=3):
    t = NalUnitType.IDR_SLICE if idr else NalUnitType.NON_IDR_SLICE
    return NalUnit(ref, t, b"")


def _hdr(frame_num=0, lsb=0, st=7):
    h = SliceHeader(frame_num=frame_num, pic_order_cnt_lsb=lsb,
                    slice_type_code=st)
    h.dec_ref_pic_marking = DecRefPicMarking()
    return h


def test_poc_type0_wrap():
    sps = SPS(pic_order_cnt_type=0, log2_max_pic_order_cnt_lsb_minus4=0)
    dpb = DecodedPictureBuffer()
    # IDR at lsb 0 -> 4 -> 12, then wrap to 2 (max_lsb = 16)
    assert dpb.decode_poc(sps, _hdr(0, 0), _nal(idr=True)) == 0
    assert dpb.decode_poc(sps, _hdr(1, 4), _nal()) == 4
    assert dpb.decode_poc(sps, _hdr(2, 12), _nal()) == 12
    assert dpb.decode_poc(sps, _hdr(3, 2), _nal()) == 18  # msb wrapped +16


def test_poc_type2():
    sps = SPS(pic_order_cnt_type=2)
    dpb = DecodedPictureBuffer()
    assert dpb.decode_poc(sps, _hdr(0), _nal(idr=True)) == 0
    assert dpb.decode_poc(sps, _hdr(1), _nal()) == 2
    assert dpb.decode_poc(sps, _hdr(2), _nal()) == 4
    # non-reference picture gets odd poc
    assert dpb.decode_poc(sps, _hdr(3), _nal(ref=0)) == 5


def test_sliding_window_and_p_list_order():
    sps = SPS(pic_order_cnt_type=2, max_num_ref_frames=2)
    dpb = DecodedPictureBuffer()
    for fn in range(4):
        nal = _nal(idr=(fn == 0))
        h = _hdr(fn, st=7 if fn == 0 else 5)
        poc = dpb.decode_poc(sps, h, nal)
        if fn > 0:
            dpb.build_ref_lists(sps, h, poc)
            # most recent frame first (descending pic_num)
            nums = [p.frame_num for p in dpb.ref_list0]
            assert nums == sorted(nums, reverse=True)
        dpb.mark_and_store(sps, h, nal, poc)
        assert len(dpb.pictures) <= 2  # sliding window bound


def test_mmco5_reset():
    sps = SPS(pic_order_cnt_type=2, max_num_ref_frames=4)
    dpb = DecodedPictureBuffer()
    h = _hdr(0)
    poc = dpb.decode_poc(sps, h, _nal(idr=True))
    dpb.mark_and_store(sps, h, _nal(idr=True), poc)
    h2 = _hdr(1, st=5)
    h2.dec_ref_pic_marking = DecRefPicMarking(
        adaptive_ref_pic_marking_mode_flag=1, mmco_ops=[MmcoOp(5)])
    poc2 = dpb.decode_poc(sps, h2, _nal())
    dpb.mark_and_store(sps, h2, _nal(), poc2)
    assert len(dpb.pictures) == 1  # only the current picture survives


def test_long_term_idr():
    sps = SPS(pic_order_cnt_type=2)
    dpb = DecodedPictureBuffer()
    h = _hdr(0)
    h.dec_ref_pic_marking = DecRefPicMarking(long_term_reference_flag=1)
    poc = dpb.decode_poc(sps, h, _nal(idr=True))
    pic = dpb.mark_and_store(sps, h, _nal(idr=True), poc)
    assert pic.is_long_term and pic.long_term_frame_idx == 0
