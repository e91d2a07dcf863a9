"""C++ deblocking filter (native/deblock.cc) vs the oracle-validated
Python reference implementation — must be bit-identical on every path:
I (4:2:0 / 4:2:2 / 8x8 / PCM / multi-slice), P and B (two-list bS)."""
import numpy as np
import pytest

from dryv_tpu.avc import split_annexb
from dryv_tpu.avc.dpb import DecodedPictureBuffer
from dryv_tpu.avc.slice_header import SliceType
from dryv_tpu.cabac.syntax import MbKind
from dryv_tpu.decoder import SyntaxDecoder, group_access_units
from dryv_tpu.refimpl.deblock import deblock_frame, deblock_frame_native
from dryv_tpu.refimpl.inter import (DirectCtx, MotionState, recon_inter_mb)
from dryv_tpu.refimpl.recon import FrameRecon
from dryv_tpu.testing.fixtures import get_fixture


def _compare_streams(stream):
    """Decode every picture; deblock each with both implementations."""
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    dpb = DecodedPictureBuffer()
    stored, stored_ms = {}, {}
    n_checked = 0
    for pic_nals in group_access_units(rest):
        sps, pps, mbs, headers = sd.decode_picture_syntax(pic_nals)
        h0 = headers[0]
        nal0 = pic_nals[0]
        poc = dpb.decode_poc(sps, h0, nal0)
        dpb.build_ref_lists(sps, h0, poc)
        recon = FrameRecon(sps, pps)
        ms = MotionState(recon.mb_w, recon.mb_h)
        ref_list = ref_list1 = dctx = None
        ref = None
        if not h0.slice_type.is_intra:
            ref_list = [stored[p.frame_idx] for p in dpb.ref_list0]
            ref = ref_list[0]
            if h0.slice_type == SliceType.B:
                ref_list1 = [stored[p.frame_idx] for p in dpb.ref_list1]
                colp = dpb.ref_list1[0]
                dctx = DirectCtx(stored_ms[colp.frame_idx],
                                 not colp.is_long_term)
        for addr, mb in enumerate(mbs):
            if mb.kind in (MbKind.I_NXN, MbKind.I_16X16, MbKind.I_PCM,
                           MbKind.SI):
                recon.recon_mb(mb, addr, mb.slice_id)
                ms.set_mb_intra(addr)
            else:
                recon_inter_mb(recon, mb, addr, mb.slice_id, ms, ref[0],
                               ref[1], ref[2], ref_list, ref_list1, dctx)

        def keys(lst, refarr):
            if not lst:
                return None
            k = np.array([p.frame_idx for p in lst], np.int64)
            return np.where(refarr >= 0,
                            k[np.clip(refarr, 0, len(k) - 1)], -1)
        rp0 = keys(dpb.ref_list0, ms.ref)
        rp1 = keys(dpb.ref_list1, ms.ref1)
        py_y = recon.y.copy()
        py_cb = None if recon.cb is None else recon.cb.copy()
        py_cr = None if recon.cr is None else recon.cr.copy()
        deblock_frame(py_y, py_cb, py_cr, mbs, ms, sps, pps, headers,
                      rp0, rp1)
        nt_y = recon.y.copy()
        nt_cb = None if recon.cb is None else recon.cb.copy()
        nt_cr = None if recon.cr is None else recon.cr.copy()
        deblock_frame_native(nt_y, nt_cb, nt_cr, mbs, ms, sps, pps,
                             headers, rp0, rp1)
        assert np.array_equal(py_y, nt_y), "luma mismatch"
        if py_cb is not None:
            assert np.array_equal(py_cb, nt_cb), "cb mismatch"
            assert np.array_equal(py_cr, nt_cr), "cr mismatch"
        n_checked += 1
        pic = dpb.mark_and_store(sps, h0, nal0, poc)
        if pic is not None:
            stored[pic.frame_idx] = (py_y, py_cb, py_cr)
            stored_ms[pic.frame_idx] = ms
    assert n_checked > 0


@pytest.mark.parametrize("name", ["dblk_mix_qp26", "dblk_i8_qp32",
                                  "dblk_slices_qp28", "dblk_c422_qp28",
                                  "dblk_i16_qp40"])
def test_native_deblock_intra(name):
    stream, _, _, _ = get_fixture(name)
    _compare_streams(stream)


def test_native_deblock_inter():
    from dryv_tpu.encoder import default_sps_pps
    from dryv_tpu.encoder.p_frame import SequenceEncoder
    from dryv_tpu.encoder.slices import encode_sequence_annexb
    from tests.test_bframes import _sources
    mb_w, mb_h = 6, 4
    frame_at = _sources(53, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=29, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, 29, deblock=True)
    frames = [
        (se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
        (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
        (se.encode_b(*frame_at(2), poc=4), 6, False, 2, 4, 0),
    ]
    stream = encode_sequence_annexb(sps, pps, frames, deblock_disable=0)
    _compare_streams(stream)
