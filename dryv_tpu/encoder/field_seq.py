"""PAFF inter fixture encoding: IDR/P/B FIELD sequences.

Each coded picture is one field (field_pic_flag=1, half height).  The
encoder mirrors the decoder's reference machinery exactly: it runs the
same DecodedPictureBuffer field-list derivation (8.2.4.2.5 parity
interleave, field picture numbers) and applies the same 8.4.1.4 chroma
MV adjustment for opposite-parity references, so its reconstruction
feedback is bit-identical to the decoder's.  No third-party encoder can
produce PAFF (x264 emits MBAFF only), so this is the conformance source
for inter field pictures; output is oracle-gated against libavcodec.
"""
from __future__ import annotations

from types import SimpleNamespace

import numpy as np

from ..avc import NalUnit, NalUnitType, to_annexb
from ..avc.dpb import DecodedPictureBuffer
from ..avc.slice_header import SliceHeader, SliceType
from .intra_encoder import IntraEncoder
from .p_frame import SequenceEncoder
from .slices import encode_islice_nal


class FieldSequenceEncoder(SequenceEncoder):
    """Encodes field pictures sharing the frame-pair DPB semantics."""

    def __init__(self, sps, pps, qp: int, intra_policy=None,
                 deblock: bool = False):
        super().__init__(sps, pps, qp, intra_policy=intra_policy,
                         deblock=deblock)
        assert not sps.frame_mbs_only_flag
        self.fh = sps.frame_height_in_mbs // 2
        self._mb_h = self.fh
        self.enc = IntraEncoder(sps, pps, qp,
                                mb_kind_policy=intra_policy or
                                (lambda a: ["i16", "i4"][a % 2]),
                                mb_h=self.fh)
        self.dpb = DecodedPictureBuffer()
        self.fields = {}      # (frame_idx, parity) -> (planes, ms, poc)
        self.field_maps = {}  # (frame_idx, parity) -> (l0 keys, l1 keys)
        self._fl = ([], [])   # current picture's field lists

    # -- coding-order driver -------------------------------------------------
    def code_field(self, kind: str, src_field, parity: int, frame_num: int,
                   poc_lsb: int, idr: bool = False, ref: bool = True,
                   nref_l0: int = None, mmco=None, rplm_l0=None,
                   temporal_direct: bool = False):
        """Encode one field; returns (mbs, header_kwargs).

        kind: 'i' | 'p' | 'b'; src_field: (y, cb, cr) half-height planes;
        the caller supplies frame_num (increments per frame pair) and
        pic_order_cnt_lsb (poc type 0).  nref_l0 overrides the active
        list-0 size; mmco (list of MmcoOp) and rplm_l0 (list of
        RefPicListModification) ride the header into the encoder's own
        DPB, so its reference machinery applies them exactly as the
        decoder will."""
        st_code = {"i": 7, "p": 5, "b": 6}[kind]
        h = SliceHeader(
            first_mb_in_slice=0,
            slice_type_code=st_code,
            pic_parameter_set_id=self.pps.pic_parameter_set_id,
            frame_num=frame_num,
            pic_order_cnt_lsb=poc_lsb,
            field_pic_flag=1,
            bottom_field_flag=parity,
        )
        if nref_l0 is not None:
            h.num_ref_idx_l0_active_minus1 = nref_l0 - 1
        elif temporal_direct and kind == "b":
            # temporal direct needs the co-located field's references
            # present in the current list 0: keep the whole derived list
            # (the written header carries the actual list length)
            h.num_ref_idx_l0_active_minus1 = 15
        if mmco:
            from ..avc.slice_header import DecRefPicMarking
            h.dec_ref_pic_marking = DecRefPicMarking(
                adaptive_ref_pic_marking_mode_flag=1, mmco_ops=list(mmco))
        if rplm_l0:
            h.ref_pic_list_modification_l0 = list(rplm_l0)
        nal = SimpleNamespace(
            type=NalUnitType.IDR_SLICE if idr else NalUnitType.NON_IDR_SLICE,
            ref_idc=3 if ref else 0)
        poc = self.dpb.decode_poc(self.sps, h, nal)
        nref = 0
        if kind != "i":
            fl0, fl1 = self.dpb.build_field_lists(self.sps, h, poc)
            self._fl = (fl0, fl1)
            self.refs = [self.fields[(p.frame_idx, par)][0]
                         for p, par in fl0]
            self.ref_pocs = [self.fields[(p.frame_idx, par)][2]
                             for p, par in fl0]
            self.ref_mss = [self.fields[(p.frame_idx, par)][1]
                            for p, par in fl0]
            self.ref_maps = [((), ())] * len(fl0)
            self._cvoff = (
                [0 if par == parity else (2 if parity else -2)
                 for p, par in fl0],
                [0 if par == parity else (2 if parity else -2)
                 for p, par in fl1] if fl1 else None)
            nref = len(fl0)
        self.ref_cap = 64  # the dpb derivation governs list membership
        y, cb, cr = src_field
        if kind == "i":
            # encode_idr resets refs; restore the dpb-mirrored store after
            mbs = self.enc.encode_frame(y, cb, cr)
            self._maybe_deblock(mbs, None)
        elif kind == "p":
            mbs = self.encode_p(y, cb, cr, poc=poc)
        else:
            self._cur_parity = parity
            mbs = self.encode_b_field(y, cb, cr, poc,
                                      temporal=temporal_direct)
        R = self.enc.recon
        fpic = self.dpb.store_field(self.sps, h, nal, poc) if ref else None
        if fpic is not None:
            from ..refimpl.inter import MotionState
            ms = getattr(self, "_last_ms", None)
            if ms is None or kind == "i":
                ms = MotionState(R.mb_w, self.fh)
                for a in range(R.mb_w * self.fh):
                    ms.set_mb_intra(a)
            self.fields[(fpic.frame_idx, parity)] = \
                ((R.y.copy(), R.cb.copy(), R.cr.copy()), ms, poc)
            fl0, fl1 = self._fl if kind != "i" else ([], [])
            self.field_maps[(fpic.frame_idx, parity)] = (
                [(p.frame_idx, par) for p, par in fl0],
                [(p.frame_idx, par) for p, par in fl1] if fl1 else [])
            live = {p.frame_idx for p in self.dpb.pictures}
            self.fields = {k: v for k, v in self.fields.items()
                           if k[0] in live}
        hdr = dict(frame_num=frame_num, field_pic=1, bottom_field=parity,
                   pic_order_cnt_lsb=poc_lsb, idr=idr,
                   slice_type_code=st_code,
                   nal_ref_idc=3 if ref else 0,
                   num_ref_l0=nref if kind in "pb" else None,
                   num_ref_l1=len(self._fl[1]) if kind == "b" else None,
                   mmco=mmco, rplm_l0=rplm_l0,
                   direct_spatial=0 if temporal_direct else 1)
        return mbs, hdr

    # SequenceEncoder.encode_p stores refs itself; intercept to keep our
    # field-store authoritative (the dpb derivation rebuilds self.refs
    # per picture)
    def _store_ref(self, planes, poc, ms, maps=((), ())):
        self._last_ms = ms

    def encode_b_field(self, src_y, src_cb, src_cr, poc: int,
                       temporal: bool = False):
        """B field: lists come from the dpb field derivation (not the
        frame POC partition encode_b re-derives).  temporal=True uses
        the 8.4.1.2.3 field temporal-direct derivation (field POCs,
        (frame_idx, parity) picture keys)."""
        from ..refimpl.inter import (DirectCtx, MotionState,
                                     TemporalDirectCtx, derive_direct,
                                     recon_inter_mb)
        from ..refimpl.recon import FrameRecon
        from ..cabac.syntax import MBState, MbKind
        fl0, fl1 = self._fl
        l0_list = [self.fields[(p.frame_idx, par)][0] for p, par in fl0]
        l1_list = [self.fields[(p.frame_idx, par)][0] for p, par in fl1]
        colp, colpar = fl1[0]
        if temporal:
            km0, km1 = self.field_maps.get((colp.frame_idx, colpar),
                                           ((), ()))
            def fpoc(p, par):
                return (p.bottom_field_order_cnt if par
                        else p.top_field_order_cnt)
            dctx = TemporalDirectCtx(
                self.fields[(colp.frame_idx, colpar)][1], km0, km1,
                [(p.frame_idx, par) for p, par in fl0],
                {(p.frame_idx, par): fpoc(p, par) for p, par in fl0 + fl1},
                {(p.frame_idx, par): p.is_long_term for p, par in fl0 + fl1},
                poc, fpoc(colp, colpar), cur_parity=self._cur_parity)
        else:
            dctx = DirectCtx(self.fields[(colp.frame_idx, colpar)][1], True)
        self._wp = None
        R = FrameRecon(self.sps, self.pps, mb_h=self.fh)
        self.enc.recon = R
        self.enc.q.recon = R
        ms = MotionState(R.mb_w, self.fh)
        l0p = l0_list[0]
        mbs = []
        from ..refimpl.inter import luma_interp, mv_pred
        for addr in range(R.mb_w * self.fh):
            mx, my = addr % R.mb_w, addr // R.mb_w
            x0, y0 = mx * 16, my * 16
            src = src_y[y0:y0 + 16, x0:x0 + 16].astype(np.int64)
            mb = MBState.fresh()
            mb.qp_y = self.qp
            mode = ["skip", "l0", "bi", "direct", "l1"][addr % 5]
            if mode == "skip":
                mb.kind = MbKind.B_SKIP
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list, l1_list,
                               dctx, None, cvoff=self._cvoff)
            elif mode == "direct":
                mb.kind = MbKind.B_DIRECT
                mb.mb_type_code = 0
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list, l1_list,
                               dctx, None, cvoff=self._cvoff)
            else:
                mb.kind = MbKind.B
                mb.mb_type_code = {"l0": 1, "l1": 2, "bi": 3}[mode]
                for which, lst in ((0, l0_list), (1, l1_list)):
                    if (mode == "l0" and which == 1) or \
                       (mode == "l1" and which == 0):
                        continue
                    ridx = addr % min(2, len(lst))
                    mvt, _ = self._search(lst[ridx][0], src, x0, y0, 4)
                    mv = np.array(mvt, np.int64)
                    mvp = mv_pred(ms, (16, 16), mx * 4, my * 4, 4, 4,
                                  ridx, 0, which)
                    mb.ref_idx[which][:] = ridx
                    mb.mvd[which][:, 0] = mv[0] - mvp[0]
                    mb.mvd[which][:, 1] = mv[1] - mvp[1]
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list, l1_list,
                               dctx, None, cvoff=self._cvoff)
            mbs.append(mb)
        self._maybe_deblock(mbs, ms)
        self._last_ms = ms
        return mbs


def encode_paff_ipb_annexb(sps, pps, frame_sources, qp: int,
                           b_fields: bool = False,
                           deblock: bool = False,
                           temporal_direct: bool = False) -> bytes:
    """Assemble a PAFF sequence: IDR fields then P (and optionally B)
    field pairs.  frame_sources: list of (y, cb, cr) FULL-height frames;
    each splits into top+bottom coded fields."""
    enc = FieldSequenceEncoder(sps, pps, qp, deblock=deblock)
    nals = [NalUnit.build(3, NalUnitType.SPS, sps.write()),
            NalUnit.build(3, NalUnitType.PPS, pps.write())]
    entries = []
    poc = 0
    for fi, (y, cb, cr) in enumerate(frame_sources):
        for parity in (0, 1):
            if fi == 0:
                kind = "i"
            elif b_fields and fi % 2 == 0:
                kind = "b"
            else:
                kind = "p"
            entries.append((kind, fi, parity))
    # B fields need a future reference: encode in coding order where the
    # following P pair precedes the B pair
    if b_fields:
        order = []
        i = 0
        while i < len(entries):
            pair = entries[i:i + 2]
            if pair[0][0] == "b" and i + 3 < len(entries):
                order += entries[i + 2:i + 4] + pair
                i += 4
            else:
                order += pair
                i += 2
        entries = order
    frame_num = 0
    prev_fi = None
    for kind, fi, parity in entries:
        y, cb, cr = frame_sources[fi]
        src = (y[parity::2], cb[parity::2], cr[parity::2])
        if prev_fi is not None and fi != prev_fi:
            frame_num += 1
        ref = kind != "b"
        mbs, hdr = enc.code_field(kind, src, parity, frame_num,
                                  poc_lsb=(2 * fi) % 256,
                                  idr=(fi == 0 and parity == 0), ref=ref,
                                  temporal_direct=(temporal_direct
                                                   and kind == "b"))
        mbs_frame = [None] * (sps.pic_width_in_mbs * enc.fh)
        nals.append(encode_islice_nal(
            sps, pps, mbs_frame, mbs, 0, 0,
            deblock_disable=0 if deblock else 1, **hdr))
        prev_fi = fi
    return to_annexb(nals)
