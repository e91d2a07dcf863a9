"""P-frame fixture encoding: IDR + P sequences with quarter-pel motion.

Goes beyond the upstream reference (which cannot code/reconstruct inter):
P slices mixing P_Skip, P_L0_16x16 with quarter-pel motion vectors, and
intra escapes.  Validated against the libavcodec oracle.
"""
from __future__ import annotations

import numpy as np

from ..avc.neighbors import ZSCAN_4X4_POS
from ..avc.sps import ZIGZAG_4X4
from ..cabac.syntax import MBState, MbKind
from ..refimpl.inter import (MotionState, chroma_interp, luma_interp,
                             mv_pred, mv_skip)
from .intra_encoder import IntraEncoder, _round_levels


class SequenceEncoder:
    """Encodes IDR + P pictures sharing one reconstruction state."""

    def __init__(self, sps, pps, qp: int, intra_policy=None,
                 deblock: bool = False):
        self.sps, self.pps, self.qp = sps, pps, qp
        self._mb_h = None  # field encoding: half-height pictures
        self.enc = IntraEncoder(sps, pps, qp,
                                mb_kind_policy=intra_policy or
                                (lambda a: ["i16", "i4"][a % 2]))
        self.refs = []       # reference planes, newest first (P list-0 order)
        self.ref_pocs = []   # POC per entry (B list construction + deblock
        #                      picture identity)
        self.ref_mss = []    # MotionState per entry (B co-located motion)
        self.ref_maps = []   # (l0 keys, l1 keys) per entry (temporal direct)
        self.deblock = deblock  # in-loop filter on (stream must use
        #                         deblock_disable=0 when assembling)
        self._wp = None  # active weighted-prediction state per frame

    @property
    def prev(self):
        return self.refs[0] if self.refs else None

    def _store_ref(self, planes, poc, ms, maps=((), ())):
        self.refs.insert(0, planes)
        self.ref_pocs.insert(0, poc)
        self.ref_mss.insert(0, ms)
        self.ref_maps.insert(0, (list(maps[0]), list(maps[1])))
        # ref_cap: fixtures with long-term refs manage eviction manually
        # (sliding window only evicts short-term pictures)
        cap = getattr(self, "ref_cap", None) or \
            max(1, self.sps.max_num_ref_frames)
        del self.refs[cap:]
        del self.ref_pocs[cap:]
        del self.ref_mss[cap:]
        del self.ref_maps[cap:]

    def drop_ref(self, poc: int):
        """Mirror an MMCO 'mark unused' op in the encoder's ref model."""
        i = self.ref_pocs.index(poc)
        for lst in (self.refs, self.ref_pocs, self.ref_mss, self.ref_maps):
            del lst[i]

    def reorder_refs(self, pocs):
        """Set the encoder's list-0 order (must mirror the decoder's DPB
        ordering, e.g. short-term by pic_num then long-term)."""
        idx = [self.ref_pocs.index(p) for p in pocs]
        self.refs = [self.refs[i] for i in idx]
        self.ref_pocs = [self.ref_pocs[i] for i in idx]
        self.ref_mss = [self.ref_mss[i] for i in idx]
        self.ref_maps = [self.ref_maps[i] for i in idx]

    def encode_idr(self, src_y, src_cb, src_cr, poc: int = 0):
        from ..refimpl.inter import MotionState
        mbs = self.enc.encode_frame(src_y, src_cb, src_cr)
        self._maybe_deblock(mbs, None)
        R = self.enc.recon
        self.refs, self.ref_pocs, self.ref_mss = [], [], []
        self.ref_maps = []
        self._store_ref((R.y.copy(), R.cb.copy(), R.cr.copy()), poc,
                        MotionState(R.mb_w, R.mb_h))
        return mbs

    def _maybe_deblock(self, mbs, ms, ids0=None, ids1=None):
        """Run the in-loop filter on the recon feedback so the encoder's
        reference planes match the decoder's (deblocked) DPB.

        ids0/ids1: per-list picture-identity keys (POCs) so B boundary
        strengths compare pictures, not list indices."""
        if not self.deblock:
            return
        from ..avc.slice_header import (DeblockingFilterControl, SliceHeader)
        from ..refimpl.deblock import deblock_frame
        R = self.enc.recon
        for mb in mbs:
            if mb.slice_id < 0:
                mb.slice_id = 0
        h = SliceHeader(deblocking=DeblockingFilterControl(disable_idc=0))

        def keys(ids, refarr):
            if ids is None or ms is None:
                return None
            arr = np.asarray(ids, np.int64)
            return np.where(refarr >= 0,
                            arr[np.clip(refarr, 0, len(arr) - 1)], -1)
        deblock_frame(R.y, R.cb, R.cr, mbs, ms, self.sps, self.pps, [h],
                      keys(ids0, ms.ref if ms is not None else None),
                      keys(ids1, ms.ref1 if ms is not None else None))

    def _search(self, ref_y, src, x0, y0, rng_full=8):
        """Full-pel diamond + half/quarter refinement; returns (mv_qpel,
        sad)."""
        best_mv, best_sad = (0, 0), None
        for dy in range(-rng_full, rng_full + 1, 1):
            for dx in range(-rng_full, rng_full + 1, 1):
                pred = luma_interp(ref_y, x0, y0, 16, 16, dx * 4, dy * 4)
                sad = np.abs(src - pred).sum()
                if best_sad is None or sad < best_sad:
                    best_mv, best_sad = (dx * 4, dy * 4), sad
        for stepq in (2, 1):  # half then quarter
            base = best_mv
            for dy in (-stepq, 0, stepq):
                for dx in (-stepq, 0, stepq):
                    mv = (base[0] + dx, base[1] + dy)
                    pred = luma_interp(ref_y, x0, y0, 16, 16, mv[0], mv[1])
                    sad = np.abs(src - pred).sum()
                    if sad < best_sad:
                        best_mv, best_sad = mv, sad
        return best_mv, best_sad

    def encode_p(self, src_y, src_cb, src_cr, search: int = 6,
                 poc: int = None, wp_table=None,
                 max_search_refs: int = None):
        """Encode one P frame; returns MBState list.

        wp_table: PredWeightTable for explicit weighted prediction (PPS
        must set weighted_pred_flag; pass the table to the slice writer).
        max_search_refs: restrict motion search to the first N references
        (e.g. 1 when a temporal-direct B will use this picture as its
        co-located reference and older refs may leave the DPB)."""
        from ..refimpl.inter import ExplicitWP
        from ..refimpl.recon import FrameRecon
        sps, pps, qp = self.sps, self.pps, self.qp
        self._wp = ExplicitWP(wp_table) if wp_table is not None else None
        if poc is None:
            poc = (max(self.ref_pocs) + 2) if self.ref_pocs else 0
        R = FrameRecon(sps, pps, mb_h=self._mb_h)
        self.enc.recon = R
        self.enc.q.recon = R
        ms = MotionState(R.mb_w, R.mb_h)
        ref_y, ref_cb, ref_cr = self.prev
        mbs = []
        n = R.mb_w * R.mb_h
        for addr in range(n):
            mx, my = addr % R.mb_w, addr // R.mb_w
            x0, y0 = mx * 16, my * 16
            src = src_y[y0:y0 + 16, x0:x0 + 16].astype(np.int64)
            mb = MBState.fresh()
            mb.qp_y = qp
            # --- candidate: skip -----------------------------------------
            skv = mv_skip(ms, addr)
            pred = luma_interp(ref_y, x0, y0, 16, 16, int(skv[0]),
                               int(skv[1]))
            sad_skip = np.abs(src - pred).sum()
            # --- candidate: L0_16x16 motion search (over all refs) -------
            nrefs = len(self.refs)  # prev setter caps at max_num_ref_frames
            if max_search_refs is not None:
                nrefs = min(nrefs, max_search_refs)
            best_mv, best_sad, best_ref = None, None, 0
            for ri in range(nrefs):
                mv_r, sad_r = self._search(self.refs[ri][0], src, x0, y0,
                                           search)
                sad_r += 48 * ri  # slight preference for ref 0
                if best_sad is None or sad_r < best_sad:
                    best_mv, best_sad, best_ref = mv_r, sad_r, ri
            # deterministic partition-coverage policy
            part_kind = [None, None, "16x8", None, "8x16", None,
                         "8x8"][addr % 7]
            # --- choose --------------------------------------------------
            if sad_skip <= best_sad + 256 and part_kind is None:
                mb.kind = MbKind.P_SKIP
                self._recon_inter(mb, addr, ms, skv, src_y,
                                  code_resid=False)
            elif best_sad < 16 * 16 * 12 and part_kind is not None:
                self._encode_partitions(mb, addr, ms, part_kind, src_y,
                                        search)
            elif best_sad < 16 * 16 * 12:
                mb.kind = MbKind.P
                mb.mb_type_code = 0  # P_L0_16x16
                mv = np.array(best_mv, np.int64)
                mvp = mv_pred(ms, (16, 16), mx * 4, my * 4, 4, 4,
                              best_ref, 0)
                mb.ref_idx[0][0:4] = best_ref
                mb.mvd[0][:, 0] = mv[0] - mvp[0]
                mb.mvd[0][:, 1] = mv[1] - mvp[1]
                self._recon_inter(mb, addr, ms, mv, src_y, code_resid=True,
                                  ref_idx=best_ref)
            else:
                # intra escape inside P slice
                self.enc._encode_i16(mb, addr, 0, src_y)
                self.enc._encode_chroma(mb, addr, 0, src_cb, src_cr)
                R._recon_chroma(mb, mx, my, 0, 255)
                R.mb_done[my, mx] = True
                ms.set_mb_intra(addr)
            mbs.append(mb)
        self._maybe_deblock(mbs, ms, self.ref_pocs)
        l0keys = list(self.ref_pocs)  # this picture's list 0, POC-keyed
        self._store_ref((R.y.copy(), R.cb.copy(), R.cr.copy()), poc, ms,
                        (l0keys, []))
        return mbs

    def encode_b(self, src_y, src_cb, src_cr, poc: int, search: int = 6,
                 implicit_wp: bool = False, wp_table=None,
                 temporal: bool = False):
        """Encode one (non-reference) B frame against the nearest past /
        future references; returns MBState list.

        Covers B_Skip, B_Direct_16x16 (spatial), B_L0/L1/Bi_16x16,
        partitioned MBs and intra escapes.  implicit_wp: PPS has
        weighted_bipred_idc 2; wp_table: explicit B weights (idc 1).
        The frame is not stored as a reference."""
        from ..refimpl.inter import (DirectCtx, ExplicitWP, ImplicitWP,
                                     MotionState, TemporalDirectCtx,
                                     derive_direct, recon_inter_mb,
                                     _wp_bi, _wp_single)
        from ..refimpl.recon import FrameRecon
        sps, pps, qp = self.sps, self.pps, self.qp
        past = [i for i, p in enumerate(self.ref_pocs) if p < poc]
        future = [i for i, p in enumerate(self.ref_pocs) if p > poc]
        if not past or not future:
            raise ValueError("B frame needs a past and a future reference")
        # full B lists, mirroring the decoder's DPB ordering (8.2.4.2.3)
        past_s = sorted(past, key=lambda i: -self.ref_pocs[i])
        future_s = sorted(future, key=lambda i: self.ref_pocs[i])
        l0_idx = past_s + future_s
        l1_idx = future_s + past_s
        i0, i1 = l0_idx[0], l1_idx[0]
        l0_list = [self.refs[i] for i in l0_idx]
        l1_list = [self.refs[i] for i in l1_idx]
        l0p, l1p = l0_list[0], l1_list[0]
        self._b_l0_pocs = [self.ref_pocs[i] for i in l0_idx]
        self._b_l1_pocs = [self.ref_pocs[i] for i in l1_idx]
        if temporal:
            cm0, cm1 = self.ref_maps[i1]
            keys = set(self.ref_pocs) | set(cm0) | set(cm1)
            dctx = TemporalDirectCtx(
                self.ref_mss[i1], cm0, cm1, self._b_l0_pocs,
                {k: k for k in keys}, {k: False for k in keys},
                poc, self.ref_pocs[i1])
        else:
            dctx = DirectCtx(self.ref_mss[i1], True)
        if wp_table is not None:
            wp = ExplicitWP(wp_table)
        elif implicit_wp:
            wp = ImplicitWP(poc, self._b_l0_pocs, self._b_l1_pocs,
                            [False] * len(self._b_l0_pocs),
                            [False] * len(self._b_l1_pocs))
        else:
            wp = None
        self._wp = wp
        R = FrameRecon(sps, pps, mb_h=self._mb_h)
        self.enc.recon = R
        self.enc.q.recon = R
        ms = MotionState(R.mb_w, R.mb_h)
        mbs = []
        for addr in range(R.mb_w * R.mb_h):
            mx, my = addr % R.mb_w, addr // R.mb_w
            x0, y0 = mx * 16, my * 16
            src = src_y[y0:y0 + 16, x0:x0 + 16].astype(np.int64)
            mb = MBState.fresh()
            mb.qp_y = qp
            # --- candidates ----------------------------------------------
            dvals = derive_direct(ms, addr, dctx)
            dpred = self._direct_pred16(addr, dvals, l0_list, l1_list, wp)
            sad_d = np.abs(src - dpred).sum()
            mv0, sad0 = self._search(l0p[0], src, x0, y0, search)
            mv1, sad1 = self._search(l1p[0], src, x0, y0, search)
            p0 = luma_interp(l0p[0], x0, y0, 16, 16, *mv0)
            p1 = luma_interp(l1p[0], x0, y0, 16, 16, *mv1)
            if isinstance(wp, ExplicitWP):
                d, w0, o0 = wp.luma(0, 0)
                _, w1, o1 = wp.luma(1, 0)
                bi = _wp_bi(p0, p1, d, w0, o0, w1, o1)
                p0 = _wp_single(p0, *wp.luma(0, 0))
                p1 = _wp_single(p1, *wp.luma(1, 0))
            elif isinstance(wp, ImplicitWP):
                w0, w1 = wp.biweights(0, 0)
                bi = _wp_bi(p0, p1, 5, w0, 0, w1, 0)
            else:
                bi = (p0 + p1 + 1) >> 1
            sad_bi = np.abs(src - bi).sum()
            mode = ["auto", "l0", "l1", "bi", "direct", "auto"][addr % 6]
            if addr % 13 == 5:
                mode = "intra"
            elif addr % 17 == 3:
                mode = "16x8"
            elif addr % 17 == 9:
                mode = "8x16"
            elif addr % 17 == 14:
                mode = "b8x8"
            if mode == "auto":
                if sad_d <= min(sad0, sad1, sad_bi) + 384:
                    mode = "skip"
                else:
                    mode = ("l0", "l1", "bi")[int(np.argmin(
                        [sad0, sad1, sad_bi]))]
            # --- encode chosen mode --------------------------------------
            if mode == "skip":
                mb.kind = MbKind.B_SKIP
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list,
                               l1_list, dctx, wp,
                               cvoff=getattr(self, "_cvoff", None))
            elif mode == "direct":
                mb.kind = MbKind.B_DIRECT
                mb.mb_type_code = 0
                self._code_luma_resid(mb, src, dpred)
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list,
                               l1_list, dctx, wp,
                               cvoff=getattr(self, "_cvoff", None))
            elif mode in ("l0", "l1", "bi"):
                mb.kind = MbKind.B
                mb.mb_type_code = {"l0": 1, "l1": 2, "bi": 3}[mode]
                pred = None
                for which, mvt in ((0, mv0), (1, mv1)):
                    if (mode == "l0" and which == 1) or \
                       (mode == "l1" and which == 0):
                        continue
                    mv = np.array(mvt, np.int64)
                    mvp = mv_pred(ms, (16, 16), mx * 4, my * 4, 4, 4, 0, 0,
                                  which)
                    mb.ref_idx[which][:] = 0
                    mb.mvd[which][:, 0] = mv[0] - mvp[0]
                    mb.mvd[which][:, 1] = mv[1] - mvp[1]
                pred = {"l0": p0, "l1": p1, "bi": bi}[mode]
                self._code_luma_resid(mb, src, pred)
                recon_inter_mb(R, mb, addr, 0, ms, *l0p, l0_list,
                               l1_list, dctx, wp,
                               cvoff=getattr(self, "_cvoff", None))
            elif mode in ("16x8", "8x16", "b8x8"):
                self._encode_b_partitions(mb, addr, ms, mode, src_y,
                                          l0_list, l1_list, dctx, search)
            else:  # intra escape inside B slice
                self.enc._encode_i16(mb, addr, 0, src_y)
                self.enc._encode_chroma(mb, addr, 0, src_cb, src_cr)
                R._recon_chroma(mb, mx, my, 0, 255)
                R.mb_done[my, mx] = True
                ms.set_mb_intra(addr)
            mbs.append(mb)
        self._maybe_deblock(mbs, ms, self._b_l0_pocs, self._b_l1_pocs)
        return mbs

    def _encode_b_partitions(self, mb, addr, ms, pkind, src_y, l0_list,
                             l1_list, dctx, search):
        """Partitioned B MBs: 16x8 (L0 top / L1 bottom), 8x16 (bi both),
        B_8x8 with sub types direct/L0/L1/Bi.  mvds derived on a scratch
        motion state in coding order; no residual (cbp 0)."""
        from ..refimpl.inter import derive_direct, recon_inter_mb
        R = self.enc.recon
        mx, my = addr % R.mb_w, addr // R.mb_w
        bx0, by0 = mx * 4, my * 4
        scratch = ms.clone()
        # parts: (off4, w4, h4, shape, pidx, anchor, quads, lists|"direct")
        if pkind == "16x8":
            mb.kind = MbKind.B
            mb.mb_type_code = 8  # B_L0_L1_16x8
            parts = [((0, 0), 4, 2, (16, 8), 0, 0, [0, 1], [0]),
                     ((0, 2), 4, 2, (16, 8), 1, 8, [2, 3], [1])]
        elif pkind == "8x16":
            mb.kind = MbKind.B
            mb.mb_type_code = 21  # B_Bi_Bi_8x16
            parts = [((0, 0), 2, 4, (8, 16), 0, 0, [0, 2], [0, 1]),
                     ((2, 0), 2, 4, (8, 16), 1, 4, [1, 3], [0, 1])]
        else:  # B_8x8: direct / L0 / L1 / Bi quadrants
            mb.kind = MbKind.B_8X8
            mb.mb_type_code = 22
            mb.sub_mb_type[:] = [0, 1, 2, 3]
            parts = [((0, 0), 2, 2, (8, 8), 0, 0, [0], "direct"),
                     ((2, 0), 2, 2, (8, 8), 1, 4, [1], [0]),
                     ((0, 2), 2, 2, (8, 8), 2, 8, [2], [1]),
                     ((2, 2), 2, 2, (8, 8), 3, 12, [3], [0, 1])]
        dvals = None
        for (ox4, oy4), w4, h4, shape, pidx, anchor, quads, lists in parts:
            if lists == "direct":
                if dvals is None:
                    dvals = derive_direct(scratch, addr, dctx)
                r0, r1, m0, m1 = dvals[pidx]
                for which, r, mv in ((0, r0, m0), (1, r1, m1)):
                    if r >= 0:
                        scratch.set_part(bx0 + ox4, by0 + oy4, w4, h4,
                                         mv, r, which)
                    else:
                        scratch.set_part(bx0 + ox4, by0 + oy4, w4, h4,
                                         np.zeros(2, np.int64), -1, which)
                continue
            px, py = mx * 16 + ox4 * 4, my * 16 + oy4 * 4
            pw, ph = w4 * 4, h4 * 4
            src = src_y[py:py + ph, px:px + pw].astype(np.int64)
            for which in (0, 1):
                if which not in lists:
                    scratch.set_part(bx0 + ox4, by0 + oy4, w4, h4,
                                     np.zeros(2, np.int64), -1, which)
                    continue
                planes = (l0_list if which == 0 else l1_list)[0]
                mvt = self._search_block(planes[0], src, px, py, pw, ph)
                mv = np.array(mvt, np.int64)
                mvp = mv_pred(scratch, shape, bx0 + ox4, by0 + oy4, w4, h4,
                              0, pidx, which)
                mvd = mv - mvp
                for q in quads:
                    mb.ref_idx[which][q] = 0
                from ..avc.neighbors import POS_TO_ZSCAN
                for yy in range(oy4, oy4 + h4):
                    for xx in range(ox4, ox4 + w4):
                        mb.mvd[which][POS_TO_ZSCAN[(xx, yy)]] = mvd
                scratch.set_part(bx0 + ox4, by0 + oy4, w4, h4, mv, 0, which)
        mb.cbp = 0
        from ..refimpl.inter import recon_inter_mb as _rim
        _rim(R, mb, addr, 0, ms, *l0_list[0], l0_list, l1_list, dctx,
             getattr(self, "_wp", None))

    def _direct_pred16(self, addr, dvals, l0_list, l1_list, wp=None):
        """16x16 direct-mode luma prediction (candidate evaluation)."""
        from ..refimpl.inter import (ExplicitWP, ImplicitWP, _wp_bi,
                                     _wp_single)
        R = self.enc.recon
        mx, my = addr % R.mb_w, addr // R.mb_w
        pred = np.zeros((16, 16), np.int64)
        for q in range(4):
            r0, r1, m0, m1 = dvals[q]
            qx, qy = (q & 1) * 8, (q >> 1) * 8
            px, py = mx * 16 + qx, my * 16 + qy
            parts = []
            for which, r, mv, lst in ((0, r0, m0, l0_list),
                                      (1, r1, m1, l1_list)):
                if r < 0:
                    continue
                parts.append((which, r, luma_interp(
                    lst[r][0], px, py, 8, 8, int(mv[0]), int(mv[1]))))
            if len(parts) == 1:
                which, r, acc = parts[0]
                if isinstance(wp, ExplicitWP):
                    acc = _wp_single(acc, *wp.luma(which, r))
            elif isinstance(wp, ExplicitWP):
                d, w0, o0 = wp.luma(0, parts[0][1])
                _, w1, o1 = wp.luma(1, parts[1][1])
                acc = _wp_bi(parts[0][2], parts[1][2], d, w0, o0, w1, o1)
            elif isinstance(wp, ImplicitWP):
                w0, w1 = wp.biweights(parts[0][1], parts[1][1])
                acc = _wp_bi(parts[0][2], parts[1][2], 5, w0, 0, w1, 0)
            else:
                acc = (parts[0][2] + parts[1][2] + 1) >> 1
            pred[qy:qy + 8, qx:qx + 8] = acc
        return pred

    def _code_luma_resid(self, mb, src, pred):
        """Quantize the 16x16 luma residual into mb.luma4 + cbp."""
        inv = self.enc.q.inv4(self.qp, 0)
        resid = src - pred
        cbp = 0
        for blk in range(16):
            ox, oy = ZSCAN_4X4_POS[blk]
            r = resid[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4].reshape(-1)
            lv = _round_levels(inv @ r, self.enc.deadzone)
            if np.any(lv):
                cbp |= 1 << (blk >> 2)
            mb.luma4[blk][:] = lv.reshape(-1)[ZIGZAG_4X4]
        mb.cbp = cbp

    def _search_block(self, ref_y, src, x0, y0, w, h, rng_full=4):
        best_mv, best_sad = (0, 0), None
        for dy in range(-rng_full, rng_full + 1):
            for dx in range(-rng_full, rng_full + 1):
                pred = luma_interp(ref_y, x0, y0, w, h, dx * 4, dy * 4)
                sad = np.abs(src - pred).sum()
                if best_sad is None or sad < best_sad:
                    best_mv, best_sad = (dx * 4, dy * 4), sad
        for stepq in (2, 1):
            base = best_mv
            for dy in (-stepq, 0, stepq):
                for dx in (-stepq, 0, stepq):
                    mv = (base[0] + dx, base[1] + dy)
                    pred = luma_interp(ref_y, x0, y0, w, h, mv[0], mv[1])
                    sad = np.abs(src - pred).sum()
                    if sad < best_sad:
                        best_mv, best_sad = mv, sad
        return best_mv

    def _encode_partitions(self, mb, addr, ms, part_kind, src_y,
                           search):
        """16x8 / 8x16 / 8x8(sub 8x8) partitioned MB: per-partition motion
        search, mvds derived on a scratch motion state in coding order."""
        R = self.enc.recon
        ref_y = self.prev[0]
        mx, my = addr % R.mb_w, addr // R.mb_w
        x0, y0 = mx * 16, my * 16
        bx0, by0 = mx * 4, my * 4
        scratch = ms.clone()
        if part_kind == "16x8":
            mb.kind = MbKind.P
            mb.mb_type_code = 1
            parts = [((0, 0), 4, 2, (16, 8), 0, [0, 8][0]),
                     ((0, 2), 4, 2, (16, 8), 1, 8)]
        elif part_kind == "8x16":
            mb.kind = MbKind.P
            mb.mb_type_code = 2
            parts = [((0, 0), 2, 4, (8, 16), 0, 0),
                     ((2, 0), 2, 4, (8, 16), 1, 4)]
        else:  # 8x8 with sub type P_L0_8x8 per quadrant
            mb.kind = MbKind.P_8X8
            mb.mb_type_code = 3
            mb.sub_mb_type[:] = 0
            parts = [((0, 0), 2, 2, (8, 8), 0, 0),
                     ((2, 0), 2, 2, (8, 8), 1, 4),
                     ((0, 2), 2, 2, (8, 8), 2, 8),
                     ((2, 2), 2, 2, (8, 8), 3, 12)]
        mb.ref_idx[0][:] = 0
        for (ox4, oy4), w4, h4, shape, pidx, anchor in parts:
            px, py = x0 + ox4 * 4, y0 + oy4 * 4
            pw, ph = w4 * 4, h4 * 4
            src = src_y[py:py + ph, px:px + pw].astype(np.int64)
            mvt = self._search_block(ref_y, src, px, py, pw, ph)
            mv = np.array(mvt, np.int64)
            mvp = mv_pred(scratch, shape, bx0 + ox4, by0 + oy4, w4, h4,
                          0, pidx)
            mvd = mv - mvp
            # store mvd on every covered 4x4 block (neighbor ctx contract)
            for yy in range(oy4, oy4 + h4):
                for xx in range(ox4, ox4 + w4):
                    zblk = None
                    from ..avc.neighbors import POS_TO_ZSCAN
                    zblk = POS_TO_ZSCAN[(xx, yy)]
                    mb.mvd[0][zblk] = mvd
            scratch.set_part(bx0 + ox4, by0 + oy4, w4, h4, mv, 0)
        # no residual for partitioned fixture MBs (cbp 0)
        mb.cbp = 0
        from ..refimpl.inter import recon_inter_mb
        recon_inter_mb(R, mb, addr, 0, ms, *self.refs[0], self.refs,
                       wp=getattr(self, "_wp", None),
                       cvoff=getattr(self, "_cvoff", None))

    def _recon_inter(self, mb, addr, ms, mv, src_y, code_resid: bool,
                     ref_idx: int = 0):
        """Quantize residual (optionally) + reconstruct through the decoder
        path for exact feedback (updates recon + motion state)."""
        from ..refimpl.inter import recon_inter_mb
        R = self.enc.recon
        mx, my = addr % R.mb_w, addr // R.mb_w
        x0, y0 = mx * 16, my * 16
        if code_resid:
            qp = self.qp
            ref_y = self.refs[ref_idx][0]
            pred = luma_interp(ref_y, x0, y0, 16, 16, int(mv[0]), int(mv[1]))
            if getattr(self, "_wp", None) is not None:
                from ..refimpl.inter import _wp_single
                pred = _wp_single(pred, *self._wp.luma(0, ref_idx))
            resid = src_y[y0:y0 + 16, x0:x0 + 16].astype(np.int64) - pred
            inv = self.enc.q.inv4(qp, 0)
            cbp_luma = 0
            for blk in range(16):
                ox, oy = ZSCAN_4X4_POS[blk]
                r = resid[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4].reshape(-1)
                lv = _round_levels(inv @ r, self.enc.deadzone)
                if np.any(lv):
                    cbp_luma |= 1 << (blk >> 2)
                mb.luma4[blk][:] = lv.reshape(-1)[ZIGZAG_4X4]
            mb.cbp = cbp_luma  # chroma residual left zero for now
        recon_inter_mb(R, mb, addr, 0, ms, *self.refs[0], self.refs,
                       wp=getattr(self, "_wp", None),
                       cvoff=getattr(self, "_cvoff", None))
