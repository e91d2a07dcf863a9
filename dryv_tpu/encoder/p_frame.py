"""P-frame fixture encoding: IDR + P sequences with integer motion.

Goes beyond the upstream reference (which cannot code/reconstruct inter):
P slices mixing P_Skip, P_L0_16x16 with even-integer-pel motion vectors,
and intra escapes — the subset our round-1 inter reconstruction supports.
Validated against the libavcodec oracle.
"""
from __future__ import annotations

import numpy as np

from ..avc.neighbors import ZSCAN_4X4_POS
from ..avc.sps import ZIGZAG_4X4
from ..cabac.syntax import MBState, MbKind
from ..refimpl.inter import MotionState, mc_copy, mv_pred_16x16, mv_skip
from .intra_encoder import IntraEncoder, _round_levels


class SequenceEncoder:
    """Encodes IDR + P pictures sharing one reconstruction state."""

    def __init__(self, sps, pps, qp: int, intra_policy=None):
        self.sps, self.pps, self.qp = sps, pps, qp
        self.enc = IntraEncoder(sps, pps, qp,
                                mb_kind_policy=intra_policy or
                                (lambda a: ["i16", "i4"][a % 2]))
        self.prev = None  # (y, cb, cr) reference planes

    def encode_idr(self, src_y, src_cb, src_cr):
        mbs = self.enc.encode_frame(src_y, src_cb, src_cr)
        R = self.enc.recon
        self.prev = (R.y.copy(), R.cb.copy(), R.cr.copy())
        return mbs

    def encode_p(self, src_y, src_cb, src_cr, search: int = 8):
        """Encode one P frame; returns MBState list.  Even full-pel MVs."""
        from ..refimpl.recon import FrameRecon
        sps, pps, qp = self.sps, self.pps, self.qp
        R = FrameRecon(sps, pps)
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
            skip_ok = skv[0] % 8 == 0 and skv[1] % 8 == 0
            sad_skip = None
            if skip_ok:
                pred = mc_copy(ref_y, x0, y0, 16, 16,
                               int(skv[0]) // 4, int(skv[1]) // 4)
                sad_skip = np.abs(src - pred).sum()
            # --- candidate: L0_16x16 motion search (even full-pel) -------
            best_mv, best_sad = None, None
            for dy in range(-search, search + 1, 2):
                for dx in range(-search, search + 1, 2):
                    pred = mc_copy(ref_y, x0, y0, 16, 16, dx, dy)
                    sad = np.abs(src - pred).sum()
                    if best_sad is None or sad < best_sad:
                        best_mv, best_sad = (dx, dy), sad
            # --- choose --------------------------------------------------
            if sad_skip is not None and sad_skip <= best_sad + 256:
                mb.kind = MbKind.P_SKIP
                mv = skv
                ref_idx = 0
                self._recon_inter(mb, addr, ms, mv, src_y, src_cb, src_cr,
                                  code_resid=False)
            elif best_sad < 16 * 16 * 12:
                mb.kind = MbKind.P
                mb.mb_type_code = 0  # P_L0_16x16
                mv = np.array([best_mv[0] * 4, best_mv[1] * 4], np.int64)
                mvp = mv_pred_16x16(ms, addr, 0)
                mb.ref_idx[0][0:4] = 0
                mb.mvd[0][:, 0] = mv[0] - mvp[0]
                mb.mvd[0][:, 1] = mv[1] - mvp[1]
                self._recon_inter(mb, addr, ms, mv, src_y, src_cb, src_cr,
                                  code_resid=True)
            else:
                # intra escape inside P slice
                self.enc._encode_i16(mb, addr, 0, src_y)
                self.enc._encode_chroma(mb, addr, 0, src_cb, src_cr)
                R._recon_chroma(mb, mx, my, 0, 255)
                R.mb_done[my, mx] = True
                ms.avail[addr] = False
            mbs.append(mb)
        self.prev = (R.y.copy(), R.cb.copy(), R.cr.copy())
        return mbs

    def _recon_inter(self, mb, addr, ms, mv, src_y, src_cb, src_cr,
                     code_resid: bool):
        """Quantize residual (optionally) + update recon/motion state using
        the decode-side reconstruction for bit-exact feedback."""
        from ..refimpl.inter import recon_inter_mb
        R = self.enc.recon
        mx, my = addr % R.mb_w, addr // R.mb_w
        x0, y0 = mx * 16, my * 16
        if code_resid:
            qp = self.qp
            ix, iy = int(mv[0]) // 4, int(mv[1]) // 4
            ref_y, ref_cb, ref_cr = self.prev
            pred = mc_copy(ref_y, x0, y0, 16, 16, ix, iy)
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
        # reconstruct through the decoder path (exact feedback)
        recon_inter_mb(R, mb, addr, 0, ms, *self.prev)
