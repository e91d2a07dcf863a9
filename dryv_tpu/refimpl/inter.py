"""Inter prediction, scalar reference (spec 8.4) — round-1 scope.

The reference decoder cannot reconstruct inter at all
(frame/mod.rs:88 todo!("Inter prediction")); this module goes beyond it:
- luma/chroma motion-vector prediction (8.4.1.3) for 16x16 partitions and
  P_Skip
- motion compensation for integer-pel motion vectors (copy with clipping)
Quarter-pel interpolation and 16x8/8x16/8x8 partitions raise for now.
"""
from __future__ import annotations

import numpy as np

from ..cabac.syntax import MBState, MbKind


class MotionState:
    """Per-picture motion field: mv + ref_idx per MB (16x16 granularity for
    the supported partition set)."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w = mb_w
        self.mb_h = mb_h
        self.mv = np.zeros((mb_h * mb_w, 2), dtype=np.int64)  # (x, y)
        self.ref = np.full(mb_h * mb_w, -1, dtype=np.int64)   # -1 = intra/NA
        self.avail = np.zeros(mb_h * mb_w, dtype=bool)

    def neighbor(self, addr: int, d: str):
        """Returns (available, mv, ref)."""
        w = self.mb_w
        x, y = addr % w, addr // w
        if d == "A":
            na = addr - 1 if x > 0 else -1
        elif d == "B":
            na = addr - w if y > 0 else -1
        elif d == "C":
            na = addr - w + 1 if (y > 0 and x + 1 < w) else -1
        else:  # D
            na = addr - w - 1 if (y > 0 and x > 0) else -1
        if na < 0 or not self.avail[na]:
            return False, np.zeros(2, np.int64), -1
        return True, self.mv[na], self.ref[na]


def mv_pred_16x16(ms: MotionState, addr: int, ref_idx: int) -> np.ndarray:
    """Median MV prediction (spec 8.4.1.3) for a 16x16 partition."""
    av_a, mv_a, ref_a = ms.neighbor(addr, "A")
    av_b, mv_b, ref_b = ms.neighbor(addr, "B")
    av_c, mv_c, ref_c = ms.neighbor(addr, "C")
    if not av_c:
        av_c, mv_c, ref_c = ms.neighbor(addr, "D")
    # intra or unavailable neighbors contribute mv 0, ref -1
    if not av_a:
        mv_a, ref_a = np.zeros(2, np.int64), -1
    if not av_b:
        mv_b, ref_b = np.zeros(2, np.int64), -1
    if not av_c:
        mv_c, ref_c = np.zeros(2, np.int64), -1
    # 8.4.1.3.1: if only A is "available" in the mb sense (B, C, D all
    # unavailable), predictor is mvA
    w = ms.mb_w
    x, y = addr % w, addr // w
    b_mb = y > 0
    c_mb = y > 0 and x + 1 < w
    d_mb = y > 0 and x > 0
    if not b_mb and not c_mb and not d_mb:
        return mv_a.copy()
    same = [(mv_a, ref_a == ref_idx), (mv_b, ref_b == ref_idx),
            (mv_c, ref_c == ref_idx)]
    matches = [mv for mv, m in same if m]
    if len(matches) == 1:
        return matches[0].copy()
    return np.median(np.stack([mv_a, mv_b, mv_c]), axis=0).astype(np.int64)


def mv_skip(ms: MotionState, addr: int) -> np.ndarray:
    """P_Skip motion vector (spec 8.4.1.1)."""
    w = ms.mb_w
    x, y = addr % w, addr // w
    a_mb = x > 0
    b_mb = y > 0
    av_a, mv_a, ref_a = ms.neighbor(addr, "A")
    av_b, mv_b, ref_b = ms.neighbor(addr, "B")
    if not a_mb or not b_mb:
        return np.zeros(2, np.int64)
    if av_a and ref_a == 0 and mv_a[0] == 0 and mv_a[1] == 0:
        return np.zeros(2, np.int64)
    if av_b and ref_b == 0 and mv_b[0] == 0 and mv_b[1] == 0:
        return np.zeros(2, np.int64)
    # neighbors are in-frame: intra neighbors contribute (0,0)/-1 per spec
    return mv_pred_16x16(ms, addr, 0)


def mc_copy(plane: np.ndarray, x0: int, y0: int, w: int, h: int,
            mvx: int, mvy: int) -> np.ndarray:
    """Integer-pel motion compensation with edge clamping."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0 + mvy, y0 + mvy + h), 0, H - 1)
    xs = np.clip(np.arange(x0 + mvx, x0 + mvx + w), 0, W - 1)
    return plane[np.ix_(ys, xs)]


def recon_inter_mb(recon, mb: MBState, addr: int, slice_id: int,
                   ms: MotionState, ref_y, ref_cb, ref_cr):
    """Reconstruct a P_Skip or P_L0_16x16 MB against a reference picture.

    recon: FrameRecon (planes + scaling state)."""
    from .transform import dequant_idct_4x4, dequant_idct_8x8, \
        idct_chroma_dc, qpc_from_qpy
    from .recon import dezigzag4, dezigzag8

    mb_w = recon.mb_w
    mx, my = addr % mb_w, addr // mb_w
    x0, y0 = mx * 16, my * 16

    if mb.kind == MbKind.P_SKIP:
        mv = mv_skip(ms, addr)
        ref_idx = 0
    else:
        assert mb.kind == MbKind.P and mb.mb_type_code == 0, \
            "only 16x16 P partitions supported (round-1 inter scope)"
        ref_idx = int(mb.ref_idx[0][0])
        mvp = mv_pred_16x16(ms, addr, ref_idx)
        mv = mvp + mb.mvd[0][0]
    if mv[0] % 4 or mv[1] % 4:
        raise NotImplementedError("sub-pel interpolation (next round)")
    ms.mv[addr] = mv
    ms.ref[addr] = ref_idx
    ms.avail[addr] = True

    ix, iy = int(mv[0]) // 4, int(mv[1]) // 4
    pred_y = mc_copy(ref_y, x0, y0, 16, 16, ix, iy)
    pred_cb = mc_copy(ref_cb, x0 // 2, y0 // 2, 8, 8, ix // 2, iy // 2)
    pred_cr = mc_copy(ref_cr, x0 // 2, y0 // 2, 8, 8, ix // 2, iy // 2)
    if ix % 2 or iy % 2:
        raise NotImplementedError("chroma half-pel from odd luma MV")

    maxv = (1 << recon.bitdepth) - 1
    qpy = mb.qp_y
    # luma residual
    resid = np.zeros((16, 16), dtype=np.int64)
    if mb.kind != MbKind.P_SKIP and mb.cbp:
        if mb.transform8x8:
            for blk in range(4):
                r = dequant_idct_8x8(dezigzag8(mb.luma8[blk]), qpy,
                                     recon.ls8[1])  # inter-Y list
                bx, by = blk & 1, blk >> 1
                resid[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = r
        else:
            from ..avc.neighbors import ZSCAN_4X4_POS
            for blk in range(16):
                r = dequant_idct_4x4(dezigzag4(mb.luma4[blk]), qpy,
                                     recon.ls4[3], False)  # inter-Y list
                ox, oy = ZSCAN_4X4_POS[blk]
                resid[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4] = r
    recon.y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred_y + resid, 0, maxv)

    # chroma residual
    for ci, (plane, pred) in enumerate(((recon.cb, pred_cb),
                                        (recon.cr, pred_cr))):
        qp_off = (recon.pps.chroma_qp_index_offset if ci == 0
                  else recon.pps.second_chroma_qp_offset)
        qpc = qpc_from_qpy(qpy, qp_off, recon.qp_bd_offset_c)
        cresid = np.zeros((8, 8), dtype=np.int64)
        if mb.kind != MbKind.P_SKIP and (mb.cbp & 0x30):
            dc_in = mb.chroma_dc[ci][:4].reshape(2, 2)
            dcv = idct_chroma_dc(dc_in, qpc, recon.ls4[4 + ci], 1)
            for j in range(4):
                bx, by = j & 1, j >> 1
                full = np.zeros(16, dtype=np.int64)
                full[1:] = mb.chroma_ac[ci][j][:15]
                c = dezigzag4(full)
                c[0, 0] = dcv[by, bx]
                r = dequant_idct_4x4(c, qpc, recon.ls4[4 + ci], True)
                cresid[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4] = r
        cy0, cx0 = y0 // 2, x0 // 2
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred + cresid, 0, maxv)

    recon.blk_done[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = True
    recon.mb_done[my, mx] = True
    recon.mb_slice[my, mx] = slice_id
    recon.mb_intra[my, mx] = False
