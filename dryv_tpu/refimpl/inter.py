"""Inter prediction, scalar reference (spec 8.4).

The upstream reference decoder cannot reconstruct inter at all
(frame/mod.rs:88 todo!("Inter prediction")); this module implements the
P-slice pixel path:
- block-granular motion-vector prediction (8.4.1.3): median with the
  one-match rule, 16x8/8x16 directional rules, P_Skip inference
- quarter-pel luma interpolation (8.4.2.2.1: 6-tap half-pel + averaging)
- eighth-pel bilinear chroma interpolation (8.4.2.2.2)
- motion compensation for 16x16/16x8/8x16/8x8(+sub) partitions
B-slice reconstruction (direct/bi-pred) is the remaining gap.
"""
from __future__ import annotations

import numpy as np

from ..cabac.syntax import (MBState, MbKind, P_MB_TYPES, P_SUB_TYPES,
                            PRED_L0)
from ..avc.neighbors import ZSCAN_4X4_POS


class MotionState:
    """Per-picture motion field at 4x4-block granularity.

    mv[by, bx, 2] in quarter-pel units; ref[by, bx] (-1 = intra or not
    yet decoded / unavailable)."""

    def __init__(self, mb_w: int, mb_h: int):
        self.mb_w = mb_w
        self.mb_h = mb_h
        self.mv = np.zeros((mb_h * 4, mb_w * 4, 2), dtype=np.int64)
        self.ref = np.full((mb_h * 4, mb_w * 4), -1, dtype=np.int64)
        self.decoded = np.zeros((mb_h * 4, mb_w * 4), dtype=bool)

    def blk(self, bx: int, by: int):
        """Returns (available, mv, ref) for 4x4 block coords."""
        if bx < 0 or by < 0 or bx >= self.mb_w * 4 or by >= self.mb_h * 4:
            return False, np.zeros(2, np.int64), -1
        if not self.decoded[by, bx]:
            return False, np.zeros(2, np.int64), -1
        return True, self.mv[by, bx], self.ref[by, bx]

    def set_mb_intra(self, addr: int):
        mx, my = addr % self.mb_w, addr // self.mb_w
        self.decoded[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = True
        self.ref[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = -1

    def set_part(self, bx0, by0, w4, h4, mv, ref):
        self.decoded[by0:by0 + h4, bx0:bx0 + w4] = True
        self.ref[by0:by0 + h4, bx0:bx0 + w4] = ref
        self.mv[by0:by0 + h4, bx0:bx0 + w4] = mv

    def clone(self) -> "MotionState":
        c = MotionState(self.mb_w, self.mb_h)
        c.mv = self.mv.copy()
        c.ref = self.ref.copy()
        c.decoded = self.decoded.copy()
        return c


def _neighbors(ms: MotionState, bx0, by0, w4):
    """A/B/C(/D fallback) neighbor (avail, mv, ref) for a partition whose
    top-left 4x4 block is (bx0, by0) and width w4 blocks (spec 6.4.11.7)."""
    a = ms.blk(bx0 - 1, by0)
    b = ms.blk(bx0, by0 - 1)
    c = ms.blk(bx0 + w4, by0 - 1)
    if not c[0]:
        c = ms.blk(bx0 - 1, by0 - 1)  # D fallback
    return a, b, c


def _median_pred(ms: MotionState, bx0, by0, w4, ref_idx):
    """spec 8.4.1.3.1 (general case).

    Intra neighbors contribute mv (0,0) / ref -1 (never a ref match)."""
    a, b, c = _neighbors(ms, bx0, by0, w4)
    av_a, mv_a, ref_a = a
    av_b, mv_b, ref_b = b
    av_c, mv_c, ref_c = c
    # If B, C and D are all unavailable and A is available -> mvp = mvA
    if not av_b and not av_c and av_a:
        return mv_a.copy()
    matches = [(mv_a, ref_a == ref_idx and av_a),
               (mv_b, ref_b == ref_idx and av_b),
               (mv_c, ref_c == ref_idx and av_c)]
    hit = [mv for mv, m in matches if m]
    if len(hit) == 1:
        return hit[0].copy()
    return np.median(np.stack([mv_a, mv_b, mv_c]), axis=0).astype(np.int64)


def mv_pred(ms: MotionState, mb_part, bx0, by0, w4, h4, ref_idx, part_idx):
    """MV predictor incl. 16x8/8x16 directional rules (8.4.1.3)."""
    if mb_part == (16, 8):
        a, b, c = _neighbors(ms, bx0, by0, w4)
        if part_idx == 0:
            if b[0] and b[2] == ref_idx:
                return b[1].copy()
        else:
            if a[0] and a[2] == ref_idx:
                return a[1].copy()
    elif mb_part == (8, 16):
        a, b, c = _neighbors(ms, bx0, by0, w4)
        if part_idx == 0:
            if a[0] and a[2] == ref_idx:
                return a[1].copy()
        else:
            if c[0] and c[2] == ref_idx:
                return c[1].copy()
    return _median_pred(ms, bx0, by0, w4, ref_idx)


def mv_skip(ms: MotionState, addr: int) -> np.ndarray:
    """P_Skip motion vector (spec 8.4.1.1)."""
    mb_w = ms.mb_w
    mx, my = addr % mb_w, addr // mb_w
    bx0, by0 = mx * 4, my * 4
    a = ms.blk(bx0 - 1, by0)
    b = ms.blk(bx0, by0 - 1)
    a_mb_avail = mx > 0
    b_mb_avail = my > 0
    if not a_mb_avail or not b_mb_avail:
        return np.zeros(2, np.int64)
    if a[0] and a[2] == 0 and a[1][0] == 0 and a[1][1] == 0:
        return np.zeros(2, np.int64)
    if b[0] and b[2] == 0 and b[1][0] == 0 and b[1][1] == 0:
        return np.zeros(2, np.int64)
    return _median_pred(ms, bx0, by0, 4, 0)


# ---------------------------------------------------------------------------
# interpolation (spec 8.4.2.2)
# ---------------------------------------------------------------------------

def _clip_idx(i, n):
    return np.clip(i, 0, n - 1)


def luma_interp(plane: np.ndarray, x0: int, y0: int, w: int, h: int,
                mvx: int, mvy: int) -> np.ndarray:
    """Quarter-pel luma MC (8.4.2.2.1) with edge clamping.

    plane int64 [H,W]; (x0,y0) block origin; mv in quarter-pel units."""
    H, W = plane.shape
    ix, iy = mvx >> 2, mvy >> 2
    fx, fy = mvx & 3, mvy & 3
    bx, by = x0 + ix, y0 + iy

    # padded integer-sample window (+2/-3 taps each side)
    ys = _clip_idx(np.arange(by - 2, by + h + 3), H)
    xs = _clip_idx(np.arange(bx - 2, bx + w + 3), W)
    win = plane[np.ix_(ys, xs)].astype(np.int64)  # [h+5, w+5]

    if fx == 0 and fy == 0:
        return win[2:2 + h, 2:2 + w]

    def tap6(v0, v1, v2, v3, v4, v5):
        return v0 - 5 * v1 + 20 * v2 + 20 * v3 - 5 * v4 + v5

    # half-pel horizontally at integer rows: b1 (unclipped), full width
    bmat = tap6(win[:, 0:w + 0], win[:, 1:w + 1], win[:, 2:w + 2],
                win[:, 3:w + 3], win[:, 4:w + 4], win[:, 5:w + 5])
    b = (bmat + 16) >> 5  # [h+5, w]
    # half-pel vertically at integer cols: h1
    hmat = tap6(win[0:h + 0, :], win[1:h + 1, :], win[2:h + 2, :],
                win[3:h + 3, :], win[4:h + 4, :], win[5:h + 5, :])
    hh = (hmat + 16) >> 5  # [h, w+5]
    # center half-pel j: 6-tap vertically over unclipped b-values
    jmat = tap6(bmat[0:h + 0, :], bmat[1:h + 1, :], bmat[2:h + 2, :],
                bmat[3:h + 3, :], bmat[4:h + 4, :], bmat[5:h + 5, :])
    j = (jmat + 512) >> 10  # [h, w]

    G = win[2:2 + h, 2:2 + w]             # integer sample at (0,0)
    Hs = win[2:2 + h, 3:3 + w]            # integer right neighbor
    M = win[3:3 + h, 2:2 + w]             # integer below
    bC = np.clip(b[2:2 + h, :], 0, 255)   # half-pel right (aligned at x+1/2)
    bD = np.clip(b[3:3 + h, :], 0, 255)   # b one row below
    hC = np.clip(hh[:, 2:2 + w], 0, 255)  # half-pel below
    hE = np.clip(hh[:, 3:3 + w], 0, 255)  # h one col right
    jC = np.clip(j, 0, 255)

    def avg(p, q):
        return (p + q + 1) >> 1

    # Table 8-12 quarter-pel sample derivation
    if fy == 0:
        if fx == 1:
            return avg(G, bC)
        if fx == 2:
            return bC
        return avg(bC, Hs)                        # fx == 3
    if fx == 0:
        if fy == 1:
            return avg(G, hC)
        if fy == 2:
            return hC
        return avg(hC, M)                          # fy == 3
    if fx == 2 and fy == 2:
        return jC
    if fx == 2:
        if fy == 1:
            return avg(bC, jC)
        return avg(jC, bD)                         # fy == 3
    if fy == 2:
        if fx == 1:
            return avg(hC, jC)
        return avg(jC, hE)                         # fx == 3
    # diagonal quarter positions: average of nearest half-pels
    bsel = bC if fy == 1 else bD
    hsel = hC if fx == 1 else hE
    return avg(bsel, hsel)


def chroma_interp(plane: np.ndarray, cx0: int, cy0: int, w: int, h: int,
                  mvx: int, mvy: int) -> np.ndarray:
    """Eighth-pel bilinear chroma MC (8.4.2.2.2); mv in luma quarter-pel
    units (chroma fraction = mv & 7 of the doubled value)."""
    H, W = plane.shape
    ix, iy = mvx >> 3, mvy >> 3
    fx, fy = mvx & 7, mvy & 7
    bx, by = cx0 + ix, cy0 + iy
    ys = _clip_idx(np.arange(by, by + h + 1), H)
    xs = _clip_idx(np.arange(bx, bx + w + 1), W)
    win = plane[np.ix_(ys, xs)].astype(np.int64)
    A = win[0:h, 0:w]
    B = win[0:h, 1:w + 1]
    C = win[1:h + 1, 0:w]
    D = win[1:h + 1, 1:w + 1]
    return ((8 - fx) * (8 - fy) * A + fx * (8 - fy) * B +
            (8 - fx) * fy * C + fx * fy * D + 32) >> 6


# ---------------------------------------------------------------------------
# macroblock reconstruction
# ---------------------------------------------------------------------------

def _partitions(mb: MBState):
    """Yields (bx_off4, by_off4, w4, h4, ref_idx, mvd, shape, part_idx) in
    coding order for the supported P partition set."""
    if mb.kind == MbKind.P:
        name, n, wh, preds = P_MB_TYPES[mb.mb_type_code]
        if n == 1:
            yield (0, 0, 4, 4, int(mb.ref_idx[0][0]), mb.mvd[0][0],
                   (16, 16), 0)
        elif wh == (16, 8):
            for p in range(2):
                yield (0, p * 2, 4, 2, int(mb.ref_idx[0][p * 2]),
                       mb.mvd[0][[0, 8][p]], (16, 8), p)
        else:
            for p in range(2):
                yield (p * 2, 0, 2, 4, int(mb.ref_idx[0][p]),
                       mb.mvd[0][[0, 4][p]], (8, 16), p)
    elif mb.kind == MbKind.P_8X8:
        for q in range(4):
            qx, qy = (q & 1) * 2, (q >> 1) * 2
            name, nparts, wh, pred = P_SUB_TYPES[mb.sub_mb_type[q]]
            ref = int(mb.ref_idx[0][q])
            if wh == (8, 8):
                yield (qx, qy, 2, 2, ref, mb.mvd[0][4 * q], (8, 8), q)
            elif wh == (8, 4):
                for p in range(2):
                    anchor = 4 * q + [0, 2][p]
                    yield (qx, qy + p, 2, 1, ref, mb.mvd[0][anchor],
                           (8, 4), q)
            elif wh == (4, 8):
                for p in range(2):
                    anchor = 4 * q + [0, 1][p]
                    yield (qx + p, qy, 1, 2, ref, mb.mvd[0][anchor],
                           (4, 8), q)
            else:
                for p in range(4):
                    anchor = 4 * q + p
                    sx, sy = p & 1, p >> 1
                    yield (qx + sx, qy + sy, 1, 1, ref, mb.mvd[0][anchor],
                           (4, 4), q)
    else:
        raise NotImplementedError(f"partitions for kind {mb.kind}")


def recon_inter_mb(recon, mb: MBState, addr: int, slice_id: int,
                   ms: MotionState, ref_y, ref_cb, ref_cr, ref_list=None):
    """Reconstruct a P-slice inter MB (P_Skip / 16x16 / 16x8 / 8x16 /
    8x8 sub-partitions) with quarter-pel MC.

    ref_y/cb/cr: reference list 0 entry 0 planes; ref_list: optional list
    of (y, cb, cr) tuples for ref_idx > 0."""
    from .transform import dequant_idct_4x4, dequant_idct_8x8, \
        idct_chroma_dc, qpc_from_qpy
    from .recon import dezigzag4, dezigzag8

    mb_w = recon.mb_w
    mx, my = addr % mb_w, addr // mb_w
    x0, y0 = mx * 16, my * 16
    bx0, by0 = mx * 4, my * 4
    maxv = (1 << recon.bitdepth) - 1
    qpy = mb.qp_y

    pred_y = np.zeros((16, 16), dtype=np.int64)
    pred_cb = np.zeros((8, 8), dtype=np.int64)
    pred_cr = np.zeros((8, 8), dtype=np.int64)

    if mb.kind == MbKind.P_SKIP:
        mv = mv_skip(ms, addr)
        ms.set_part(bx0, by0, 4, 4, mv, 0)
        pred_y = luma_interp(ref_y, x0, y0, 16, 16, int(mv[0]), int(mv[1]))
        pred_cb = chroma_interp(ref_cb, x0 // 2, y0 // 2, 8, 8,
                                int(mv[0]), int(mv[1]))
        pred_cr = chroma_interp(ref_cr, x0 // 2, y0 // 2, 8, 8,
                                int(mv[0]), int(mv[1]))
    else:
        for (ox4, oy4, w4, h4, ref_idx, mvd, shape, pidx) in _partitions(mb):
            mvp = mv_pred(ms, shape, bx0 + ox4, by0 + oy4, w4, h4,
                          ref_idx, pidx)
            mv = mvp + np.asarray(mvd, np.int64)
            if ref_idx == 0:
                ry, rcb, rcr = ref_y, ref_cb, ref_cr
            else:
                if ref_list is None or ref_idx >= len(ref_list):
                    raise ValueError(f"ref_idx {ref_idx} out of list range")
                ry, rcb, rcr = ref_list[ref_idx]
            ms.set_part(bx0 + ox4, by0 + oy4, w4, h4, mv, ref_idx)
            px, py = x0 + ox4 * 4, y0 + oy4 * 4
            pw, ph = w4 * 4, h4 * 4
            pred_y[oy4 * 4:oy4 * 4 + ph, ox4 * 4:ox4 * 4 + pw] = \
                luma_interp(ry, px, py, pw, ph, int(mv[0]), int(mv[1]))
            cw, chh = pw // 2, ph // 2
            ccx, ccy = px // 2, py // 2
            pred_cb[oy4 * 2:oy4 * 2 + chh, ox4 * 2:ox4 * 2 + cw] = \
                chroma_interp(rcb, ccx, ccy, cw, chh,
                              int(mv[0]), int(mv[1]))
            pred_cr[oy4 * 2:oy4 * 2 + chh, ox4 * 2:ox4 * 2 + cw] = \
                chroma_interp(rcr, ccx, ccy, cw, chh,
                              int(mv[0]), int(mv[1]))

    # ---- residuals -----------------------------------------------------
    resid = np.zeros((16, 16), dtype=np.int64)
    if mb.kind != MbKind.P_SKIP and (mb.cbp & 0x0F):
        if mb.transform8x8:
            for blk in range(4):
                if not ((mb.cbp >> blk) & 1):
                    continue
                r = dequant_idct_8x8(dezigzag8(mb.luma8[blk]), qpy,
                                     recon.ls8[1])
                qx, qy = blk & 1, blk >> 1
                resid[qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8] = r
        else:
            from ..avc.neighbors import ZSCAN_4X4_POS as ZP
            for blk in range(16):
                if not ((mb.cbp >> (blk >> 2)) & 1):
                    continue
                r = dequant_idct_4x4(dezigzag4(mb.luma4[blk]), qpy,
                                     recon.ls4[3], False)
                ox, oy = ZP[blk]
                resid[oy * 4:oy * 4 + 4, ox * 4:ox * 4 + 4] = r
    recon.y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred_y + resid, 0, maxv)

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
                qx, qy = j & 1, j >> 1
                full = np.zeros(16, dtype=np.int64)
                full[1:] = mb.chroma_ac[ci][j][:15]
                c = dezigzag4(full)
                c[0, 0] = dcv[qy, qx]
                r = dequant_idct_4x4(c, qpc, recon.ls4[4 + ci], True)
                cresid[qy * 4:qy * 4 + 4, qx * 4:qx * 4 + 4] = r
        cy0, cx0 = y0 // 2, x0 // 2
        plane[cy0:cy0 + 8, cx0:cx0 + 8] = np.clip(pred + cresid, 0, maxv)

    recon.blk_done[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = True
    recon.mb_done[my, mx] = True
    recon.mb_slice[my, mx] = slice_id
    recon.mb_intra[my, mx] = False
