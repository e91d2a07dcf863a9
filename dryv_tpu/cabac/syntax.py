"""CABAC macroblock-layer syntax (spec 7.3.5 / 9.3.2 / 9.3.3.1).

One symmetric implementation of every syntax element: context derivation is
shared between the decode path (CabacDecoder) and the encode path
(CabacEncoder, used by the fixture generator), so the two cannot drift.

The decode side is the behavioural mirror of reference
src/video/cabac/mod.rs:89-1111 (macroblock_layer and friends), restructured:
instead of reconstructing pixels per-MB, it fills per-slice dense arrays
(coefficients in scan order + mode/QP planes) that the TPU kernels consume.

Scope: I slices (I_NxN 4x4/8x8, I_16x16, I_PCM), chroma_array_type 0/1/2.
P/B syntax (mvd/ref_idx/sub_mb) lands with inter support; 4:4:4 raises.
"""
from __future__ import annotations

from dataclasses import dataclass, field as dfield
from enum import IntEnum

import numpy as np

from ..avc.neighbors import blk4x4_neighbor, blk8x8_neighbor, chroma_blk_neighbor
from . import tables as T
from .engine import CabacDecoder
from .encoder import CabacEncoder


class MbKind(IntEnum):
    I_NXN = 0
    I_16X16 = 1
    I_PCM = 2


@dataclass
class MBState:
    """Per-macroblock syntax state (the neighbor-visible subset of the
    reference's Macroblock record, macroblock.rs:21-258, plus coefficients)."""
    available: bool = True
    slice_id: int = -1
    kind: int = MbKind.I_NXN
    transform8x8: int = 0
    cbp: int = 0x0F  # unavailable-intra default (consts.rs sentinel)
    qp_delta: int = 0
    qp_y: int = 0
    i16_pred_mode: int = 0
    chroma_mode: int = 0
    intra4x4_modes: np.ndarray = None  # [16] resolved modes
    intra8x8_modes: np.ndarray = None  # [4]
    cbf: np.ndarray = None  # [3][17]; [..][16] = DC
    # coefficients, scan (zig-zag) order as coded
    luma_dc: np.ndarray = None      # [16]
    luma4: np.ndarray = None        # [16][16]  (AC blocks for I16x16: [..][15] used)
    luma8: np.ndarray = None        # [4][64]
    chroma_dc: np.ndarray = None    # [2][8]   (4 used for 4:2:0)
    chroma_ac: np.ndarray = None    # [2][8][16] (AC in slots 1..15)
    pcm_luma: np.ndarray = None     # [256]
    pcm_chroma: np.ndarray = None   # [2][64*cat]

    @classmethod
    def fresh(cls, **kw) -> "MBState":
        m = cls(**kw)
        m.cbp = kw.get("cbp", 0)
        m.intra4x4_modes = np.full(16, 2, dtype=np.int32)  # DC default
        m.intra8x8_modes = np.full(4, 2, dtype=np.int32)
        m.cbf = np.zeros((3, 17), dtype=np.int32)
        m.luma_dc = np.zeros(16, dtype=np.int32)
        m.luma4 = np.zeros((16, 16), dtype=np.int32)
        m.luma8 = np.zeros((4, 64), dtype=np.int32)
        m.chroma_dc = np.zeros((2, 8), dtype=np.int32)
        m.chroma_ac = np.zeros((2, 8, 16), dtype=np.int32)
        return m


def _unavailable(intra: bool) -> MBState:
    m = MBState.fresh(available=False)
    m.cbp = 0x0F
    if intra:
        m.cbf[:] = 1
    else:
        m.cbp = 0
    return m


UNAVAIL_INTRA = _unavailable(True)
UNAVAIL_INTER = _unavailable(False)

# Residual block categories (spec Table 9-40)
CAT_LUMA_DC = 0
CAT_LUMA_AC = 1
CAT_LUMA_4X4 = 2
CAT_CHROMA_DC = 3
CAT_CHROMA_AC = 4
CAT_LUMA_8X8 = 5


class SliceCoder:
    """Walks macroblocks of one I slice in raster order, decoding syntax from
    (or encoding syntax to) a CABAC engine.  `mbs` is the frame-wide MBState
    array shared across slices of the same picture."""

    def __init__(self, engine, sps, pps, header, mbs, slice_id: int):
        self.engine = engine
        self.encoding = isinstance(engine, CabacEncoder)
        self.sps = sps
        self.pps = pps
        self.header = header
        self.mbs = mbs
        self.slice_id = slice_id
        self.mb_w = sps.pic_width_in_mbs
        self.mb_h = sps.frame_height_in_mbs
        self.chroma_array_type = sps.chroma_array_type
        self.qp_bd_offset_y = 6 * sps.bit_depth_luma_minus8
        self.qpy_prev = header.slice_qp_y(pps)
        self.curr = header.first_mb_in_slice
        self.prev_addr = -1
        self.field_flag = 0  # progressive only

    # -- engine primitives (symmetric) ----------------------------------
    def _bin(self, ctx: int, val=None) -> int:
        if self.encoding:
            self.engine.decision(ctx, val)
            return val
        return self.engine.decision(ctx)

    def _bypass(self, val=None) -> int:
        if self.encoding:
            self.engine.bypass(val)
            return val
        return self.engine.bypass()

    def _terminate(self, val=None) -> int:
        if self.encoding:
            self.engine.terminate(val)
            return val
        return self.engine.terminate()

    # -- neighbors ------------------------------------------------------
    def mb_at(self, addr: int) -> MBState:
        if addr < 0 or addr >= len(self.mbs):
            return UNAVAIL_INTRA
        m = self.mbs[addr]
        if m is None or m.slice_id != self.slice_id:
            return UNAVAIL_INTRA
        return m

    def nb_mb(self, direction: str, addr=None) -> MBState:
        a = self.curr if addr is None else addr
        x, y = a % self.mb_w, a // self.mb_w
        if direction == "A":
            return self.mb_at(a - 1) if x > 0 else UNAVAIL_INTRA
        if direction == "B":
            return self.mb_at(a - self.mb_w)
        if direction == "C":
            return self.mb_at(a - self.mb_w + 1) if x + 1 < self.mb_w else UNAVAIL_INTRA
        if direction == "D":
            return self.mb_at(a - self.mb_w - 1) if x > 0 else UNAVAIL_INTRA
        raise ValueError(direction)

    def cur_mb(self) -> MBState:
        return self.mbs[self.curr]

    def nb_blk4(self, direction: str, blk: int):
        same, nb = blk4x4_neighbor(blk, direction)
        return (self.cur_mb(), nb) if same else (self.nb_mb(direction), nb)

    def nb_blk8(self, direction: str, blk: int):
        same, nb = blk8x8_neighbor(blk, direction)
        return (self.cur_mb(), nb) if same else (self.nb_mb(direction), nb)

    def nb_blkc(self, direction: str, blk: int):
        same, nb = chroma_blk_neighbor(blk, direction, self.chroma_array_type)
        return (self.cur_mb(), nb) if same else (self.nb_mb(direction), nb)

    # -- syntax elements ------------------------------------------------
    def mb_type_i(self, mb: MBState):
        """mb_type for I slices (Table 9-36; ctx 9.3.3.1.1.3).

        Decode: fills mb.kind / i16 fields.  Encode: emits from them."""
        a, b = self.nb_mb("A"), self.nb_mb("B")
        inc = (1 if (a.available and a.kind != MbKind.I_NXN) else 0) + \
              (1 if (b.available and b.kind != MbKind.I_NXN) else 0)
        base = T.CTX_MB_TYPE_I

        if self.encoding:
            if mb.kind == MbKind.I_NXN:
                self._bin(base + inc, 0)
                return
            self._bin(base + inc, 1)
            if mb.kind == MbKind.I_PCM:
                self._terminate(1)
                return
            self._terminate(0)
            cbp_luma = 1 if (mb.cbp & 0x0F) else 0
            cbp_chroma = mb.cbp >> 4
            self._bin(base + 3, cbp_luma)
            self._bin(base + 4, 1 if cbp_chroma > 0 else 0)
            if cbp_chroma > 0:
                self._bin(base + 5, cbp_chroma - 1)
            self._bin(base + 6, (mb.i16_pred_mode >> 1) & 1)
            self._bin(base + 7, mb.i16_pred_mode & 1)
            return

        if self._bin(base + inc) == 0:
            mb.kind = MbKind.I_NXN
            return
        if self._terminate() == 1:
            mb.kind = MbKind.I_PCM
            return
        mb.kind = MbKind.I_16X16
        cbp_luma = self._bin(base + 3)
        cbp_chroma = 0
        if self._bin(base + 4):
            cbp_chroma = 1 + self._bin(base + 5)
        hi = self._bin(base + 6)
        lo = self._bin(base + 7)
        mb.i16_pred_mode = (hi << 1) | lo
        mb.cbp = (cbp_chroma << 4) | (0x0F if cbp_luma else 0)

    def transform_size_8x8_flag(self, mb: MBState):
        a, b = self.nb_mb("A"), self.nb_mb("B")
        ctx = T.CTX_TRANSFORM_SIZE_8X8_FLAG + a.transform8x8 + b.transform8x8
        mb.transform8x8 = self._bin(ctx, mb.transform8x8 if self.encoding else None)

    def intra4x4_pred_modes(self, mb: MBState):
        """prev_intra4x4_pred_mode_flag / rem (spec 8.3.1.1 derivation).

        dcPredModePredictedFlag: if either neighbor is unavailable, BOTH
        sides are forced to DC before the min()."""
        for blk in range(16):
            ma = self._nb_intra_mode4(blk, "A")
            mb_b = self._nb_intra_mode4(blk, "B")
            pred = 2 if ma is None or mb_b is None else min(ma, mb_b)
            if self.encoding:
                mode = int(mb.intra4x4_modes[blk])
                if mode == pred:
                    self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG, 1)
                else:
                    self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG, 0)
                    rem = mode if mode < pred else mode - 1
                    for i in range(3):
                        self._bin(T.CTX_REM_INTRA_PRED_MODE, (rem >> i) & 1)
            else:
                if self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG):
                    mb.intra4x4_modes[blk] = pred
                else:
                    rem = 0
                    for i in range(3):
                        rem |= self._bin(T.CTX_REM_INTRA_PRED_MODE) << i
                    mb.intra4x4_modes[blk] = rem if rem < pred else rem + 1

    def intra8x8_pred_modes(self, mb: MBState):
        for blk in range(4):
            ma = self._nb_intra_mode8(blk, "A")
            mb_b = self._nb_intra_mode8(blk, "B")
            pred = 2 if ma is None or mb_b is None else min(ma, mb_b)
            if self.encoding:
                mode = int(mb.intra8x8_modes[blk])
                if mode == pred:
                    self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG, 1)
                else:
                    self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG, 0)
                    rem = mode if mode < pred else mode - 1
                    for i in range(3):
                        self._bin(T.CTX_REM_INTRA_PRED_MODE, (rem >> i) & 1)
            else:
                if self._bin(T.CTX_PREV_INTRA_PRED_MODE_FLAG):
                    mb.intra8x8_modes[blk] = pred
                else:
                    rem = 0
                    for i in range(3):
                        rem |= self._bin(T.CTX_REM_INTRA_PRED_MODE) << i
                    mb.intra8x8_modes[blk] = rem if rem < pred else rem + 1

    def _nb_intra_mode4(self, blk: int, d: str):
        """IntraMxMPredModeN for a 4x4 block neighbor (spec 8.3.1.1).

        Returns None when the neighbor MB is unavailable (caller forces DC
        for both sides), else the neighbor mode."""
        nb, nb_blk = self.nb_blk4(d, blk)
        if nb is self.cur_mb():
            return int(nb.intra4x4_modes[nb_blk])
        if not nb.available:
            return None
        if nb.kind != MbKind.I_NXN:
            return 2  # DC
        if nb.transform8x8:
            return int(nb.intra8x8_modes[nb_blk >> 2])
        return int(nb.intra4x4_modes[nb_blk])

    def _nb_intra_mode8(self, blk: int, d: str) -> int:
        """IntraMxMPredModeN for an 8x8 block neighbor (spec 8.3.2.1).

        When the neighbor MB is 4x4-coded, the adjacent covering 4x4 block is
        the neighbor 8x8 block's top-right (A) / bottom-left (B) sub-block
        (reference pred8x8.rs:735-753 quirk)."""
        nb, nb_blk8 = self.nb_blk8(d, blk)
        if nb is self.cur_mb():
            return int(nb.intra8x8_modes[nb_blk8])
        if not nb.available:
            return None
        if nb.kind != MbKind.I_NXN:
            return 2  # DC
        if nb.transform8x8:
            return int(nb.intra8x8_modes[nb_blk8])
        sub = 1 if d == "A" else 2
        return int(nb.intra4x4_modes[4 * nb_blk8 + sub])

    def intra_chroma_pred_mode(self, mb: MBState):
        a, b = self.nb_mb("A"), self.nb_mb("B")
        inc = (1 if a.chroma_mode != 0 else 0) + (1 if b.chroma_mode != 0 else 0)
        ctxs = [T.CTX_INTRA_CHROMA_PRED_MODE + inc,
                T.CTX_INTRA_CHROMA_PRED_MODE + 3]
        if self.encoding:
            v = mb.chroma_mode
            for k in range(v):
                self._bin(ctxs[min(k, 1)], 1)
            if v < 3:
                self._bin(ctxs[min(v, 1)], 0)
        else:
            v = 0
            while v < 3 and self._bin(ctxs[min(v, 1)]):
                v += 1
            mb.chroma_mode = v

    def coded_block_pattern(self, mb: MBState):
        """cbp (9.3.3.1.1.4): 4 luma bins (8x8 z-order) + up to 2 chroma."""
        bits = [0] * 6
        cur = self.cur_mb()
        for i in range(4):
            nb_a, idx_a = self.nb_blk8("A", i)
            nb_b, idx_b = self.nb_blk8("B", i)
            bit_a = bits[idx_a] if nb_a is cur else (nb_a.cbp >> idx_a) & 1
            bit_b = bits[idx_b] if nb_b is cur else (nb_b.cbp >> idx_b) & 1
            ctx = T.CTX_CBP_LUMA + (1 - bit_a) + 2 * (1 - bit_b)
            bits[i] = self._bin(ctx, (mb.cbp >> i) & 1 if self.encoding else None)
        if self.chroma_array_type in (1, 2):
            a, b = self.nb_mb("A"), self.nb_mb("B")
            ca, cb = a.cbp >> 4, b.cbp >> 4
            ctx = T.CTX_CBP_CHROMA + (1 if ca > 0 else 0) + 2 * (1 if cb > 0 else 0)
            enc_chroma = (mb.cbp >> 4) if self.encoding else None
            bits[4] = self._bin(ctx, (1 if enc_chroma > 0 else 0)
                                if self.encoding else None)
            if bits[4]:
                ctx = T.CTX_CBP_CHROMA + 4 + (1 if ca > 1 else 0) + 2 * (1 if cb > 1 else 0)
                bits[5] = self._bin(ctx, (enc_chroma - 1) if self.encoding else None)
        cbp = bits[0] | bits[1] << 1 | bits[2] << 2 | bits[3] << 3
        if bits[4]:
            cbp |= 0x10 << bits[5]
        if not self.encoding:
            mb.cbp = cbp

    def mb_qp_delta(self, mb: MBState):
        prev = self.mbs[self.prev_addr] if self.prev_addr >= 0 else None
        if prev is not None and prev.slice_id == self.slice_id and prev.qp_delta != 0:
            c0 = T.CTX_MB_QP_DELTA + 1
        else:
            c0 = T.CTX_MB_QP_DELTA
        ctxs = [c0, T.CTX_MB_QP_DELTA + 2, T.CTX_MB_QP_DELTA + 3]
        if self.encoding:
            v = mb.qp_delta
            tmp = 2 * v - 1 if v > 0 else -2 * v
            for k in range(tmp):
                self._bin(ctxs[min(k, 2)], 1)
            self._bin(ctxs[min(tmp, 2)], 0)
        else:
            tmp = 0
            while self._bin(ctxs[min(tmp, 2)]):
                tmp += 1
                if tmp > 87:
                    raise ValueError("mb_qp_delta overflow")
            mb.qp_delta = (tmp + 1) >> 1 if (tmp & 1) else -(tmp >> 1)

    # -- residual -------------------------------------------------------
    def coded_block_flag(self, cat: int, idx: int, val=None) -> int:
        """9.3.3.1.1.9: ctx from neighbor blocks' coded_block_flag."""
        cur = self.cur_mb()
        if cat in (CAT_LUMA_DC,):
            comp = 0
        elif cat in (CAT_LUMA_AC, CAT_LUMA_4X4, CAT_LUMA_8X8):
            comp = 0
        elif cat == CAT_CHROMA_DC:
            comp = idx + 1
        elif cat == CAT_CHROMA_AC:
            comp = (idx >> 3) + 1
            idx &= 7
        else:
            raise NotImplementedError(f"cat {cat}")

        if cat in (CAT_LUMA_DC, CAT_CHROMA_DC):
            nb_a, nb_b = self.nb_mb("A"), self.nb_mb("B")
            idx_a = idx_b = 16
        elif cat in (CAT_LUMA_AC, CAT_LUMA_4X4):
            nb_a, idx_a = self.nb_blk4("A", idx)
            nb_b, idx_b = self.nb_blk4("B", idx)
        elif cat == CAT_LUMA_8X8:
            nb_a, idx_a = self.nb_blk8("A", idx)
            nb_b, idx_b = self.nb_blk8("B", idx)
            idx_a *= 4
            idx_b *= 4
        else:  # CAT_CHROMA_AC
            nb_a, idx_a = self.nb_blkc("A", idx)
            nb_b, idx_b = self.nb_blkc("B", idx)
        cond_a = int(nb_a.cbf[comp][idx_a])
        cond_b = int(nb_b.cbf[comp][idx_b])
        ctx = T.CTX_CODED_BLOCK_FLAG[cat] + cond_a + 2 * cond_b
        out = self._bin(ctx, val)
        # record
        if cat == CAT_LUMA_DC:
            cur.cbf[0][16] = out
        elif cat in (CAT_LUMA_AC, CAT_LUMA_4X4):
            cur.cbf[0][idx] = out
        elif cat == CAT_LUMA_8X8:
            cur.cbf[0][idx:idx + 4] = out
        elif cat == CAT_CHROMA_DC:
            cur.cbf[comp][16] = out
        else:
            cur.cbf[comp][idx] = out
        return out

    def _sig_ctx(self, cat: int, i: int, last: bool) -> int:
        if cat == CAT_CHROMA_DC:
            inc = min(i // self.chroma_array_type, 2)
        elif cat == CAT_LUMA_8X8:
            col = 2 if last else self.field_flag
            inc = int(T.SIG_COEFF_8X8[i][col])
        else:
            inc = i
        if last:
            base = (T.CTX_LAST_FIELD if self.field_flag else T.CTX_LAST_FRAME)[cat]
        else:
            base = (T.CTX_SIG_FIELD if self.field_flag else T.CTX_SIG_FRAME)[cat]
        return base + inc

    def _abs_level_ctx(self, cat: int, num1: int, numgt1: int):
        base = T.CTX_ABS_LEVEL[cat]
        c0 = base + (0 if numgt1 != 0 else min(4, 1 + num1))
        clamp = 3 if cat == CAT_CHROMA_DC else 4
        c1 = base + 5 + min(clamp, numgt1)
        return c0, c1

    def residual_block(self, cat: int, idx: int, coeffs: np.ndarray,
                       start: int, end: int, maxnumcoeff: int, coded: bool):
        """One residual block (reference residual_cabac).

        coeffs: scan-order array of length maxnumcoeff (decode: filled;
        encode: read).  `coded`: whether cbp allows coefficients here."""
        if coded:
            if maxnumcoeff != 64 or self.chroma_array_type == 3:
                if self.encoding:
                    cbf = 1 if np.any(coeffs[start:end + 1]) else 0
                    self.coded_block_flag(cat, idx, cbf)
                else:
                    cbf = self.coded_block_flag(cat, idx)
            else:
                cbf = 1
                cur = self.cur_mb()
                cur.cbf[0][idx * 4:idx * 4 + 4] = 1
        else:
            cbf = 0
            # record zeros for neighbor ctx
            cur = self.cur_mb()
            if cat == CAT_LUMA_DC:
                cur.cbf[0][16] = 0
            elif cat in (CAT_LUMA_AC, CAT_LUMA_4X4):
                cur.cbf[0][idx] = 0
            elif cat == CAT_LUMA_8X8:
                cur.cbf[0][idx * 4:idx * 4 + 4] = 0
            elif cat == CAT_CHROMA_DC:
                cur.cbf[idx + 1][16] = 0
            else:
                cur.cbf[(idx >> 3) + 1][idx & 7] = 0
        if not cbf:
            if not self.encoding:
                coeffs[:maxnumcoeff] = 0
            return

        if self.encoding:
            sigpos = [i for i in range(start, end + 1) if coeffs[i] != 0]
            assert sigpos, "coded_block_flag=1 requires a nonzero coeff"
            last = sigpos[-1]
            numcoeff = last + 1
            for i in range(start, end + 1):
                if i == end:
                    break  # significance of the final position is inferred
                sig = 1 if coeffs[i] != 0 else 0
                self._bin(self._sig_ctx(cat, i, False), sig)
                if sig:
                    self._bin(self._sig_ctx(cat, i, True), 1 if i == last else 0)
                    if i == last:
                        break
            # reverse-order levels
            num1 = numgt1 = 0
            for i in range(numcoeff - 1, start - 1, -1):
                v = int(coeffs[i])
                if v == 0:
                    continue
                c0, c1 = self._abs_level_ctx(cat, num1, numgt1)
                mag = abs(v) - 1  # coeff_abs_level_minus1
                pre = min(mag, 14)
                for k in range(pre):
                    self._bin(c0 if k == 0 else c1, 1)
                if pre < 14:
                    self._bin(c0 if pre == 0 else c1, 0)
                self.engine.ueg_suffix(mag, 14, 0, False, 0)
                self._bypass(1 if v < 0 else 0)
                if mag != 0:
                    numgt1 += 1
                else:
                    num1 += 1
            return

        # decode
        sig = np.zeros(64, dtype=np.int32)
        numcoeff = end + 1
        i = start
        while i < numcoeff - 1:
            if self._bin(self._sig_ctx(cat, i, False)):
                sig[i] = 1
                if self._bin(self._sig_ctx(cat, i, True)):
                    numcoeff = i + 1
            i += 1
        sig[numcoeff - 1] = 1
        coeffs[:maxnumcoeff] = 0
        num1 = numgt1 = 0
        for i in range(numcoeff - 1, start - 1, -1):
            if not sig[i]:
                continue
            c0, c1 = self._abs_level_ctx(cat, num1, numgt1)
            pre = 0
            while pre < 14 and self._bin(c0 if pre == 0 else c1):
                pre += 1
            mag = self.engine.ueg_suffix(pre, 14, 0, False)
            s = self._bypass()
            coeffs[i] = -(mag + 1) if s else mag + 1
            if mag != 0:
                numgt1 += 1
            else:
                num1 += 1

    def residual(self, mb: MBState):
        """Residual for one MB (reference residual/residual_luma)."""
        # luma
        if mb.kind == MbKind.I_16X16:
            self.residual_block(CAT_LUMA_DC, 0, mb.luma_dc, 0, 15, 16, True)
            for i in range(16):
                coded = bool((mb.cbp >> (i >> 2)) & 1)
                self.residual_block(CAT_LUMA_AC, i, mb.luma4[i], 0, 14, 15, coded)
        elif mb.transform8x8:
            mb.cbf[0][16] = 0
            for i in range(4):
                coded = bool((mb.cbp >> i) & 1)
                self.residual_block(CAT_LUMA_8X8, i, mb.luma8[i], 0, 63, 64, coded)
        else:
            mb.cbf[0][16] = 0
            for i in range(16):
                coded = bool((mb.cbp >> (i >> 2)) & 1)
                self.residual_block(CAT_LUMA_4X4, i, mb.luma4[i], 0, 15, 16, coded)
        # chroma (4:2:0 / 4:2:2)
        if self.chroma_array_type in (1, 2):
            nc = 4 * self.chroma_array_type
            for c in range(2):
                self.residual_block(CAT_CHROMA_DC, c, mb.chroma_dc[c],
                                    0, nc - 1, nc, bool(mb.cbp & 0x30))
            for c in range(2):
                for j in range(nc):
                    self.residual_block(CAT_CHROMA_AC, c * 8 + j,
                                        mb.chroma_ac[c][j], 0, 14, 15,
                                        bool(mb.cbp & 0x20))
        elif self.chroma_array_type == 3:
            raise NotImplementedError("4:4:4 residual")

    # -- macroblock layer ----------------------------------------------
    def macroblock_layer(self, mb: MBState):
        """Decode/encode one MB (reference macroblock_layer, mod.rs:89-210)."""
        sps, pps = self.sps, self.pps
        mb.slice_id = self.slice_id
        self.mbs[self.curr] = mb
        self.mb_type_i(mb)

        if mb.kind == MbKind.I_PCM:
            self._pcm(mb)
        else:
            if mb.kind == MbKind.I_NXN and pps.transform_8x8_mode_flag:
                self.transform_size_8x8_flag(mb)
            # mb_pred (intra)
            if mb.kind == MbKind.I_NXN:
                if mb.transform8x8:
                    self.intra8x8_pred_modes(mb)
                else:
                    self.intra4x4_pred_modes(mb)
            if self.chroma_array_type in (1, 2):
                self.intra_chroma_pred_mode(mb)
            if mb.kind == MbKind.I_NXN:
                self.coded_block_pattern(mb)
            if mb.cbp != 0 or mb.kind == MbKind.I_16X16:
                self.mb_qp_delta(mb)
            else:
                mb.qp_delta = 0
            self.residual(mb)

        # QP chain (reference mod.rs:186-193)
        off = self.qp_bd_offset_y
        mb.qp_y = ((self.qpy_prev + mb.qp_delta + 52 + 2 * off) % (52 + off)) - off
        self.qpy_prev = mb.qp_y
        # propagate resolved 8x8 modes into 4x4 slots for neighbor prediction
        if mb.kind == MbKind.I_NXN and mb.transform8x8:
            mb.intra4x4_modes[:] = np.repeat(mb.intra8x8_modes, 4)

    def _pcm(self, mb: MBState):
        eng = self.engine
        bd_l = self.sps.bit_depth_luma_minus8 + 8
        bd_c = self.sps.bit_depth_chroma_minus8 + 8
        n_chroma = 64 << self.chroma_array_type if self.chroma_array_type else 0
        if self.encoding:
            # pcm_alignment_zero_bit + raw samples + engine re-init (9.3.1.2)
            eng.byte_align()
            for v in mb.pcm_luma:
                eng.write_raw(int(v), bd_l)
            if n_chroma:
                for v in mb.pcm_chroma.reshape(-1):
                    eng.write_raw(int(v), bd_c)
            eng.reinit_engine()
        else:
            eng.byte_align()  # skip pcm_alignment_zero_bit
            mb.pcm_luma = np.array([eng._read_bits(bd_l) for _ in range(256)],
                                   dtype=np.int32)
            if n_chroma:
                mb.pcm_chroma = np.array(
                    [eng._read_bits(bd_c) for _ in range(n_chroma)],
                    dtype=np.int32).reshape(2, -1)
            eng.reinit_engine()
        mb.qp_delta = 0
        mb.transform8x8 = 0
        mb.cbp = 0x2F
        mb.chroma_mode = 0
        mb.cbf[:] = 1
        mb.intra4x4_modes[:] = 2
        mb.intra8x8_modes[:] = 2

    # -- slice loop ------------------------------------------------------
    def decode_slice_data(self):
        """I-slice decode loop (reference Slice::data, slice/mod.rs:199-254)."""
        assert not self.encoding
        n_mbs = self.mb_w * self.mb_h
        while True:
            mb = MBState.fresh()
            self.macroblock_layer(mb)
            self.prev_addr = self.curr
            end = self._terminate()
            if end or self.curr + 1 >= n_mbs:
                break
            self.curr += 1
        return self.curr

    def encode_slice_data(self, mb_list):
        """Encode MBs [first_mb..] from pre-filled MBState records."""
        assert self.encoding
        for k, mb in enumerate(mb_list):
            self.macroblock_layer(mb)
            self.prev_addr = self.curr
            last = k + 1 == len(mb_list)
            self._terminate(1 if last else 0)
            if not last:
                self.curr += 1
