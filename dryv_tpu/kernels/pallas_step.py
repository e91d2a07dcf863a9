"""Pallas mega-kernel for one wavefront diagonal step.

The XLA scan body compiles to dozens of small TPU kernels whose fixed
launch overhead (~0.5-1 ms/step x 253 steps) dominates 1080p
reconstruction.  This module fuses the entire per-diagonal computation —
apron assembly from the lane-aligned frontier, I16/I4/I8 prediction
(matrix-form, MXU), residual add/clip, chroma, frontier update — into a
single pallas_call, so the scan body is one kernel plus trivial glue.

Falls back transparently (pipeline keeps the pure-XLA lane_step) if
Mosaic rejects the kernel on some backend; bit-exactness is asserted in
tests against the XLA path.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..coeffs import KIND_I4, KIND_I8, KIND_I16, KIND_PCM
from .pred_tables import tables_4x4, tables_8x8, filter_tables_8x8, to_matrix
from .wavefront import (BLK4_A, BLK4_B, BLK4_C, BLK4_D, BLK8_A, BLK8_B,
                        BLK8_C, BLK8_D, ZSCAN_4X4_POS)


def _avail_from_code(codes, av):
    """codes [nblk] static; av dict of [K] arrays -> [nblk, K] bool."""
    rows = []
    for c in codes:
        c = int(c)
        if c == 0:
            rows.append(jnp.ones_like(av["a"]))
        elif c == 5:
            rows.append(jnp.zeros_like(av["a"]))
        else:
            rows.append([None, av["a"], av["b"], av["c"], av["d"]][c])
    return jnp.stack(rows)


@lru_cache(maxsize=None)
def _mats():
    I4, W4, R4, S4 = tables_4x4()
    I8, W8, R8, S8 = tables_8x8()
    (F1i, F1w, _, _), (F0i, F0w, _, _) = filter_tables_8x8()
    return {
        "M4": to_matrix(I4, W4, 13), "R4": R4.reshape(-1).astype(np.int32),
        "S4": S4.reshape(-1).astype(np.int32),
        "M8": to_matrix(I8, W8, 25), "R8": R8.reshape(-1).astype(np.int32),
        "S8": S8.reshape(-1).astype(np.int32),
        "MF1": to_matrix(F1i[None], F1w[None], 25),
        "MF0": to_matrix(F0i[None], F0w[None], 25),
    }


def make_step_kernel(K: int, bitdepth: int = 8):
    """Builds the fused diagonal-step function.

    Signature matches lane_step(x, K, state) -> (new_state, out16, outc)."""
    maxv = (1 << bitdepth) - 1
    mats = _mats()
    M4 = jnp.asarray(mats["M4"])
    R4 = jnp.asarray(mats["R4"])
    S4 = jnp.asarray(mats["S4"])
    M8 = jnp.asarray(mats["M8"])
    R8 = jnp.asarray(mats["R8"])
    S8 = jnp.asarray(mats["S8"])
    MF1 = jnp.asarray(mats["MF1"])
    MF0 = jnp.asarray(mats["MF0"])
    zpos = ZSCAN_4X4_POS

    def kernel(shift_ref,                    # SMEM [4]: s_ab, s_ar, s_lf, s_cn
               kind_ref, i16m_ref, cmode_ref, modes4_ref, modes8_ref,
               ava_ref, avb_ref, avc_ref, avd_ref, valid_ref,
               yres_ref, cres_ref,
               yb1_ref, yb2_ref, yb3_ref, yr1_ref,
               cb1_ref, cb2_ref, cb3_ref, cr1_ref,
               m4_ref, r4_ref, s4_ref, m8_ref, r8_ref, s8_ref,
               mf1_ref, mf0_ref,
               out16_ref, outc_ref, L_ref, L8_ref, pad_ref):
        M4 = m4_ref[:]
        R4 = r4_ref[:]
        S4 = s4_ref[:]
        M8 = m8_ref[:]
        R8 = r8_ref[:]
        S8 = s8_ref[:]
        MF1 = mf1_ref[:]
        MF0 = mf0_ref[:]
        s_ab = shift_ref[0]
        s_ar = shift_ref[1]
        s_lf = shift_ref[2]
        s_cn = shift_ref[3]

        zeros2 = jnp.zeros((2, 16), jnp.int32)

        def shifted16(arr, s):
            # lane shift via pl.ds on a padded scratch row buffer
            pad_ref[0:2] = zeros2
            pad_ref[2:K + 2] = arr
            pad_ref[K + 2:K + 4] = zeros2
            return pad_ref[pl.ds(2 + s, K)]

        above16 = shifted16(yb2_ref[:], s_ab)
        abover8 = shifted16(yb1_ref[:], s_ar)[:, :8]
        corner = shifted16(yb3_ref[:], s_cn)[:, 15]
        left16 = shifted16(yr1_ref[:], s_lf)

        kind = kind_ref[:]
        valid = valid_ref[:] != 0
        av = {"a": (ava_ref[:] != 0) & valid, "b": (avb_ref[:] != 0) & valid,
              "c": (avc_ref[:] != 0) & valid, "d": (avd_ref[:] != 0) & valid}
        resid = yres_ref[:].astype(jnp.int32)

        # ---- I16 ------------------------------------------------------
        i16m = i16m_ref[:]
        p16 = _pred16(i16m, above16, left16, corner, av, maxv)
        o16 = jnp.clip(p16 + resid, 0, maxv)

        # ---- I4 (16 sequential sub-blocks) ----------------------------
        aa4 = _avail_from_code(BLK4_A, av)
        ab4 = _avail_from_code(BLK4_B, av)
        ac4 = _avail_from_code(BLK4_C, av)
        modes4 = modes4_ref[:]
        # apron row/col into the scratch working buffer (in-place stores)
        L_ref[:, 0, 0] = corner
        L_ref[:, 0, 1:17] = above16
        L_ref[:, 0, 17:25] = abover8
        L_ref[:, 1:17, 0] = left16
        for blk in range(16):
            bx, by = zpos[blk]
            r0, c0 = 4 * by, 4 * bx
            row = L_ref[:, r0, c0:c0 + 9]
            above8 = jnp.concatenate([
                row[:, 1:5],
                jnp.where(ac4[blk][:, None], row[:, 5:9], row[:, 4:5])],
                axis=1)
            left4 = L_ref[:, r0 + 1:r0 + 5, c0]
            corn = row[:, 0]
            sv = jnp.concatenate([corn[:, None], above8, left4], axis=1)
            acc = jnp.dot(sv.astype(jnp.float32), M4,
                          preferred_element_type=jnp.float32)
            vals = ((acc.astype(jnp.int32) + R4) >> S4).reshape(K, 9, 16)
            pred = _select_mode(vals, modes4[:, blk], above8[:, :4], left4,
                                av, aa4[blk], ab4[blk], maxv, 4)
            rblk = resid[:, 4 * by:4 * by + 4, 4 * bx:4 * bx + 4]
            u = jnp.clip(pred + rblk, 0, maxv)
            L_ref[:, r0 + 1:r0 + 5, c0 + 1:c0 + 5] = u
        o4 = L_ref[:, 1:17, 1:17]

        # ---- I8 (4 sequential sub-blocks) -----------------------------
        aa8 = _avail_from_code(BLK8_A, av)
        ab8 = _avail_from_code(BLK8_B, av)
        ac8 = _avail_from_code(BLK8_C, av)
        ad8 = _avail_from_code(BLK8_D, av)
        modes8 = modes8_ref[:]
        L8_ref[:, 0, :] = L_ref[:, 0, :]
        L8_ref[:, 1:17, 0] = left16
        for blk in range(4):
            bx, by = blk & 1, blk >> 1
            r0, c0 = 8 * by, 8 * bx
            row = L8_ref[:, r0, c0:c0 + 17]
            above = jnp.concatenate([
                row[:, 1:9],
                jnp.where(ac8[blk][:, None], row[:, 9:17], row[:, 8:9])],
                axis=1)
            left8 = L8_ref[:, r0 + 1:r0 + 9, c0]
            corn = row[:, 0]
            sv = jnp.concatenate([corn[:, None], above, left8], axis=1)
            svf = sv.astype(jnp.float32)
            f_d = (jnp.dot(svf, MF1, preferred_element_type=jnp.float32)
                   .astype(jnp.int32) + 2) >> 2
            f_nd = (jnp.dot(svf, MF0, preferred_element_type=jnp.float32)
                    .astype(jnp.int32) + 2) >> 2
            f = jnp.where(ad8[blk][:, None], f_d, f_nd)
            a0 = above[:, 0]
            l0 = left8[:, 0]
            fz = jnp.where(aa8[blk] & ab8[blk],
                           (a0 + 2 * corn + l0 + 2) >> 2,
                           jnp.where(ab8[blk], (3 * corn + a0 + 2) >> 2,
                                     jnp.where(aa8[blk],
                                               (3 * corn + l0 + 2) >> 2,
                                               corn)))
            fz = jnp.where(ad8[blk], fz, corn)
            fa = jnp.where(ab8[blk][:, None], f[:, 1:17], above)
            fl = jnp.where(aa8[blk][:, None], f[:, 17:25], left8)
            sv2 = jnp.concatenate([fz[:, None], fa, fl], axis=1)
            acc = jnp.dot(sv2.astype(jnp.float32), M8,
                          preferred_element_type=jnp.float32)
            vals = ((acc.astype(jnp.int32) + R8) >> S8).reshape(K, 9, 64)
            pred = _select_mode(vals, modes8[:, blk], fa[:, :8], fl, av,
                                aa8[blk], ab8[blk], maxv, 8)
            rblk = resid[:, 8 * by:8 * by + 8, 8 * bx:8 * bx + 8]
            u = jnp.clip(pred + rblk, 0, maxv)
            L8_ref[:, r0 + 1:r0 + 9, c0 + 1:c0 + 9] = u
        o8 = L8_ref[:, 1:17, 1:17]

        out16 = jnp.where((kind == KIND_PCM)[:, None, None], resid,
                  jnp.where((kind == KIND_I16)[:, None, None], o16,
                    jnp.where((kind == KIND_I8)[:, None, None], o8, o4)))
        out16_ref[:] = out16.astype(jnp.uint8)

        # ---- chroma ----------------------------------------------------
        cab = shifted16(cb2_ref[:].reshape(K, 16), s_ab).reshape(K, 2, 8)
        csh = shifted16(cb3_ref[:].reshape(K, 16), s_cn)
        ccorn = jnp.stack([csh[:, 7], csh[:, 15]], axis=1)
        cleft = shifted16(cr1_ref[:].reshape(K, 16), s_lf).reshape(K, 2, 8)
        cresid = cres_ref[:].astype(jnp.int32)
        cmode = cmode_ref[:]
        ocs = []
        for ci in range(2):
            pc = _pred_chroma(cmode, cab[:, ci], cleft[:, ci],
                              ccorn[:, ci], av, maxv)
            oc = jnp.clip(pc + cresid[:, ci], 0, maxv)
            oc = jnp.where((kind == KIND_PCM)[:, None, None],
                           cresid[:, ci], oc)
            ocs.append(oc)
        outc_ref[:] = jnp.stack(ocs, axis=1).astype(jnp.uint8)

    def _pred16(mode, above, left, corner, av, maxv):
        K_ = above.shape[0]
        p_v = jnp.broadcast_to(above[:, None, :], (K_, 16, 16))
        p_h = jnp.broadcast_to(left[:, :, None], (K_, 16, 16))
        suma = jnp.sum(above, axis=1)
        suml = jnp.sum(left, axis=1)
        dc = jnp.where(av["a"] & av["b"], (suma + suml + 16) >> 5,
                       jnp.where(av["a"], (suml + 8) >> 4,
                                 jnp.where(av["b"], (suma + 8) >> 4,
                                           jnp.full_like(suma, 128))))
        p_dc = jnp.broadcast_to(dc[:, None, None], (K_, 16, 16))
        z = corner
        hh = sum((x + 1) * (above[:, 8 + x] -
                            (above[:, 6 - x] if x < 7 else z))
                 for x in range(8))
        vv = sum((y + 1) * (left[:, 8 + y] -
                            (left[:, 6 - y] if y < 7 else z))
                 for y in range(8))
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
        aa = 16 * (above[:, 15] + left[:, 15])
        xs = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (16, 16), 0)
        val = (aa[:, None, None] + b[:, None, None] * (xs - 7)[None]
               + c[:, None, None] * (ys - 7)[None] + 16) >> 5
        p_pl = jnp.clip(val, 0, maxv)
        oh = [(mode == m).astype(jnp.int32)[:, None, None]
              for m in range(4)]
        return (p_v * oh[0] + p_h * oh[1] + p_dc * oh[2] + p_pl * oh[3])

    def _pred_chroma(mode, above, left, corner, av, maxv):
        K_ = above.shape[0]
        p_h = jnp.broadcast_to(left[:, :, None], (K_, 8, 8))
        p_v = jnp.broadcast_to(above[:, None, :], (K_, 8, 8))
        quads = []
        for by in (0, 4):
            for bx in (0, 4):
                asum = above[:, bx:bx + 4].sum(axis=1)
                lsum = left[:, by:by + 4].sum(axis=1)
                if (bx == 0 and by == 0) or (bx > 0 and by > 0):
                    v = jnp.where(av["a"] & av["b"], (asum + lsum + 4) >> 3,
                                  jnp.where(av["a"], (lsum + 2) >> 2,
                                            jnp.where(av["b"],
                                                      (asum + 2) >> 2, 128)))
                elif bx > 0:
                    v = jnp.where(av["b"], (asum + 2) >> 2,
                                  jnp.where(av["a"], (lsum + 2) >> 2, 128))
                else:
                    v = jnp.where(av["a"], (lsum + 2) >> 2,
                                  jnp.where(av["b"], (asum + 2) >> 2, 128))
                quads.append(v)
        def q(i):
            return jnp.broadcast_to(quads[i][:, None, None], (K_, 4, 4))
        p_dc = jnp.concatenate([
            jnp.concatenate([q(0), q(1)], axis=2),
            jnp.concatenate([q(2), q(3)], axis=2)], axis=1)
        z = corner
        hs = sum((x + 1) * (above[:, 4 + x] -
                            (above[:, 2 - x] if x <= 2 else z))
                 for x in range(4))
        vs = sum((y + 1) * (left[:, 4 + y] -
                            (left[:, 2 - y] if y <= 2 else z))
                 for y in range(4))
        b = (34 * hs + 32) >> 6
        c = (34 * vs + 32) >> 6
        aa = 16 * (above[:, 7] + left[:, 7])
        xs = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
        ys = jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
        val = (aa[:, None, None] + b[:, None, None] * (xs - 3)[None]
               + c[:, None, None] * (ys - 3)[None] + 16) >> 5
        p_pl = jnp.clip(val, 0, maxv)
        oh = [(mode == m).astype(jnp.int32)[:, None, None]
              for m in range(4)]
        return (p_dc * oh[0] + p_h * oh[1] + p_v * oh[2] + p_pl * oh[3])

    def _select_mode(vals, mode, above4, left4, av, aa, ab, maxv, n):
        # vals [K, 9, n*n]; DC handled from raw samples
        P = n * n
        oh = (jax.lax.broadcasted_iota(jnp.int32, (vals.shape[0], 9), 1) ==
              mode[:, None].astype(jnp.int32)).astype(jnp.int32)
        sel = jnp.sum(vals * oh[:, :, None], axis=1)
        suma = jnp.sum(above4, axis=1)
        suml = jnp.sum(left4, axis=1)
        if n == 4:
            dc = jnp.where(aa & ab, (suma + suml + 4) >> 3,
                           jnp.where(aa, (suml + 2) >> 2,
                                     jnp.where(ab, (suma + 2) >> 2, 128)))
        else:
            suma8 = jnp.sum(above4, axis=1)  # above4 is fa[:, :8] here
            dc = jnp.where(aa & ab, (suma8 + suml + 8) >> 4,
                           jnp.where(aa, (suml + 4) >> 3,
                                     jnp.where(ab, (suma8 + 4) >> 3, 128)))
        out = jnp.where((mode == 2)[:, None], dc[:, None], sel)
        return out.reshape(-1, n, n)

    # ---- the pallas_call wrapper --------------------------------------
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    def step(x, state):
        shifts = jnp.stack([x["s_ab"], x["s_ar"], x["s_lf"], x["s_cn"]])
        out16, outc = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((K, 16, 16), jnp.uint8),
                jax.ShapeDtypeStruct((K, 2, 8, 8), jnp.uint8),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 28,
            out_specs=(vmem, vmem),
            scratch_shapes=[pltpu.VMEM((K, 17, 25), jnp.int32),
                            pltpu.VMEM((K, 17, 25), jnp.int32),
                            pltpu.VMEM((K + 4, 16), jnp.int32)],
        )(shifts.astype(jnp.int32),
          x["kind"].astype(jnp.int32), x["i16_mode"].astype(jnp.int32),
          x["chroma_mode"].astype(jnp.int32),
          x["modes4"].astype(jnp.int32), x["modes8"].astype(jnp.int32),
          x["avail_a"].astype(jnp.int32), x["avail_b"].astype(jnp.int32),
          x["avail_c"].astype(jnp.int32), x["avail_d"].astype(jnp.int32),
          x["valid"].astype(jnp.int32),
          x["y_resid"], x["c_resid"],
          state["yb1"], state["yb2"], state["yb3"], state["yr1"],
          state["cb1"], state["cb2"], state["cb3"], state["cr1"],
          M4, R4, S4, M8, R8, S8, MF1, MF0)
        o16 = out16.astype(jnp.int32)
        oc = outc.astype(jnp.int32)
        new_state = {
            "yb1": o16[:, 15, :],
            "yb2": state["yb1"],
            "yb3": state["yb2"],
            "yr1": o16[:, :, 15],
            "cb1": oc[:, :, 7, :],
            "cb2": state["cb1"],
            "cb3": state["cb2"],
            "cr1": oc[:, :, :, 7],
        }
        return new_state, out16, outc

    return step
