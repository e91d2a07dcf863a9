"""Stage B: intra prediction + reconstruction as an anti-diagonal MB wavefront.

The intra feedback loop (prediction reads already-reconstructed neighbor
pixels, reference pred4x4.rs:62) forces sequential ordering; the exploitable
parallelism is the classic H.264 wavefront: MB (x, y) depends on
(x-1,y), (x,y-1), (x+1,y-1), (x-1,y-1), so all MBs with equal d = x + 2y
are independent.  We lax.scan over d; each step reconstructs every MB on
the diagonal in parallel (vmapped gathers -> branchless per-kind
reconstruction -> batched scatter).  All arithmetic is exact int32: output
is bit-identical to the scalar refimpl path.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..avc.neighbors import ZSCAN_4X4_POS, POS_TO_ZSCAN
from ..coeffs import KIND_I4, KIND_I8, KIND_I16, KIND_PCM
from . import intra_pred as ipk

# ---------------------------------------------------------------------------
# static schedules / tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def diag_schedule(mb_w: int, mb_h: int):
    """[n_diag, K] MB addresses per anti-diagonal (x + 2y = d), -1 padded."""
    diags = {}
    for my in range(mb_h):
        for mx in range(mb_w):
            diags.setdefault(mx + 2 * my, []).append(my * mb_w + mx)
    n_diag = mb_w + 2 * (mb_h - 1)
    K = max(len(v) for v in diags.values())
    out = np.full((n_diag, K), -1, dtype=np.int32)
    for d, addrs in diags.items():
        out[d, :len(addrs)] = addrs
    return out


# per-4x4-block availability source: 0=always True, 1=mb_a, 2=mb_b, 3=mb_c,
# 4=mb_d, 5=always False
def _blk4_avail_tables():
    a_src, b_src, c_src, d_src = [], [], [], []
    for blk in range(16):
        bx, by = ZSCAN_4X4_POS[blk]
        a_src.append(0 if bx > 0 else 1)
        b_src.append(0 if by > 0 else 2)
        if bx > 0 and by > 0:
            d_src.append(0)
        elif bx == 0 and by > 0:
            d_src.append(1)
        elif bx > 0 and by == 0:
            d_src.append(2)
        else:
            d_src.append(4)
        if by == 0:
            c_src.append(2 if bx < 3 else 3)
        elif bx == 3:
            c_src.append(5)
        else:
            nb_z = POS_TO_ZSCAN[(bx + 1, by - 1)]
            c_src.append(0 if nb_z < blk else 5)
    return (np.array(a_src), np.array(b_src),
            np.array(c_src), np.array(d_src))


BLK4_A, BLK4_B, BLK4_C, BLK4_D = _blk4_avail_tables()
# 8x8 blocks (raster 0..3)
BLK8_A = np.array([1, 0, 1, 0])
BLK8_B = np.array([2, 2, 0, 0])
BLK8_C = np.array([2, 3, 0, 5])
BLK8_D = np.array([4, 2, 1, 0])


def _resolve_avail(src_code, mb_a, mb_b, mb_c, mb_d):
    """src_code static int -> [K] bool."""
    if src_code == 0:
        return jnp.ones_like(mb_a)
    if src_code == 5:
        return jnp.zeros_like(mb_a)
    return [None, mb_a, mb_b, mb_c, mb_d][src_code]


# ---------------------------------------------------------------------------
# the wavefront step
# ---------------------------------------------------------------------------

LW = 25   # luma window cols: x0-1 .. x0+23
LH = 17   # luma window rows: y0-1 .. y0+15


def _gather_window(plane_pad, ys, xs, h, w):
    """vmapped dynamic_slice: plane_pad [Hp, Wp]; ys/xs [K] -> [K,h,w]."""
    def one(y, x):
        return jax.lax.dynamic_slice(plane_pad, (y, x), (h, w))
    return jax.vmap(one)(ys, xs)


def make_wavefront_fn(mb_w: int, mb_h: int, bitdepth: int = 8):
    """Builds the jit-able wavefront reconstruction for a frame geometry.

    Returns fn(syntax_dict, y_resid, cb_resid, cr_resid) -> (y, cb, cr)."""
    H, W = mb_h * 16, mb_w * 16
    sched = jnp.asarray(diag_schedule(mb_w, mb_h))
    n_diag, K = sched.shape
    maxv = (1 << bitdepth) - 1

    def step(carry, diag_addrs):
        y_pad, cb_pad, cr_pad, s = carry
        addrs = diag_addrs          # [K], -1 padded
        valid = addrs >= 0
        a = jnp.maximum(addrs, 0)
        mx = a % mb_w
        my = a // mb_w
        x0 = mx * 16
        y0 = my * 16

        kind = s["kind"][a]
        av_a = s["avail_a"][a] & valid
        av_b = s["avail_b"][a] & valid
        av_c = s["avail_c"][a] & valid
        av_d = s["avail_d"][a] & valid

        # gather local luma window: padded plane offset (+1,+1); window
        # starts at (y0-1, x0-1) -> padded coords (y0, x0)
        L = _gather_window(y_pad, y0, x0, LH, LW)  # [K,LH,LW] int32
        resid = _gather_window(s["y_resid"], y0, x0, 16, 16)

        # ---- I16 path -------------------------------------------------
        above16 = L[:, 0, 1:17]
        left16 = L[:, 1:17, 0]
        corner = L[:, 0, 0]
        p16 = ipk.pred16x16_batch(s["i16_mode"][a], above16, left16, corner,
                                  av_a, av_b, av_d, bitdepth)
        o16 = jnp.clip(p16 + resid, 0, maxv)

        # ---- I4 path (16 sequential sub-blocks on the local window) ---
        L4 = L
        for blk in range(16):
            bx, by = ZSCAN_4X4_POS[blk]
            aa = _resolve_avail(int(BLK4_A[blk]), av_a, av_b, av_c, av_d)
            ab = _resolve_avail(int(BLK4_B[blk]), av_a, av_b, av_c, av_d)
            ac = _resolve_avail(int(BLK4_C[blk]), av_a, av_b, av_c, av_d)
            r0, c0 = 4 * by, 4 * bx  # local coords of (y-1, x-1) corner
            above8 = L4[:, r0, c0 + 1:c0 + 9]
            above8 = jnp.concatenate([
                above8[:, :4],
                jnp.where(ac[:, None], above8[:, 4:8], above8[:, 3:4]),
            ], axis=1)
            left4 = L4[:, r0 + 1:r0 + 5, c0]
            corn = L4[:, r0, c0]
            pred = ipk.pred4x4_batch(s["modes4"][a, blk], above8, left4,
                                     corn, aa, ab, bitdepth)
            rblk = resid[:, by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
            u = jnp.clip(pred + rblk, 0, maxv)
            L4 = L4.at[:, r0 + 1:r0 + 5, c0 + 1:c0 + 5].set(u)
        o4 = L4[:, 1:17, 1:17]

        # ---- I8 path (4 sequential 8x8 blocks) ------------------------
        L8 = L
        for blk in range(4):
            bx, by = blk & 1, blk >> 1
            aa = _resolve_avail(int(BLK8_A[blk]), av_a, av_b, av_c, av_d)
            ab = _resolve_avail(int(BLK8_B[blk]), av_a, av_b, av_c, av_d)
            ac = _resolve_avail(int(BLK8_C[blk]), av_a, av_b, av_c, av_d)
            ad = _resolve_avail(int(BLK8_D[blk]), av_a, av_b, av_c, av_d)
            r0, c0 = 8 * by, 8 * bx
            above16 = L8[:, r0, c0 + 1:c0 + 17]
            above16 = jnp.concatenate([
                above16[:, :8],
                jnp.where(ac[:, None], above16[:, 8:16], above16[:, 7:8]),
            ], axis=1)
            left8 = L8[:, r0 + 1:r0 + 9, c0]
            corn = L8[:, r0, c0]
            fa, fl, fz = ipk.filter8x8_batch(above16, left8, corn, aa, ab, ad)
            pred = ipk.pred8x8_batch(s["modes8"][a, blk], fa, fl, fz,
                                     aa, ab, bitdepth)
            rblk = resid[:, by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            u = jnp.clip(pred + rblk, 0, maxv)
            L8 = L8.at[:, r0 + 1:r0 + 9, c0 + 1:c0 + 9].set(u)
        o8 = L8[:, 1:17, 1:17]

        # ---- select + scatter luma -------------------------------------
        out16 = jnp.where((kind == KIND_PCM)[:, None, None], s["pcm_y"][a],
                  jnp.where((kind == KIND_I16)[:, None, None], o16,
                    jnp.where((kind == KIND_I8)[:, None, None], o8, o4)))
        ys = jnp.where(valid, y0 + 1, H + 64)
        iy = ys[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, :, None]
        ix = (x0 + 1)[:, None, None] + jnp.arange(16, dtype=jnp.int32)[None, None, :]
        y_pad = y_pad.at[iy, ix].set(out16, mode="drop")

        # ---- chroma ----------------------------------------------------
        cx0 = mx * 8
        cy0 = my * 8
        for ci, (plane, resid_key, dump) in enumerate(
                ((cb_pad, "cb_resid", 0), (cr_pad, "cr_resid", 0))):
            Cw = _gather_window(plane, cy0, cx0, 9, 9)
            cresid = _gather_window(s[resid_key], cy0, cx0, 8, 8)
            abv = Cw[:, 0, 1:9]
            lft = Cw[:, 1:9, 0]
            crn = Cw[:, 0, 0]
            pc = ipk.pred_chroma_batch(s["chroma_mode"][a], abv, lft, crn,
                                       av_a, av_b, av_d, bitdepth)
            oc = jnp.clip(pc + cresid, 0, maxv)
            oc = jnp.where((kind == KIND_PCM)[:, None, None],
                           s["pcm_c"][a, ci], oc)
            cys = jnp.where(valid, cy0 + 1, H // 2 + 64)
            jy = cys[:, None, None] + jnp.arange(8, dtype=jnp.int32)[None, :, None]
            jx = (cx0 + 1)[:, None, None] + jnp.arange(8, dtype=jnp.int32)[None, None, :]
            plane = plane.at[jy, jx].set(oc, mode="drop")
            if ci == 0:
                cb_pad = plane
            else:
                cr_pad = plane

        return (y_pad, cb_pad, cr_pad, s), None

    def run(syntax, y_resid, cb_resid, cr_resid):
        s = dict(syntax)
        s["y_resid"] = y_resid
        s["cb_resid"] = cb_resid
        s["cr_resid"] = cr_resid
        y_pad = jnp.zeros((H + 1 + 80, W + 1 + 80), dtype=jnp.int32)
        cb_pad = jnp.zeros((H // 2 + 1 + 80, W // 2 + 1 + 80), dtype=jnp.int32)
        cr_pad = jnp.zeros_like(cb_pad)
        (y_pad, cb_pad, cr_pad, _), _ = jax.lax.scan(
            step, (y_pad, cb_pad, cr_pad, s), sched)
        return (y_pad[1:H + 1, 1:W + 1], cb_pad[1:H // 2 + 1, 1:W // 2 + 1],
                cr_pad[1:H // 2 + 1, 1:W // 2 + 1])

    return run
