"""Stage A: inverse quantization + inverse transforms, batched over all
blocks of a frame (spec 8.5; reference transform.rs / pred16x16.rs /
trans_chroma.rs butterflies).

No cross-block dependencies (SURVEY.md §2.10) — everything here is
embarrassingly parallel VPU work with exact int32 arithmetic.  Produces
full-frame residual planes consumed by the wavefront stage.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..refimpl.transform import V4X4, V8X8, CLASS4, CLASS8
from ..coeffs import KIND_I16, KIND_I8

# Flat-16 level scale tables (fixtures/default); [6,4,4] / [6,8,8] int32.
LS4_FLAT = np.asarray(16 * V4X4[:, CLASS4], dtype=np.int32)
LS8_FLAT = np.asarray(16 * V8X8[:, CLASS8], dtype=np.int32)

# z-scan 4x4 block index -> (bx, by) in 4x4-block units
from ..avc.neighbors import ZSCAN_4X4_POS
ZPOS = np.array(ZSCAN_4X4_POS, dtype=np.int32)  # [16, 2] (x, y)


def dequant4(c, qp, ls4, dc_passthrough_mask=None):
    """c [N,4,4] int32, qp [N] int32, ls4 [6,4,4] -> d [N,4,4].

    dc_passthrough_mask: optional [N] bool — where True, d[0,0] = c[0,0]."""
    ls = ls4[qp % 6]  # [N,4,4]
    shift = qp // 6
    prod = c * ls
    hi = prod << jnp.maximum(shift - 4, 0)[:, None, None]
    rnd = 1 << jnp.clip(3 - shift, 0, 3)
    lo = (prod + rnd[:, None, None]) >> jnp.maximum(4 - shift, 0)[:, None, None]
    d = jnp.where((qp >= 24)[:, None, None], hi, lo)
    if dc_passthrough_mask is not None:
        d = d.at[:, 0, 0].set(jnp.where(dc_passthrough_mask, c[:, 0, 0],
                                        d[:, 0, 0]))
    return d


def idct4(d):
    """Butterfly 8.5.12.2: d [N,4,4] -> r [N,4,4] (with final rounding)."""
    d0, d1, d2, d3 = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    e0, e1 = d0 + d2, d0 - d2
    e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
    f = jnp.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    f0, f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :], f[..., 3, :]
    g0, g1 = f0 + f2, f0 - f2
    g2, g3 = (f1 >> 1) - f3, f1 + (f3 >> 1)
    h = jnp.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=-2)
    return (h + 32) >> 6


def idct8(d):
    """8.5.13 two-stage butterfly: d [N,8,8] -> r [N,8,8]."""
    def stage(m):
        c = [m[..., k] for k in range(8)]
        e0 = c[0] + c[4]
        e1 = -c[3] + c[5] - c[7] - (c[7] >> 1)
        e2 = c[0] - c[4]
        e3 = c[1] + c[7] - c[3] - (c[3] >> 1)
        e4 = (c[2] >> 1) - c[6]
        e5 = -c[1] + c[7] + c[5] + (c[5] >> 1)
        e6 = c[2] + (c[6] >> 1)
        e7 = c[3] + c[5] + c[1] + (c[1] >> 1)
        f0 = e0 + e6
        f1 = e1 + (e7 >> 2)
        f2 = e2 + e4
        f3 = e3 + (e5 >> 2)
        f4 = e2 - e4
        f5 = (e3 >> 2) - e5
        f6 = e0 - e6
        f7 = e7 - (e1 >> 2)
        return jnp.stack([f0 + f7, f2 + f5, f4 + f3, f6 + f1,
                          f6 - f1, f4 - f3, f2 - f5, f0 - f7], axis=-1)
    g = stage(d)
    h = stage(jnp.swapaxes(g, -1, -2))
    return (jnp.swapaxes(h, -1, -2) + 32) >> 6


def dequant8(c, qp, ls8):
    ls = ls8[qp % 6]
    shift = qp // 6
    prod = c * ls
    hi = prod << jnp.maximum(shift - 6, 0)[:, None, None]
    rnd = 1 << jnp.clip(5 - shift, 0, 5)
    lo = (prod + rnd[:, None, None]) >> jnp.maximum(6 - shift, 0)[:, None, None]
    return jnp.where((qp >= 36)[:, None, None], hi, lo)


HAD4 = jnp.asarray([[1, 1, 1, 1], [1, 1, -1, -1],
                    [1, -1, -1, 1], [1, -1, 1, -1]], dtype=jnp.int32)
HAD2 = jnp.asarray([[1, 1], [1, -1]], dtype=jnp.int32)


def i16_dc(c, qp, ls4):
    """8.5.10: c [N,4,4] DC levels -> scaled DC values [N,4,4]."""
    f = jnp.einsum("ij,njk,kl->nil", HAD4, c, HAD4)
    ls00 = ls4[qp % 6, 0, 0][:, None, None]
    shift = (qp // 6)[:, None, None]
    hi = (f * ls00) << jnp.maximum(shift - 6, 0)
    rnd = 1 << jnp.clip(5 - shift, 0, 5)
    lo = (f * ls00 + rnd) >> jnp.maximum(6 - shift, 0)
    return jnp.where(shift >= 6, hi, lo)


def chroma_dc(c, qp, ls4):
    """8.5.11.1 (4:2:0): c [N,2,2] -> [N,2,2]."""
    f = jnp.einsum("ij,njk,kl->nil", HAD2, c, HAD2)
    ls00 = ls4[qp % 6, 0, 0][:, None, None]
    return ((f * ls00) << (qp // 6)[:, None, None]) >> 5


def luma_residual_tiles(kind, qp_y, luma4, luma8, luma_dc, n, ls4, ls8):
    """Per-MB residual tiles [n,16,16] int32 for all non-PCM MBs.

    kind [n], qp_y [n], luma4 [n,16,4,4] (z order), luma8 [n,4,8,8],
    luma_dc [n,4,4]."""
    is16 = kind == KIND_I16
    # 4x4 path (I4 + I16-AC): dequant all, DC passthrough for I16
    qp_rep = jnp.repeat(qp_y, 16)
    c4 = luma4.reshape(n * 16, 4, 4)
    dcmask = jnp.repeat(is16, 16)
    # I16: insert scaled DC values into the blocks before IDCT
    dcv = i16_dc(luma_dc, qp_y, ls4)  # [n,4,4] indexed [y][x]
    zx, zy = ZPOS[:, 0], ZPOS[:, 1]
    dc_per_blk = dcv[:, zy, zx].reshape(n * 16)  # z-order per block
    c4 = c4.at[:, 0, 0].set(jnp.where(dcmask, dc_per_blk, c4[:, 0, 0]))
    d4 = dequant4(c4, qp_rep, ls4, dc_passthrough_mask=dcmask)
    r4 = idct4(d4).reshape(n, 16, 4, 4)
    # 8x8 path
    d8 = dequant8(luma8.reshape(n * 4, 8, 8), jnp.repeat(qp_y, 4), ls8)
    r8 = idct8(d8).reshape(n, 4, 8, 8)

    # assemble per-MB 16x16 residual
    r4_spatial = jnp.zeros((n, 16, 16), dtype=jnp.int32)
    for blk in range(16):
        bx, by = int(ZPOS[blk, 0]), int(ZPOS[blk, 1])
        r4_spatial = r4_spatial.at[:, by * 4:by * 4 + 4,
                                   bx * 4:bx * 4 + 4].set(r4[:, blk])
    r8_spatial = jnp.zeros((n, 16, 16), dtype=jnp.int32)
    for blk in range(4):
        bx, by = blk & 1, blk >> 1
        r8_spatial = r8_spatial.at[:, by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8].set(r8[:, blk])
    return jnp.where((kind == KIND_I8)[:, None, None], r8_spatial, r4_spatial)


def chroma_residual_tiles(qp_cb, qp_cr, chroma_dc_lv, chroma_ac, n,
                          ls4cb, ls4cr):
    """Both chroma components: chroma_dc_lv [n,2,2,2], chroma_ac
    [n,2,4,4,4] -> tiles [n,2,8,8]."""
    outs = []
    for ci, (qp_c, ls4) in enumerate(((qp_cb, ls4cb), (qp_cr, ls4cr))):
        dcv = chroma_dc(chroma_dc_lv[:, ci], qp_c, ls4)  # [n,2,2]
        c = chroma_ac[:, ci].reshape(n * 4, 4, 4)
        c = c.at[:, 0, 0].set(dcv.reshape(n * 4))
        d = dequant4(c, jnp.repeat(qp_c, 4), ls4,
                     dc_passthrough_mask=jnp.ones(n * 4, dtype=bool))
        r = idct4(d).reshape(n, 2, 2, 4, 4)
        outs.append(r.transpose(0, 1, 3, 2, 4).reshape(n, 8, 8))
    return jnp.stack(outs, axis=1)
