"""Batch-pipelined intra GOP decode: the production e2e path.

Per batch of F pictures: the C++ slice-parallel entropy stage fills a
preallocated compact host buffer (uint8/int16 ABI, one slot per frame,
copied straight out of the reusable entropy arena), the whole batch
ships to the device in one transfer, and ONE launch of the Pallas
mega-kernel (+ the Pallas deblock kernel when the stream enables the
in-loop filter) reconstructs all F frames.  Dispatch is asynchronous:
while the device reconstructs batch k, the host entropy-decodes batch
k+1 — the steady-state throughput bench.py measures is this overlap
with per-batch pack + host->device transfer paid inside the loop.

The upstream reference decodes one frame, single-threaded, CPU-only
(/root/reference/src/video/decoder.rs:88 `.take(1)`); this module is the
scale-out replacement for its decode_sample loop.
"""
from __future__ import annotations

import numpy as np

from .coeffs import KIND_PCM
from .pipeline import SYNTAX_KEYS  # noqa: F401  (re-export convenience)

COMPACT_I16 = ("luma_lv", "luma_dc", "chroma_dc", "chroma_ac")
COMPACT_U8 = ("kind", "qp_y", "qp_cb", "qp_cr", "i16_mode", "chroma_mode",
              "modes4", "modes8")


def _qpc_vec(qp, off):
    from .refimpl.transform import QPC_TAB
    qpi = np.clip(qp + off, 0, 51)
    return np.where(qpi < 30, qpi, QPC_TAB[np.clip(qpi - 30, 0, 21)])


def alloc_compact(F: int, n: int) -> dict:
    """Preallocate one batch worth of compact host buffers."""
    return {
        "kind": np.zeros((F, n), np.uint8),
        "qp_y": np.zeros((F, n), np.uint8),
        "qp_cb": np.zeros((F, n), np.uint8),
        "qp_cr": np.zeros((F, n), np.uint8),
        "i16_mode": np.zeros((F, n), np.uint8),
        "chroma_mode": np.zeros((F, n), np.uint8),
        "modes4": np.zeros((F, n, 16), np.uint8),
        "modes8": np.zeros((F, n, 4), np.uint8),
        "avail_a": np.zeros((F, n), np.bool_),
        "avail_b": np.zeros((F, n), np.bool_),
        "avail_c": np.zeros((F, n), np.bool_),
        "avail_d": np.zeros((F, n), np.bool_),
        "luma_lv": np.zeros((F, n, 256), np.int16),
        "luma_dc": np.zeros((F, n, 16), np.int16),
        "chroma_dc": np.zeros((F, n, 8), np.int16),
        "chroma_ac": np.zeros((F, n, 128), np.int16),
    }


def fill_compact_slot(buf: dict, i: int, out: dict, pps, mb_w: int,
                      mb_h: int) -> bool:
    """Copy one picture's native entropy outputs into batch slot i.

    Copies immediately (the entropy arena is reused by the next decode).
    Returns True if the picture contains PCM macroblocks (caller adds
    pcm buffers lazily — x264 output virtually never trips this)."""
    n = mb_w * mb_h
    kind = out["kind"]
    buf["kind"][i] = kind
    qp_y = out["qp_y"]
    buf["qp_y"][i] = qp_y
    off1 = pps.second_chroma_qp_offset
    buf["qp_cb"][i] = _qpc_vec(qp_y, pps.chroma_qp_index_offset)
    buf["qp_cr"][i] = _qpc_vec(qp_y, off1)
    buf["i16_mode"][i] = out["i16_mode"]
    buf["chroma_mode"][i] = out["chroma_mode"]
    buf["modes4"][i] = out["modes4"]
    buf["modes8"][i] = out["modes8"]
    i8 = (kind == 1)[:, None]
    np.copyto(buf["luma_lv"][i],
              np.where(i8, out["luma8"].reshape(n, 256),
                       out["luma4"].reshape(n, 256)), casting="unsafe")
    np.copyto(buf["luma_dc"][i], out["luma_dc"].reshape(n, 16),
              casting="unsafe")
    np.copyto(buf["chroma_dc"][i],
              np.ascontiguousarray(out["chroma_dc"][:, :, :4]).reshape(n, 8),
              casting="unsafe")
    np.copyto(buf["chroma_ac"][i],
              np.ascontiguousarray(out["chroma_ac"][:, :, :4, :])
              .reshape(n, 128), casting="unsafe")
    # slice-aware availability
    sid = out["slice_id"].astype(np.int64).reshape(mb_h, mb_w)
    nb = np.full((mb_h, mb_w), -9, np.int64)
    nb[:, 1:] = sid[:, :-1]
    buf["avail_a"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, :] = sid[:-1, :]
    buf["avail_b"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, :-1] = sid[:-1, 1:]
    buf["avail_c"][i] = (nb == sid).reshape(-1)
    nb[:] = -9
    nb[1:, 1:] = sid[:-1, :-1]
    buf["avail_d"][i] = (nb == sid).reshape(-1)
    has_pcm = bool((kind == KIND_PCM).any())
    if has_pcm:
        if "pcm_y" not in buf:
            F = buf["kind"].shape[0]
            buf["pcm_y"] = np.zeros((F, n, 16, 16), np.uint8)
            buf["pcm_c"] = np.zeros((F, n, 2, 8, 8), np.uint8)
        np.copyto(buf["pcm_y"][i], out["pcm_y"].reshape(n, 16, 16),
                  casting="unsafe")
        np.copyto(buf["pcm_c"][i], out["pcm_c"].reshape(n, 2, 8, 8),
                  casting="unsafe")
    return has_pcm


def _parse_pictures(stream: bytes):
    from .avc import split_annexb
    from .avc.slice_header import SliceHeader
    from .decoder import SyntaxDecoder, group_access_units

    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pics = []
    sps = pps = None
    for pic_nals in group_access_units(rest):
        headers = []
        slice_datas = []
        for nal in pic_nals:
            rbsp = nal.rbsp
            probe_pps = next(iter(sd.pps_map.values()))
            probe_sps = next(iter(sd.sps_map.values()))
            h0 = SliceHeader.parse(rbsp, nal, probe_sps, probe_pps)
            pps = sd.pps_map[h0.pic_parameter_set_id]
            sps = sd.sps_map[pps.seq_parameter_set_id]
            h = SliceHeader.parse(rbsp, nal, sps, pps)
            headers.append(h)
            bitoff = ((h.header_bit_len + 7) & ~7
                      if pps.entropy_coding_mode_flag else h.header_bit_len)
            slice_datas.append((rbsp, bitoff, h.first_mb_in_slice,
                                h.slice_qp_y(pps)))
        pics.append((slice_datas, headers))
    return pics, sps, pps


def _gop_supported(sps, pps, headers) -> bool:
    h = headers[0]
    return (h.slice_type.is_intra and sps.chroma_array_type == 1
            and not h.field_pic_flag
            and not sps.qpprime_y_zero_transform_bypass_flag
            and not sps.bit_depth_luma_minus8
            and pps.slice_groups is None
            and pps.entropy_coding_mode_flag
            and not sps.seq_scaling_matrix_present_flag
            and not pps.pic_scaling_matrix_present_flag)


def decode_annexb_gop_pipelined(stream: bytes, gop: int = 16,
                                n_threads: int = 0, device_out: bool = False,
                                interpret=None):
    """Decode an Annex-B all-intra stream with the batched device pipeline.

    Returns a list of DecodedFrame (host planes), or, with
    device_out=True, a list of (y, cb, cr) device arrays (uncropped) for
    TPU-resident consumers.  Streams outside the batched scope (inter,
    non-4:2:0, lossless, FMO, CAVLC, custom scaling matrices) fall back
    to the per-picture paths."""
    import jax.numpy as jnp

    from .decoder import DecodedFrame
    from .kernels.deblock import deblock_precompute_intra, PRE_KEYS
    from .kernels.pallas_deblock import make_gop_pipeline_deblock_pallas
    from .kernels.pallas_wavefront import make_gop_pipeline_pallas
    from .kernels.transform import LS4_FLAT, LS8_FLAT
    from .native.entropy import decode_picture_islices

    pics, sps, pps = _parse_pictures(stream)
    if not pics or not all(_gop_supported(sps, pps, h) for _, h in pics):
        from .pipeline import decode_annexb_fast
        assert not device_out, "device_out requires the batched scope"
        return decode_annexb_fast(stream, n_threads=n_threads)

    mb_w, mb_h = sps.pic_width_in_mbs, sps.frame_height_in_mbs
    n = mb_w * mb_h
    F = gop
    deblocked = any(h.deblocking is None or h.deblocking.disable_idc != 1
                    for _, hs in pics for h in hs)
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]
    off1 = pps.second_chroma_qp_offset

    results = []
    pending = None

    def harvest(p):
        (y, cb, cr), nf = p
        if device_out:
            results.extend([(y[i], cb[i], cr[i]) for i in range(nf)])
        else:
            ys = np.asarray(y)
            cbs = np.asarray(cb)
            crs = np.asarray(cr)
            for i in range(nf):
                results.append(DecodedFrame(ys[i], cbs[i], crs[i])
                               .crop(sps))

    for b0 in range(0, len(pics), F):
        batch = pics[b0:b0 + F]
        buf = alloc_compact(F, n)
        pre = ({k: None for k in PRE_KEYS} if deblocked else None)
        pre_list = []
        has_pcm = False
        for i, (slice_datas, headers) in enumerate(batch):
            out = decode_picture_islices(slice_datas, sps, pps,
                                         n_threads=n_threads, reuse=True)
            has_pcm |= fill_compact_slot(buf, i, out, pps, mb_w, mb_h)
            if deblocked:
                ctl = [(0, 0, 0) if h.deblocking is None else
                       (h.deblocking.disable_idc,
                        h.deblocking.alpha_c0_offset_div2 * 2,
                        h.deblocking.beta_offset_div2 * 2) for h in headers]
                pre_list.append(deblock_precompute_intra(
                    buf["kind"][i], buf["qp_y"][i], out["slice_id"], ctl,
                    mb_w, mb_h, pps.chroma_qp_index_offset, off1))
        # pad the tail batch by replicating the last picture's slot
        for i in range(len(batch), F):
            for v in buf.values():
                v[i] = v[len(batch) - 1]
            if deblocked:
                pre_list.append(pre_list[-1])
        stacked = {k: jnp.asarray(v) for k, v in buf.items()}   # H2D
        if deblocked:
            pre = {k: jnp.asarray(np.stack([p[k] for p in pre_list]))
                   for k in PRE_KEYS}
            fn = make_gop_pipeline_deblock_pallas(
                mb_w, mb_h, F, has_pcm=has_pcm, interpret=interpret)
            r = fn(stacked, *ls, pre)
        else:
            fn = make_gop_pipeline_pallas(mb_w, mb_h, F, has_pcm=has_pcm,
                                          interpret=interpret)
            r = fn(stacked, *ls)
        if pending is not None:
            harvest(pending)
        pending = (r, len(batch))
    harvest(pending)
    return results
