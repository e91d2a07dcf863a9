"""ctypes bindings for the native CABAC entropy stage.

decode_picture_islices(slices, sps, pps) -> FrameSyntax-compatible dense
arrays (same contract as the Python SliceCoder + pack_frame path, verified
identical in tests)."""
from __future__ import annotations

import ctypes as ct

import numpy as np

from .build import build


class PicParams(ct.Structure):
    _fields_ = [("mb_w", ct.c_int32), ("mb_h", ct.c_int32),
                ("chroma_array_type", ct.c_int32),
                ("transform_8x8_mode_flag", ct.c_int32),
                ("bit_depth_luma", ct.c_int32),
                ("bit_depth_chroma", ct.c_int32)]


_P = ct.POINTER(ct.c_int32)


class Out(ct.Structure):
    _fields_ = [("kind", _P), ("qp_y", _P), ("cbp", _P), ("i16_mode", _P),
                ("chroma_mode", _P), ("modes4", _P), ("modes8", _P),
                ("luma4", _P), ("luma8", _P), ("luma_dc", _P),
                ("chroma_dc", _P), ("chroma_ac", _P), ("pcm_y", _P),
                ("pcm_c", _P), ("slice_id", _P),
                ("bin_count", ct.POINTER(ct.c_int64))]


_lib = None


def lib():
    global _lib
    if _lib is None:
        _lib = ct.CDLL(str(build()))
        fn = _lib.dt_decode_picture_islices
        fn.restype = ct.c_int
        fn.argtypes = [ct.POINTER(ct.c_uint8), ct.POINTER(ct.c_int64),
                       ct.POINTER(ct.c_int64), ct.POINTER(ct.c_int64),
                       _P, _P, ct.c_int32, PicParams, Out, ct.c_int32]
        rf = _lib.dt_reconstruct_islices
        rf.restype = ct.c_int
        rf.argtypes = [_P] * 15 + [ct.c_int32] * 4 + \
                      [ct.POINTER(ct.c_uint8)] * 3
    return _lib


def _ptr(a):
    return a.ctypes.data_as(_P)


def decode_picture_islices(slice_datas, sps, pps, n_threads: int = 0):
    """slice_datas: list of (rbsp_bytes, bit_offset, first_mb, slice_qp).

    Returns dict of dense arrays (scan-order coefficients, like MBState)."""
    mb_w = sps.pic_width_in_mbs
    mb_h = sps.frame_height_in_mbs
    n = mb_w * mb_h
    ns = len(slice_datas)

    rbsp_all = b"".join(s[0] for s in slice_datas)
    offs, lens, bitoffs, firsts, qps = [], [], [], [], []
    o = 0
    for rbsp, bitoff, first, qp in slice_datas:
        offs.append(o)
        lens.append(len(rbsp))
        bitoffs.append(bitoff)
        firsts.append(first)
        qps.append(qp)
        o += len(rbsp)

    out = {
        "kind": np.zeros(n, np.int32),
        "qp_y": np.zeros(n, np.int32),
        "cbp": np.zeros(n, np.int32),
        "i16_mode": np.zeros(n, np.int32),
        "chroma_mode": np.zeros(n, np.int32),
        "modes4": np.zeros((n, 16), np.int32),
        "modes8": np.zeros((n, 4), np.int32),
        "luma4": np.zeros((n, 16, 16), np.int32),   # raster 4x4 blocks
        "luma8": np.zeros((n, 4, 64), np.int32),    # raster 8x8 blocks
        "luma_dc": np.zeros((n, 16), np.int32),     # raster DC grid
        "chroma_dc": np.zeros((n, 2, 8), np.int32),
        "chroma_ac": np.zeros((n, 2, 8, 16), np.int32),  # raster, slot 0 zero
        "pcm_y": np.zeros((n, 256), np.int32),
        "pcm_c": np.zeros((n, 128), np.int32),
        "slice_id": np.zeros(n, np.int32),
        "bin_count": np.zeros(ns, np.int64),
    }

    ostruct = Out(
        _ptr(out["kind"]), _ptr(out["qp_y"]), _ptr(out["cbp"]),
        _ptr(out["i16_mode"]), _ptr(out["chroma_mode"]), _ptr(out["modes4"]),
        _ptr(out["modes8"]), _ptr(out["luma4"]), _ptr(out["luma8"]),
        _ptr(out["luma_dc"]), _ptr(out["chroma_dc"]), _ptr(out["chroma_ac"]),
        _ptr(out["pcm_y"]), _ptr(out["pcm_c"]), _ptr(out["slice_id"]),
        out["bin_count"].ctypes.data_as(ct.POINTER(ct.c_int64)))
    pp = PicParams(mb_w, mb_h, sps.chroma_array_type,
                   pps.transform_8x8_mode_flag,
                   8 + sps.bit_depth_luma_minus8,
                   8 + sps.bit_depth_chroma_minus8)

    buf = ct.create_string_buffer(rbsp_all, len(rbsp_all))
    rc = lib().dt_decode_picture_islices(
        ct.cast(buf, ct.POINTER(ct.c_uint8)),
        np.asarray(offs, np.int64).ctypes.data_as(ct.POINTER(ct.c_int64)),
        np.asarray(lens, np.int64).ctypes.data_as(ct.POINTER(ct.c_int64)),
        np.asarray(bitoffs, np.int64).ctypes.data_as(ct.POINTER(ct.c_int64)),
        np.asarray(firsts, np.int32).ctypes.data_as(_P),
        np.asarray(qps, np.int32).ctypes.data_as(_P),
        ct.c_int32(ns), pp, ostruct,
        ct.c_int32(n_threads or min(ns, 16)))
    assert rc == 0
    return out


def reconstruct_islices(out: dict, sps, pps):
    """Native scalar reconstruction from dense entropy outputs.

    Returns (y, cb, cr) uint8 planes.  Single-threaded — this is the
    C++-scalar baseline path (see BASELINE.md)."""
    mb_w = sps.pic_width_in_mbs
    mb_h = sps.frame_height_in_mbs
    W, H = mb_w * 16, mb_h * 16
    y = np.zeros((H, W), np.uint8)
    cb = np.zeros((H // 2, W // 2), np.uint8)
    cr = np.zeros((H // 2, W // 2), np.uint8)
    u8 = ct.POINTER(ct.c_uint8)
    rc = lib().dt_reconstruct_islices(
        _ptr(out["kind"]), _ptr(out["qp_y"]), _ptr(out["cbp"]),
        _ptr(out["i16_mode"]), _ptr(out["chroma_mode"]), _ptr(out["modes4"]),
        _ptr(out["modes8"]), _ptr(out["luma4"]), _ptr(out["luma8"]),
        _ptr(out["luma_dc"]), _ptr(out["chroma_dc"]), _ptr(out["chroma_ac"]),
        _ptr(out["pcm_y"]), _ptr(out["pcm_c"]), _ptr(out["slice_id"]),
        ct.c_int32(mb_w), ct.c_int32(mb_h),
        ct.c_int32(pps.chroma_qp_index_offset),
        ct.c_int32(pps.second_chroma_qp_offset),
        y.ctypes.data_as(u8), cb.ctypes.data_as(u8), cr.ctypes.data_as(u8))
    assert rc == 0
    return y, cb, cr
