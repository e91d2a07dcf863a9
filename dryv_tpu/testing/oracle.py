"""Independent H.264 conformance oracle via the bundled libavcodec.

No H.264 *encoder* exists in this image, so conformance fixtures are
produced by our own intra encoder (dryv_tpu/encoder).  To break the
circularity of testing our decoder against our encoder, every fixture
bitstream is also decoded by FFmpeg's libavcodec (shipped inside the cv2
wheel) through these ctypes bindings; its YUV output is the golden
reference both for encoder conformance and decoder bit-exactness.
"""
from __future__ import annotations

import ctypes as ct
import glob
import os

import numpy as np

AV_CODEC_ID_H264 = 27
AV_NUM_DATA_POINTERS = 8
AVERROR_EAGAIN = -11
AVERROR_EOF = -0x20464F45  # 'EOF '


def _find_lib(stub: str) -> str:
    import cv2
    root = os.path.join(os.path.dirname(os.path.dirname(cv2.__file__)),
                        "opencv_python.libs")
    hits = glob.glob(os.path.join(root, f"lib{stub}-*.so*"))
    if not hits:
        raise FileNotFoundError(f"lib{stub} not found under {root}")
    return hits[0]


class AVFrame(ct.Structure):
    # Leading fields of AVFrame (stable across FFmpeg 5..8); we only read these.
    _fields_ = [
        ("data", ct.POINTER(ct.c_uint8) * AV_NUM_DATA_POINTERS),
        ("linesize", ct.c_int * AV_NUM_DATA_POINTERS),
        ("extended_data", ct.POINTER(ct.POINTER(ct.c_uint8))),
        ("width", ct.c_int),
        ("height", ct.c_int),
        ("nb_samples", ct.c_int),
        ("format", ct.c_int),
    ]


class AVPacket(ct.Structure):
    _fields_ = [
        ("buf", ct.c_void_p),
        ("pts", ct.c_int64),
        ("dts", ct.c_int64),
        ("data", ct.POINTER(ct.c_uint8)),
        ("size", ct.c_int),
    ]


_avutil = ct.CDLL(_find_lib("avutil"), mode=ct.RTLD_GLOBAL)
_avcodec = ct.CDLL(_find_lib("avcodec"), mode=ct.RTLD_GLOBAL)

_avcodec.avcodec_find_decoder.restype = ct.c_void_p
_avcodec.avcodec_alloc_context3.restype = ct.c_void_p
_avcodec.avcodec_alloc_context3.argtypes = [ct.c_void_p]
_avcodec.avcodec_open2.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_void_p]
_avcodec.av_packet_alloc.restype = ct.POINTER(AVPacket)
_avcodec.avcodec_send_packet.argtypes = [ct.c_void_p, ct.c_void_p]
_avcodec.avcodec_receive_frame.argtypes = [ct.c_void_p, ct.POINTER(AVFrame)]
_avutil.av_frame_alloc.restype = ct.POINTER(AVFrame)


def decode_annexb(stream: bytes, max_frames: int = 0):
    """Decode an Annex-B H.264 byte stream; returns list of (y, cb, cr) uint8
    arrays (cb/cr None for monochrome)."""
    codec = _avcodec.avcodec_find_decoder(AV_CODEC_ID_H264)
    assert codec, "libavcodec lacks H.264 decoder"
    ctx = _avcodec.avcodec_alloc_context3(ct.c_void_p(codec))
    assert ctx
    rc = _avcodec.avcodec_open2(ct.c_void_p(ctx), ct.c_void_p(codec), None)
    assert rc == 0, f"avcodec_open2: {rc}"

    pkt = _avcodec.av_packet_alloc()
    frame = _avutil.av_frame_alloc()
    frames = []

    def drain():
        while True:
            rc = _avcodec.avcodec_receive_frame(ct.c_void_p(ctx), frame)
            if rc in (AVERROR_EAGAIN, AVERROR_EOF):
                return
            assert rc == 0, f"receive_frame: {rc}"
            f = frame.contents
            w, h = f.width, f.height
            fmt = f.format  # 0=YUV420P, 4=YUV422P, 5=YUV444P, 13=YUVJ420P...

            def plane(i, pw, ph):
                ls = f.linesize[i]
                buf = ct.cast(f.data[i], ct.POINTER(ct.c_uint8 * (ls * ph))).contents
                arr = np.frombuffer(buf, dtype=np.uint8).reshape(ph, ls)
                return arr[:, :pw].copy()

            y = plane(0, w, h)
            if fmt in (0, 12, 13):  # 4:2:0 variants
                cw, chh = (w + 1) // 2, (h + 1) // 2
            elif fmt in (4, 14):    # 4:2:2
                cw, chh = (w + 1) // 2, h
            elif fmt in (5, 15):    # 4:4:4
                cw, chh = w, h
            else:
                frames.append((y, None, None))
                return
            frames.append((y, plane(1, cw, chh), plane(2, cw, chh)))

    _bufs = []  # keep packet buffers alive until decoding finishes

    def yield_pkt(payload: bytearray):
        data = ct.create_string_buffer(bytes(payload), len(payload))
        _bufs.append(data)
        p = pkt.contents
        p.data = ct.cast(data, ct.POINTER(ct.c_uint8))
        p.size = len(payload)
        rc = _avcodec.avcodec_send_packet(ct.c_void_p(ctx), pkt)
        assert rc == 0, f"send_packet: {rc}"
        drain()

    # split into access units (one packet each): a VCL NAL with
    # first_mb_in_slice == 0 starts a new picture
    from ..avc import split_annexb
    from ..bitio import BitReader

    units = []
    cur = bytearray()
    for nal in split_annexb(stream):
        is_vcl = int(nal.type) in (1, 5)
        starts_pic = False
        if is_vcl:
            r = BitReader(nal.rbsp)
            starts_pic = r.ue() == 0
        if is_vcl and starts_pic and any(
                int(n.type) in (1, 5) for n in units):
            cur = bytearray()
            for n in units:
                cur += b"\x00\x00\x00\x01" + n.to_bytes()
            yield_pkt(cur)
            units = []
        units.append(nal)
    if units:
        cur = bytearray()
        for n in units:
            cur += b"\x00\x00\x00\x01" + n.to_bytes()
        yield_pkt(cur)

    _avcodec.avcodec_send_packet(ct.c_void_p(ctx), None)  # flush
    drain()
    return frames
