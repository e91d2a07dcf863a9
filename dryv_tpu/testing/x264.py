"""Third-party H.264 encoder harness: drive the system libx264 (via the
distro libavcodec) to produce bitstreams this repo's own encoder did NOT
generate.

Why: every other fixture in testing/fixtures.py is emitted by dryv_tpu's
own spec-faithful encoder; the libavcodec oracle breaks decode-side
circularity, but a real encoder (x264) produces syntax corner cases our
encoder never emits — arbitrary rate-control level sequences, B-pyramids,
weighted prediction decisions, MBAFF, custom quant matrices, HRD/VUI,
filler NALs.  (Round-1 review: "the decoder has only ever seen syntax its
own encoder emits".)

The encode runs in a SUBPROCESS: the test process already holds the cv2
wheel's bundled libavcodec with RTLD_GLOBAL (testing/oracle.py); loading
the distro's different-version libavcodec into the same process would mix
symbol spaces.  The subprocess uses only the system
/usr/lib/x86_64-linux-gnu/libavcodec.so.59 + libavutil.so.57 (ffmpeg 5.1,
x264 build 164).

Reference scope note: the upstream reference decoder (Stuff7/dryv) has no
encoder and no conformance corpus at all (SURVEY.md §4: "The reference has
no tests"); this module exists to exceed that bar.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

_LIBDIR = "/usr/lib/x86_64-linux-gnu"

PIX_FMT = {"yuv420p": 0, "yuv422p": 4, "yuv444p": 5, "gray": 8}


def x264_available() -> bool:
    return (os.path.exists(os.path.join(_LIBDIR, "libavcodec.so.59"))
            and os.path.exists(os.path.join(_LIBDIR, "libx264.so.164")))


def encode_x264(frames, pix_fmt: str = "yuv420p", preset: str = "medium",
                x264_params: str = "", opts: dict | None = None) -> bytes:
    """Encode (y, cb, cr) uint8 frame tuples to an Annex-B H.264 stream.

    `x264_params` is a raw `key=value:key=value` string handed to
    x264_param_parse (the ffmpeg `-x264-params` escape hatch) — slices,
    interlaced/tff, cqm, qp, keyint, bframes, ref, weightp, … all live
    there.  `opts` are libavcodec AVOptions (e.g. {"g": "12"}).
    """
    ys = np.stack([np.ascontiguousarray(f[0], dtype=np.uint8)
                   for f in frames])
    payload = {"y": ys}
    if frames[0][1] is not None:
        payload["cb"] = np.stack([np.ascontiguousarray(f[1], np.uint8)
                                  for f in frames])
        payload["cr"] = np.stack([np.ascontiguousarray(f[2], np.uint8)
                                  for f in frames])
    with tempfile.TemporaryDirectory() as td:
        src = os.path.join(td, "src.npz")
        out = os.path.join(td, "out.264")
        np.savez(src, **payload)
        spec = {"pix_fmt": pix_fmt, "preset": preset,
                "x264_params": x264_params, "opts": opts or {}}
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "dryv_tpu.testing.x264", src, out,
             json.dumps(spec)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))))
        if r.returncode != 0:
            raise RuntimeError(f"x264 encode failed:\n{r.stdout}\n{r.stderr}")
        return open(out, "rb").read()


# ---------------------------------------------------------------------------
# subprocess side
# ---------------------------------------------------------------------------

def _subprocess_encode(src: str, dst: str, spec: dict) -> None:
    import ctypes as ct

    av = ct.CDLL(os.path.join(_LIBDIR, "libavcodec.so.59"))
    avu = ct.CDLL(os.path.join(_LIBDIR, "libavutil.so.57"))

    # AVFrame leading fields — stable across ffmpeg 5 (avutil 57), same
    # prefix testing/oracle.py relies on, extended through `pts`.
    class AVRational(ct.Structure):
        _fields_ = [("num", ct.c_int), ("den", ct.c_int)]

    class AVFrame(ct.Structure):
        _fields_ = [
            ("data", ct.POINTER(ct.c_uint8) * 8),
            ("linesize", ct.c_int * 8),
            ("extended_data", ct.c_void_p),
            ("width", ct.c_int),
            ("height", ct.c_int),
            ("nb_samples", ct.c_int),
            ("format", ct.c_int),
            ("key_frame", ct.c_int),
            ("pict_type", ct.c_int),
            ("sample_aspect_ratio", AVRational),
            ("pts", ct.c_int64),
        ]

    class AVPacket(ct.Structure):
        _fields_ = [
            ("buf", ct.c_void_p),
            ("pts", ct.c_int64),
            ("dts", ct.c_int64),
            ("data", ct.POINTER(ct.c_uint8)),
            ("size", ct.c_int),
        ]

    av.avcodec_find_encoder_by_name.restype = ct.c_void_p
    av.avcodec_alloc_context3.restype = ct.c_void_p
    av.avcodec_alloc_context3.argtypes = [ct.c_void_p]
    av.avcodec_open2.argtypes = [ct.c_void_p, ct.c_void_p, ct.c_void_p]
    av.avcodec_send_frame.argtypes = [ct.c_void_p, ct.c_void_p]
    av.avcodec_receive_packet.argtypes = [ct.c_void_p, ct.POINTER(AVPacket)]
    av.av_packet_alloc.restype = ct.POINTER(AVPacket)
    av.av_packet_unref.argtypes = [ct.POINTER(AVPacket)]
    avu.av_frame_alloc.restype = ct.POINTER(AVFrame)
    avu.av_frame_get_buffer.argtypes = [ct.POINTER(AVFrame), ct.c_int]
    avu.av_frame_make_writable.argtypes = [ct.POINTER(AVFrame)]
    avu.av_opt_set.argtypes = [ct.c_void_p, ct.c_char_p, ct.c_char_p,
                               ct.c_int]
    avu.av_opt_set_image_size.argtypes = [ct.c_void_p, ct.c_char_p,
                                          ct.c_int, ct.c_int, ct.c_int]
    avu.av_opt_set_pixel_fmt.argtypes = [ct.c_void_p, ct.c_char_p,
                                         ct.c_int, ct.c_int]

    SEARCH_CHILDREN = 1
    data = np.load(src)
    ys = data["y"]
    has_chroma = "cb" in data.files
    n, h, w = ys.shape

    codec = av.avcodec_find_encoder_by_name(b"libx264")
    assert codec, "system libavcodec lacks libx264"
    ctx = ct.c_void_p(av.avcodec_alloc_context3(ct.c_void_p(codec)))
    assert ctx

    fmt = PIX_FMT[spec["pix_fmt"]]
    assert avu.av_opt_set_image_size(ctx, b"video_size", w, h,
                                     SEARCH_CHILDREN) == 0
    assert avu.av_opt_set_pixel_fmt(ctx, b"pixel_format", fmt,
                                    SEARCH_CHILDREN) == 0
    assert avu.av_opt_set(ctx, b"time_base", b"1/25", SEARCH_CHILDREN) == 0
    assert avu.av_opt_set(ctx, b"preset",
                          spec["preset"].encode(), SEARCH_CHILDREN) == 0
    # determinism: single-threaded encode
    assert avu.av_opt_set(ctx, b"threads", b"1", SEARCH_CHILDREN) == 0
    for k, v in spec["opts"].items():
        rc = avu.av_opt_set(ctx, k.encode(), str(v).encode(),
                            SEARCH_CHILDREN)
        assert rc == 0, f"av_opt_set({k}={v}) -> {rc}"
    if spec["x264_params"]:
        assert avu.av_opt_set(ctx, b"x264-params",
                              spec["x264_params"].encode(),
                              SEARCH_CHILDREN) == 0

    rc = av.avcodec_open2(ctx, ct.c_void_p(codec), None)
    assert rc == 0, f"avcodec_open2: {rc}"

    frame = avu.av_frame_alloc()
    f = frame.contents
    f.width, f.height, f.format = w, h, fmt
    assert avu.av_frame_get_buffer(frame, 0) == 0

    pkt = av.av_packet_alloc()
    out = bytearray()
    EAGAIN, EOF = -11, -0x20464F45

    def drain():
        while True:
            rc = av.avcodec_receive_packet(ctx, pkt)
            if rc in (EAGAIN, EOF):
                return
            assert rc == 0, f"receive_packet: {rc}"
            p = pkt.contents
            out.extend(ct.string_at(p.data, p.size))
            av.av_packet_unref(pkt)

    if has_chroma:
        cbs, crs = data["cb"], data["cr"]
    for i in range(n):
        assert avu.av_frame_make_writable(frame) == 0
        f = frame.contents
        planes = [(0, ys[i])]
        if has_chroma:
            planes += [(1, cbs[i]), (2, crs[i])]
        for pi, arr in planes:
            ph, pw = arr.shape
            ls = f.linesize[pi]
            base = ct.addressof(f.data[pi].contents)
            for row in range(ph):
                ct.memmove(base + row * ls,
                           arr[row].ctypes.data, pw)
        f.pts = i
        assert av.avcodec_send_frame(ctx, frame) == 0
        drain()
    assert av.avcodec_send_frame(ctx, None) == 0  # flush
    drain()
    with open(dst, "wb") as fh:
        fh.write(bytes(out))


if __name__ == "__main__":
    _subprocess_encode(sys.argv[1], sys.argv[2], json.loads(sys.argv[3]))
