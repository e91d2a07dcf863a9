"""Probe: decode a matrix of x264-encoded streams on the native path
(scalar fallback inside) and report pass/fail vs the libavcodec oracle.
Used to drive the third-party conformance corpus (tests/conformance)."""
import sys

import numpy as np

sys.path.insert(0, ".")
from dryv_tpu.testing.x264 import encode_x264
from dryv_tpu.testing.oracle import decode_annexb
from dryv_tpu.native.full import decode_annexb_native
from dryv_tpu.testing.fixtures import make_source


def sources(n=6, mb_w=6, mb_h=4, fade=False):
    y, cb, cr = make_source(mb_w, mb_h, seed=2)
    out = []
    for t in range(n):
        fy = np.roll(y, t * 3, axis=1)
        if fade:
            fy = np.clip(fy.astype(np.int32) - 25 * t, 0, 255)
        out.append((fy.astype(np.uint8), np.roll(cb, t, axis=1),
                    np.roll(cr, t, axis=1)))
    return out


def scene_sources(n=10):
    a = sources(n)
    y2, cb2, cr2 = make_source(6, 4, seed=77)
    for t in range(n // 2, n):
        a[t] = (np.roll(y2, t, axis=0), cb2, cr2)
    return a


CASES = [
    ("defaults_qp28", {}, dict(x264_params="qp=28")),
    ("veryfast_crf", {}, dict(preset="veryfast", x264_params="crf=30")),
    ("slow_qp24", {}, dict(preset="slow", x264_params="qp=24")),
    ("refs8_bpyr", {}, dict(x264_params="qp=30:ref=8:bframes=8:b-pyramid=normal:direct=auto")),
    ("cavlc_ipb", {}, dict(x264_params="qp=30:cabac=0:bframes=2")),
    ("intra_only", {}, dict(x264_params="qp=26:keyint=1")),
    ("slices4", {}, dict(x264_params="qp=28:slices=4")),
    ("slice_max_size", {}, dict(x264_params="qp=28:slice-max-size=600")),
    ("no_deblock", {}, dict(x264_params="qp=28:deblock=0:nf=1")),
    ("deblock_22", {}, dict(x264_params="qp=28:deblock=2,2")),
    ("no8x8", {}, dict(x264_params="qp=28:8x8dct=0")),
    ("lossless_intra", {}, dict(x264_params="qp=0:keyint=1")),
    ("qp51", {}, dict(x264_params="qp=51")),
    ("cqm_jvt", {}, dict(x264_params="qp=28:cqm=jvt")),
    ("weightp_fade", {"fade": True}, dict(x264_params="qp=28:weightp=2")),
    ("keyint3", {"n": 8}, dict(x264_params="qp=28:keyint=3:min-keyint=1:scenecut=0")),
    ("scenecut", {"scene": True}, dict(x264_params="qp=28:keyint=12:min-keyint=1:scenecut=40")),
    ("open_gop", {"scene": True}, dict(x264_params="qp=28:open-gop=1:keyint=6:min-keyint=1")),
    ("intra_refresh", {"n": 8}, dict(x264_params="qp=28:intra-refresh=1:keyint=6")),
    ("c422", {"fmt": "yuv422p"}, dict(x264_params="qp=28")),
    ("gray", {"fmt": "gray"}, dict(x264_params="qp=28")),
    ("nal_hrd_cbr", {}, dict(opts={"b": "200000"}, x264_params="nal-hrd=cbr:vbv-maxrate=200:vbv-bufsize=400:aud=1")),
    ("vui_sar", {}, dict(x264_params="qp=28:sar=4/3:overscan=show:videoformat=ntsc:range=tv:colorprim=bt709")),
    ("constrained_intra", {}, dict(x264_params="qp=28:constrained-intra=1")),
    ("chroma_qp", {}, dict(x264_params="qp=28:chroma-qp-offset=4")),
    ("mbaff_tff", {}, dict(x264_params="qp=28:interlaced=1:tff=1")),
    ("mbaff_bff", {}, dict(x264_params="qp=28:interlaced=1:bff=1")),
    # intra MBAFF without in-loop deblocking: decodes bit-exact today
    # (entropy + recon); the deblocked/inter variants above are the
    # remaining MBAFF boundary
    ("mbaff_intra", {}, dict(x264_params="qp=28:keyint=1:interlaced=1:tff=1:nf=1")),
    ("mbaff_intra_no8x8", {}, dict(x264_params="qp=33:keyint=1:interlaced=1:bff=1:nf=1:8x8dct=0")),
    ("mbaff_intra_slices", {}, dict(x264_params="qp=24:keyint=1:interlaced=1:tff=1:nf=1:slices=2")),
    ("fake_interlaced", {}, dict(x264_params="qp=28:fake-interlaced=1")),
    # round-5 additions (VERDICT r4 item 6): third-party 4:4:4 and
    # lossless coverage — the own-encoder c444/lossless fixtures are
    # oracle-golden but x264's mode decisions exercise different syntax
    ("c444", {"fmt": "yuv444p"}, dict(x264_params="qp=28")),
    ("c444_intra", {"fmt": "yuv444p"}, dict(x264_params="qp=26:keyint=1")),
    ("c444_lossless", {"fmt": "yuv444p"}, dict(x264_params="qp=0:keyint=1")),
    ("qp0_lossless_ipb", {}, dict(x264_params="qp=0:bframes=2")),
    ("c422_lossless", {"fmt": "yuv422p"}, dict(x264_params="qp=0:keyint=1")),
]


def make_frames(case_opts):
    fmt = case_opts.get("fmt", "yuv420p")
    n = case_opts.get("n", 6)
    frs = (scene_sources(n if n > 6 else 10) if case_opts.get("scene")
           else sources(n, fade=case_opts.get("fade", False)))
    if fmt == "gray":
        return [(f[0], None, None) for f in frs], fmt
    if fmt == "yuv422p":
        out = []
        for fy, fcb, fcr in frs:
            out.append((fy, np.repeat(fcb, 2, axis=0),
                        np.repeat(fcr, 2, axis=0)))
        return out, fmt
    if fmt == "yuv444p":
        out = []
        for fy, fcb, fcr in frs:
            out.append((fy, np.repeat(np.repeat(fcb, 2, axis=0), 2, axis=1),
                        np.repeat(np.repeat(fcr, 2, axis=0), 2, axis=1)))
        return out, fmt
    return frs, fmt


def main():
    only = sys.argv[1:] or None
    for name, copts, eopts in CASES:
        if only and name not in only:
            continue
        frames, fmt = make_frames(copts)
        try:
            bs = encode_x264(frames, pix_fmt=fmt, **eopts)
        except Exception as e:
            print(f"{name}: ENCODE FAIL {e}")
            continue
        g = decode_annexb(bs)
        try:
            ours = decode_annexb_native(bs)
        except Exception as e:
            print(f"{name}: DECODE FAIL {type(e).__name__}: {str(e)[:90]}")
            continue
        if len(ours) != len(g):
            print(f"{name}: COUNT {len(ours)} vs {len(g)}")
            continue
        # monochrome: our decoder yields cb/cr None; libavcodec
        # synthesizes constant mid-gray planes — skip those
        bad = [
            (i, pn, int(np.sum(np.asarray(op) != gp)))
            for i, (o, gf) in enumerate(zip(ours, g))
            for pn, op, gp in zip("ycc", (o.y, o.cb, o.cr), gf)
            if gp is not None
            and not (op is None and (gp == 128).all())
            and not np.array_equal(np.asarray(op), gp)]
        print(f"{name}: {'OK' if not bad else bad[:4]} ({len(g)}f, {len(bs)}B)")


if __name__ == "__main__":
    main()
