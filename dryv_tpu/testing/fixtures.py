"""Deterministic conformance fixture set.

Each fixture is (name, annexb_stream, golden_yuv) where the golden comes
from the libavcodec oracle — the independent ground truth all decode paths
(scalar refimpl, JAX pipeline, C++ entropy stage) must match bit-exactly.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from ..encoder import default_sps_pps, encode_frame_annexb
from ..encoder.intra_encoder import IntraEncoder
from .oracle import decode_annexb


def make_source(mb_w: int, mb_h: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    W, H = mb_w * 16, mb_h * 16
    yy = np.clip(rng.randint(0, 256, (H, W)).astype(np.float64) * 0.3 +
                 np.linspace(0, 200, W)[None, :] +
                 np.linspace(0, 40, H)[:, None], 0, 255).astype(np.int64)
    cb = np.clip(rng.randint(0, 256, (H // 2, W // 2)) * 0.25 + 100,
                 0, 255).astype(np.int64)
    cr = np.clip(rng.randint(0, 256, (H // 2, W // 2)) * 0.25 + 80,
                 0, 255).astype(np.int64)
    return yy, cb, cr


POLICIES = {
    "mix48": lambda a: ["i4", "i8"][a % 2],
    "i16": lambda a: "i16",
    "i4": lambda a: "i4",
    "i8": lambda a: "i8",
    "pcm": lambda a: "pcm",
    "mix": lambda a: ["i16", "i4", "pcm"][a % 3],
    "mix8": lambda a: ["i8", "i4", "i16", "pcm"][a % 4],
    "mix420": lambda a: ["i16", "i4"][a % 2],  # no PCM (4:2:2 fixture)
}

# (name, mb_w, mb_h, qp, policy, transform8x8, rows_per_slice, crop)
FIXTURE_SPECS = [
    ("i16_qp26", 4, 3, 26, "i16", False, None, None),
    ("i16_qp0", 4, 3, 0, "i16", False, None, None),
    ("i16_qp51", 4, 3, 51, "i16", False, None, None),
    ("i4_qp26", 4, 3, 26, "i4", False, None, None),
    ("i4_qp10", 4, 3, 10, "i4", False, None, None),
    ("i8_qp26", 4, 3, 26, "i8", True, None, None),
    ("i8_qp35", 4, 3, 35, "i8", True, None, None),
    ("mix_qp26", 4, 3, 26, "mix", False, None, None),
    ("mix8_qp30", 4, 3, 30, "mix8", True, None, None),
    ("pcm", 3, 2, 26, "pcm", False, None, None),
    ("slices_qp28", 4, 4, 28, "mix", False, 1, None),
    ("crop_qp28", 4, 4, 28, "i16", False, None, (0, 2, 0, 3)),
    ("big_qp30", 8, 6, 30, "mix8", True, 2, None),
    ("mono_qp26", 4, 3, 26, "mix", False, None, None),  # 4:0:0
    ("c422_qp27", 4, 3, 27, "mix420", False, None, None),  # 4:2:2
    # 4:4:4 (High 4:4:4 Predictive): Cb/Cr residuals in the luma process
    # with context categories 6-13 — the reference's CABAC tables cover
    # these (consts.rs cat5-13 bases) but its recon todo!()s 4:4:4
    ("c444_qp27", 4, 3, 27, "mix420", False, None, None),
    ("c444_i8_qp30", 4, 3, 30, "mix48", True, None, None),  # cats 9/13
    ("c444_slices_qp24", 4, 4, 24, "mix420", False, 2, None),
    # "dblk_" prefix: in-loop deblocking ENABLED (disable_idc 0) — goes
    # beyond the reference, which has no deblocking (README.md:14)
    ("dblk_i16_qp30", 4, 3, 30, "i16", False, None, None),
    ("dblk_i16_qp31", 4, 3, 31, "i16", False, None, None),
    ("dblk_i4_qp33", 4, 3, 33, "i4", False, None, None),
    ("dblk_i16_qp40", 4, 3, 40, "i16", False, None, None),
    ("dblk_i4_qp45", 4, 3, 45, "i4", False, None, None),
    ("dblk_mix_qp26", 4, 3, 26, "mix", False, None, None),  # incl. PCM qp0
    ("dblk_i8_qp32", 4, 3, 32, "i8", True, None, None),  # 8x8 edge rules
    ("dblk_slices_qp28", 4, 4, 28, "mix", False, 1, None),  # x-slice filter
    ("dblk_c422_qp28", 4, 3, 28, "mix420", False, None, None),
    # "cavlc_" prefix: CAVLC entropy coding (reference slice/mod.rs:299
    # todo!) — same reconstruction paths, different entropy layer
    ("cavlc_mix_qp26", 4, 3, 26, "mix", False, None, None),
    ("cavlc_i4_qp10", 4, 3, 10, "i4", False, None, None),
    ("cavlc_mix8_qp30", 4, 3, 30, "mix8", True, 1, None),
    ("cavlc_c422_qp27", 4, 3, 27, "mix420", False, None, None),
    ("cavlc_dblk_qp30", 4, 3, 30, "mix", False, None, None),
    # extreme QPs: large levels exercise CAVLC suffix escapes
    # (level_prefix >= 15) and dense blocks (total_coeff == maxNumCoeff)
    ("cavlc_i16_qp0", 4, 3, 0, "i16", False, None, None),
    ("cavlc_i4_qp0", 4, 3, 0, "i4", False, None, None),
    ("cavlc_mix8_qp51", 4, 3, 51, "mix8", True, None, None),
    # "lossless_" prefix: transform bypass (QP'Y == 0 + SPS flag); the
    # reference leaves lossless as todo!()
    ("lossless_i4", 4, 3, 0, "i4", False, None, None),
    ("lossless_mix48", 4, 3, 0, "mix48", True, 1, None),
    # transform-bypass I_16x16 (8.3.5 DPCM over the 16x16 array; the
    # reference todo!()s all lossless)
    ("lossless_i16", 4, 3, 0, "i16", False, None, None),
    ("lossless_mix16", 4, 3, 0, "mix420", False, None, None),
    # "scal_" prefix: custom scaling matrices (non-flat weight lists;
    # reference sps.rs:179-249 parses them, header.rs:317-332 activates)
    ("scal_mix8_qp28", 4, 3, 28, "mix8", True, None, None),   # SPS matrix
    ("scal_pps_qp30", 4, 3, 30, "mix", False, None, None),    # PPS matrix
    ("scal_dblk_qp32", 4, 3, 32, "mix8", True, None, None),   # + deblock
]


@lru_cache(maxsize=None)
def get_fixture(name: str):
    """Returns (stream_bytes, (y, cb, cr) golden from oracle, sps, pps)."""
    spec = next(s for s in FIXTURE_SPECS if s[0] == name)
    _, mb_w, mb_h, qp, policy, t8, rps, crop = spec
    mono = "mono" in name
    c422 = "c422" in name
    c444 = "c444" in name
    deblock = name.startswith("dblk") or "dblk" in name
    cavlc = name.startswith("cavlc")
    lossless = name.startswith("lossless")
    src = make_source(mb_w, mb_h)
    if mono:
        src = (src[0], None, None)
    if c422:
        rng = np.random.RandomState(9)
        H, W = mb_h * 16, mb_w * 16
        src = (src[0],
               np.clip(100 + rng.randint(-20, 21, (H, W // 2)),
                       0, 255).astype(np.int64),
               np.clip(130 + rng.randint(-20, 21, (H, W // 2)),
                       0, 255).astype(np.int64))
    if c444:
        rng = np.random.RandomState(11)
        H, W = mb_h * 16, mb_w * 16
        src = (src[0],
               np.clip(105 + rng.randint(-25, 26, (H, W)),
                       0, 255).astype(np.int64),
               np.clip(125 + rng.randint(-25, 26, (H, W)),
                       0, 255).astype(np.int64))
    profile = 66
    if mono:
        profile = 100
    if c422:
        profile = 122
    if c444:
        profile = 244
    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, transform_8x8=t8,
                               crop=crop, profile=profile, cabac=not cavlc,
                               lossless=lossless)
    if mono:
        sps.chroma_format_idc = 0
    if c422:
        sps.chroma_format_idc = 2
    if c444:
        sps.chroma_format_idc = 3
    if name.startswith("scal"):
        from ..avc.sps import ScalingLists
        rng = np.random.RandomState(7)
        l4 = np.stack([np.sort(np.clip(10 + rng.randint(-6, 26, 16), 1, 255))
                       for _ in range(6)]).astype(np.int32)
        l8 = np.stack([np.sort(np.clip(10 + rng.randint(-6, 38, 64), 1, 255))
                       for _ in range(6)]).astype(np.int32)
        sl = ScalingLists(l4, l8)
        sps.profile_idc = 100
        if "pps" in name:
            pps.pic_scaling_matrix_present_flag = 1
            pps.pic_scaling_lists = sl
        else:
            sps.seq_scaling_matrix_present_flag = 1
            sps.seq_scaling_lists = sl
    enc = IntraEncoder(sps, pps, qp, mb_kind_policy=POLICIES[policy])
    if rps:
        bounds = list(range(0, mb_w * mb_h, rps * mb_w))
        mbs = enc.encode_frame(*src, slice_bounds=bounds)
    else:
        mbs = enc.encode_frame(*src)
    stream = encode_frame_annexb(sps, pps, rps, mbs,
                                 deblock_disable=0 if deblock else 1)
    golden = decode_annexb(stream)[0]
    return stream, golden, sps, pps


def all_fixture_names():
    return [s[0] for s in FIXTURE_SPECS]
