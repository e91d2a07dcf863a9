"""B-slice reconstruction conformance vs the libavcodec oracle.

Exceeds the upstream reference, which parses B syntax but cannot
reconstruct inter (frame/mod.rs:88 todo!): spatial direct mode, B_Skip,
L0/L1/bi-predictive 16x16 with quarter-pel MC, intra escapes."""
import numpy as np
import pytest

from dryv_tpu.cabac.syntax import MbKind
from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.testing.oracle import decode_annexb


def _sources(seed, mb_w, mb_h):
    rng = np.random.RandomState(seed)
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(np.linspace(25, 225, W)[None, :]
                     + rng.randint(-12, 13, (H, W)), 0, 255).astype(np.int64)
    base_cb = np.clip(105 + rng.randint(-9, 10, (H // 2, W // 2)),
                      0, 255).astype(np.int64)
    base_cr = np.clip(135 + rng.randint(-9, 10, (H // 2, W // 2)),
                      0, 255).astype(np.int64)

    def frame_at(shift):
        y = np.roll(np.roll(base_y, shift, axis=1), shift // 2,
                    axis=0).copy()
        y[18:38, 25 + shift * 2:57 + shift * 2] = 205
        return (y, np.roll(base_cb, shift, axis=1).copy(), base_cr.copy())
    return frame_at


@pytest.fixture(scope="module", params=[False, True],
                ids=["nodeblock", "deblock"])
def b_sequence(request):
    """IDR(poc 0) + P(poc 8) + B(poc 4, non-reference), coded I-P-B."""
    deblock = request.param
    mb_w, mb_h = 6, 4
    frame_at = _sources(31, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, 28, deblock=deblock)
    frames = [
        (se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
        (se.encode_p(*frame_at(4), poc=8), 5, False, 1, 8, 3),
        (se.encode_b(*frame_at(2), poc=4), 6, False, 2, 4, 0),
    ]
    stream = encode_sequence_annexb(sps, pps, frames,
                                    deblock_disable=0 if deblock else 1)
    return stream, frames


def test_b_mb_kind_mix(b_sequence):
    _, frames = b_sequence
    kinds = [m.kind for m in frames[2][0]]
    assert MbKind.B_SKIP in kinds
    assert MbKind.B_DIRECT in kinds
    assert MbKind.B in kinds
    assert MbKind.B_8X8 in kinds  # sub-partitioned (direct/L0/L1/Bi subs)
    codes = {m.mb_type_code for m in frames[2][0] if m.kind == MbKind.B}
    assert {1, 2, 3} <= codes, f"want L0+L1+Bi coverage, got {codes}"
    assert 8 in codes and 21 in codes, f"want 16x8+8x16 coverage: {codes}"


def test_b_sequence_bit_exact(b_sequence):
    stream, _ = b_sequence
    oracle = decode_annexb(stream)
    assert len(oracle) == 3
    ours = sorted(decode_annexb_scalar(stream), key=lambda f: f.poc)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"


def test_temporal_direct_bit_exact():
    """IDR + P + P + B with temporal direct (POC-scaled co-located mvs):
    the co-located P's motion references the middle P -> non-trivial
    scaling (tb=2, td=4)."""
    mb_w, mb_h = 6, 4
    frame_at = _sources(37, mb_w, mb_h)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, poc_type=0, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [
        (se.encode_idr(*frame_at(0), poc=0), 7, True, 0, 0, 3),
        (se.encode_p(*frame_at(2), poc=4), 5, False, 1, 4, 3),
        (se.encode_p(*frame_at(4), poc=8, max_search_refs=1),
         5, False, 2, 8, 3),
        (se.encode_b(*frame_at(3), poc=6, temporal=True), 6, False, 3, 6,
         0, None, 0),
    ]
    stream = encode_sequence_annexb(sps, pps, frames)
    kinds = [m.kind for m in frames[3][0]]
    assert MbKind.B_SKIP in kinds or MbKind.B_DIRECT in kinds
    oracle = decode_annexb(stream)
    assert len(oracle) == 4
    ours = sorted(decode_annexb_scalar(stream), key=lambda f: f.poc)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"
