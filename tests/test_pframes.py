"""IDR+P sequence conformance: motion-compensated P frames vs oracle.

This exceeds the upstream reference, which parses but cannot reconstruct
inter (frame/mod.rs:88 todo!)."""
import numpy as np
import pytest

from dryv_tpu.cabac.syntax import MbKind
from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.testing.oracle import decode_annexb


@pytest.fixture(scope="module")
def p_sequence():
    rng = np.random.RandomState(5)
    mb_w, mb_h = 6, 4
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(np.linspace(30, 220, W)[None, :]
                     + rng.randint(-10, 11, (H, W)), 0, 255).astype(np.int64)
    base_cb = np.clip(100 + rng.randint(-8, 9, (H // 2, W // 2)),
                      0, 255).astype(np.int64)
    base_cr = np.clip(140 + rng.randint(-8, 9, (H // 2, W // 2)),
                      0, 255).astype(np.int64)

    def frame_at(shift):
        # odd shifts force odd-pel MVs (chroma half-pel); the search also
        # picks fractional refinements -> quarter-pel interpolation covered
        y = np.roll(np.roll(base_y, shift, axis=1), shift, axis=0).copy()
        y[20:40, 30 + shift * 3:60 + shift * 3] = 210
        return y, np.roll(base_cb, shift, axis=1).copy(), base_cr.copy()

    sps, pps = default_sps_pps(mb_w, mb_h, qp=28)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(*frame_at(0)), 7, True, 0),
              (se.encode_p(*frame_at(1)), 5, False, 1),
              (se.encode_p(*frame_at(3)), 5, False, 2)]
    stream = encode_sequence_annexb(sps, pps, frames)
    return stream, frames


def test_p_mb_kind_mix(p_sequence):
    _, frames = p_sequence
    kinds = [m.kind for m in frames[1][0]]
    assert MbKind.P_SKIP in kinds
    assert MbKind.P in kinds       # 16x16/16x8/8x16 motion-compensated MBs
    assert MbKind.P_8X8 in kinds   # sub-partitioned MBs
    # fractional motion present
    mvds = np.concatenate([m.mvd[0].reshape(-1) for m in frames[1][0]])
    assert np.any(mvds % 4 != 0) or np.any(mvds % 2 != 0)


@pytest.fixture(scope="module")
def multiref_sequence():
    """IDR + 2 P frames with max_num_ref_frames=2: the last frame's content
    reverts to the IDR (flash pattern), so motion search picks ref_idx=1
    for many MBs — exercises ref_idx syntax + multi-ref reconstruction."""
    rng = np.random.RandomState(11)
    mb_w, mb_h = 5, 4
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(128 + rng.randint(-60, 61, (H, W)),
                     0, 255).astype(np.int64)
    base_cb = np.full((H // 2, W // 2), 90, np.int64)
    base_cr = np.full((H // 2, W // 2), 150, np.int64)
    flash_y = np.clip(base_y + 70, 0, 255)

    sps, pps = default_sps_pps(mb_w, mb_h, qp=28, max_refs=2)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(base_y, base_cb, base_cr), 7, True, 0),
              (se.encode_p(flash_y, base_cb, base_cr), 5, False, 1),
              (se.encode_p(base_y, base_cb, base_cr), 5, False, 2)]
    stream = encode_sequence_annexb(sps, pps, frames)
    return stream, frames


def test_multiref_uses_ref_idx_1(multiref_sequence):
    _, frames = multiref_sequence
    refs = np.concatenate([m.ref_idx[0] for m in frames[2][0]
                           if m.kind in (MbKind.P, MbKind.P_8X8)])
    assert np.any(refs == 1), "fixture never coded ref_idx 1"


def test_multiref_bit_exact(multiref_sequence):
    stream, _ = multiref_sequence
    oracle = decode_annexb(stream)
    assert len(oracle) == 3
    ours = decode_annexb_scalar(stream)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"


def test_p_sequence_bit_exact(p_sequence):
    stream, _ = p_sequence
    oracle = decode_annexb(stream)
    assert len(oracle) == 3
    ours = decode_annexb_scalar(stream)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"
