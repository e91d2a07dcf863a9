"""In-loop deblocking filter conformance (spec 8.7) vs the libavcodec
oracle.  The upstream reference has no deblocking (README.md:14), so these
tests cover beyond-reference behavior.  I-frame deblock fixtures are
covered by test_conformance (dblk_* specs); here: inter bS rules."""
import numpy as np
import pytest

from dryv_tpu.decoder import decode_annexb_scalar
from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.p_frame import SequenceEncoder
from dryv_tpu.encoder.slices import encode_sequence_annexb
from dryv_tpu.testing.oracle import decode_annexb


@pytest.fixture(scope="module")
def deblock_p_sequence():
    """IDR + 2 P frames, deblocking enabled: inter bS (coded coeffs -> 2,
    mv delta >= 4 quarter-pel -> 1), skip MBs, intra escapes in P."""
    rng = np.random.RandomState(17)
    mb_w, mb_h = 6, 4
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(np.linspace(20, 230, W)[None, :]
                     + rng.randint(-12, 13, (H, W)), 0, 255).astype(np.int64)
    base_cb = np.clip(110 + rng.randint(-10, 11, (H // 2, W // 2)),
                      0, 255).astype(np.int64)
    base_cr = np.clip(130 + rng.randint(-10, 11, (H // 2, W // 2)),
                      0, 255).astype(np.int64)

    def frame_at(shift):
        y = np.roll(np.roll(base_y, shift, axis=1), shift, axis=0).copy()
        y[24:44, 20 + shift * 4:52 + shift * 4] = 200
        return y, np.roll(base_cb, shift, axis=1).copy(), base_cr.copy()

    sps, pps = default_sps_pps(mb_w, mb_h, qp=30)
    se = SequenceEncoder(sps, pps, 30, deblock=True)
    frames = [(se.encode_idr(*frame_at(0)), 7, True, 0),
              (se.encode_p(*frame_at(1)), 5, False, 1),
              (se.encode_p(*frame_at(3)), 5, False, 2)]
    stream = encode_sequence_annexb(sps, pps, frames, deblock_disable=0)
    return stream


def test_deblock_p_sequence_bit_exact(deblock_p_sequence):
    oracle = decode_annexb(deblock_p_sequence)
    assert len(oracle) == 3
    ours = decode_annexb_scalar(deblock_p_sequence)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"


def test_deblock_multiref_bit_exact():
    """Deblocking + multi-reference: bS ref-difference rule (different
    reference picture -> bS 1) crossing partition boundaries."""
    rng = np.random.RandomState(23)
    mb_w, mb_h = 5, 3
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(128 + rng.randint(-70, 71, (H, W)),
                     0, 255).astype(np.int64)
    cbp = np.full((H // 2, W // 2), 95, np.int64)
    crp = np.full((H // 2, W // 2), 145, np.int64)
    flash = np.clip(base_y + 60, 0, 255)
    sps, pps = default_sps_pps(mb_w, mb_h, qp=29, max_refs=2)
    se = SequenceEncoder(sps, pps, 29, deblock=True)
    frames = [(se.encode_idr(base_y, cbp, crp), 7, True, 0),
              (se.encode_p(flash, cbp, crp), 5, False, 1),
              (se.encode_p(base_y, cbp, crp), 5, False, 2)]
    stream = encode_sequence_annexb(sps, pps, frames, deblock_disable=0)
    oracle = decode_annexb(stream)
    ours = decode_annexb_scalar(stream)
    for i, (oy, ocb, ocr) in enumerate(oracle):
        assert np.array_equal(oy, ours[i].y), f"frame {i} luma"
        assert np.array_equal(ocb, ours[i].cb), f"frame {i} cb"
        assert np.array_equal(ocr, ours[i].cr), f"frame {i} cr"
