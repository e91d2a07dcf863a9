"""Native C++ entropy stage vs the Python syntax decoder: element-identical
dense outputs on intra fixtures and motion P sequences."""
import numpy as np
import pytest

from dryv_tpu.avc import split_annexb
from dryv_tpu.avc.slice_header import SliceHeader
from dryv_tpu.decoder import SyntaxDecoder, group_access_units
from dryv_tpu.native.entropy import (_MBKIND_OF_NATIVE,
                                     decode_picture_slices)
from dryv_tpu.testing.fixtures import get_fixture


def _compare_stream(stream):
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    for pic in group_access_units(rest):
        sps, pps, mbs, headers = sd.decode_picture_syntax(pic)
        sds = []
        for h, nal in zip(headers, pic):
            sds.append((nal.rbsp, (h.header_bit_len + 7) & ~7,
                        h.first_mb_in_slice, h.slice_qp_y(pps),
                        int(h.slice_type), h.cabac_init_idc,
                        h.num_ref_idx_l0_active_minus1,
                        h.num_ref_idx_l1_active_minus1))
        out = decode_picture_slices(sds, sps, pps)
        for a, mb in enumerate(mbs):
            nk = int(out["kind"][a])
            assert _MBKIND_OF_NATIVE[nk] == int(mb.kind), (a, nk, mb.kind)
            assert out["qp_y"][a] == mb.qp_y
            assert out["cbp"][a] == mb.cbp
            assert np.array_equal(out["modes4"][a], mb.intra4x4_modes)
            assert np.array_equal(out["ref_idx"][a], mb.ref_idx)
            assert np.array_equal(out["mvd"][a], mb.mvd)


@pytest.mark.parametrize("name", ["mix_qp26", "mix8_qp30", "slices_qp28",
                                  "pcm", "big_qp30"])
def test_native_matches_python_intra(name):
    stream, _, _, _ = get_fixture(name)
    _compare_stream(stream)


def test_native_matches_python_psequence(p_sequence_stream):
    _compare_stream(p_sequence_stream)


@pytest.fixture(scope="module")
def p_sequence_stream():
    from dryv_tpu.encoder import default_sps_pps
    from dryv_tpu.encoder.p_frame import SequenceEncoder
    from dryv_tpu.encoder.slices import encode_sequence_annexb

    rng = np.random.RandomState(5)
    mb_w, mb_h = 6, 4
    W, H = mb_w * 16, mb_h * 16
    base_y = np.clip(np.linspace(30, 220, W)[None, :]
                     + rng.randint(-10, 11, (H, W)), 0, 255).astype(np.int64)
    cbp = np.clip(100 + rng.randint(-8, 9, (H // 2, W // 2)),
                  0, 255).astype(np.int64)
    crp = np.clip(140 + rng.randint(-8, 9, (H // 2, W // 2)),
                  0, 255).astype(np.int64)

    def frame_at(shift):
        y = np.roll(base_y, shift * 2, axis=1).copy()
        y[20:40, 30 + shift * 4:60 + shift * 4] = 210
        return y, cbp.copy(), crp.copy()

    sps, pps = default_sps_pps(mb_w, mb_h, qp=28)
    se = SequenceEncoder(sps, pps, 28)
    frames = [(se.encode_idr(*frame_at(0)), 7, True, 0),
              (se.encode_p(*frame_at(1)), 5, False, 1),
              (se.encode_p(*frame_at(2)), 5, False, 2)]
    return encode_sequence_annexb(sps, pps, frames)
