"""PAFF field-picture decode, oracle-gated (the reference cannot decode
any field-coded stream: its neighbor derivation is frame-only —
/root/reference/src/video/slice/mod.rs:328-342 only *infers* flags)."""
import numpy as np
import pytest

from dryv_tpu.encoder import default_sps_pps
from dryv_tpu.encoder.intra_encoder import IntraEncoder
from dryv_tpu.encoder.slices import encode_fields_annexb
from dryv_tpu.testing.fixtures import make_source
from dryv_tpu.testing.oracle import decode_annexb as oracle_decode
from dryv_tpu.decoder import decode_annexb_scalar


def _paff_stream(mb_w=4, mb_h=4, qp=28, policy=None, t8=False,
                 deblock=False, n_frames=2):
    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp, transform_8x8=t8,
                               profile=100 if t8 else 77)
    sps.frame_mbs_only_flag = 0
    sps.pic_height_in_map_units_minus1 = mb_h // 2 - 1
    from dryv_tpu.encoder.intra_encoder import IntraEncoder
    entries = []
    for fi in range(n_frames):
        y, cb, cr = make_source(mb_w, mb_h, seed=13 + fi)
        for parity in (0, 1):
            fy, fcb, fcr = y[parity::2], cb[parity::2], cr[parity::2]
            enc = IntraEncoder(sps, pps, qp, mb_kind_policy=policy,
                               mb_h=mb_h // 2)
            mbs = enc.encode_frame(fy, fcb, fcr)
            entries.append((mbs, parity, fi == 0 and parity == 0, fi))
    stream = encode_fields_annexb(sps, pps, entries,
                                  deblock_disable=0 if deblock else 1)
    return stream, n_frames


@pytest.mark.parametrize("t8,policy,qp,deblock", [
    (False, lambda a: ["i16", "i4"][a % 2], 28, False),
    (True, lambda a: ["i8", "i4", "i16"][a % 3], 31, False),
    (False, lambda a: ["i16", "i4", "pcm"][a % 3], 26, False),
    (False, lambda a: ["i16", "i4"][a % 2], 30, True),
])
def test_paff_intra_bit_exact(t8, policy, qp, deblock):
    stream, n_frames = _paff_stream(t8=t8, policy=policy, qp=qp,
                                    deblock=deblock)
    goldens = oracle_decode(stream)
    assert len(goldens) == n_frames, "oracle should weave field pairs"
    frames = decode_annexb_scalar(stream)
    assert len(frames) == n_frames
    for f, (gy, gcb, gcr) in zip(frames, goldens):
        assert np.array_equal(f.y, gy)
        assert np.array_equal(f.cb, gcb)
        assert np.array_equal(f.cr, gcr)
