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


# -- PAFF inter (P/B field pictures) -----------------------------------
# The reference cannot decode ANY field-coded stream; this is
# beyond-reference coverage.  Field reference lists follow 8.2.4.2.5
# (parity-interleaved split of the frame ordering) and motion
# compensation applies the 8.4.1.4 chroma MV adjustment (+/-2 quarter
# samples) for opposite-parity references.  Deblocking uses the
# field-picture vertical MV threshold of 2 quarter samples (8.7.2.1).

def _paff_ipb(mb_w, mb_h, qp, b_fields, deblock, n_frames=4, seed=13,
              temporal=False):
    from dryv_tpu.encoder.field_seq import encode_paff_ipb_annexb
    # temporal direct needs the co-located field's own references still
    # in the DPB when the B field decodes (sliding window must not have
    # evicted them)
    # temporal direct derives motion from POC distances, so the fixture
    # needs real (type 0) POCs with the B between its references; POC
    # type 2 (decode order == output order) would make the reordered B
    # nonconformant
    sps, pps = default_sps_pps(mb_w, mb_h, qp=qp,
                               max_refs=4 if temporal else 1,
                               poc_type=0 if temporal else 2)
    sps.frame_mbs_only_flag = 0
    sps.pic_height_in_map_units_minus1 = mb_h // 2 - 1
    srcs = [make_source(mb_w, mb_h, seed=seed + i) for i in range(n_frames)]
    stream = encode_paff_ipb_annexb(sps, pps, srcs, qp,
                                    b_fields=b_fields, deblock=deblock,
                                    temporal_direct=temporal)
    return stream, n_frames


@pytest.mark.parametrize("b_fields,deblock,qp,temporal", [
    (False, False, 27, False),   # IDR + P fields
    (False, True, 30, False),    # P fields through the in-loop filter
    (True, False, 27, False),    # B fields (parity-interleaved l1, direct)
    (True, True, 29, False),     # B fields + deblock (field bS thresholds)
    (True, False, 28, True),     # B fields, TEMPORAL direct (8.4.1.2.3
                                 # with field POCs + parity keys)
    (True, True, 30, True),      # temporal direct + in-loop filter
])
def test_paff_inter_bit_exact(b_fields, deblock, qp, temporal):
    stream, n_frames = _paff_ipb(6, 4, qp, b_fields, deblock,
                                 temporal=temporal)
    goldens = oracle_decode(stream)
    assert len(goldens) == n_frames
    frames = decode_annexb_scalar(stream)
    assert len(frames) == n_frames
    for i, (f, (gy, gcb, gcr)) in enumerate(zip(frames, goldens)):
        assert np.array_equal(f.y, gy), f"frame {i} luma"
        assert np.array_equal(f.cb, gcb), f"frame {i} cb"
        assert np.array_equal(f.cr, gcr), f"frame {i} cr"
