"""FMO slice-group map properties (spec 8.2.2)."""
import numpy as np

from dryv_tpu.avc.pps import PPS, SliceGroups
from dryv_tpu.avc.slice_map import map_units_to_sgmap, next_mb_addr
from dryv_tpu.avc.sps import SPS


def _setup(mb_w=8, mb_h=6, **sg):
    sps = SPS(pic_width_in_mbs_minus1=mb_w - 1,
              pic_height_in_map_units_minus1=mb_h - 1)
    pps = PPS(slice_groups=SliceGroups(**sg))
    return sps, pps


def test_interleaved():
    sps, pps = _setup(num_slice_groups=2, map_type=0,
                      run_length_minus1=[2, 1])
    m = map_units_to_sgmap(pps, sps)
    assert m[:5].tolist() == [0, 0, 0, 1, 1]
    assert set(m.tolist()) == {0, 1}


def test_dispersed_partitions():
    sps, pps = _setup(num_slice_groups=3, map_type=1)
    m = map_units_to_sgmap(pps, sps)
    counts = np.bincount(m, minlength=3)
    assert counts.min() > 0 and abs(counts.max() - counts.min()) <= 8


def test_foreground_box():
    sps, pps = _setup(num_slice_groups=2, map_type=2,
                      top_left=[9], bottom_right=[19])
    m = map_units_to_sgmap(pps, sps).reshape(6, 8)
    assert m[1, 1] == 0 and m[2, 3] == 0
    assert m[0, 0] == 1 and m[5, 7] == 1


def test_raster_wipe():
    sps, pps = _setup(num_slice_groups=2, map_type=4,
                      change_direction_flag=0, change_rate_minus1=7)
    m = map_units_to_sgmap(pps, sps, slice_group_change_cycle=2)
    assert (m[:16] == 0).all() and (m[16:] == 1).all()


def test_explicit_and_next_mb_addr():
    ids = [i % 2 for i in range(48)]
    sps, pps = _setup(num_slice_groups=2, map_type=6, explicit_ids=ids)
    m = map_units_to_sgmap(pps, sps)
    assert m.tolist() == ids
    assert next_mb_addr(m, 0) == 2
    assert next_mb_addr(m, 1) == 3


# --- cross-path FMO decode (round-5, VERDICT r4 item 10): own-encoder
# FMO streams decoded through the Python scalar path AND the native C++
# path (dt_decode_picture_slices_fmo walks the group's next-address
# chain), both diffed against the closed-loop encoder reconstruction.
# libavcodec cannot decode FMO, so the encoder recon is the anchor.

import pytest


def _fmo_cases():
    return [
        ("interleaved", dict(num_slice_groups=2, map_type=0,
                             run_length_minus1=[2, 1])),
        ("dispersed", dict(num_slice_groups=3, map_type=1)),
        ("foreground", dict(num_slice_groups=2, map_type=2,
                            top_left=[9], bottom_right=[27])),
        ("explicit", dict(num_slice_groups=2, map_type=6,
                          explicit_ids=[(3 * a) % 2 for a in range(48)])),
    ]


@pytest.mark.parametrize("name,sg", _fmo_cases(),
                         ids=[c[0] for c in _fmo_cases()])
def test_fmo_cross_path_bit_exact(name, sg):
    from dryv_tpu.encoder import default_sps_pps
    from dryv_tpu.encoder.intra_encoder import IntraEncoder
    from dryv_tpu.testing.fixtures import POLICIES
    from dryv_tpu.encoder.slices import encode_fmo_frame_annexb
    from dryv_tpu.decoder import decode_annexb_scalar

    mb_w, mb_h = 8, 6
    sps, pps = default_sps_pps(mb_w, mb_h, qp=27, transform_8x8=True)
    pps.slice_groups = SliceGroups(**sg)
    sgmap = map_units_to_sgmap(pps, sps)

    rng = np.random.RandomState(5)
    H, W = mb_h * 16, mb_w * 16
    src_y = np.clip(np.linspace(20, 230, W)[None, :]
                    + rng.randint(-18, 19, (H, W)), 0, 255).astype(np.int64)
    src_cb = np.clip(110 + rng.randint(-15, 16, (H // 2, W // 2)),
                     0, 255).astype(np.int64)
    src_cr = np.clip(135 + rng.randint(-15, 16, (H // 2, W // 2)),
                     0, 255).astype(np.int64)

    enc = IntraEncoder(sps, pps, 27, mb_kind_policy=POLICIES["mix8"])
    mbs = enc.encode_frame(src_y, src_cb, src_cr, slice_ids=sgmap)
    stream = encode_fmo_frame_annexb(sps, pps, mbs, sgmap)

    # anchor: the encoder's closed-loop reconstruction
    ay = np.asarray(enc.recon.y)
    acb = np.asarray(enc.recon.cb)
    acr = np.asarray(enc.recon.cr)

    # path 1: Python scalar decode (sgmap-driven SliceCoder + recon)
    f = decode_annexb_scalar(stream)[0]
    assert np.array_equal(np.asarray(f.y), ay), "scalar luma"
    assert np.array_equal(np.asarray(f.cb), acb), "scalar cb"
    assert np.array_equal(np.asarray(f.cr), acr), "scalar cr"

    # path 2: native C++ entropy (FMO next-address walk) + scalar recon
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.avc.slice_header import SliceHeader
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units
    from dryv_tpu.native.entropy import (decode_picture_slices,
                                         reconstruct_islices)
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    slice_datas = []
    for nal in group_access_units(rest)[0]:
        h = SliceHeader.parse(nal.rbsp, nal, sps, pps)
        bitoff = (h.header_bit_len + 7) & ~7
        slice_datas.append((nal.rbsp, bitoff, h.first_mb_in_slice,
                            h.slice_qp_y(pps), 2, 0, 0, 0))
    out = decode_picture_slices(slice_datas, sps, pps, n_threads=2,
                                sgmap=sgmap)
    y2, cb2, cr2 = reconstruct_islices(out, sps, pps)
    assert np.array_equal(y2, ay), "native luma"
    assert np.array_equal(cb2, acb), "native cb"
    assert np.array_equal(cr2, acr), "native cr"
