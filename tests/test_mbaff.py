"""MBAFF (macroblock-adaptive frame/field) decode.

The upstream reference implements MBAFF only at the entropy layer
(cabac/mod.rs:1105-1111 mb_field_decoding_flag, slice/mod.rs:412-451
MBAFF neighbours, cabac/mod.rs:925-938 field mvd scaling) and cannot
reconstruct any interlaced picture.  Here: full CABAC entropy decode
(pair loop, flag inference, Table 6-4 neighbours, field scans/sig maps,
mvd rescale) plus intra reconstruction, bit-exact vs libavcodec on
x264-encoded MBAFF streams.  Fixtures come from the real third-party
encoder — our own encoder does not emit MBAFF.
"""
import numpy as np
import pytest

from dryv_tpu.testing.x264 import encode_x264, x264_available

pytestmark = pytest.mark.skipif(not x264_available(),
                                reason="system libx264 not present")


def _sources(n=3, mb_w=5, mb_h=4):
    from dryv_tpu.testing.fixtures import make_source
    y, cb, cr = make_source(mb_w, mb_h, seed=11)
    return [(np.roll(y, 2 * t, axis=0).astype(np.uint8),
             np.roll(cb, t, axis=1), np.roll(cr, t, axis=1))
            for t in range(n)]


def _check(bs):
    from dryv_tpu.decoder import decode_annexb_scalar
    from dryv_tpu.testing.oracle import decode_annexb

    golden = decode_annexb(bs)
    ours = decode_annexb_scalar(bs)
    assert len(ours) == len(golden)
    for i, (o, g) in enumerate(zip(ours, golden)):
        for pn, op, gp in zip("ycc", (o.y, o.cb, o.cr), g):
            assert np.array_equal(np.asarray(op), gp), \
                f"frame {i} plane {pn}"


@pytest.mark.parametrize("params", [
    "qp=28:tff=1",                       # 8x8 transform mix
    "qp=33:bff=1:8x8dct=0",              # 4x4 only, bottom-field-first
    "qp=24:tff=1:slices=2",              # multi-slice MBAFF
    "qp=44:tff=1",                       # high QP (i16 heavy)
], ids=["tff8x8", "bff4x4", "slices", "qp44"])
def test_mbaff_intra_bit_exact(params):
    bs = encode_x264(_sources(),
                     x264_params=f"keyint=1:interlaced=1:nf=1:{params}")
    _check(bs)


@pytest.mark.parametrize("params", [
    "qp=30:interlaced=1:tff=1:bframes=2",           # IPB + deblock
    "qp=30:interlaced=1:tff=1:nf=1:bframes=0",      # P only, no filter
    "qp=26:interlaced=1:bff=1:bframes=3:b-pyramid=normal:ref=3",
    "qp=35:interlaced=1:tff=1:8x8dct=0:bframes=1",  # 4x4 transform
    "qp=22:interlaced=1:tff=1:bframes=2:deblock=2,-1",  # filter offsets
], ids=["ipb", "p_nf", "pyramid_bff", "b4x4", "dblk_offsets"])
def test_mbaff_inter_bit_exact(params):
    """Full MBAFF P/B reconstruction + MBAFF deblocking, bit-exact vs
    libavcodec (field-parity reference lists, scaled MV prediction,
    spatial direct across frame/field pairs, implicit field weights,
    mixed-edge boundary strengths).  This is the value-level oracle
    check the round-2 review asked to replace the non-desync smoke test
    with."""
    _check(encode_x264(_sources(6), x264_params=params))


def test_mbaff_inter_single_active_ref():
    """Regression (round-2 advisor, high): field MBs parse ref_idx even
    when num_ref_idx_active_minus1 == 0 (spec 7.3.5.1 condition
    `nref > 0 || (MbaffFrameFlag && mb_field_decoding_flag)`), with the
    doubled field range 2*nref+1 (7.4.5.2).  x264 interlaced=1:ref=2
    emits a first P picture with a single active reference whose field
    MBs still code ref_idx bins; dropping them desyncs CABAC and leaves
    MB pairs undecoded."""
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units

    bs = encode_x264(_sources(4),
                     x264_params="qp=30:interlaced=1:tff=1:bframes=0:ref=2")
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(bs)))
    pics = group_access_units(rest)
    assert len(pics) == 4
    for pic in pics:
        sps, pps, mbs, headers = sd.decode_picture_syntax(pic)
        assert all(m is not None for m in mbs), \
            f"{sum(m is None for m in mbs)} MBs left undecoded (desync)"


def test_mbaff_decode_order_field_flags():
    """Pair flags propagate: both MBs of a pair report the same
    mb_field_decoding_flag."""
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units

    bs = encode_x264(_sources(1),
                     x264_params="qp=26:keyint=1:interlaced=1:tff=1:nf=1")
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(bs)))
    sps, pps, mbs, _ = sd.decode_picture_syntax(group_access_units(rest)[0])
    flags = [m.field_flag for m in mbs]
    assert any(flags), "x264 interlaced stream coded no field pairs"
    for p in range(len(mbs) // 2):
        assert flags[2 * p] == flags[2 * p + 1]
