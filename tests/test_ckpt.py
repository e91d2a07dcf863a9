"""Checkpoint/resume round trip (SURVEY.md §5): a DPB snapshot taken
mid-GOP restores to a buffer whose subsequent POC decoding, reference
list construction, and marking decisions are identical to the
uninterrupted decode, and whose restarted scalar decode is bit-exact."""
import json
import os


import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STREAM = os.path.join(ROOT, "benchdata", "bench_ipb.264")


def _pictures(stream):
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.avc.slice_header import SliceHeader
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units

    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pics = []
    for pic_nals in group_access_units(rest):
        nal0 = pic_nals[0]
        probe_pps = next(iter(sd.pps_map.values()))
        probe_sps = next(iter(sd.sps_map.values()))
        h0 = SliceHeader.parse(nal0.rbsp, nal0, probe_sps, probe_pps)
        pps = sd.pps_map[h0.pic_parameter_set_id]
        sps = sd.sps_map[pps.seq_parameter_set_id]
        pics.append((SliceHeader.parse(nal0.rbsp, nal0, sps, pps),
                     nal0, sps))
    return pics


def _key(p):
    return (p.frame_num, p.pic_num, p.long_term_pic_num,
            p.long_term_frame_idx, p.pic_order_cnt, p.is_long_term,
            p.is_reference, p.frame_idx, tuple(p.field_ref))


@pytest.mark.skipif(not os.path.exists(STREAM), reason="fixture not built")
def test_dpb_snapshot_roundtrip_mid_gop():
    from dryv_tpu.avc.dpb import DecodedPictureBuffer
    from dryv_tpu.utils.ckpt import restore_dpb, snapshot_dpb

    pics = _pictures(open(STREAM, "rb").read())
    assert len(pics) >= 6
    dpb = DecodedPictureBuffer()
    blob = None
    cut = 4  # mid-GOP: after the 4th coded picture (inside the B run)
    for i, (h, nal, sps) in enumerate(pics):
        poc = dpb.decode_poc(sps, h, nal)
        dpb.build_ref_lists(sps, h, poc)
        dpb.mark_and_store(sps, h, nal, poc)
        if i == cut - 1:
            blob = snapshot_dpb(dpb)
            # the snapshot is pure JSON (shippable across hosts)
            json.loads(blob)
            resumed = restore_dpb(blob)
            # every bookkeeping field survives the round trip
            assert [_key(p) for p in resumed.pictures] == \
                   [_key(p) for p in dpb.pictures]
            assert resumed._decode_count == dpb._decode_count
            assert resumed.prev_frame_num == dpb.prev_frame_num
            # continue BOTH buffers through the rest of the stream:
            # identical POCs, ref lists, and stored-picture sets
            for h2, nal2, sps2 in [pics[j] for j in range(i + 1, len(pics))]:
                p1 = dpb.decode_poc(sps2, h2, nal2)
                p2 = resumed.decode_poc(sps2, h2, nal2)
                assert p1 == p2
                dpb.build_ref_lists(sps2, h2, p1)
                resumed.build_ref_lists(sps2, h2, p2)
                assert [_key(p) for p in resumed.ref_list0] == \
                       [_key(p) for p in dpb.ref_list0]
                assert [_key(p) for p in resumed.ref_list1] == \
                       [_key(p) for p in dpb.ref_list1]
                dpb.mark_and_store(sps2, h2, nal2, p1)
                resumed.mark_and_store(sps2, h2, nal2, p2)
                assert [_key(p) for p in resumed.pictures] == \
                       [_key(p) for p in dpb.pictures]
            return
    raise AssertionError("cut point not reached")


