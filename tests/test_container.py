"""MP4 mux + demux round-trip, validated against the ffmpeg demuxer."""
import os

import numpy as np
import pytest

from dryv_tpu.avc import NalUnitType, split_annexb
from dryv_tpu.avc.nal import to_avcc_sample
from dryv_tpu.container import MP4File, write_mp4
from dryv_tpu.testing.fixtures import get_fixture
from dryv_tpu.video import Video


@pytest.fixture(scope="module")
def mp4_path(tmp_path_factory):
    stream, golden, sps, pps = get_fixture("mix_qp26")
    nals = list(split_annexb(stream))
    sps_nal = next(n for n in nals if n.type == NalUnitType.SPS).to_bytes()
    pps_nal = next(n for n in nals if n.type == NalUnitType.PPS).to_bytes()
    slices = [n for n in nals if n.type in (NalUnitType.IDR_SLICE,
                                            NalUnitType.NON_IDR_SLICE)]
    path = tmp_path_factory.mktemp("mp4") / "fixture.mp4"
    write_mp4(path, [to_avcc_sample(slices)], sps_nal, pps_nal,
              sps.width, sps.height)
    return str(path), golden, sps


def test_ffmpeg_accepts_container(mp4_path):
    import cv2
    path, golden, sps = mp4_path
    cap = cv2.VideoCapture(path)
    ok, img = cap.read()
    assert ok and img.shape[:2] == (sps.height, sps.width)


def test_demux_info(mp4_path):
    path, golden, sps = mp4_path
    v = Video.open(path)
    info = v.info()
    assert info["codec"] == "H264"
    assert int(info["width"]) == sps.width
    assert int(info["height"]) == sps.height
    assert v.avc1.avcc is not None
    assert v.avc1.avcc.nal_length_size == 4


def test_mp4_decode_bit_exact(mp4_path):
    path, (gy, gcb, gcr), _ = mp4_path
    v = Video.open(path)
    fr = v.decode_frames(backend="scalar")[0]
    assert np.array_equal(fr.y, gy)
    assert np.array_equal(fr.cb, gcb)
    assert np.array_equal(fr.cr, gcr)


def test_mp4_ipb_decode(tmp_path):
    """IPB stream muxed one-sample-per-AU: Video decodes through the
    native path and returns display (POC) order."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ipb = os.path.join(root, "benchdata", "bench_ipb.264")
    if not os.path.exists(ipb):
        pytest.skip("ipb fixture not built")
    from dryv_tpu.decoder import group_access_units
    stream = open(ipb, "rb").read()
    nals = list(split_annexb(stream))
    sps_nal = next(n for n in nals if n.type == NalUnitType.SPS).to_bytes()
    pps_nal = next(n for n in nals if n.type == NalUnitType.PPS).to_bytes()
    slices = [n for n in nals if n.type in (NalUnitType.IDR_SLICE,
                                            NalUnitType.NON_IDR_SLICE)]
    samples = [to_avcc_sample(au) for au in group_access_units(slices)]
    import dryv_tpu.avc.sps as spsmod
    sps = spsmod.SPS.parse(nals[0].rbsp)
    path = tmp_path / "ipb.mp4"
    write_mp4(path, samples, sps_nal, pps_nal, sps.width, sps.height)
    v = Video.open(path)
    frames = v.decode_frames(max_frames=9, backend="native")
    g = np.load(os.path.join(root, "benchdata", "bench_ipb_golden.npz"))
    assert len(frames) == 9
    for i, f in enumerate(frames):
        assert np.array_equal(f.y, g[f"f{i}_y"]), f"frame {i}"


def test_sample_tables(mp4_path):
    path, _, _ = mp4_path
    m = MP4File(path)
    trak = m.video_track()
    stbl = trak.mdia.minf(m.f).stbl
    assert len(list(stbl.stco)) == 1
    assert len(list(stbl.stsc)) == 1
    sizes = list(stbl.stsz)
    assert len(sizes) == 1 and sizes[0] > 0
    assert list(stbl.stss) == [1]
    stts = list(stbl.stts)
    assert stts[0][0] == 1
