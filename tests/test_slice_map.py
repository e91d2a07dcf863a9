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
