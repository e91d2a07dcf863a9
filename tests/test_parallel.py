"""Multi-chip sharding on the virtual 8-device CPU mesh: frame-parallel
GOP decode, band-parallel wavefront with ICI halo exchange, 2-D mesh."""
import numpy as np
import pytest

from dryv_tpu.avc import split_annexb
from dryv_tpu.coeffs import pack_frame
from dryv_tpu.decoder import SyntaxDecoder, group_access_units
from dryv_tpu.parallel import make_mesh
from dryv_tpu.parallel.bands import make_banded_frame_fn
from dryv_tpu.parallel.gop import decode_gop_sharded
from dryv_tpu.testing.fixtures import get_fixture


@pytest.fixture(scope="module")
def frame_syntax():
    stream, golden, _, _ = get_fixture("mix_qp26")
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    sps, pps, mbs, _ = sd.decode_picture_syntax(group_access_units(rest)[0])
    return pack_frame(mbs, sps, pps), golden


@pytest.mark.parametrize("use_pallas", [True, False])
def test_gop_sharded(frame_syntax, use_pallas):
    fs, (gy, gcb, gcr) = frame_syntax
    mesh = make_mesh({"gop": 8})
    ys, cbs, crs = decode_gop_sharded([fs] * 8, mesh, use_pallas=use_pallas)
    for i in range(8):
        assert np.array_equal(ys[i], gy)
        assert np.array_equal(cbs[i], gcb)
        assert np.array_equal(crs[i], gcr)


@pytest.mark.parametrize("n_bands", [2, 3])
def test_band_sharded_halo_exchange(frame_syntax, n_bands):
    fs, (gy, gcb, gcr) = frame_syntax
    mesh = make_mesh({"band": n_bands})
    fn = make_banded_frame_fn(mesh, fs.mb_w, fs.mb_h)
    y, cb, cr = fn(fs)
    assert np.array_equal(y, gy)
    assert np.array_equal(cb, gcb)
    assert np.array_equal(cr, gcr)


def test_2d_mesh(frame_syntax):
    fs, (gy, gcb, gcr) = frame_syntax
    mesh = make_mesh({"gop": 2, "band": 2})
    fn = make_banded_frame_fn(mesh, fs.mb_w, fs.mb_h)
    y, cb, cr = fn(fs)
    assert np.array_equal(y, gy)
    assert np.array_equal(cb, gcb)
    assert np.array_equal(cr, gcr)


@pytest.mark.parametrize("n_bands,Fi", [(2, 2), (4, 1)])
def test_band_pipelined_pallas(frame_syntax, n_bands, Fi):
    """Pipeline-parallel banded schedule: whole-band Pallas launches with
    ppermute'd bottom-row halos, bit-exact vs the golden."""
    from dryv_tpu.parallel.bands import make_banded_gop_pallas_fn

    fs, (gy, gcb, gcr) = frame_syntax
    mesh = make_mesh({"band": n_bands})
    F = 4
    run = make_banded_gop_pallas_fn(mesh, fs.mb_w, fs.mb_h, F, Fi=Fi)
    y, cb, cr = run([fs] * F)
    for f in range(F):
        assert np.array_equal(y[f], gy)
        assert np.array_equal(cb[f], gcb)
        assert np.array_equal(cr[f], gcr)


def test_graft_entry():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    y, cb, cr = fn(*args)
    assert y.shape == (64, 64)
