"""The Pallas whole-GOP deblock kernel is bit-exact vs the XLA scan path.

Runs in interpreter mode on the CPU test backend; on TPU the same kernel
compiles natively (exercised by bench.py).
"""
import numpy as np
import pytest

from dryv_tpu.coeffs import KIND_I4, KIND_I8, KIND_I16

from test_pallas_wavefront import _random_syntax


def _random_pre(rng, s, mb_w, mb_h, F):
    """Realistic edge params via deblock_precompute from the syntax."""
    from dryv_tpu.kernels.deblock import deblock_precompute

    n = mb_w * mb_h
    pres = []
    for f in range(F):
        qp = rng.integers(10, 50, n).astype(np.int32)
        sid = np.zeros(n, np.int32)
        ctl = [(0, int(rng.integers(-4, 5)) * 2, int(rng.integers(-4, 5)) * 2)]
        pres.append(deblock_precompute(s["kind"][f], qp, sid, ctl,
                                       mb_w, mb_h, 1, -2))
    return {k: np.stack([p[k] for p in pres]) for k in pres[0]}


def _xla_reference_deblock(s, y_resid, c_resid, pre, mb_w, mb_h, F):
    import jax
    import jax.numpy as jnp
    from dryv_tpu.kernels.deblock import make_deblock_tiles_fn
    from dryv_tpu.kernels.wavefront import (diag_schedule, make_wavefront_fn,
                                            tiles_to_planes)

    wf = make_wavefront_fn(mb_w, mb_h, return_tiles=True)
    dbfn = make_deblock_tiles_fn(mb_w, mb_h)
    _, d_of, k_of = diag_schedule(mb_w, mb_h)
    outs = []
    for f in range(F):
        sf = {k: s[k][f] for k in s}
        ty, tc = jax.jit(wf)(sf, y_resid[f], c_resid[f])
        fy, fc = dbfn(ty, tc, {k: jnp.asarray(pre[k][f]) for k in pre})
        outs.append(tiles_to_planes(fy, fc, jnp.asarray(d_of),
                                    jnp.asarray(k_of), mb_w, mb_h))
    y = np.stack([np.asarray(o[0]) for o in outs])
    cb = np.stack([np.asarray(o[1]) for o in outs])
    cr = np.stack([np.asarray(o[2]) for o in outs])
    return y, cb, cr


@pytest.mark.parametrize("geom,F", [((8, 6), 2), ((5, 3), 4), ((1, 1), 1)])
def test_pallas_deblock_matches_xla_random(geom, F):
    from dryv_tpu.kernels.pallas_deblock import make_gop_recon_deblock_pallas

    mb_w, mb_h = geom
    rng = np.random.default_rng(31 * mb_w + mb_h)
    s, y_resid, c_resid = _random_syntax(rng, mb_w, mb_h, F)
    pre = _random_pre(rng, s, mb_w, mb_h, F)
    gy, gcb, gcr = _xla_reference_deblock(s, y_resid, c_resid, pre,
                                          mb_w, mb_h, F)
    fn = make_gop_recon_deblock_pallas(mb_w, mb_h, F, interpret=True)
    py, pcb, pcr = fn(s, y_resid, c_resid, pre)
    assert np.array_equal(np.asarray(py), gy)
    assert np.array_equal(np.asarray(pcb), gcb)
    assert np.array_equal(np.asarray(pcr), gcr)


def test_pallas_deblock_fixture_bit_exact():
    """Full stage-A + Pallas recon + Pallas deblock vs libavcodec golden."""
    import jax.numpy as jnp
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.coeffs import pack_from_native
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units
    from dryv_tpu.avc.slice_header import SliceHeader
    from dryv_tpu.kernels.deblock import deblock_precompute_intra
    from dryv_tpu.kernels.pallas_deblock import (
        make_gop_pipeline_deblock_pallas)
    from dryv_tpu.kernels.transform import LS4_FLAT, LS8_FLAT
    from dryv_tpu.native.entropy import decode_picture_islices
    from dryv_tpu.pipeline import SYNTAX_KEYS
    from dryv_tpu.testing.fixtures import get_fixture

    stream, (gy, gcb, gcr), _, _ = get_fixture("dblk_slices_qp28")
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pic = group_access_units(rest)[0]
    headers = []
    slice_datas = []
    for nal in pic:
        pps = next(iter(sd.pps_map.values()))
        sps = next(iter(sd.sps_map.values()))
        h = SliceHeader.parse(nal.rbsp, nal, sps, pps)
        headers.append(h)
        slice_datas.append((nal.rbsp, (h.header_bit_len + 7) & ~7,
                            h.first_mb_in_slice, h.slice_qp_y(pps)))
    out = decode_picture_islices(slice_datas, sps, pps, n_threads=1)
    fs = pack_from_native(out, sps, pps)
    ctl = [(0, 0, 0) if h.deblocking is None else
           (h.deblocking.disable_idc, h.deblocking.alpha_c0_offset_div2 * 2,
            h.deblocking.beta_offset_div2 * 2) for h in headers]
    off1 = pps.second_chroma_qp_index_offset
    pre1 = deblock_precompute_intra(
        fs.kind, fs.qp_y, out["slice_id"], ctl, fs.mb_w, fs.mb_h,
        pps.chroma_qp_index_offset,
        off1 if off1 is not None else pps.chroma_qp_index_offset)
    F = 2
    stacked = {k: np.stack([np.asarray(getattr(fs, k))] * F)
               for k in SYNTAX_KEYS}
    pre = {k: np.stack([v] * F) for k, v in pre1.items()}
    fn = make_gop_pipeline_deblock_pallas(fs.mb_w, fs.mb_h, F,
                                          interpret=True)
    y, cb, cr = fn(stacked, jnp.asarray(LS4_FLAT), jnp.asarray(LS4_FLAT),
                   jnp.asarray(LS4_FLAT), jnp.asarray(LS8_FLAT), pre)
    H, W = gy.shape
    for f in range(F):
        assert np.array_equal(np.asarray(y[f])[:H, :W], gy)
        assert np.array_equal(
            np.asarray(cb[f])[:gcb.shape[0], :gcb.shape[1]], gcb)
        assert np.array_equal(
            np.asarray(cr[f])[:gcr.shape[0], :gcr.shape[1]], gcr)
