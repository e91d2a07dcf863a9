"""The Pallas whole-GOP wavefront kernel is bit-exact vs the XLA scan path.

Runs in interpreter mode on the CPU test backend; on TPU the same kernel
compiles natively (exercised by bench.py / the driver's entry check).
"""
import numpy as np
import pytest

from dryv_tpu.coeffs import KIND_I4, KIND_I8, KIND_I16, KIND_PCM


def _random_syntax(rng, mb_w, mb_h, F, pcm=True):
    n = mb_w * mb_h
    kinds = [KIND_I4, KIND_I8, KIND_I16] + ([KIND_PCM] if pcm else [])
    s = {
        "kind": rng.choice(kinds, size=(F, n)).astype(np.int32),
        "i16_mode": rng.integers(0, 4, (F, n)).astype(np.int32),
        "chroma_mode": rng.integers(0, 4, (F, n)).astype(np.int32),
        "modes4": rng.integers(0, 9, (F, n, 16)).astype(np.int32),
        "modes8": rng.integers(0, 9, (F, n, 4)).astype(np.int32),
        "pcm_y": rng.integers(0, 256, (F, n, 16, 16)).astype(np.int32),
        "pcm_c": rng.integers(0, 256, (F, n, 2, 8, 8)).astype(np.int32),
    }
    # geometric availability (single slice, no constrained intra)
    x = np.arange(n) % mb_w
    y = np.arange(n) // mb_w
    av_a = (x > 0)
    av_b = (y > 0)
    av_c = (y > 0) & (x < mb_w - 1)
    av_d = (y > 0) & (x > 0)
    for k, v in (("avail_a", av_a), ("avail_b", av_b),
                 ("avail_c", av_c), ("avail_d", av_d)):
        s[k] = np.broadcast_to(v, (F, n)).copy()
    # mask modes that would read unavailable neighbors to keep the stream
    # "legal" (real bitstreams never select them; both paths mask reads
    # identically anyway, but legality keeps the test semantics honest)
    need_b = {0: True, 3: True, 7: True}
    need_a = {1: True, 8: True}
    for blk_modes, navail in ((s["modes4"], 16), (s["modes8"], 4)):
        m = blk_modes
        m[~s["avail_b"]] = np.where(
            np.isin(m[~s["avail_b"]], list(need_b)), 2, m[~s["avail_b"]])
        m[~s["avail_a"]] = np.where(
            np.isin(m[~s["avail_a"]], list(need_a)), 2, m[~s["avail_a"]])
        m[~(s["avail_a"] & s["avail_b"])] = np.where(
            np.isin(m[~(s["avail_a"] & s["avail_b"])], [4, 5, 6]), 2,
            m[~(s["avail_a"] & s["avail_b"])])
    s["i16_mode"] = np.where(s["avail_a"] & s["avail_b"], s["i16_mode"],
                             2).astype(np.int32)
    s["chroma_mode"] = np.where(s["avail_a"] & s["avail_b"],
                                s["chroma_mode"], 0).astype(np.int32)
    y_resid = rng.integers(-300, 300, (F, n, 16, 16)).astype(np.int32)
    c_resid = rng.integers(-300, 300, (F, n, 2, 8, 8)).astype(np.int32)
    return s, y_resid, c_resid


def _xla_reference(s, y_resid, c_resid, mb_w, mb_h, F):
    import jax
    from dryv_tpu.kernels.wavefront import make_wavefront_fn

    wf = make_wavefront_fn(mb_w, mb_h, use_pallas=False)
    outs = []
    for f in range(F):
        sf = {k: s[k][f] for k in s}
        outs.append(jax.jit(wf)(sf, y_resid[f], c_resid[f]))
    y = np.stack([np.asarray(o[0]) for o in outs])
    cb = np.stack([np.asarray(o[1]) for o in outs])
    cr = np.stack([np.asarray(o[2]) for o in outs])
    return y, cb, cr


@pytest.mark.parametrize("geom,F", [((8, 6), 2), ((5, 3), 4), ((1, 1), 1)])
def test_pallas_matches_xla_random(geom, F):
    from dryv_tpu.kernels.pallas_wavefront import make_gop_recon_pallas

    mb_w, mb_h = geom
    rng = np.random.default_rng(7 * mb_w + mb_h)
    s, y_resid, c_resid = _random_syntax(rng, mb_w, mb_h, F)
    gy, gcb, gcr = _xla_reference(s, y_resid, c_resid, mb_w, mb_h, F)
    recon = make_gop_recon_pallas(mb_w, mb_h, F, interpret=True)
    py, pcb, pcr = recon(s, y_resid, c_resid)
    assert np.array_equal(np.asarray(py), gy)
    assert np.array_equal(np.asarray(pcb), gcb)
    assert np.array_equal(np.asarray(pcr), gcr)


def test_pallas_pipeline_fixture_bit_exact():
    """Full stage-A + Pallas wavefront on a real fixture vs golden."""
    import jax.numpy as jnp
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.coeffs import pack_frame
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units
    from dryv_tpu.kernels.pallas_wavefront import make_gop_pipeline_pallas
    from dryv_tpu.kernels.transform import LS4_FLAT, LS8_FLAT
    from dryv_tpu.testing.fixtures import get_fixture

    stream, (gy, gcb, gcr), sps, pps = get_fixture("mix_qp26")
    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pic = group_access_units(rest)[0]
    _, _, mbs, headers = sd.decode_picture_syntax(pic)
    fs = pack_frame(mbs, sps, pps)
    F = 2
    from dryv_tpu.pipeline import SYNTAX_KEYS
    stacked = {k: np.stack([np.asarray(getattr(fs, k))] * F)
               for k in SYNTAX_KEYS}
    fn = make_gop_pipeline_pallas(fs.mb_w, fs.mb_h, F, interpret=True)
    y, cb, cr = fn(stacked, jnp.asarray(LS4_FLAT), jnp.asarray(LS4_FLAT),
                   jnp.asarray(LS4_FLAT), jnp.asarray(LS8_FLAT))
    H, W = gy.shape
    for f in range(F):
        assert np.array_equal(np.asarray(y[f])[:H, :W], gy)
        assert np.array_equal(np.asarray(cb[f])[:gcb.shape[0], :gcb.shape[1]],
                              gcb)
        assert np.array_equal(np.asarray(cr[f])[:gcr.shape[0], :gcr.shape[1]],
                              gcr)
