"""Fast table-driven predictors must match the scalar reference exactly."""
import numpy as np
import jax.numpy as jnp

from dryv_tpu.kernels import intra_pred as ipk
from dryv_tpu.refimpl import intra as ips


def test_pred4x4_fast_matches_scalar():
    rng = np.random.RandomState(0)
    K = 64
    above = rng.randint(0, 256, (K, 8)).astype(np.int32)
    left = rng.randint(0, 256, (K, 4)).astype(np.int32)
    corner = rng.randint(0, 256, K).astype(np.int32)
    for mode in range(9):
        modes = np.full(K, mode, np.int32)
        out = np.asarray(ipk.pred4x4_fast(
            jnp.asarray(modes), jnp.asarray(above), jnp.asarray(left),
            jnp.asarray(corner), jnp.ones(K, bool), jnp.ones(K, bool)))
        for k in range(0, K, 7):
            ref = ips.pred4x4(mode, above[k], left[k], int(corner[k]),
                              True, True, True, True)
            assert np.array_equal(out[k], ref), f"4x4 mode {mode} lane {k}"


def test_pred4x4_fast_dc_availability():
    rng = np.random.RandomState(1)
    K = 8
    above = rng.randint(0, 256, (K, 8)).astype(np.int32)
    left = rng.randint(0, 256, (K, 4)).astype(np.int32)
    corner = rng.randint(0, 256, K).astype(np.int32)
    for aa in (False, True):
        for ab in (False, True):
            out = np.asarray(ipk.pred4x4_fast(
                jnp.full(K, 2, jnp.int32), jnp.asarray(above),
                jnp.asarray(left), jnp.asarray(corner),
                jnp.full(K, aa, bool), jnp.full(K, ab, bool)))
            ref = ips.pred4x4(2, above[0], left[0], int(corner[0]),
                              aa, ab, False, False)
            assert np.array_equal(out[0], ref)


def test_pred8x8_fast_matches_scalar():
    rng = np.random.RandomState(2)
    K = 32
    above = rng.randint(0, 256, (K, 16)).astype(np.int32)
    left = rng.randint(0, 256, (K, 8)).astype(np.int32)
    corner = rng.randint(0, 256, K).astype(np.int32)
    for mode in range(9):
        modes = np.full(K, mode, np.int32)
        out = np.asarray(ipk.pred8x8_fast(
            jnp.asarray(modes), jnp.asarray(above), jnp.asarray(left),
            jnp.asarray(corner), jnp.ones(K, bool), jnp.ones(K, bool)))
        for k in range(0, K, 5):
            ref = ips.pred8x8(mode, above[k], left[k], int(corner[k]),
                              True, True, True)
            assert np.array_equal(out[k], ref), f"8x8 mode {mode} lane {k}"


def test_filter8x8_fast_matches_scalar():
    rng = np.random.RandomState(3)
    K = 16
    above = rng.randint(0, 256, (K, 16)).astype(np.int32)
    left = rng.randint(0, 256, (K, 8)).astype(np.int32)
    corner = rng.randint(0, 256, K).astype(np.int32)
    for aa in (False, True):
        for ab in (False, True):
            for ad in (False, True):
                fa, fl, fz = ipk.filter8x8_fast(
                    jnp.asarray(above), jnp.asarray(left),
                    jnp.asarray(corner), jnp.full(K, aa, bool),
                    jnp.full(K, ab, bool), jnp.full(K, ad, bool))
                ra, rl, rz = ips.filter_ref_8x8(
                    above[0], left[0], int(corner[0]), aa, ab, True, ad)
                assert np.array_equal(np.asarray(fa)[0], ra), (aa, ab, ad)
                assert np.array_equal(np.asarray(fl)[0], rl), (aa, ab, ad)
                assert int(np.asarray(fz)[0]) == int(rz), (aa, ab, ad)
