#!/usr/bin/env python3
"""Quick TPU micro-bench: Pallas recon+deblock pipeline vs plain recon."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def best_of(f, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from bench import parse_slices
    import jax
    import jax.numpy as jnp
    from dryv_tpu.coeffs import pack_from_native
    from dryv_tpu.kernels.deblock import deblock_precompute_intra
    from dryv_tpu.kernels.pallas_deblock import (
        make_gop_pipeline_deblock_pallas)
    from dryv_tpu.kernels.pallas_wavefront import make_gop_pipeline_pallas
    from dryv_tpu.kernels.transform import LS4_FLAT, LS8_FLAT
    from dryv_tpu.native.entropy import decode_picture_islices
    from dryv_tpu.pipeline import SYNTAX_KEYS

    F = int(os.environ.get("DRYV_BENCH_GOP", "16"))
    dblk_path = os.path.join(HERE, "benchdata", "bench1080p_dblk.264")
    dg = np.load(os.path.join(HERE, "benchdata",
                              "bench1080p_dblk_golden.npz"))
    dsd, dsps, dpps = parse_slices(open(dblk_path, "rb").read())
    dout = decode_picture_islices(dsd, dsps, dpps, n_threads=2)
    dfs = pack_from_native(dout, dsps, dpps)
    pre1 = deblock_precompute_intra(
        dfs.kind, dfs.qp_y, dout["slice_id"], [(0, 0, 0)] * len(dsd),
        dfs.mb_w, dfs.mb_h, dpps.chroma_qp_index_offset,
        dpps.second_chroma_qp_offset)
    stacked = {k: jnp.asarray(np.stack([np.asarray(getattr(dfs, k))] * F))
               for k in SYNTAX_KEYS}
    pre = {k: jnp.asarray(np.stack([v] * F)) for k, v in pre1.items()}
    ls = [jnp.asarray(LS4_FLAT)] * 3 + [jnp.asarray(LS8_FLAT)]

    fn = make_gop_pipeline_deblock_pallas(dfs.mb_w, dfs.mb_h, F)
    t0 = time.perf_counter()
    y, cb, cr = fn(stacked, *ls, pre)
    jax.block_until_ready(y)
    print(f"compile+run: {time.perf_counter()-t0:.1f}s")
    assert np.array_equal(np.asarray(y[0])[:1080], dg["y"]), "y mismatch"
    assert np.array_equal(np.asarray(cb[0])[:540], dg["cb"]), "cb mismatch"
    assert np.array_equal(np.asarray(cr[0])[:540], dg["cr"]), "cr mismatch"
    print("bit-exact on TPU")

    def run_db(K=4):
        for _ in range(K - 1):
            fn(stacked, *ls, pre)
        r = fn(stacked, *ls, pre)
        np.asarray(r[0][0, 0, :2])

    t = best_of(run_db, 3) / 4
    print(f"deblocked: {F / t:.1f} fps ({t / F * 1e3:.2f} ms/frame)")

    plain = make_gop_pipeline_pallas(dfs.mb_w, dfs.mb_h, F)
    r = plain(stacked, *ls)
    jax.block_until_ready(r[0])

    def run_plain(K=4):
        for _ in range(K - 1):
            plain(stacked, *ls)
        r = plain(stacked, *ls)
        np.asarray(r[0][0, 0, :2])

    t = best_of(run_plain, 3) / 4
    print(f"plain:     {F / t:.1f} fps ({t / F * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
