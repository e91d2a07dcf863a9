"""Band-sharded wavefront reconstruction with ICI halo exchange.

One frame's MB rows split into contiguous bands across the mesh "band"
axis.  The global anti-diagonal schedule still runs; each step every
device reconstructs its band's MBs of that diagonal, then ppermutes its
frontier bottom rows (per-MB-column newest bottom pixel rows — a few KB)
to the next band, where lanes on the band's first MB row read them as
their above/corner apron (SURVEY §5: ring-attention-style neighbor
exchange -> halo exchange of MB-boundary pixel rows over ICI).

Freshness: an MB on diagonal d needs above-band pixels from neighbor-band
MBs on diagonals <= d-1 (above-right); the exchange at the end of every
step delivers them before step d starts."""
from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels.wavefront import (
    diag_schedule, frontier_step, init_frontier, pack_diagonal,
    tiles_to_planes)


@lru_cache(maxsize=None)
def band_schedule(mb_w: int, mb_h: int, n_bands: int):
    """Per-band diagonal schedule with band-LOCAL MB addresses, plus the
    inverse maps for local tile->plane assembly.

    Returns (rows, sched [n_bands, n_diag, K], d_of [n_bands, n_local],
    k_of [n_bands, n_local])."""
    rows = -(-mb_h // n_bands)
    n_diag = mb_w + 2 * (mb_h - 1)
    diags = [[[] for _ in range(n_diag)] for _ in range(n_bands)]
    for my in range(mb_h):
        b = my // rows
        for mx in range(mb_w):
            diags[b][mx + 2 * my].append((my - b * rows) * mb_w + mx)
    K = max((len(v) for band in diags for v in band), default=1)
    n_local = rows * mb_w
    sched = np.full((n_bands, n_diag, K), -1, dtype=np.int32)
    d_of = np.zeros((n_bands, n_local), dtype=np.int32)
    k_of = np.zeros((n_bands, n_local), dtype=np.int32)
    for b in range(n_bands):
        for d in range(n_diag):
            sched[b, d, :len(diags[b][d])] = diags[b][d]
            for k, a in enumerate(diags[b][d]):
                d_of[b, a] = d
                k_of[b, a] = k
    return rows, sched, d_of, k_of


def make_banded_frame_fn(mesh, mb_w: int, mb_h: int, axis: str = "band",
                         bitdepth: int = 8):
    """jitted full-frame band-sharded reconstruction.

    Call the returned `run(fs)` with an (unpadded) FrameSyntax; it pads MB
    rows to a multiple of the band count, shards syntax + residual stage
    over the mesh axis, runs the halo-exchanging wavefront, and returns
    cropped numpy planes."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ..pipeline import SYNTAX_KEYS
    from ..kernels.transform import (
        LS4_FLAT, LS8_FLAT, chroma_residual_tiles, luma_residual_tiles)

    n_bands = mesh.shape[axis]
    rows, sched_np, d_of_np, k_of_np = band_schedule(mb_w, mb_h, n_bands)
    n_local = rows * mb_w
    perm = [(i, i + 1) for i in range(n_bands - 1)]

    def local(s, sched, d_of, k_of):
        sched = sched[0]
        d_of = d_of[0]
        k_of = k_of[0]
        s = dict(s)
        s["y_resid"] = luma_residual_tiles(
            s["kind"], s["qp_y"], s["luma4"], s["luma8"], s["luma_dc"],
            n_local, jnp.asarray(LS4_FLAT), jnp.asarray(LS8_FLAT))
        s["c_resid"] = chroma_residual_tiles(
            s["qp_cb"], s["qp_cr"], s["chroma_dc"], s["chroma_ac"], n_local,
            jnp.asarray(LS4_FLAT), jnp.asarray(LS4_FLAT))

        halo0 = {
            "bot_cur": jnp.zeros((mb_w, 16), jnp.int32),
            "cbot_cur": jnp.zeros((mb_w, 2, 8), jnp.int32),
        }

        def mark_varying(tree):
            # the scan carry becomes device-varying after the ppermute;
            # mark the initial value to match
            return jax.tree.map(
                lambda x: jax.lax.pcast(x, axis, to="varying"), tree)

        def step(carry, x):
            state, halo = carry
            state, out16, outc = frontier_step(
                x, mb_w, state, halo, bitdepth)
            # exchange frontier bottom rows to the next band over ICI
            halo = {
                "bot_cur": jax.lax.ppermute(state["bot_cur"], axis, perm),
                "cbot_cur": jax.lax.ppermute(state["cbot_cur"], axis, perm),
            }
            return (state, halo), (out16, outc)

        from ..kernels.wavefront import merge_pcm_and_slim, LANE_KEYS
        s = merge_pcm_and_slim(s)
        xs = pack_diagonal(s, sched, mb_w, LANE_KEYS)
        (_, _), (tiles_y, tiles_c) = jax.lax.scan(
            step, mark_varying((init_frontier(mb_w, rows), halo0)), xs)
        return tiles_to_planes(tiles_y, tiles_c, d_of, k_of, mb_w, rows)

    spec = P(axis)
    fn = shard_map(local, mesh=mesh,
                   in_specs=({k: spec for k in SYNTAX_KEYS}, spec, spec,
                             spec),
                   out_specs=(spec, spec, spec))
    jfn = jax.jit(fn)

    def run(fs):
        n_pad = n_bands * n_local
        s = {}
        for k in SYNTAX_KEYS:
            arr = np.asarray(getattr(fs, k))
            if arr.shape[0] != n_pad:
                pad = np.zeros((n_pad - arr.shape[0],) + arr.shape[1:],
                               arr.dtype)
                arr = np.concatenate([arr, pad])
            s[k] = arr
        y, cb, cr = jfn(s, sched_np, d_of_np, k_of_np)
        H = mb_h * 16
        return (np.asarray(y)[:H], np.asarray(cb)[:H // 2],
                np.asarray(cr)[:H // 2])

    return run


def make_banded_wavefront_fn(*a, **kw):  # back-compat alias
    return make_banded_frame_fn(*a, **kw)
