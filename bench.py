#!/usr/bin/env python3
"""Benchmark: 1080p AVC intra decode, frames/sec/chip.

Pipeline measured: C++ multi-threaded slice-parallel CABAC entropy stage
(host) + dense pack + JAX (stage A IQ/IDCT + frontier-wavefront intra
reconstruction) on one TPU chip.  Output is verified bit-exact against the
libavcodec golden before timing.

vs_baseline: the reference decoder (Stuff7/dryv) publishes no numbers and
cannot be built here (no Rust toolchain in the image; BASELINE.md), so the
stand-in baseline is this repo's own single-threaded C++ full decode
(native entropy + native scalar reconstruction) — the same work dryv's
single-threaded Rust decoder performs, measured on this host.

Prints ONE JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
STREAM = os.path.join(HERE, "benchdata", "bench1080p.264")
GOLDEN = os.path.join(HERE, "benchdata", "bench1080p_golden.npz")


def parse_slices(stream):
    from dryv_tpu.avc import split_annexb
    from dryv_tpu.avc.slice_header import SliceHeader
    from dryv_tpu.decoder import SyntaxDecoder, group_access_units

    sd = SyntaxDecoder()
    rest = sd.feed_parameter_sets(list(split_annexb(stream)))
    pic = group_access_units(rest)[0]
    out = []
    sps = pps = None
    for nal in pic:
        rbsp = nal.rbsp
        h0 = SliceHeader.parse(rbsp, nal, next(iter(sd.sps_map.values())),
                               next(iter(sd.pps_map.values())))
        pps = sd.pps_map[h0.pic_parameter_set_id]
        sps = sd.sps_map[pps.seq_parameter_set_id]
        h = SliceHeader.parse(rbsp, nal, sps, pps)
        out.append((rbsp, (h.header_bit_len + 7) & ~7, h.first_mb_in_slice,
                    h.slice_qp_y(pps)))
    return out, sps, pps


def best_of(f, n=5):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from dryv_tpu.native.entropy import (decode_picture_islices,
                                         reconstruct_islices)
    from dryv_tpu.coeffs import pack_from_native
    from dryv_tpu.pipeline import reconstruct_frame_jax

    stream = open(STREAM, "rb").read()
    g = np.load(GOLDEN)
    slice_datas, sps, pps = parse_slices(stream)
    nthreads = os.cpu_count() or 1

    # ---- baseline: single-thread C++ full decode (dryv proxy) ----------
    def cpu_full():
        out = decode_picture_islices(slice_datas, sps, pps, n_threads=1)
        return reconstruct_islices(out, sps, pps)

    y, cb, cr = cpu_full()
    assert np.array_equal(y[:1080], g["y"]), "cpu path not bit-exact"
    t_baseline = best_of(cpu_full, 5)

    # ---- TPU pipeline ---------------------------------------------------
    out = decode_picture_islices(slice_datas, sps, pps, n_threads=nthreads)
    fs = pack_from_native(out, sps, pps)
    yj, cbj, crj = reconstruct_frame_jax(fs)  # compile
    assert np.array_equal(np.asarray(yj)[:1080], g["y"]), \
        "device path not bit-exact"

    t_entropy = best_of(
        lambda: decode_picture_islices(slice_datas, sps, pps,
                                       n_threads=nthreads), 5)
    t_pack = best_of(lambda: pack_from_native(out, sps, pps), 5)

    import jax

    def device_recon():
        y, cb, cr = reconstruct_frame_jax(fs)
        jax.block_until_ready(y)

    t_recon = best_of(device_recon, 5)

    def e2e():
        o = decode_picture_islices(slice_datas, sps, pps, n_threads=nthreads)
        f = pack_from_native(o, sps, pps)
        y, cb, cr = reconstruct_frame_jax(f)
        jax.block_until_ready(y)

    t_e2e = best_of(e2e, 5)

    fps = 1.0 / t_e2e
    baseline_fps = 1.0 / t_baseline
    result = {
        "metric": "1080p_avc_intra_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "detail": {
            "baseline_cpu_singlethread_fps": round(baseline_fps, 2),
            "entropy_ms": round(t_entropy * 1e3, 1),
            "pack_ms": round(t_pack * 1e3, 1),
            "device_recon_ms": round(t_recon * 1e3, 1),
            "e2e_ms": round(t_e2e * 1e3, 1),
            "host_threads": nthreads,
            "device": str(jax.devices()[0]),
            "bit_exact": True,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
