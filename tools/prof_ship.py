#!/usr/bin/env python3
"""Measure H2D transfer cost (wall + CPU) for the packed batch ABI on the
real device, plus its interference with the entropy stage."""
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cpu_s():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def main():
    import jax
    import jax.numpy as jnp
    F, npad, W = 16, 8160, 32
    bufs = {
        "bmp": np.random.randint(0, 255, (F, npad, 51), dtype=np.uint8),
        "vals": np.random.randint(-127, 127, (F, npad, W)).astype(np.int8),
        "exc_idx": np.zeros((F, 256), np.int32),
        "exc_delta": np.zeros((F, 256), np.int16),
        "ovf_idx": np.full((F, 64), npad, np.int32),
        "ovf_rows": np.zeros((F, 64, 408), np.int16),
        "u8": np.random.randint(0, 255, (F, npad, 19), dtype=np.uint8),
    }
    total_mb = sum(v.nbytes for v in bufs.values()) / 1e6
    print(f"batch bytes: {total_mb:.1f} MB ({total_mb/F*1000:.0f} KB/frame)")

    def ship():
        arrs = [jnp.asarray(v) for v in bufs.values()]
        jax.block_until_ready(arrs)
        return arrs

    ship()  # warm
    for _ in range(3):
        c0, t0 = cpu_s(), time.perf_counter()
        ship()
        dt, dc = time.perf_counter() - t0, cpu_s() - c0
        print(f"ship: wall={dt*1e3:.1f} ms  cpu={dc*1e3:.1f} ms  "
              f"({total_mb/dt:.0f} MB/s)")

    # async device_put (no block) — measures enqueue cost only
    for _ in range(3):
        c0, t0 = cpu_s(), time.perf_counter()
        arrs = [jnp.asarray(v) for v in bufs.values()]
        dt, dc = time.perf_counter() - t0, cpu_s() - c0
        print(f"enqueue: wall={dt*1e3:.1f} ms cpu={dc*1e3:.1f} ms")
        jax.block_until_ready(arrs)

    # entropy alone vs entropy + concurrent ship loop
    from dryv_tpu.native.entropy import decode_picture_islices
    sys.path.insert(0, HERE)
    from bench import parse_slices
    stream = open(os.path.join(HERE, "benchdata", "bench1080p.264"),
                  "rb").read()
    sd, sps, pps = parse_slices(stream)
    for nt in (1, 2):
        decode_picture_islices(sd, sps, pps, n_threads=nt, reuse=True)
        t0 = time.perf_counter()
        for _ in range(5):
            decode_picture_islices(sd, sps, pps, n_threads=nt, reuse=True)
        print(f"entropy solo {nt}t: {(time.perf_counter()-t0)/5*1e3:.1f} "
              f"ms/frame")

    stop = [False]

    def ship_loop():
        while not stop[0]:
            ship()

    th = threading.Thread(target=ship_loop)
    th.start()
    time.sleep(0.3)
    for nt in (1, 2):
        t0 = time.perf_counter()
        for _ in range(5):
            decode_picture_islices(sd, sps, pps, n_threads=nt, reuse=True)
        print(f"entropy+shiploop {nt}t: {(time.perf_counter()-t0)/5*1e3:.1f}"
              f" ms/frame")
    stop[0] = True
    th.join()


if __name__ == "__main__":
    main()
