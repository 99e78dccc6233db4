"""Measure the on-device CABAC engine's throughput on the real chip.

Reports bins/s for 1 row and R rows (the wavefront scaling axis), and
the native C++ stage A's effective throughput on the 1080p bench
stream for comparison.  Feeds docs/ONDEVICE_CABAC.md.

python tools/probe_cabac_pallas.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from tests.test_cabac_pallas import _make_row
    from hevc_tpu.tpu.cabac_pallas import decode_rows_pallas

    rng = np.random.default_rng(5)
    n_bins = 4096
    for R in (1, 8):
        rows = [_make_row(rng, n_bins) for _ in range(R)]
        n_ctx = len(rows[0][2])
        n_bytes = max(len(r[0]) for r in rows)
        data = np.zeros((R, n_bytes), np.int32)
        sched = np.zeros((R, n_bins), np.int32)
        init = np.zeros((R, n_ctx), np.int32)
        for k, (buf, sc, st, _b) in enumerate(rows):
            data[k, :len(buf)] = np.frombuffer(buf, np.uint8)
            sched[k] = sc
            init[k] = st
        out = decode_rows_pallas(data, sched, init, n_bins=n_bins,
                                 n_ctx=n_ctx, n_bytes=n_bytes)
        out.block_until_ready()
        # correctness on-device too
        for k, (_b, _s, _st, bins) in enumerate(rows):
            assert np.asarray(out)[k].tolist() == bins, f"row {k}"
        iters = 8
        t0 = time.time()
        for _ in range(iters):
            out = decode_rows_pallas(data, sched, init, n_bins=n_bins,
                                     n_ctx=n_ctx, n_bytes=n_bytes)
        out.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"R={R}: {R * n_bins / dt / 1e6:.3f} Mbins/s total "
              f"({n_bins / dt / 1e6:.3f} Mbins/s per row, "
              f"{dt * 1e3:.2f} ms per launch)")


if __name__ == "__main__":
    main()
