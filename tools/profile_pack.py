"""Profile pack_frame_pipeline on the cached 1080p bench stream (CPU).

Usage: JAX_PLATFORMS=cpu python tools/profile_pack.py
Prints cumulative-time hotspots for the host-side pack path.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STREAM = os.path.join(os.path.dirname(__file__), "..", ".bench",
                      "e2e_1920x1080_qp30_ctb64_wpp.265")


def main():
    from hevc_tpu import trace
    from hevc_tpu.decoder.core import Decoder

    data = open(STREAM, "rb").read()
    # warmup (jit compile etc.)
    Decoder(check_md5=True, recon_backend="jax").decode_bytes(data)

    trace.reset()
    pr = cProfile.Profile()
    t0 = time.time()
    pr.enable()
    frames = Decoder(check_md5=True, recon_backend="jax").decode_bytes(data)
    pr.disable()
    dt = time.time() - t0
    n = len(frames)
    print(f"frames={n} total={dt:.2f}s  per-frame={dt / n * 1e3:.1f}ms")
    r = trace.report()
    for k, v in sorted(r.items()):
        print(f"  {k}: {v['total_s'] / n * 1e3:.1f} ms/frame")
    s = io.StringIO()
    ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
    ps.print_stats(40)
    print(s.getvalue())


if __name__ == "__main__":
    main()
