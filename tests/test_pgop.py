"""Frame-axis parallel decode of independent B frames.

A parallel-B GOP's n B pictures (encoder/pgop.py) decode concurrently
over a ("frame",) mesh, device k reconstructing frame k+1 end to end
with the anchor reference windows replicated — bit-exact vs the
sequential decode (the TPU-native form of the reference's frame
threads, pthread_frame.c:395/484)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.decoder.core import Decoder  # noqa: E402
from hevc_tpu.encoder.core import EncoderConfig  # noqa: E402
from hevc_tpu.encoder.generate import synth_frame  # noqa: E402
from hevc_tpu.encoder.pgop import ParallelBGopEncoder  # noqa: E402
from hevc_tpu.tpu.pgop_frame import decode_bframes_frame_axis  # noqa: E402


def _devs(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices, have {len(devs)}")
    return devs[:n]


@pytest.mark.parametrize("n", [4, 8])
def test_frame_axis_bit_exact(n):
    got, want = decode_bframes_frame_axis(n, _devs(n), width=96,
                                          height=64)
    assert len(got) == n
    for k, (g3, w3) in enumerate(zip(got, want)):
        for p, (g, w) in enumerate(zip(g3, w3)):
            assert (g == w).all(), f"B{k + 1} plane {p} mismatch"
    # distinct content across the frame axis
    assert any((got[0][0] != g[0]).any() for g in got[1:])


def test_pgop_stream_all_backends():
    """The parallel-B stream itself is a conforming stream: decodes
    bit-exact on every backend (and drops cleanly with -t 0)."""
    n_b = 4
    cfg = EncoderConfig(width=96, height=64, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, gop="ra", deblocking=True,
                        sao=True, seed=2, search_range=2)
    enc = ParallelBGopEncoder(cfg, n_b)
    stream = enc.encode([synth_frame("noise", 96, 64, t, seed=4)
                         for t in range(n_b + 2)])
    recons = dict(enc.recons)
    for backend in ("inline", "plan", "jax"):
        frames = Decoder(recon_backend=backend).decode_bytes(stream)
        assert len(frames) == n_b + 2
        for f in frames:
            assert f.md5_ok, f"poc {f.poc} md5 [{backend}]"
            for a, b in zip(f.planes, recons[f.poc]):
                assert (np.asarray(a) == b).all()
    # temporal scalability: tid1 Bs drop, anchors remain
    anchors = Decoder(temporal_layer=0).decode_bytes(stream)
    assert sorted(f.poc for f in anchors) == [0, n_b + 1]
