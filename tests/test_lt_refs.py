"""Long-term reference pictures + ref_pic_lists_modification + DPB.

Streams keep frame 0 as a long-term reference for every P frame
(exercising the LT RPS slice syntax, the no-scaling long-term MV rules,
and RPS-driven DPB retention); the "mod" variant additionally signals
ref_pic_lists_modification with swapped L0 entries.  Oracle-bit-exact
when the openHEVC binary is present; encoder/decoder md5 otherwise.
"""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
from hevc_tpu.encoder.generate import synth_frame

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"


def _make(cfg, n=8, kind="noise"):
    enc = IntraEncoder(cfg)
    out = bytearray()
    for t in range(n):
        out += enc.encode_frame(synth_frame(kind, cfg.width, cfg.height,
                                            t, seed=3))
    return bytes(out)


@pytest.mark.parametrize("lt", [True, "mod"])
def test_long_term_refs_bitexact(tmp_path, lt):
    cfg = EncoderConfig(width=64, height=64, qp=30, gop="ipp",
                        search_range=2, long_term_ref=lt)
    stream = _make(cfg)
    ref = Decoder(check_md5=True, recon_backend="inline").decode_bytes(
        stream)
    assert all(f.md5_ok for f in ref)
    for be in ("plan", "jax"):
        got = Decoder(check_md5=True, recon_backend=be).decode_bytes(
            stream)
        assert all(f.md5_ok for f in got), f"{be} diverged"
    if not os.path.exists(ORACLE):
        pytest.skip("oracle binary not built")
    sfile = str(tmp_path / "lt.265")
    with open(sfile, "wb") as f:
        f.write(stream)
    subprocess.run([ORACLE, "-i", sfile, "-o", str(tmp_path / "o")],
                   capture_output=True, timeout=120)
    yuv = open(str(tmp_path / "o") + "_64x64.yuv", "rb").read()
    ours = b"".join(np.asarray(f.planes[p]).astype(np.uint8).tobytes()
                    for f in ref for p in range(3))
    assert yuv == ours


def test_lt_survives_dpb_churn():
    """Frame 0 must stay decodable as an LT ref long after the
    short-term window would have evicted it (RPS retention, 8.3.2)."""
    cfg = EncoderConfig(width=64, height=48, qp=30, gop="ipp",
                        search_range=2, long_term_ref=True)
    stream = _make(cfg, n=12)
    got = Decoder(check_md5=True, recon_backend="inline").decode_bytes(
        stream)
    assert len(got) == 12
    assert all(f.md5_ok for f in got)
