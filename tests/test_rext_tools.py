"""Range-extension coding tools: round-trip + oracle bit-exactness.

Covers persistent Rice adaptation, transform-skip sig contexts, 4x4
skip rotation, implicit RDPCM and cu_chroma_qp_offset
(reference: hevc_ps.c:1829-1860 SPS rext, :2476-2510 PPS rext,
hevc_cabac.c:2058 update_rice_statistics, :1981/2010 skip sig ctx,
:1723-1750 transform_rdpcm drive, hevcdec.c:1367 cu_chroma_qp_offset).
Every stream decodes bit-exact on all three backends and, when the
oracle binary is built, byte-identical to its YUV output.
"""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
from hevc_tpu.encoder.generate import synth_frame

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")

W, H = 96, 64

CASES = {
    "persistent_rice": dict(transform_skip=True,
                            rext_persistent_rice=True),
    "ts_context": dict(transform_skip=True, rext_ts_context=True),
    "ts_rotation": dict(transform_skip=True, rext_ts_rotation=True),
    "implicit_rdpcm": dict(transform_skip=True,
                           rext_implicit_rdpcm=True),
    "chroma_qp_offsets": dict(
        rext_chroma_qp_offsets=((3, -3), (-2, 4))),
    "all_tools": dict(transform_skip=True, rext_persistent_rice=True,
                      rext_ts_context=True, rext_ts_rotation=True,
                      rext_implicit_rdpcm=True,
                      rext_chroma_qp_offsets=((2, -2),)),
    "inter_rice": dict(transform_skip=True, rext_persistent_rice=True,
                       rext_ts_context=True, gop="ipp", search_range=2),
    "ccp": dict(chroma_format_idc=3, rext_ccp=True),
    "ccp_tools": dict(chroma_format_idc=3, rext_ccp=True,
                      transform_skip=True, rext_persistent_rice=True,
                      rext_ts_context=True),
    "explicit_rdpcm": dict(gop="ipp", search_range=2,
                           rext_explicit_rdpcm=True),
    "explicit_rdpcm_tools": dict(gop="ipp", search_range=2,
                                 rext_explicit_rdpcm=True,
                                 rext_persistent_rice=True,
                                 rext_ts_context=True),
}


def _stream(name):
    cfg = EncoderConfig(width=W, height=H, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, seed=3, **CASES[name])
    enc = IntraEncoder(cfg)
    out = bytearray()
    for t in range(3):
        out += enc.encode_frame(synth_frame("noise", W, H, t, seed=6))
    return bytes(out)


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("backend", ["inline", "plan", "jax"])
def test_roundtrip(name, backend):
    stream = _stream(name)
    frames = Decoder(check_md5=True,
                     recon_backend=backend).decode_bytes(stream)
    assert len(frames) == 3
    assert all(f.md5_ok for f in frames)


@needs_oracle
@pytest.mark.parametrize("name", CASES)
def test_vs_oracle(name, tmp_path):
    stream = _stream(name)
    sfile = str(tmp_path / "t.265")
    open(sfile, "wb").write(stream)
    subprocess.run([ORACLE, "-i", sfile, "-o", str(tmp_path / "o")],
                   capture_output=True, timeout=120, check=False)
    oracle = open(f"{tmp_path}/o_{W}x{H}.yuv", "rb").read()
    frames = Decoder(check_md5=True,
                     recon_backend="inline").decode_bytes(stream)
    ours = b"".join(p.astype(np.uint8).tobytes()
                    for f in frames for p in f.planes)
    assert oracle == ours


def test_stats_reset_across_tiles():
    """Persistent-Rice stats reset at tile CABAC reinits like context
    states (reference: hevc_cabac.c:609 cabac_init_state)."""
    cfg = EncoderConfig(width=128, height=64, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, seed=3, transform_skip=True,
                        rext_persistent_rice=True, tiles=(2, 1))
    enc = IntraEncoder(cfg)
    stream = bytes(enc.encode_frame(synth_frame("noise", 128, 64, 0,
                                                seed=6)))
    frames = Decoder(check_md5=True,
                     recon_backend="plan").decode_bytes(stream)
    assert frames and all(f.md5_ok for f in frames)
