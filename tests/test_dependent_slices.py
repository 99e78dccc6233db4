"""Dependent slice segments: header inheritance + state continuation.

A dependent segment carries only its CTB address; every other header
field is inherited from the picture's independent segment, and the
CABAC contexts / QP prediction state / rice stats continue across the
segment boundary (reference: hevcdec.c:612 hls_slice_header dependent
path, hevc_cabac.c load_states).  Streams must decode bit-exact on all
backends and byte-identical to the oracle decoder's YUV.
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
W, H = 96, 96

CASES = {
    "one_dep": dict(dependent_slices=1),
    "two_dep": dict(dependent_slices=2),
    "two_dep_ipp": dict(dependent_slices=2, gop="ipp", search_range=2),
    "dep_cu_qp": dict(dependent_slices=1, cu_qp_delta_depth=0),
}


def _stream(name):
    cfg = EncoderConfig(width=W, height=H, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, seed=3, deblocking=True,
                        sao=True, **CASES[name])
    enc = IntraEncoder(cfg)
    out = bytearray()
    for t in range(3):
        out += enc.encode_frame(synth_frame("noise", W, H, t, seed=6))
    return bytes(out)


@pytest.mark.parametrize("name", CASES)
@pytest.mark.parametrize("backend", ["inline", "plan", "jax"])
def test_roundtrip(name, backend):
    frames = Decoder(check_md5=True,
                     recon_backend=backend).decode_bytes(_stream(name))
    assert len(frames) == 3 and all(f.md5_ok for f in frames)


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
