"""Error-resilience tests: CRA random access with RASL discarding and
missing-reference concealment (reference: hevcdec.c:3776-3799 max_ra,
hevc_refs.c:622 generate_missing_ref, log-and-continue error policy)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.bitstream import nal as nalmod

ORACLE = os.path.join(os.path.dirname(__file__), os.pardir,
                      ".oracle", "build", "hevc_nodisplay")


def _cra_stream(frames=9, w=64, h=64):
    """RA GOP with CRA anchors + RASL leading pictures; returns
    (headers, list-of-AUs, encoder display-order recon planes)."""
    from hevc_tpu.encoder.core import EncoderConfig, RaEncoder
    from hevc_tpu.encoder.generate import synth_frame

    cfg = EncoderConfig(width=w, height=h, qp=30, gop="ra",
                        cra_anchors=True)
    enc = RaEncoder(cfg)
    stream = enc.encode([synth_frame("gradient", w, h, t)
                         for t in range(frames)])
    # split back into per-AU chunks: an AU ends after its slices and
    # their SUFFIX SEI (the picture hash rides a suffix NAL)
    aus, cur = [], []

    def ends_au(t):
        return nalmod.is_slice_nal(t) or t == nalmod.NAL_SEI_SUFFIX

    for n in nalmod.split_annexb(stream):
        if cur and ends_au(cur[-1].type) \
                and n.type != nalmod.NAL_SEI_SUFFIX:
            aus.append(nalmod.write_annexb(
                [(x.type, x.layer_id, x.temporal_id, x.rbsp)
                 for x in cur]))
            cur = []
        cur.append(n)
    if cur:
        aus.append(nalmod.write_annexb(
            [(x.type, x.layer_id, x.temporal_id, x.rbsp) for x in cur]))
    return enc, aus


def test_full_stream_with_cra_rasl_decodes():
    from hevc_tpu.decoder.core import Decoder

    enc, aus = _cra_stream()
    types = [next(n.type for n in nalmod.split_annexb(au)
                  if nalmod.is_slice_nal(n.type)) for au in aus]
    assert nalmod.NAL_CRA_NUT in types and nalmod.NAL_RASL_R in types
    frames = Decoder().decode_bytes(b"".join(aus))
    assert len(frames) == 9
    assert all(f.md5_ok for f in frames)
    assert [f.poc for f in frames] == sorted(f.poc for f in frames)


def test_random_access_at_cra_skips_rasl():
    from hevc_tpu.decoder.core import Decoder
    from hevc_tpu.encoder.core import EncoderConfig, RaEncoder

    enc, aus = _cra_stream()
    types = [next(n.type for n in nalmod.split_annexb(au)
                  if nalmod.is_slice_nal(n.type)) for au in aus]
    k = types.index(nalmod.NAL_CRA_NUT)
    cut = enc.enc.headers_annexb() + b"".join(aus[k:])
    frames = Decoder().decode_bytes(cut)
    # the 3 RASL leading pictures of that CRA are discarded
    assert len(frames) == len(aus) - k - 3
    assert all(f.md5_ok for f in frames)
    # and all remaining frames have poc >= the CRA poc
    assert min(f.poc for f in frames) == 4


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="oracle binary not built")
def test_oracle_bitexact_cra_full_and_cut(tmp_path):
    from hevc_tpu.decoder.core import Decoder

    enc, aus = _cra_stream()
    types = [next(n.type for n in nalmod.split_annexb(au)
                  if nalmod.is_slice_nal(n.type)) for au in aus]
    k = types.index(nalmod.NAL_CRA_NUT)
    streams = {"full": b"".join(aus),
               "cut": enc.enc.headers_annexb() + b"".join(aus[k:])}
    for name, data in streams.items():
        p = tmp_path / f"{name}.265"
        p.write_bytes(data)
        subprocess.run([ORACLE, "-i", str(p), "-o", str(tmp_path / name)],
                       capture_output=True, text=True, timeout=120,
                       cwd=str(tmp_path))
        yuv = next(q for q in tmp_path.iterdir()
                   if q.name.startswith(name) and q.name.endswith(".yuv"))
        ours = b""
        for f in Decoder().decode_bytes(data):
            for pl in f.planes:
                ours += pl.astype(np.uint8).tobytes()
        assert yuv.read_bytes() == ours, f"{name} stream mismatch"


def test_missing_reference_concealment():
    from hevc_tpu.decoder.core import Decoder
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=30, gop="ipp"))
    aus = [enc.encode_frame(synth_frame("gradient", 64, 64, t))
           for t in range(4)]
    # drop P frame 1: frame 2 references a missing poc -> concealed gray
    data = aus[0] + aus[2] + aus[3]
    frames = Decoder().decode_bytes(data)
    assert len(frames) == 3  # decode continued
    assert frames[0].md5_ok  # IDR fine
    assert frames[1].md5_ok is False  # predicted from concealed ref
