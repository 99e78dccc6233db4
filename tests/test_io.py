"""Container layer tests: MP4 (hvcC) + MPEG-TS mux/demux round trips,
probe, and oracle cross-checks (the reference builds mov.c + mpegts.c
demuxers — our muxed files must decode bit-exactly there too)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.bitstream import nal as nalmod
from hevc_tpu.io import (Mp4Reader, Mp4Writer, TsReader, TsWriter,
                         build_hvcc, open_input, parse_hvcc, probe_format)
from hevc_tpu.io.mp4 import annexb_to_lengths, lengths_to_annexb

ORACLE = os.path.join(os.path.dirname(__file__), os.pardir,
                      ".oracle", "build", "hevc_nodisplay")


def _encode(w=64, h=64, frames=3, **kw):
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30, **kw))
    aus = [enc.encode_frame(synth_frame("gradient", w, h, t))
           for t in range(frames)]
    return aus


def _decode_annexb(data):
    from hevc_tpu.decoder.core import Decoder
    frames = Decoder().decode_bytes(data)
    assert all(f.md5_ok for f in frames)
    return frames


def test_probe():
    aus = _encode(frames=1)
    assert probe_format(b"".join(aus)) == "annexb"
    mw = Mp4Writer(64, 64)
    mw.add_au(aus[0])
    assert probe_format(mw.getvalue()) == "mp4"
    tw = TsWriter()
    tw.add_au(aus[0])
    assert probe_format(tw.getvalue()) == "mpegts"


def test_hvcc_roundtrip():
    aus = _encode(frames=1)
    ps = nalmod.write_annexb(
        [(n.type, n.layer_id, n.temporal_id, n.rbsp)
         for n in nalmod.split_annexb(aus[0])
         if n.type in (nalmod.NAL_VPS, nalmod.NAL_SPS, nalmod.NAL_PPS)])
    rec = parse_hvcc(build_hvcc(ps))
    assert rec.length_size == 4 and rec.chroma_format_idc == 1
    assert rec.bit_depth_luma == 8
    got = sorted(rec.arrays)
    assert got == [nalmod.NAL_VPS, nalmod.NAL_SPS, nalmod.NAL_PPS]
    # NALs survive byte-exactly
    back = b"".join(b"\x00\x00\x00\x01" + raw
                    for t in got for raw in rec.arrays[t])
    assert [n.rbsp for n in nalmod.split_annexb(back)] == \
        [n.rbsp for n in nalmod.split_annexb(ps)]


def test_length_prefix_roundtrip():
    aus = _encode(frames=2)
    for au in aus:
        sample = annexb_to_lengths(au)
        back = lengths_to_annexb(sample)
        assert [n.rbsp for n in nalmod.split_annexb(back)] == \
            [n.rbsp for n in nalmod.split_annexb(au)]


def test_mp4_mux_demux_decode():
    aus = _encode(frames=3, deblocking=True, sao=True)
    mw = Mp4Writer(64, 64)
    for au in aus:
        mw.add_au(au)
    mp4 = mw.getvalue()
    rd = Mp4Reader(mp4)
    assert len(rd.samples) == 3
    raw_frames = _decode_annexb(b"".join(aus))
    mp4_frames = _decode_annexb(open_input(mp4))
    for a, b in zip(raw_frames, mp4_frames):
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()


def test_ts_mux_demux_decode():
    aus = _encode(frames=3)
    tw = TsWriter()
    for au in aus:
        tw.add_au(au)
    ts = tw.getvalue()
    assert len(ts) % 188 == 0
    raw_frames = _decode_annexb(b"".join(aus))
    ts_frames = _decode_annexb(open_input(ts))
    for a, b in zip(raw_frames, ts_frames):
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="oracle binary not built")
@pytest.mark.parametrize("container", ["mp4", "ts"])
def test_oracle_decodes_our_containers(tmp_path, container):
    aus = _encode(w=96, h=80, frames=3, deblocking=True)
    if container == "mp4":
        mw = Mp4Writer(96, 80)
        for au in aus:
            mw.add_au(au)
        path = tmp_path / "t.mp4"
        mw.write(str(path))
    else:
        tw = TsWriter()
        for au in aus:
            tw.add_au(au)
        path = tmp_path / "t.ts"
        tw.write(str(path))
    r = subprocess.run([ORACLE, "-i", str(path), "-o",
                        str(tmp_path / "o.yuv")],
                       capture_output=True, text=True, timeout=120,
                       cwd=str(tmp_path))
    out = r.stdout + r.stderr
    assert "Incorrect MD5" not in out
    assert "frame= 3" in out, out[-800:]
    # oracle YUV == our YUV from the same container file
    yuvs = [p for p in tmp_path.iterdir() if p.suffix == ".yuv"
            and p.name.startswith("o")]
    assert yuvs, list(tmp_path.iterdir())
    ours = b""
    for f in _decode_annexb(open_input(str(path))):
        for p in f.planes:
            ours += p.astype(np.uint8).tobytes()
    assert yuvs[0].read_bytes() == ours
