"""Round-2 regression tests for advisor/verdict findings: HRD
parse-and-skip, TS resync realignment, pts-with-picture propagation,
PCM coding units (all backends + oracle), PPS 4:4:4 scaling-list remap."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.bitstream.bits import BitReader, BitWriter
from hevc_tpu.bitstream.ps import SPS, skip_hrd_parameters
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
from hevc_tpu.encoder.generate import synth_frame

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")


def _write_hrd(w, common_inf=True, max_sub_layers=1, nal=True, vcl=False,
               sub_pic=False, cpb_cnt=2):
    """Emit a syntactically valid hrd_parameters() (E.2.2)."""
    if common_inf:
        w.flag(int(nal))
        w.flag(int(vcl))
        if nal or vcl:
            w.flag(int(sub_pic))
            if sub_pic:
                w.u(0, 8); w.u(0, 5); w.flag(0); w.u(0, 5)
            w.u(3, 4); w.u(2, 4)
            if sub_pic:
                w.u(0, 4)
            w.u(23, 5); w.u(7, 5); w.u(7, 5)
    for _ in range(max_sub_layers):
        w.flag(0)   # fixed_pic_rate_general
        w.flag(0)   # fixed_pic_rate_within_cvs
        w.flag(0)   # low_delay_hrd
        w.ue(cpb_cnt - 1)
        for present in (nal, vcl):
            if present:
                for _ in range(cpb_cnt):
                    w.ue(1000); w.ue(2000)
                    if sub_pic:
                        w.ue(1); w.ue(2)
                    w.flag(1)


@pytest.mark.parametrize("kw", [
    dict(nal=True, vcl=False, sub_pic=False, cpb_cnt=1),
    dict(nal=True, vcl=True, sub_pic=True, cpb_cnt=3),
    dict(nal=False, vcl=False),
])
def test_hrd_skip_consumes_exact_bits(kw):
    w = BitWriter()
    _write_hrd(w, **kw)
    w.u(0x2B, 7)  # sentinel
    w.align_zero()
    r = BitReader(w.getvalue())
    skip_hrd_parameters(r, True, 1)
    assert r.u(7) == 0x2B


def test_vui_with_hrd_parses():
    """A VUI carrying hrd_parameters must not abort the parse."""
    from hevc_tpu.bitstream.ps import parse_vui
    w = BitWriter()
    w.flag(0)  # aspect_ratio_info_present
    w.flag(0)  # overscan_info_present
    w.flag(0)  # video_signal_type_present
    w.flag(0)  # chroma_loc_info_present
    w.flag(0)  # neutral_chroma_indication
    w.flag(0)  # field_seq
    w.flag(0)  # frame_field_info_present
    w.flag(0)  # default_display_window
    w.flag(1)  # vui_timing_info_present
    w.u(1, 32); w.u(25, 32)
    w.flag(0)  # poc_proportional_to_timing
    w.flag(1)  # vui_hrd_parameters_present
    _write_hrd(w, common_inf=True, nal=True, vcl=True, cpb_cnt=2)
    w.flag(0)  # bitstream_restriction
    w.u(0x2B, 7)
    w.align_zero()
    sps = SPS(width=64, height=64)
    r = BitReader(w.getvalue())
    parse_vui(r, sps)
    assert r.u(7) == 0x2B


def test_ts_resync_realigns_grid():
    """A single inserted garbage byte must not drop the rest of the
    stream: the reader realigns its 188-byte grid at the next sync."""
    from hevc_tpu.io.mpegts import TsReader, TsWriter

    enc = IntraEncoder(EncoderConfig(width=64, height=64, qp=30))
    aus = [enc.encode_frame(synth_frame("gradient", 64, 64, t))
           for t in range(3)]
    tw = TsWriter()
    for au in aus:
        tw.add_au(au)
    data = tw.getvalue()
    # corrupt: insert one junk byte after the 4th packet (first AU's
    # payload region — later AUs must survive the resync)
    cut = 4 * 188
    corrupted = data[:cut] + b"\x55" + data[cut:]
    got = TsReader(corrupted).annexb_stream()
    good = TsReader(data).annexb_stream()
    # the tail of the stream (last AU onward) must be recovered intact
    tail = good[-len(aus[-1]):]
    assert tail in got


def test_pts_follows_picture_in_display_order():
    """With a reordering RA GOP, each output picture carries the pts of
    its own AU (the advisor's api.py finding)."""
    from hevc_tpu import api
    from hevc_tpu.bitstream import nal as nalmod
    from hevc_tpu.encoder.core import RaEncoder

    enc = RaEncoder(EncoderConfig(width=64, height=64, qp=30, gop="ra",
                                  search_range=2))
    n = 5
    stream = enc.encode([synth_frame("gradient", 64, 64, t)
                         for t in range(n)])
    # split the decode-order stream into AUs: an AU ends after its
    # slices and their SUFFIX SEI (the picture hash rides a suffix NAL)
    aus, cur = [], []

    def _ends(t):
        return nalmod.is_slice_nal(t) or t == nalmod.NAL_SEI_SUFFIX

    for nl in nalmod.split_annexb(stream):
        if cur and _ends(cur[-1][0]) \
                and nl.type != nalmod.NAL_SEI_SUFFIX:
            aus.append(cur)
            cur = []
        cur.append((nl.type, nl.layer_id, nl.temporal_id, nl.rbsp))
    aus.append(cur)
    aus = [nalmod.write_annexb(a) for a in aus]
    assert len(aus) == n
    # learn each AU's POC by decoding one at a time
    dec = Decoder()
    poc_of_au = []
    for au in aus:
        for nl in nalmod.split_annexb(au):
            dec.decode_nal(nl)
        poc_of_au.append(dec.layers[0].cur_poc)
    h = api.oh_init()
    h.start()
    outs = []
    for i, au in enumerate(aus):
        got, f = h.decode(au, pts=1000 + i)
        if got:
            outs.append(f)
    outs.extend(h.close())
    assert len(outs) == n
    ptss = [f.info.pts for f in outs]
    # outputs are in display (POC) order: AU i produced poc_of_au[i], so
    # display order k should carry pts 1000 + decode-index of that poc
    order = sorted(range(n), key=lambda i: poc_of_au[i])
    assert ptss == [1000 + i for i in order]
    # the GOP really reorders (otherwise this test is vacuous)
    assert order != list(range(n))


@pytest.mark.parametrize("pcm_bd", [0, 7])
def test_pcm_roundtrip_backends(pcm_bd):
    """PCM CUs reconstruct identically on inline, plan and jax-pack
    paths (the round-1 'pcm broken off the inline path' finding)."""
    cfg = EncoderConfig(width=64, height=64, qp=30, pcm=0.5, seed=3,
                        pcm_bit_depth=pcm_bd)
    enc = IntraEncoder(cfg)
    data = b"".join(enc.encode_frame(synth_frame("gradient", 64, 64, t))
                    for t in range(2))
    ref = Decoder(recon_backend="inline").decode_bytes(data)
    assert all(f.md5_ok for f in ref)
    got = Decoder(recon_backend="plan").decode_bytes(data)
    for a, b in zip(ref, got):
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()
    got_jax = Decoder(recon_backend="jax").decode_bytes(data)
    for a, b in zip(ref, got_jax):
        for pa, pb in zip(a.planes, b.planes):
            assert (np.asarray(pa) == np.asarray(pb)).all()


@needs_oracle
def test_pcm_oracle_bitexact(tmp_path):
    """PCM streams decode bit-exactly in the reference oracle."""
    w, h = 64, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, pcm=0.5, seed=3)
    enc = IntraEncoder(cfg)
    stream = b"".join(enc.encode_frame(synth_frame("gradient", w, h, t))
                      for t in range(2))
    frames = Decoder().decode_bytes(stream)
    assert all(f.md5_ok for f in frames)
    ours = bytearray()
    for f in frames:
        for p in f.planes:
            ours += p.astype(np.uint8).tobytes()
    sfile = str(tmp_path / "t.265")
    open(sfile, "wb").write(stream)
    subprocess.run([ORACLE, "-i", sfile, "-o", str(tmp_path / "o")],
                   capture_output=True, timeout=120, check=False)
    got = open(str(tmp_path / f"o_{w}x{h}.yuv"), "rb").read()
    assert bytes(ours) == got


def test_pps_scaling_list_remap_444():
    """PPS-carried scaling lists in 4:4:4 must mirror 16x16 chroma
    matrices into the 32x32 slots (advisor medium finding)."""
    from hevc_tpu.bitstream.ps import PPS
    from hevc_tpu.coding.scaling import ScalingListData

    sld = ScalingListData()
    sld.sl[2][1] = [20] * 64  # distinctive chroma 16x16
    sld.sl_dc[0][1] = 21
    sps = SPS(width=64, height=64, chroma_format_idc=3).derive()

    p = PPS()
    p.scaling_list_data_present = 1
    p.scaling_list = sld
    p.derive(sps)
    assert list(p.scaling_list.sl[3][1]) == [20] * 64
    assert p.scaling_list.sl_dc[1][1] == 21
