import random

import pytest

from hevc_tpu.bitstream.bits import BitReader, BitWriter
from hevc_tpu.bitstream.nal import (insert_epb, remove_epb, split_annexb,
                                    write_annexb)
from hevc_tpu.bitstream.ps import PPS, SPS, VPS, ShortTermRPS
from hevc_tpu.bitstream.sei import parse_sei_rbsp, write_sei_rbsp


def test_bits_roundtrip():
    rng = random.Random(0)
    ops = []
    w = BitWriter()
    for _ in range(2000):
        kind = rng.randrange(4)
        if kind == 0:
            n = rng.randrange(1, 25)
            v = rng.getrandbits(n)
            w.u(v, n)
            ops.append(("u", n, v))
        elif kind == 1:
            v = rng.randrange(0, 100000)
            w.ue(v)
            ops.append(("ue", None, v))
        elif kind == 2:
            v = rng.randrange(-5000, 5000)
            w.se(v)
            ops.append(("se", None, v))
        else:
            v = rng.randrange(2)
            w.flag(v)
            ops.append(("flag", None, v))
    w.rbsp_trailing_bits()
    data = w.getvalue()
    r = BitReader(data)
    for kind, n, v in ops:
        if kind == "u":
            assert r.u(n) == v
        elif kind == "ue":
            assert r.ue() == v
        elif kind == "se":
            assert r.se() == v
        else:
            assert r.flag() == v
    r.rbsp_trailing_bits()


def test_more_rbsp_data():
    w = BitWriter()
    w.u(5, 3)
    w.rbsp_trailing_bits()
    r = BitReader(w.getvalue())
    assert r.more_rbsp_data()
    r.u(3)
    assert not r.more_rbsp_data()


def test_epb_roundtrip():
    rng = random.Random(1)
    for _ in range(50):
        # biased toward zeros to exercise escaping
        raw = bytes(rng.choice([0, 0, 0, 1, 2, 3, 255]) for _ in range(200))
        esc = insert_epb(raw)
        # escaped stream must not contain 00 00 0[0-2] (00 00 03 is the EPB)
        for i in range(len(esc) - 2):
            if esc[i] == 0 and esc[i + 1] == 0:
                assert esc[i + 2] >= 3
        back, skipped = remove_epb(esc)
        assert back == raw
        assert len(skipped) == len(esc) - len(raw)


def test_annexb_roundtrip():
    payloads = [
        (32, 0, 0, b"\x00\x00\x00\x00\x01\x02\x03"),
        (33, 0, 0, b"\xff" * 10),
        (19, 0, 0, b"\x80\x00\x00\x00"),
        (0, 2, 1, b"\x12\x34"),
    ]
    data = write_annexb(payloads)
    nals = split_annexb(data)
    assert len(nals) == len(payloads)
    for nal, (t, lid, tid, rbsp) in zip(nals, payloads):
        assert nal.type == t
        assert nal.layer_id == lid
        assert nal.temporal_id == tid
        # trailing zeros of the last NAL are start-code ambiguous; our writer
        # requires rbsp_trailing_bits so real payloads never end in 0x00.
        assert nal.rbsp == rbsp or rbsp.startswith(nal.rbsp)


def test_vps_roundtrip():
    v = VPS()
    rbsp = v.write_rbsp()
    v2 = VPS.parse_rbsp(rbsp)
    assert v2.max_layers == v.max_layers
    assert v2.max_sub_layers == v.max_sub_layers
    assert v2.ptl.profile_idc == v.ptl.profile_idc


@pytest.mark.parametrize("w,h,chroma,depth", [
    (416, 240, 1, 8), (832, 480, 1, 8), (1920, 1080, 1, 10),
    (64, 64, 3, 8), (128, 64, 2, 10),
])
def test_sps_roundtrip(w, h, chroma, depth):
    s = SPS(width=w, height=h, chroma_format_idc=chroma,
            bit_depth_luma=depth, bit_depth_chroma=depth)
    if chroma != 1 or depth > 8:
        s.ptl.profile_idc = 4 if chroma != 1 else 2
    s.sao_enabled = 1
    s.derive()
    rbsp = s.write_rbsp()
    s2 = SPS.parse_rbsp(rbsp)
    for f in ("width", "height", "chroma_format_idc", "bit_depth_luma",
              "log2_ctb_size", "log2_min_cb_size", "sao_enabled",
              "ctb_w", "ctb_h"):
        assert getattr(s2, f) == getattr(s, f), f


def test_sps_rps_roundtrip():
    rps = ShortTermRPS(delta_poc_s0=[-1, -3], used_s0=[1, 1],
                       delta_poc_s1=[2], used_s1=[1])
    s = SPS(width=64, height=64)
    s.st_rps = [rps]
    s.derive()
    s2 = SPS.parse_rbsp(s.write_rbsp())
    assert s2.st_rps[0].delta_poc_s0 == [-1, -3]
    assert s2.st_rps[0].delta_poc_s1 == [2]
    assert s2.st_rps[0].used_s0 == [1, 1]


def test_pps_roundtrip_and_tiles():
    s = SPS(width=256, height=192)  # 4x3 CTBs at 64
    s.derive()
    p = PPS(tiles_enabled=1, num_tile_columns=2, num_tile_rows=2,
            cu_qp_delta_enabled=1, diff_cu_qp_delta_depth=1,
            sign_data_hiding=1, init_qp=30)
    rbsp = p.write_rbsp()
    p2 = PPS.parse_rbsp(rbsp)
    for f in ("tiles_enabled", "num_tile_columns", "num_tile_rows",
              "cu_qp_delta_enabled", "diff_cu_qp_delta_depth",
              "sign_data_hiding", "init_qp"):
        assert getattr(p2, f) == getattr(p, f), f
    p2.derive(s)
    assert p2.column_widths == [2, 2]
    # uniform spacing uses floor-division bounds: rows of 3 CTBs → [1, 2]
    assert p2.row_heights == [1, 2]
    # tile scan: tile0 = row 0, cols 0-1; tile2 = rows 1-2, cols 0-1
    assert list(p2.ctb_addr_ts_to_rs[:8]) == [0, 1, 2, 3, 4, 5, 8, 9]
    rs_to_ts = p2.ctb_addr_rs_to_ts
    for ts, rs in enumerate(p2.ctb_addr_ts_to_rs):
        assert rs_to_ts[rs] == ts


def test_sei_roundtrip():
    payload = bytes([0]) + bytes(range(48))
    rbsp = write_sei_rbsp([(132, payload), (5, b"hello-uuid-0123456789abcdef")])
    msgs = parse_sei_rbsp(rbsp)
    assert msgs[0] == (132, payload)
    assert msgs[1][0] == 5
