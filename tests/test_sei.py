"""SEI side-data suite: parse/emit round trips, decoder side-data export,
and oracle tolerance of streams carrying the full SEI set.

Capability parity target: reference hevc_sei.c (frame packing, display
orientation, mastering display, content light, A53 captions, alternative
transfer, active parameter sets) + hevcdec.c set_side_data (:3456-3573).
"""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.bitstream import sei as seimod
from hevc_tpu.bitstream.sei import (
    SEI_TYPE_ACTIVE_PARAMETER_SETS, SEI_TYPE_ALTERNATIVE_TRANSFER,
    SEI_TYPE_CONTENT_LIGHT_LEVEL, SEI_TYPE_DISPLAY_ORIENTATION,
    SEI_TYPE_FRAME_PACKING, SEI_TYPE_MASTERING_DISPLAY_INFO,
    SEI_TYPE_USER_DATA_REGISTERED_ITU_T_T35, ActiveParameterSets,
    AlternativeTransfer, ContentLightLevel, DisplayOrientation, FramePacking,
    MasteringDisplay, UserDataRegistered, parse_sei_rbsp, write_sei_rbsp)

ORACLE = os.path.join(os.path.dirname(__file__), os.pardir,
                      ".oracle", "build", "hevc_nodisplay")

MSGS = [
    (SEI_TYPE_FRAME_PACKING,
     FramePacking(arrangement_id=1, arrangement_type=3,
                  content_interpretation=1, current_frame_is_frame0=1)),
    (SEI_TYPE_DISPLAY_ORIENTATION,
     DisplayOrientation(hflip=1, anticlockwise_rotation=1 << 14)),
    (SEI_TYPE_MASTERING_DISPLAY_INFO,
     MasteringDisplay(primaries=((13250, 34500), (7500, 3000),
                                 (34000, 16000)),
                      white_point=(15635, 16450),
                      max_luminance=10000000, min_luminance=50)),
    (SEI_TYPE_CONTENT_LIGHT_LEVEL, ContentLightLevel(1000, 400)),
    (SEI_TYPE_ALTERNATIVE_TRANSFER, AlternativeTransfer(18)),
    (SEI_TYPE_USER_DATA_REGISTERED_ITU_T_T35,
     UserDataRegistered(data=b"GA94\x03\xff\xfc\x20\x20")),
    (SEI_TYPE_ACTIVE_PARAMETER_SETS,
     ActiveParameterSets(active_vps_id=0, active_sps_ids=(0,))),
]


def test_sei_roundtrip_each_type():
    rbsp = write_sei_rbsp([(t, m.payload()) for t, m in MSGS])
    parsed = parse_sei_rbsp(rbsp)
    assert [t for t, _ in parsed] == [t for t, _ in MSGS]
    fp = FramePacking.parse(dict(parsed)[SEI_TYPE_FRAME_PACKING])
    assert (fp.arrangement_type, fp.current_frame_is_frame0) == (3, 1)
    do = DisplayOrientation.parse(dict(parsed)[SEI_TYPE_DISPLAY_ORIENTATION])
    assert (do.hflip, do.anticlockwise_rotation) == (1, 1 << 14)
    md = MasteringDisplay.parse(dict(parsed)[SEI_TYPE_MASTERING_DISPLAY_INFO])
    assert md == MSGS[2][1]
    cl = ContentLightLevel.parse(dict(parsed)[SEI_TYPE_CONTENT_LIGHT_LEVEL])
    assert cl == ContentLightLevel(1000, 400)
    at = AlternativeTransfer.parse(dict(parsed)[SEI_TYPE_ALTERNATIVE_TRANSFER])
    assert at.preferred_transfer_characteristics == 18
    ud = UserDataRegistered.parse(
        dict(parsed)[SEI_TYPE_USER_DATA_REGISTERED_ITU_T_T35])
    assert ud.is_a53_cc and ud.data.startswith(b"GA94")
    ap = ActiveParameterSets.parse(
        dict(parsed)[SEI_TYPE_ACTIVE_PARAMETER_SETS])
    assert ap.active_sps_ids == (0,)


def _stream(tmp_path, **cfg_over):
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    cfg = EncoderConfig(width=64, height=64, qp=30, sei_side_data=tuple(MSGS),
                        **cfg_over)
    enc = IntraEncoder(cfg)
    data = bytearray()
    for t in range(2):
        data += enc.encode_frame(synth_frame("gradient", 64, 64, t))
    path = tmp_path / "sei.265"
    path.write_bytes(bytes(data))
    return path


def test_decoder_exports_side_data(tmp_path):
    from hevc_tpu.decoder.core import Decoder

    path = _stream(tmp_path)
    frames = Decoder().decode_bytes(path.read_bytes())
    assert all(f.md5_ok for f in frames)
    # persistent items attach to every frame; one-shots to the first only
    sd0 = frames[0].side_data
    assert sd0["frame_packing"].arrangement_type == 3
    assert sd0["display_orientation"].anticlockwise_rotation == 1 << 14
    assert sd0["mastering_display"].max_luminance == 10000000
    assert sd0["content_light"].max_content_light_level == 1000
    assert sd0["alternative_transfer"].preferred_transfer_characteristics \
        == 18
    assert sd0["user_data_registered"].is_a53_cc
    assert sd0["active_parameter_sets"].active_vps_id == 0
    sd1 = frames[1].side_data
    assert "frame_packing" in sd1 and "user_data_registered" not in sd1


def test_display_orientation_cancel(tmp_path):
    from hevc_tpu.bitstream import nal as nalmod
    from hevc_tpu.decoder.core import Decoder

    path = _stream(tmp_path)
    data = bytearray(path.read_bytes())
    # append a cancel SEI + re-decode: a second decode run sees cancel
    # arriving before frame 2 removes the orientation from that frame on
    cancel = write_sei_rbsp([(SEI_TYPE_DISPLAY_ORIENTATION,
                              DisplayOrientation(cancel=1).payload())])
    dec = Decoder()
    frames = dec.decode_bytes(bytes(data))
    assert "display_orientation" in frames[-1].side_data
    nal = nalmod.write_annexb([(nalmod.NAL_SEI_PREFIX, 0, 0, cancel)])
    lay = dec._layer(0)
    assert "display_orientation" in lay.side_data
    for n in nalmod.split_annexb(nal):
        dec.decode_nal(n)
    assert "display_orientation" not in lay.side_data


@pytest.mark.skipif(not os.path.exists(ORACLE),
                    reason="oracle binary not built")
def test_oracle_accepts_sei_suite(tmp_path):
    path = _stream(tmp_path)
    r = subprocess.run([ORACLE, "-i", str(path), "-o", "/dev/null"],
                       capture_output=True, text=True, timeout=120)
    out = r.stdout + r.stderr
    assert "Incorrect MD5" not in out
    assert "frame= 2" in out.replace("frame=2", "frame= 2")
