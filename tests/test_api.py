"""Public API wrapper tests — the oh_init/oh_start/oh_decode lifecycle
(reference: libopenhevc/openhevc.h), per-AU decode, extradata paths,
layer/temporal selection, log control."""
import numpy as np

from hevc_tpu import api
from hevc_tpu import log as ohlog
from hevc_tpu.bitstream import nal as nalmod


def _aus(w=64, h=64, frames=4, **kw):
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=30, **kw))
    return [enc.encode_frame(synth_frame("gradient", w, h, t))
            for t in range(frames)]


def test_lifecycle_per_au():
    hdl = api.oh_init()
    hdl.enable_sei_checksum(True)
    hdl.start()
    got_any = []
    for i, au in enumerate(_aus()):
        got, frm = hdl.decode(au, pts=1000 * i)
        if got:
            got_any.append(frm)
    got_any += hdl.close()
    assert len(got_any) == 4
    for i, frm in enumerate(got_any):
        assert frm.md5_ok
        assert frm.info.width == 64 and frm.info.height == 64
        assert frm.info.bit_depth == 8 and frm.info.chroma_format == 1
        assert frm.info.pts == 1000 * i
        assert frm.info.display_picture_number == i


def test_extradata_hvcc_and_annexb():
    from hevc_tpu.io.mp4 import annexb_to_lengths, build_hvcc, \
        lengths_to_annexb

    aus = _aus(frames=2)
    ps, rest0 = [], []
    for n in nalmod.split_annexb(aus[0]):
        tup = (n.type, n.layer_id, n.temporal_id, n.rbsp)
        (ps if n.type in (nalmod.NAL_VPS, nalmod.NAL_SPS, nalmod.NAL_PPS)
         else rest0).append(tup)
    ps_annexb = nalmod.write_annexb(ps)
    body0 = nalmod.write_annexb(rest0)

    for extradata in (ps_annexb, build_hvcc(ps_annexb)):
        hdl = api.oh_init()
        hdl.enable_sei_checksum(True)
        hdl.start()
        hdl.extradata_cpy(extradata)
        frames = []
        for au in (body0, aus[1]):
            got, frm = hdl.decode(au)
            if got:
                frames.append(frm)
        frames += hdl.close()
        assert len(frames) == 2 and all(f.md5_ok for f in frames)


def test_temporal_selection():
    aus = _aus(frames=8, gop="ra")
    whole = b"".join(aus)
    hdl = api.oh_init_lhvc()
    hdl.select_temporal_layer(0)
    hdl.start()
    got, _ = hdl.decode(whole)
    frames = ([_ for _ in ()] if not got else [_])
    drained = hdl.close()
    # only temporal layer 0 decodes -> fewer frames than total
    n = (1 if got else 0) + len(drained)
    assert 0 < n < 8


def test_log_control(capsys):
    seen = []
    api.OHHandle.set_log_callback(lambda lvl, msg: seen.append((lvl, msg)))
    api.OHHandle.set_log_level(ohlog.OH_LOG_VERBOSE)
    hdl = api.oh_init()
    hdl.start()
    assert seen and seen[-1][0] == ohlog.OH_LOG_VERBOSE
    api.OHHandle.set_log_callback(None)
    api.OHHandle.set_log_level(ohlog.OH_LOG_INFO)
