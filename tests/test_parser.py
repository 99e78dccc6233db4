"""AU-boundary stream parser (the AVCodecParser analogue).

Feeding the decoder AU-by-AU — or in arbitrary byte chunks through the
incremental parser — must reproduce the whole-file decode exactly
(reference: hevc_parser.c:458 AU framing)."""
import numpy as np

from hevc_tpu.api import OHHandle
from hevc_tpu.bitstream import nal as nalmod
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder, RaEncoder
from hevc_tpu.encoder.generate import synth_frame
from hevc_tpu.io.parser import AnnexBParser, split_access_units


def _stream(gop="ipp", n=4):
    cfg = EncoderConfig(width=96, height=64, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, seed=3, gop=gop, search_range=2,
                        deblocking=True, sao=True)
    frames = [synth_frame("noise", 96, 64, t, seed=6) for t in range(n)]
    if gop == "ra":
        return bytes(RaEncoder(cfg).encode(frames))
    enc = IntraEncoder(cfg)
    out = bytearray()
    for f in frames:
        out += enc.encode_frame(f)
    return bytes(out)


def _decode_whole(stream):
    frames = Decoder(check_md5=True).decode_bytes(stream)
    assert all(f.md5_ok for f in frames)
    return [(f.poc, [np.asarray(p).copy() for p in f.planes])
            for f in frames]


def _assert_same(got, want):
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, a), (_, b) in zip(got, want):
        for pa, pb in zip(a, b):
            assert (pa == pb).all()


def test_split_access_units_counts():
    stream = _stream()
    aus = split_access_units(stream)
    assert len(aus) == 4          # one AU per frame (headers attach)
    assert b"".join(aus) == stream


def _feed_au(dec, au):
    for n in nalmod.split_annexb(au):
        dec.decode_nal(n)
    out, dec.frames = dec.frames, []
    assert all(f.md5_ok is not False for f in out)
    return [(f.poc, [np.asarray(p).copy() for p in f.planes])
            for f in out]


def _drain(dec):
    dec.flush()
    out, dec.frames = dec.frames, []
    return [(f.poc, [np.asarray(p).copy() for p in f.planes])
            for f in out]


def test_au_by_au_decode():
    stream = _stream()
    want = _decode_whole(stream)
    dec = Decoder(check_md5=True)
    got = []
    for au in split_access_units(stream):
        got += _feed_au(dec, au)
    got += _drain(dec)
    _assert_same(got, want)


def test_incremental_chunks_ra():
    """Arbitrary chunk sizes through AnnexBParser, RA reordered GOP."""
    stream = _stream(gop="ra", n=6)
    want = _decode_whole(stream)
    parser = AnnexBParser()
    dec = Decoder(check_md5=True)
    got = []
    for i in range(0, len(stream), 257):  # prime-size chunks
        for au in parser.feed(stream[i:i + 257]):
            got += _feed_au(dec, au)
    for au in parser.flush():
        got += _feed_au(dec, au)
    got += _drain(dec)
    _assert_same(got, want)


def test_api_au_feed():
    """The OHHandle API consumes parsed AUs like oh_decode packets."""
    stream = _stream()
    want = _decode_whole(stream)
    h = OHHandle()
    h.start()
    got = []

    def grab(ret):
        ok, fr = ret
        if ok:
            got.append((fr.info.display_picture_number,
                        [np.asarray(p).copy() for p in fr.planes]))
        return ok

    for au in split_access_units(stream):
        grab(h.decode(au))
    while grab(h.decode(None)):
        pass
    _assert_same(got, want)
