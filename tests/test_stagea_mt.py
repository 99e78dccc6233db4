"""Parallel native stage A (WPP rows / tiles) vs sequential decode.

The MT fan-out (hevc_tpu/native/stage_a_mt.h) must be bit-exact with
the single-thread decode_ctus walk: identical output planes and SEI
MD5 on every stream whose segment layout admits parallelism.  This is
the analogue of the reference's thread-config bit-exactness check
(SURVEY §4 point 4: same stream re-run with -f 1|2|4 -p N must produce
identical MD5s; reference: pthread_slice.c:239-299 row sync).
"""
import os

import numpy as np
import pytest

from hevc_tpu import native
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder, RaEncoder
from hevc_tpu.encoder.generate import synth_frame

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _stream(cfg, n=4, kind="noise"):
    frames = [synth_frame(kind, cfg.width, cfg.height, t, seed=3)
              for t in range(n)]
    if cfg.gop == "ra":
        return bytes(RaEncoder(cfg).encode(frames))
    enc = IntraEncoder(cfg)
    out = bytearray()
    for f in frames:
        out += enc.encode_frame(f)
    return bytes(out)


def _decode(stream, n_threads, backend="plan"):
    os.environ["HEVC_TPU_STAGEA_THREADS"] = str(n_threads)
    try:
        return Decoder(recon_backend=backend).decode_bytes(stream)
    finally:
        os.environ.pop("HEVC_TPU_STAGEA_THREADS", None)


CONFIGS = {
    # 8 CTB rows of 13 CTBs — enough wavefront depth to exercise the lag
    "wpp_ipp": dict(width=416, height=256, qp=30, log2_ctb_size=5,
                    log2_cu_size=5, gop="ipp", wpp=True, deblocking=True,
                    sao=True, search_range=3),
    "wpp_ra": dict(width=192, height=128, qp=30, log2_ctb_size=5,
                   log2_cu_size=5, gop="ra", wpp=True, deblocking=True),
    "tiles_3x2": dict(width=416, height=256, qp=30, log2_ctb_size=5,
                      log2_cu_size=5, gop="ipp", tiles=(3, 2),
                      deblocking=True, sao=True, search_range=3),
    "wpp_10bit": dict(width=192, height=96, qp=30, log2_ctb_size=5,
                      log2_cu_size=5, gop="ipp", wpp=True, bit_depth=10),
    # combined WPP-inside-tiles through the MT fan-out (one unit per
    # tile x tile-row, tile-relative 2-CTU lag)
    "wit_2x2_mt": dict(width=192, height=128, qp=30, log2_ctb_size=5,
                       log2_cu_size=5, wpp=True, tiles=(2, 2),
                       deblocking=True, sao=True),
    "wit_3x1_ipp_mt": dict(width=288, height=128, qp=30,
                           log2_ctb_size=5, log2_cu_size=5, wpp=True,
                           tiles=(3, 1), gop="ipp", search_range=2,
                           deblocking=True),
}


@pytest.mark.parametrize("name", CONFIGS)
@pytest.mark.parametrize("n_threads", [2, 4])
def test_mt_bit_exact(name, n_threads):
    cfg = EncoderConfig(seed=2, **CONFIGS[name])
    stream = _stream(cfg)
    seq = _decode(stream, 1)
    mt = _decode(stream, n_threads)
    assert len(seq) == len(mt) == 4
    for a, b in zip(seq, mt):
        assert a.md5_ok and b.md5_ok
        for p in range(3):
            assert (np.asarray(a.planes[p])
                    == np.asarray(b.planes[p])).all()


def test_mt_jax_backend():
    """MT stage A under the device pipeline backend stays bit-exact."""
    cfg = EncoderConfig(seed=2, **CONFIGS["wpp_ipp"])
    stream = _stream(cfg)
    seq = _decode(stream, 1)
    mt = _decode(stream, 4, backend="jax")
    for a, b in zip(seq, mt):
        assert b.md5_ok
        for p in range(3):
            assert (np.asarray(a.planes[p])
                    == np.asarray(b.planes[p])).all()


WIT_CONFIGS = {
    "wit_2x2": dict(width=192, height=128, qp=30, log2_ctb_size=5,
                    log2_cu_size=5, wpp=True, tiles=(2, 2),
                    deblocking=True, sao=True),
    "wit_3x1_ipp": dict(width=192, height=128, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, wpp=True, tiles=(3, 1),
                        gop="ipp", search_range=2, deblocking=True),
}


@pytest.mark.parametrize("name", WIT_CONFIGS)
def test_wpp_in_tiles(name):
    """Combined WPP-inside-tiles: tile-relative row segments with the
    per-tile-row context handoff (reference: hevcdec.c:3196
    hls_decode_entry_wpp_in_tiles, hevc_cabac.c:560 tile-relative save).
    Decodes identically through the Python and native stage A."""
    cfg = EncoderConfig(seed=2, **WIT_CONFIGS[name])
    stream = _stream(cfg)
    a = _decode(stream, 1)            # native stage A (sequential path)
    os.environ["HEVC_TPU_NATIVE_SLICE"] = "0"
    try:
        b = Decoder(recon_backend="plan").decode_bytes(stream)
    finally:
        os.environ.pop("HEVC_TPU_NATIVE_SLICE", None)
    assert len(a) == len(b) == 4
    for fa, fb in zip(a, b):
        assert fa.md5_ok and fb.md5_ok
        for p in range(3):
            assert (np.asarray(fa.planes[p])
                    == np.asarray(fb.planes[p])).all()
