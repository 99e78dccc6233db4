"""Full-native stage-A front-end vs the Python syntax layer.

The C++ slice decoder (hevc_tpu/native/stage_a.cpp) must be bit-exact
with decoder.core.SliceDecoder: identical BlockRecord plans, identical
per-4x4 picture maps, identical SAO parameters, identical output planes.
This is the native analogue of the reference's entropy front-end
(reference: libavcodec/hevcdec.c:2845 hls_decode_entry) so the whole
existing stream matrix is replayed through both paths.
"""
import os

import numpy as np
import pytest

import hevc_tpu.decoder.core as core
from hevc_tpu import native
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder, RaEncoder
from hevc_tpu.encoder.generate import synth_frame

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _stream(cfg, n=4, kind="noise"):
    frames = [synth_frame(kind, cfg.width, cfg.height, t, seed=3)
              for t in range(n)]
    if cfg.bit_depth > 8:
        frames = [[(p.astype(np.int32) << (cfg.bit_depth - 8)) for p in f]
                  for f in frames]
    if cfg.gop != "ra":
        enc = IntraEncoder(cfg)
        out = bytearray()
        for f in frames:
            out += enc.encode_frame(f)
        return bytes(out)
    return bytes(RaEncoder(cfg).encode(frames))


def _decode(stream, use_native, backend="plan"):
    os.environ["HEVC_TPU_NATIVE_SLICE"] = "1" if use_native else "0"
    core._NATIVE_SLICE = None
    try:
        return Decoder(check_md5=False,
                       recon_backend=backend).decode_bytes(stream)
    finally:
        os.environ.pop("HEVC_TPU_NATIVE_SLICE", None)
        core._NATIVE_SLICE = None


CONFIGS = {
    "ipp": dict(width=64, height=48, qp=28, gop="ipp"),
    "ra_b": dict(width=64, height=64, qp=30, gop="ra"),
    "tmvp": dict(width=64, height=64, qp=30, gop="lowb", tmvp=True),
    "wp": dict(width=64, height=64, qp=30, gop="lowb", weighted_pred=True,
               search_range=2),
    "wpp": dict(width=96, height=64, qp=30, gop="ipp", wpp=True),
    "tiles": dict(width=96, height=64, qp=30, gop="ipp", tiles=(2, 2)),
    "cu_qp": dict(width=64, height=64, qp=30, gop="ra",
                  cu_qp_delta_depth=1),
    "amp": dict(width=64, height=64, qp=30, gop="ra", amp="all",
                log2_ctb_size=5),
    "pcm": dict(width=64, height=48, qp=30, pcm=0.5, pcm_bit_depth=6,
                pcm_loop_filter_disabled=True, deblocking=True),
    "main10": dict(width=64, height=48, qp=30, bit_depth=10, gop="ipp"),
    "fmt422": dict(width=64, height=48, qp=30, chroma_format_idc=2,
                   gop="ipp"),
    "fmt444_ts": dict(width=64, height=48, qp=30, chroma_format_idc=3,
                      transform_skip=True),
    "scaling": dict(width=64, height=48, qp=30, scaling_lists="custom",
                    gop="ipp"),
    "filters": dict(width=64, height=64, qp=32, gop="ra", deblocking=True,
                    sao=True),
    "random_split": dict(width=96, height=80, qp=30, gop="ra",
                         split_policy="random", seed=7, deblocking=True,
                         sao=True, max_transform_hierarchy_depth_intra=2),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_native_matches_python(name):
    """Decoded planes: inline oracle == Python plan == native plan."""
    kw = dict(CONFIGS[name])
    n = 8 if kw.get("gop") == "ra" else 4
    stream = _stream(EncoderConfig(**kw), n=n)
    ref = Decoder(check_md5=True, recon_backend="inline").decode_bytes(
        stream)
    assert all(f.md5_ok is not False for f in ref)
    py = _decode(stream, use_native=False)
    nat = _decode(stream, use_native=True)
    assert len(ref) == len(py) == len(nat)
    for a, b, c in zip(ref, py, nat):
        for p in range(3):
            assert np.array_equal(a.planes[p], b.planes[p]), \
                f"{name}: python plan backend diverged"
            assert np.array_equal(a.planes[p], c.planes[p]), \
                f"{name}: native stage A diverged"


def _plans(stream, use_native):
    """Collect per-picture BlockRecord plans by monkeypatching the
    finisher."""
    os.environ["HEVC_TPU_NATIVE_SLICE"] = "1" if use_native else "0"
    core._NATIVE_SLICE = None
    plans = []
    orig = core.Decoder._finish_picture

    def spy(self, lay):
        if lay.cur_pic is not None and \
                getattr(lay.cur_pic, "plan", None) is not None:
            plans.append(list(lay.cur_pic.plan))
        return orig(self, lay)

    core.Decoder._finish_picture = spy
    try:
        Decoder(check_md5=False, recon_backend="plan").decode_bytes(stream)
    finally:
        core.Decoder._finish_picture = orig
        os.environ.pop("HEVC_TPU_NATIVE_SLICE", None)
        core._NATIVE_SLICE = None
    return plans


def _rec_tuple(r):
    lv = None if r.levels is None else r.levels.tolist()
    return (r.kind, r.plane, r.x, r.y, r.size, r.h, r.mode, r.qp, r.dst,
            r.ts, r.tqb, r.bi, r.lx, tuple(r.mv), r.ref_idx, tuple(r.mv1),
            r.ref_idx1, r.mtx, r.wp, lv)


@pytest.mark.parametrize("name", ["ra_b", "wp", "cu_qp", "pcm", "wpp"])
def test_native_plan_record_equality(name):
    """Record-by-record plan equality (order, fields, levels)."""
    kw = dict(CONFIGS[name])
    n = 8 if kw.get("gop") == "ra" else 3
    stream = _stream(EncoderConfig(**kw), n=n)
    p_py = _plans(stream, use_native=False)
    p_nat = _plans(stream, use_native=True)
    assert len(p_py) == len(p_nat)
    for pp, pn in zip(p_py, p_nat):
        assert len(pp) == len(pn)
        for a, b in zip(pp, pn):
            assert _rec_tuple(a) == _rec_tuple(b)


def test_native_jax_backend():
    """Native stage A feeding the device stage B (full plan path)."""
    stream = _stream(EncoderConfig(**CONFIGS["filters"]), n=6)
    ref = Decoder(check_md5=False, recon_backend="inline").decode_bytes(
        stream)
    nat = _decode(stream, use_native=True, backend="jax")
    for a, c in zip(ref, nat):
        for p in range(3):
            assert np.array_equal(a.planes[p], c.planes[p])


def test_native_weighted_pred_plan_backend():
    """Explicit WP is applied by the plan executor (was inline-only)."""
    stream = _stream(EncoderConfig(**CONFIGS["wp"]), n=6, kind="gradient")
    ref = Decoder(check_md5=True, recon_backend="inline").decode_bytes(
        stream)
    assert all(f.md5_ok is not False for f in ref)
    for use_native in (False, True):
        got = _decode(stream, use_native=use_native)
        for a, b in zip(ref, got):
            for p in range(3):
                assert np.array_equal(a.planes[p], b.planes[p])
