"""Native packer (stage_a_pack.h) vs the Python pack_frame oracle.

pack_frame_native consumes the raw native record stream and must produce
a PackedFrame bit-identical to tpu.pack.pack_frame on the equivalent
BlockRecord plan — wavefront chunking, slot order, MC grouping,
availability bitmaps, the lot.  Also checks the jax backend end-to-end
through the native pack path.
"""
import numpy as np
import pytest

import hevc_tpu.decoder.core as core
from hevc_tpu import native
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder, RaEncoder
from hevc_tpu.encoder.generate import synth_frame
from hevc_tpu.tpu.pack import pack_frame

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


def _compare_pf(a, b, name):
    assert np.array_equal(a.canvas, b.canvas), f"{name}: canvas"
    assert a.n_chunks == b.n_chunks, f"{name}: n_chunks"
    for c in range(4):
        assert np.array_equal(a.scal[c], b.scal[c]), f"{name}: scal[{c}]"
        assert np.array_equal(a.avail[c], b.avail[c]), f"{name}: avail[{c}]"
        assert np.array_equal(a.levels[c], b.levels[c]), \
            f"{name}: levels[{c}]"
        assert np.array_equal(a.rmeta[c], b.rmeta[c]), f"{name}: rmeta[{c}]"
        assert np.array_equal(a.resid_groups[c], b.resid_groups[c]), \
            f"{name}: resid[{c}]"
        assert np.array_equal(a.scale_bank[c], b.scale_bank[c]), \
            f"{name}: bank[{c}]"
    assert len(a.mc_groups) == len(b.mc_groups), f"{name}: mc group count"
    for (k1, k2, k3, k4, k5, f1), (m1, m2, m3, m4, m5, f2) in zip(
            a.mc_groups, b.mc_groups):
        assert (bool(k1), bool(k2), k3, k4, bool(k5)) \
            == (bool(m1), bool(m2), m3, m4, bool(m5)), f"{name}: mc key"
        assert np.array_equal(f1, f2), f"{name}: mc fields"
    assert np.array_equal(a.refs_l, b.refs_l), f"{name}: refs_l"
    assert np.array_equal(a.refs_c, b.refs_c), f"{name}: refs_c"
    assert a.region == b.region and a.bit_depth == b.bit_depth


CONFIGS = {
    "ra_filters": (dict(width=96, height=80, qp=31, gop="ra",
                        deblocking=True, sao=True, split_policy="random",
                        seed=2, max_transform_hierarchy_depth_intra=2), 8),
    "amp_qp": (dict(width=64, height=64, qp=30, gop="ra", amp="all",
                    log2_ctb_size=5, cu_qp_delta_depth=1), 8),
    "pcm": (dict(width=64, height=48, qp=30, pcm=0.5, pcm_bit_depth=6,
                 pcm_loop_filter_disabled=True, deblocking=True), 4),
    "main10_422": (dict(width=64, height=48, qp=30, bit_depth=10,
                        chroma_format_idc=2, gop="ipp"), 3),
    "scaling": (dict(width=64, height=48, qp=30, scaling_lists="custom",
                     gop="ipp"), 3),
    "tiles": (dict(width=96, height=64, qp=30, gop="ipp",
                   tiles=(2, 2)), 3),
    "wp": (dict(width=64, height=64, qp=30, gop="lowb",
                weighted_pred=True, search_range=2), 6),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_native_pack_equality(name):
    kw, n = CONFIGS[name]
    stream = _stream(EncoderConfig(**kw), n=n)
    pairs = []
    orig = core.Decoder._finish_picture

    def spy(self, lay):
        pic = lay.cur_pic
        if pic is not None and \
                getattr(pic, "native_chunks", None) is not None:
            plan = []
            for rec, lvl in pic.native_chunks:
                native.records_to_plan(rec, lvl, plan)
            pairs.append((pack_frame(pic, plan),
                          native.pack_frame_native(pic)))
        return orig(self, lay)

    core.Decoder._finish_picture = spy
    try:
        nat = Decoder(check_md5=False,
                      recon_backend="jax").decode_bytes(stream)
    finally:
        core.Decoder._finish_picture = orig
    assert pairs, "native pack path not taken"
    for a, b in pairs:
        _compare_pf(a, b, name)
    ref = Decoder(check_md5=False,
                  recon_backend="inline").decode_bytes(stream)
    for a, c in zip(ref, nat):
        for p in range(3):
            assert np.array_equal(a.planes[p], c.planes[p]), \
                f"{name}: e2e plane {p}"


def test_native_compute_bs_matches_numpy():
    """hevc_native_compute_bs vs the NumPy BS oracle on a filtered RA
    stream's per-4x4 maps."""
    kw, n = CONFIGS["ra_filters"]
    stream = _stream(EncoderConfig(**kw), n=n)
    pics = []
    orig = core.Decoder._finish_picture

    def spy(self, lay):
        if lay.cur_pic is not None:
            pics.append(lay.cur_pic)
        return orig(self, lay)

    core.Decoder._finish_picture = spy
    try:
        Decoder(check_md5=False, recon_backend="jax").decode_bytes(stream)
    finally:
        core.Decoder._finish_picture = orig
    assert pics
    for pic in pics:
        ref_v, ref_h = (a.copy() for a in pic.compute_bs_numpy())
        native.compute_bs_native(pic)
        assert np.array_equal(pic.bs_v, ref_v)
        assert np.array_equal(pic.bs_h, ref_h)
