"""SHVC two-layer tests: round-trip self-consistency and bit-exactness
against the openHEVC oracle decoding the same scalable stream with
quality_layer_id 1 (EL output) and 0 (BL output).

Covers spatial x2 / x1.5 / arbitrary-ratio / SNR scalability, EL intra
fallback, and in-loop filters on both layers (SURVEY.md §7 step 8;
BASELINE config 5)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig
from hevc_tpu.encoder.generate import synth_frame
from hevc_tpu.encoder.shvc import ShvcEncoder

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")


def encode_shvc(bl_cfg, el_cfg, n_frames, sources=("gradient", "zoneplate")):
    enc = ShvcEncoder(bl_cfg, el_cfg)
    bl_base = synth_frame(sources[0], bl_cfg.width, bl_cfg.height, 0)
    el_base = synth_frame(sources[1], el_cfg.width, el_cfg.height, 0)
    stream = bytearray()
    recons = []
    for t in range(n_frames):
        bl = [np.roll(p, (t * 2, t * 3), (0, 1)) for p in bl_base]
        el = [np.roll(p, (t * 4, t * 6), (0, 1)) for p in el_base]
        stream += enc.encode_frame(bl, el)
        recons.append(([p.copy() for p in enc.bl.recon_planes],
                       [p.copy() for p in enc.el.recon_planes]))
    return bytes(stream), recons


def self_check(stream, recons):
    frames = Decoder().decode_bytes(stream)
    assert len(frames) == 2 * len(recons)
    for f in frames:
        assert f.md5_ok, f"hash mismatch layer {f.layer} poc {f.poc}"
        ref = recons[f.poc][f.layer]
        for a, b in zip(f.planes, ref):
            assert (a == b).all()
    return frames


def oracle_yuv(stream, layer, w, h, tmp_path) -> bytes:
    sfile = str(tmp_path / f"t{layer}.265")
    ofile = str(tmp_path / f"o{layer}")
    with open(sfile, "wb") as f:
        f.write(stream)
    subprocess.run([ORACLE, "-l", str(layer), "-i", sfile, "-o", ofile],
                   capture_output=True, timeout=120, check=False)
    return open(f"{ofile}_{w}x{h}.yuv", "rb").read()


def layer_yuv(recons, layer) -> bytes:
    out = bytearray()
    for rec in recons:
        for p in rec[layer]:
            out += p.astype(np.uint8).tobytes()
    return bytes(out)


def cfg_pair(bl_wh, el_wh, qp=30, **el_kw):
    bl = EncoderConfig(width=bl_wh[0], height=bl_wh[1], qp=qp,
                       log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                       search_range=2, seed=3)
    el = EncoderConfig(width=el_wh[0], height=el_wh[1], qp=qp,
                       log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                       search_range=2, seed=4, **el_kw)
    return bl, el


def test_shvc_roundtrip_x2():
    stream, recons = encode_shvc(*cfg_pair((64, 64), (128, 128)), 3)
    self_check(stream, recons)


def test_shvc_roundtrip_snr():
    bl, el = cfg_pair((64, 64), (64, 64), qp=34)
    el.qp = 26  # SNR scalability: same dims, finer quantization
    stream, recons = encode_shvc(bl, el, 3)
    self_check(stream, recons)


@needs_oracle
def test_oracle_shvc_x2(tmp_path):
    bl, el = cfg_pair((64, 64), (128, 128))
    stream, recons = encode_shvc(bl, el, 3)
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 128, 128, tmp_path)
    assert layer_yuv(recons, 0) == oracle_yuv(stream, 0, 64, 64, tmp_path)


@needs_oracle
def test_oracle_shvc_x1_5(tmp_path):
    bl, el = cfg_pair((64, 64), (96, 96))
    stream, recons = encode_shvc(bl, el, 2)
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 96, 96, tmp_path)


def test_shvc_arbitrary_ratio_roundtrip():
    """Non-standard upsampling ratio (DEFAULT filter path).

    Self-roundtrip only: the oracle's block-based DEFAULT-ratio
    upsampler crashes (heap corruption in upsample_filter_block_*
    for ratios other than x2/x1.5) — our frame-level resampler
    handles any ratio."""
    bl, el = cfg_pair((48, 32), (112, 80))
    stream, recons = encode_shvc(bl, el, 2)
    self_check(stream, recons)


@needs_oracle
def test_oracle_shvc_snr(tmp_path):
    bl, el = cfg_pair((64, 64), (64, 64), qp=34)
    el.qp = 26
    stream, recons = encode_shvc(bl, el, 3)
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 64, 64, tmp_path)


@needs_oracle
def test_oracle_shvc_filters(tmp_path):
    """Deblocking + SAO enabled on both layers; EL intra fallback."""
    bl, el = cfg_pair((64, 64), (128, 128))
    for c in (bl, el):
        c.deblocking = True
        c.sao = True
    stream, recons = encode_shvc(bl, el, 3, sources=("noise", "zoneplate"))
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 128, 128, tmp_path)
    assert layer_yuv(recons, 0) == oracle_yuv(stream, 0, 64, 64, tmp_path)


@needs_oracle
def test_oracle_shvc_larger(tmp_path):
    """176x144 -> 352x288 over 4 frames with CTB 64."""
    bl = EncoderConfig(width=176, height=144, qp=32, log2_ctb_size=6,
                       log2_cu_size=6, gop="ipp", search_range=2, seed=5)
    el = EncoderConfig(width=352, height=288, qp=30, log2_ctb_size=6,
                       log2_cu_size=6, gop="ipp", search_range=2, seed=6)
    stream, recons = encode_shvc(bl, el, 4)
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 352, 288, tmp_path)


@needs_oracle
@pytest.mark.parametrize("col_idx,bl_tmvp", [(0, False), (1, True)])
def test_oracle_shvc_tmvp(tmp_path, col_idx, bl_tmvp):
    """EL TMVP: collocated = previous EL frame (idx 0) and collocated =
    the inter-layer ref (idx 1, upscaled BL motion field — set_mfm;
    reference: hevc_filter.c:1985 ff_upscale_mv_block)."""
    bl, el = cfg_pair((64, 64), (128, 128))
    bl.tmvp = bl_tmvp
    el.tmvp = True
    el.tmvp_col_ref_idx = col_idx
    stream, recons = encode_shvc(bl, el, 4)
    self_check(stream, recons)
    assert layer_yuv(recons, 1) == oracle_yuv(stream, 1, 128, 128, tmp_path)


def test_shvc_jax_backend():
    """Device stage-B backend on an SHVC stream (incl. the JAX
    inter-layer upsampling kernel) matches the NumPy oracle path."""
    bl, el = cfg_pair((64, 64), (128, 128))
    stream, recons = encode_shvc(bl, el, 2)
    ref = Decoder(recon_backend="inline").decode_bytes(stream)
    jx = Decoder(recon_backend="jax").decode_bytes(stream)
    for a, b in zip(ref, jx):
        assert a.layer == b.layer and a.poc == b.poc
        for pa, pb in zip(a.planes, b.planes):
            assert (np.asarray(pa) == np.asarray(pb)).all()


@needs_oracle
def test_shvc_bit_depth_8_to_10(tmp_path):
    """Bit-depth scalability: 8-bit BL -> 10-bit EL (the upsampler's
    shift-up path; reference: per-depth US init hevcdsp.c:589)."""
    bl = EncoderConfig(width=64, height=64, qp=30, log2_ctb_size=5,
                       log2_cu_size=5, gop="ipp", search_range=2, seed=3,
                       bit_depth=8)
    el = EncoderConfig(width=128, height=128, qp=30, log2_ctb_size=5,
                       log2_cu_size=5, gop="ipp", search_range=2, seed=4,
                       bit_depth=10)
    enc = ShvcEncoder(bl, el)
    blb = synth_frame("gradient", 64, 64, 0)
    elb = [(p.astype(np.int32) << 2)
           for p in synth_frame("zoneplate", 128, 128, 0)]
    stream = bytearray()
    recons = []
    for t in range(3):
        b = [np.roll(p, (t * 2, t * 3), (0, 1)) for p in blb]
        e = [np.roll(p, (t * 4, t * 6), (0, 1)) for p in elb]
        stream += enc.encode_frame(b, e)
        recons.append(([p.copy() for p in enc.bl.recon_planes],
                       [p.copy() for p in enc.el.recon_planes]))
    frames = Decoder().decode_bytes(bytes(stream))
    assert len(frames) == 6
    for f in frames:
        assert f.md5_ok, f"layer {f.layer} poc {f.poc}"
        for a, b in zip(f.planes, recons[f.poc][f.layer]):
            assert (np.asarray(a) == b).all()
    sfile = str(tmp_path / "bd10.265")
    with open(sfile, "wb") as fh:
        fh.write(stream)
    subprocess.run([ORACLE, "-l", "1", "-i", sfile,
                    "-o", str(tmp_path / "o")],
                   capture_output=True, timeout=120, check=False)
    out = open(str(tmp_path / "o_128x128.yuv"), "rb").read()
    ours = b"".join(p.astype("<u2").tobytes()
                    for rec in recons for p in rec[1])
    assert out == ours, "oracle 10-bit EL output differs"
