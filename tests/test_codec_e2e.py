"""End-to-end codec tests: encoder → decoder bit-exactness, and (when the
oracle binary is present) bit-exactness against openHEVC.

This is the analogue of the reference's conformance-stream MD5 strategy
(SURVEY.md §4): the decoded-picture-hash SEI is the correctness oracle.
"""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
from hevc_tpu.encoder.generate import synth_frame

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"


def encode_decode(cfg, frames):
    enc = IntraEncoder(cfg)
    stream = bytearray()
    recons = []
    for planes in frames:
        stream += enc.encode_frame(planes)
        recons.append([p.copy() for p in enc.recon_planes])
    dec = Decoder()
    decoded = dec.decode_bytes(bytes(stream))
    assert len(decoded) == len(frames)
    for df, rec in zip(decoded, recons):
        assert df.md5_ok, "decoded-picture-hash mismatch"
        for a, b in zip(df.planes, rec):
            assert (a == b).all()
    return bytes(stream), recons


def oracle_decode(stream: bytes, w: int, h: int, tmp_path) -> bytes:
    sfile = str(tmp_path / "t.265")
    ofile = str(tmp_path / "o")
    with open(sfile, "wb") as f:
        f.write(stream)
    subprocess.run([ORACLE, "-i", sfile, "-o", ofile],
                   capture_output=True, timeout=120, check=False)
    return open(f"{ofile}_{w}x{h}.yuv", "rb").read()


def flatten(recons):
    out = bytearray()
    for planes in recons:
        for p in planes:
            out += p.astype(np.uint8).tobytes()
    return bytes(out)


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_roundtrip_qp(qp):
    frames = [synth_frame("gradient", 64, 48, t) for t in range(2)]
    cfg = EncoderConfig(width=64, height=48, qp=qp)
    encode_decode(cfg, frames)


def test_roundtrip_noise():
    frames = [synth_frame("noise", 48, 32, 0)]
    encode_decode(EncoderConfig(width=48, height=32, qp=30), frames)


def test_roundtrip_zoneplate():
    frames = [synth_frame("zoneplate", 80, 48, 0)]
    encode_decode(EncoderConfig(width=80, height=48, qp=27), frames)


needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")


@needs_oracle
@pytest.mark.parametrize("source,qp", [("gradient", 32), ("noise", 37),
                                       ("zoneplate", 25)])
def test_oracle_bitexact(tmp_path, source, qp):
    w, h = 416, 240
    frames = [synth_frame(source, w, h, t) for t in range(2)]
    stream, recons = encode_decode(EncoderConfig(width=w, height=h, qp=qp),
                                   frames)
    oracle = oracle_decode(stream, w, h, tmp_path)
    assert flatten(recons) == oracle


@needs_oracle
def test_oracle_bitexact_small_sizes(tmp_path):
    for (w, h) in ((16, 16), (32, 16), (48, 48), (64, 32)):
        frames = [synth_frame("gradient", w, h, 0)]
        stream, recons = encode_decode(
            EncoderConfig(width=w, height=h, qp=30), frames)
        assert flatten(recons) == oracle_decode(stream, w, h, tmp_path)


@needs_oracle
def test_oracle_bitexact_structures(tmp_path):
    """Random CU/TU structure policies: quadtree depths, NxN partitions,
    TU trees, 4x4 DST, mode-dependent scans — all vs the oracle."""
    configs = [
        EncoderConfig(width=128, height=64, qp=28, log2_ctb_size=6,
                      split_policy="random",
                      max_transform_hierarchy_depth_intra=2, seed=1,
                      full_mode_search=True),
        EncoderConfig(width=128, height=64, qp=35, log2_ctb_size=5,
                      split_policy="random",
                      max_transform_hierarchy_depth_intra=1, seed=2),
        EncoderConfig(width=96, height=96, qp=22, log2_ctb_size=6,
                      split_policy="random",
                      max_transform_hierarchy_depth_intra=3, seed=3,
                      full_mode_search=True),
        EncoderConfig(width=128, height=64, qp=30, log2_ctb_size=6,
                      split_policy="variance",
                      max_transform_hierarchy_depth_intra=1),
        EncoderConfig(width=128, height=64, qp=30, log2_ctb_size=6,
                      log2_cu_size=4),
    ]
    for i, cfg in enumerate(configs):
        src = ("noise", "gradient", "zoneplate")[i % 3]
        frames = [synth_frame(src, cfg.width, cfg.height, i)]
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
        assert flatten(recons) == oracle, f"config {i} diverged from oracle"


@needs_oracle
def test_oracle_bitexact_loop_filters(tmp_path):
    """Deblocking + SAO (band/edge/merge, random per-CTB params)."""
    for i, (w, h, qp) in enumerate(((64, 64, 33), (96, 48, 30),
                                    (416, 240, 32))):
        cfg = EncoderConfig(width=w, height=h, qp=qp, sao=True,
                            deblocking=True, seed=i)
        frames = [synth_frame("gradient", w, h, t, i) for t in range(2)]
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, w, h, tmp_path)
        assert flatten(recons) == oracle, f"filter config {i} diverged"


@needs_oracle
def test_oracle_bitexact_deblock_only(tmp_path):
    cfg = EncoderConfig(width=128, height=64, qp=35, log2_ctb_size=6,
                        split_policy="random", deblocking=True,
                        max_transform_hierarchy_depth_intra=2, seed=11,
                        full_mode_search=True)
    frames = [synth_frame("noise", 128, 64, 1)]
    stream, recons = encode_decode(cfg, frames)
    assert flatten(recons) == oracle_decode(stream, 128, 64, tmp_path)


def _moving_frames(w, h, n, wobble=0):
    base = synth_frame("gradient", w, h, 0)
    out = []
    for t in range(n):
        y = np.roll(base[0], (t * 3, t * 2), (0, 1))
        if wobble:
            y = np.clip(y.astype(int) + (t % 2) * wobble,
                        0, 255).astype(np.uint8)
        out.append([y, np.roll(base[1], (t, t), (0, 1)),
                    np.roll(base[2], (t, t), (0, 1))])
    return out


def test_roundtrip_ipp():
    cfg = EncoderConfig(width=64, height=48, qp=30, gop="ipp",
                        search_range=3)
    encode_decode(cfg, _moving_frames(64, 48, 4, wobble=6))


@needs_oracle
def test_oracle_bitexact_ipp(tmp_path):
    for i, cfg in enumerate([
        EncoderConfig(width=64, height=48, qp=30, gop="ipp",
                      search_range=3, p_intra_fallback=False),
        EncoderConfig(width=64, height=48, qp=30, gop="ipp",
                      search_range=3),
        EncoderConfig(width=96, height=64, qp=33, gop="ipp",
                      search_range=3, deblocking=True, sao=True),
    ]):
        frames = _moving_frames(cfg.width, cfg.height, 4, wobble=6)
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
        assert flatten(recons) == oracle, f"ipp config {i} diverged"


def _to10(p):
    return ((p.astype(np.uint16) << 2) | (p.astype(np.uint16) >> 6))


@needs_oracle
def test_oracle_bitexact_main10(tmp_path):
    """Main 10: 10-bit intra + IPP + filters vs the oracle."""
    w, h = 64, 48
    base = synth_frame("gradient", w, h, 0)
    frames = []
    for t in range(3):
        frames.append([_to10(np.roll(base[0], (t * 3, t * 2), (0, 1))),
                       _to10(np.roll(base[1], (t, t), (0, 1))),
                       _to10(np.roll(base[2], (t, t), (0, 1)))])
    for i, kw in enumerate([{}, dict(gop="ipp", search_range=3,
                                     deblocking=True, sao=True)]):
        cfg = EncoderConfig(width=w, height=h, qp=30, bit_depth=10, **kw)
        enc = IntraEncoder(cfg)
        stream = bytearray()
        recons = []
        for f in frames:
            stream += enc.encode_frame(f)
            recons.append([p.copy() for p in enc.recon_planes])
        from hevc_tpu.decoder.core import Decoder as D
        assert all(fr.md5_ok for fr in D().decode_bytes(bytes(stream)))
        oracle = oracle_decode(bytes(stream), w, h, tmp_path)
        ours = b"".join(p.astype("<u2").tobytes()
                        for rc in recons for p in rc)
        assert ours == oracle, f"main10 config {i} diverged"


@needs_oracle
def test_oracle_bitexact_wpp_tiles(tmp_path):
    """WPP and tile streams (entry points, CABAC handoff/reinit)."""
    for i, cfg in enumerate([
        EncoderConfig(width=96, height=64, qp=30, wpp=True),
        EncoderConfig(width=96, height=64, qp=30, tiles=(2, 2)),
        EncoderConfig(width=96, height=64, qp=33, wpp=True,
                      deblocking=True, sao=True),
        EncoderConfig(width=96, height=64, qp=33, tiles=(2, 2),
                      deblocking=True, sao=True),
        EncoderConfig(width=96, height=64, qp=30, tiles=(2, 2), gop="ipp",
                      search_range=2),
        EncoderConfig(width=96, height=64, qp=30, wpp=True, gop="ipp",
                      search_range=2, deblocking=True, sao=True),
        EncoderConfig(width=128, height=64, qp=28, log2_ctb_size=5,
                      wpp=True, split_policy="random",
                      max_transform_hierarchy_depth_intra=2, seed=3,
                      full_mode_search=True),
    ]):
        frames = _moving_frames(cfg.width, cfg.height, 3)
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
        assert flatten(recons) == oracle, f"wpp/tiles config {i} diverged"


@needs_oracle
def test_oracle_bitexact_b_slices(tmp_path):
    """Low-delay B: bi-prediction, two lists, inter_pred_idc."""
    for i, cfg in enumerate([
        EncoderConfig(width=96, height=64, qp=30, gop="lowb",
                      search_range=2),
        EncoderConfig(width=96, height=64, qp=31, gop="lowb",
                      search_range=2, deblocking=True, sao=True),
    ]):
        frames = _moving_frames(cfg.width, cfg.height, 4)
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
        assert flatten(recons) == oracle, f"b-slice config {i} diverged"


def test_jax_backend_b_slices():
    from hevc_tpu.decoder.core import Decoder as D
    cfg = EncoderConfig(width=96, height=64, qp=30, gop="lowb",
                        search_range=2, deblocking=True, sao=True)
    frames = _moving_frames(96, 64, 4)
    enc = IntraEncoder(cfg)
    stream = bytearray()
    for f in frames:
        stream += enc.encode_frame(f)
    jx = D(recon_backend="jax").decode_bytes(bytes(stream))
    assert all(f.md5_ok for f in jx)


@needs_oracle
def test_oracle_bitexact_444_and_ts(tmp_path):
    """RExt 4:4:4 chroma + transform_skip vs the oracle."""
    rng = np.random.default_rng(1)
    w, h = 64, 48
    base444 = [rng.integers(40, 220, (h, w)).astype(np.uint8)
               for _ in range(3)]
    for i, (cfg, frames) in enumerate([
        (EncoderConfig(width=w, height=h, qp=30, chroma_format_idc=3),
         [base444]),
        (EncoderConfig(width=w, height=h, qp=30, chroma_format_idc=3,
                       gop="ipp", search_range=2),
         [[np.roll(p, (t * 2, t * 3), (0, 1)) for p in base444]
          for t in range(3)]),
        (EncoderConfig(width=w, height=h, qp=33, chroma_format_idc=3,
                       deblocking=True, sao=True), [base444]),
        (EncoderConfig(width=w, height=h, qp=30, transform_skip=True,
                       split_policy="random",
                       max_transform_hierarchy_depth_intra=2, seed=5,
                       full_mode_search=True),
         [synth_frame("noise", w, h, 0)]),
    ]):
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, w, h, tmp_path)
        assert flatten(recons) == oracle, f"444/ts config {i} diverged"


@needs_oracle
def test_oracle_bitexact_422(tmp_path):
    """RExt 4:2:2: paired square chroma TBs, mode remap, intra + inter."""
    rng = np.random.default_rng(2)
    w, h = 64, 48
    base = [rng.integers(40, 220, (h, w)).astype(np.uint8),
            rng.integers(40, 220, (h, w // 2)).astype(np.uint8),
            rng.integers(40, 220, (h, w // 2)).astype(np.uint8)]
    for i, cfg in enumerate([
        EncoderConfig(width=w, height=h, qp=30, chroma_format_idc=2),
        EncoderConfig(width=w, height=h, qp=30, chroma_format_idc=2,
                      gop="ipp", search_range=2),
        EncoderConfig(width=w, height=h, qp=33, chroma_format_idc=2,
                      deblocking=True, sao=True),
    ]):
        frames = [[np.roll(p, (t * 2, t * 3), (0, 1)) for p in base]
                  for t in range(3)]
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, w, h, tmp_path)
        assert flatten(recons) == oracle, f"422 config {i} diverged"


@needs_oracle
def test_oracle_bitexact_tmvp_and_wp(tmp_path):
    """TMVP (collocated motion) and explicit weighted prediction."""
    for i, cfg in enumerate([
        EncoderConfig(width=96, height=64, qp=30, gop="ipp",
                      search_range=2, tmvp=True),
        EncoderConfig(width=96, height=64, qp=30, gop="lowb",
                      search_range=2, tmvp=True),
        EncoderConfig(width=96, height=64, qp=30, gop="ipp",
                      search_range=2, weighted_pred=True),
        EncoderConfig(width=96, height=64, qp=30, gop="lowb",
                      search_range=2, weighted_pred=True),
    ]):
        frames = _moving_frames(cfg.width, cfg.height, 4, wobble=4)
        stream, recons = encode_decode(cfg, frames)
        oracle = oracle_decode(stream, cfg.width, cfg.height, tmp_path)
        assert flatten(recons) == oracle, f"tmvp/wp config {i} diverged"


@needs_oracle
@pytest.mark.parametrize("wh", [(100, 60), (52, 36)])
def test_oracle_conformance_window(tmp_path, wh):
    """Arbitrary (non-min-CB-multiple) frame sizes: the encoder pads and
    signals a conformance window; decoder output is cropped, matching
    the oracle's cropped YUV (openhevc.c:662-740)."""
    w, h = wh
    frames = [synth_frame("zoneplate", w, h, t) for t in range(3)]
    cfg = EncoderConfig(width=w, height=h, qp=28, log2_ctb_size=5,
                        log2_cu_size=4, gop="ipp", deblocking=True,
                        sao=True, search_range=2)
    enc = IntraEncoder(cfg)
    stream = bytearray()
    ours = bytearray()
    for planes in frames:
        stream += enc.encode_frame(planes)
        for p in enc.output_planes:
            ours += p.astype(np.uint8).tobytes()
    assert enc.sps.width % 8 == 0 and enc.sps.height % 8 == 0
    assert any(enc.sps.conf_win)
    outs = Decoder().decode_bytes(bytes(stream))
    assert all(f.md5_ok for f in outs)
    got = b"".join(p.astype(np.uint8).tobytes()
                   for f in outs for p in f.planes)
    assert got == bytes(ours)
    assert got == oracle_decode(bytes(stream), w, h, tmp_path)


@needs_oracle
def test_oracle_12bit(tmp_path):
    """Main-12-style coding: 12-bit samples through every stage
    (dequant/IDCT shifts, deblock/SAO clip ranges, uint16 output)."""
    w, h = 96, 64
    cfg = EncoderConfig(width=w, height=h, qp=30, log2_ctb_size=5,
                        log2_cu_size=5, seed=3, bit_depth=12,
                        deblocking=True, sao=True)
    enc = IntraEncoder(cfg)
    stream = bytearray()
    for t in range(2):
        f = [(p.astype(np.int32) << 4)
             for p in synth_frame("noise", w, h, t, seed=6)]
        stream += enc.encode_frame(f)
    stream = bytes(stream)
    for backend in ("inline", "jax"):
        frames = Decoder(check_md5=True,
                         recon_backend=backend).decode_bytes(stream)
        assert all(fr.md5_ok for fr in frames), backend
    sfile = str(tmp_path / "t.265")
    open(sfile, "wb").write(stream)
    subprocess.run([ORACLE, "-i", sfile, "-o", str(tmp_path / "o")],
                   capture_output=True, timeout=120, check=False)
    oracle = open(f"{tmp_path}/o_{w}x{h}.yuv", "rb").read()
    frames = Decoder(check_md5=True).decode_bytes(stream)
    ours = b"".join(p.astype("<u2").tobytes()
                    for f in frames for p in f.planes)
    assert oracle == ours
