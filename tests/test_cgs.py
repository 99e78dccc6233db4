"""CGS colour-gamut scalability tests.

Covers: 3D-LUT write->parse round-trip (octant split tree, vertex
residual prediction), colour-mapped SHVC decode self-consistency on all
backends, and bit-exactness of the EL output against the openHEVC
oracle decoding the same CGS stream (reference: hevc_ps.c:2791
xParse3DAsymLUT, hevcdsp_template.c:4511 map_color_block,
hevcdec.c:3627-3629 / hevc_filter.c:2077 CGS driver)."""
import os
import subprocess

import numpy as np
import pytest

from hevc_tpu.bitstream.bits import BitReader, BitWriter
from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig
from hevc_tpu.encoder.generate import synth_frame
from hevc_tpu.encoder.shvc import ShvcEncoder
from hevc_tpu.ops.cgs import (CgsLut, color_map_frame, parse_cgs_lut,
                              write_cgs_lut)

ORACLE = "/root/repo/.oracle/build/hevc_nodisplay"
needs_oracle = pytest.mark.skipif(not os.path.exists(ORACLE),
                                  reason="oracle binary not built")

# a non-trivial LUT: slight gain change + DC offsets, different per
# octant half (u threshold), exercising vertex prediction across y
DELTAS1 = {
    (0, 0, 0, 0): (-3, 0, 1),
    (0, 0, 0, 3): (2, -1, 0),
    (0, 1, 0, 1): (4, 2, -2),
    (1, 0, 1, 2): (-2, 3, 1),
    (1, 1, 1, 3): (1, 1, 1),
}


def lut_depth1():
    return CgsLut(octant_depth=1, y_part_num_log2=1, res_quant_bit=1,
                  flc_bits=2, adapt_threshold_u_delta=5,
                  adapt_threshold_v_delta=-3)


def test_lut_roundtrip():
    w = BitWriter()
    cgs = lut_depth1()
    write_cgs_lut(w, cgs, deltas=DELTAS1)
    w.align_zero()
    r = BitReader(w.getvalue())
    got = parse_cgs_lut(r)
    assert got.octant_depth == 1 and got.y_part_num_log2 == 1
    assert got.adapt_threshold_u == 128 + 5
    assert got.adapt_threshold_v == 128 - 3
    assert (got.lut == cgs.lut).all()
    # the y=0 residual propagates up the y axis via vertex prediction
    assert cgs.lut[2, 0, 0, 0, 0] == 1024 - (3 << 1)
    # untouched vertex keeps the identity seed
    assert cgs.lut[3, 0, 0, 1, 1] == 1024


def test_lut_roundtrip_split():
    w = BitWriter()
    cgs = CgsLut(octant_depth=2, y_part_num_log2=0, res_quant_bit=0,
                 flc_bits=3)
    deltas = {(0, 0, 0, 0): (7, 0, 0), (2, 1, 0, 2): (0, -5, 0),
              (3, 3, 3, 3): (0, 0, 9)}
    splits = {(0, 0, 0, 0), (1, 2, 0, 0)}
    write_cgs_lut(w, cgs, splits=splits, deltas=deltas)
    w.align_zero()
    got = parse_cgs_lut(BitReader(w.getvalue()))
    assert (got.lut == cgs.lut).all()


def test_color_map_identity():
    """All-zero deltas = the identity LUT (vertex prediction seeds
    P[c].comp = 1024 on the matching component)."""
    cgs = CgsLut(octant_depth=1, y_part_num_log2=1)
    w = BitWriter()
    write_cgs_lut(w, cgs)
    rng = np.random.default_rng(7)
    y = rng.integers(0, 256, (16, 16), np.int32)
    u = rng.integers(0, 256, (8, 8), np.int32)
    v = rng.integers(0, 256, (8, 8), np.int32)
    out = color_map_frame(cgs, [y, u, v])
    assert (out[0] == y).all()
    assert (out[1] == u).all()
    assert (out[2] == v).all()


def encode_cgs(n_frames=3, deltas=DELTAS1, bl_wh=(64, 64),
               el_wh=(128, 128), el_kw=None):
    bl_cfg = EncoderConfig(width=bl_wh[0], height=bl_wh[1], qp=30,
                           log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                           search_range=2, seed=3)
    el_cfg = EncoderConfig(width=el_wh[0], height=el_wh[1], qp=30,
                           log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                           search_range=2, seed=4, **(el_kw or {}))
    enc = ShvcEncoder(bl_cfg, el_cfg, cgs=lut_depth1(),
                      cgs_deltas=deltas)
    bl_base = synth_frame("gradient", bl_cfg.width, bl_cfg.height, 0)
    el_base = synth_frame("zoneplate", el_cfg.width, el_cfg.height, 0)
    stream = bytearray()
    recons = []
    for t in range(n_frames):
        bl = [np.roll(p, (t * 2, t * 3), (0, 1)) for p in bl_base]
        el = [np.roll(p, (t * 4, t * 6), (0, 1)) for p in el_base]
        stream += enc.encode_frame(bl, el)
        recons.append(([p.copy() for p in enc.bl.recon_planes],
                       [p.copy() for p in enc.el.recon_planes]))
    return bytes(stream), recons


def check_backend(stream, recons, backend):
    frames = Decoder(recon_backend=backend).decode_bytes(stream)
    assert len(frames) == 2 * len(recons)
    for f in frames:
        assert f.md5_ok, \
            f"hash mismatch layer {f.layer} poc {f.poc} [{backend}]"
        ref = recons[f.poc][f.layer]
        for a, b in zip(f.planes, ref):
            assert (np.asarray(a) == b).all()


def test_cgs_roundtrip_all_backends():
    stream, recons = encode_cgs()
    for backend in ("inline", "plan", "jax"):
        check_backend(stream, recons, backend)


def test_cgs_snr_roundtrip():
    """SNR scalability (same size) with colour mapping only."""
    stream, recons = encode_cgs(bl_wh=(64, 64), el_wh=(64, 64))
    check_backend(stream, recons, "inline")


@needs_oracle
def test_cgs_vs_oracle(tmp_path):
    stream, recons = encode_cgs()
    sfile = str(tmp_path / "cgs.265")
    ofile = str(tmp_path / "o")
    with open(sfile, "wb") as f:
        f.write(stream)
    r = subprocess.run([ORACLE, "-l", "1", "-i", sfile, "-o", ofile],
                       capture_output=True, timeout=120, check=False,
                       text=True)
    out = open(f"{ofile}_128x128.yuv", "rb").read()
    ours = bytearray()
    for rec in recons:
        for p in rec[1]:
            ours += p.astype(np.uint8).tobytes()
    assert out == bytes(ours), "oracle EL output differs"
    assert "Incorrect MD5" not in (r.stdout + r.stderr)


def test_cgs_device_kernel_matches_oracle():
    """Device colour-mapping kernel vs the NumPy oracle across octant
    depths (reference: hevcdsp_template.c:4511)."""
    from hevc_tpu.tpu.upsample import color_map_frame_jax
    for depth, ypl in ((1, 1), (0, 2), (2, 0)):
        cgs = CgsLut(octant_depth=depth, y_part_num_log2=ypl,
                     res_quant_bit=1, flc_bits=2,
                     adapt_threshold_u_delta=5)
        w = BitWriter()
        write_cgs_lut(w, cgs, deltas=DELTAS1)
        rng = np.random.default_rng(depth * 3 + ypl)
        y = rng.integers(0, 256, (32, 48), np.int32)
        u = rng.integers(0, 256, (16, 24), np.int32)
        v = rng.integers(0, 256, (16, 24), np.int32)
        want = color_map_frame(cgs, [y, u, v])
        got = color_map_frame_jax(cgs, [y, u, v])
        for a, b in zip(got, want):
            assert (np.asarray(a) == b).all(), (depth, ypl)
