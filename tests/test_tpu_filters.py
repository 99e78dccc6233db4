"""JAX in-loop filters vs the NumPy references, bit-exact."""
import numpy as np

import jax.numpy as jnp

from hevc_tpu.ops import deblock as DB
from hevc_tpu.ops import sao as SAO
from hevc_tpu.tpu.filters import deblock_jax, sao_plane_jax


def test_deblock_jax_bitexact():
    rng = np.random.default_rng(0)
    for trial in range(6):
        H, W = 64, 96
        y = rng.integers(0, 256, (H, W)).astype(np.int32)
        cb = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
        qp4 = rng.integers(20, 45, (H // 4, W // 4)).astype(np.int32)
        bs_v = (rng.random((H // 4, W // 4)) < 0.7).astype(np.int8) * 2
        bs_h = (rng.random((H // 4, W // 4)) < 0.7).astype(np.int8) * 2
        planes = [y.copy(), cb.copy(), cr.copy()]
        DB.deblock_frame(planes, qp4, bs_v, bs_h, bit_depth=8,
                         beta_offset=0, tc_offset=0)
        jy, jcb, jcr = deblock_jax(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qp4), jnp.asarray(bs_v.astype(np.int32)),
            jnp.asarray(bs_h.astype(np.int32)), 0, 0, 0, 0)
        assert (np.asarray(jy) == planes[0]).all(), f"luma trial {trial}"
        assert (np.asarray(jcb) == planes[1]).all(), f"cb trial {trial}"
        assert (np.asarray(jcr) == planes[2]).all(), f"cr trial {trial}"


def test_deblock_jax_mod8_geometry():
    """Dimensions ≡ 4 (mod 8) carry one more edge than dim//8 - 1 —
    1080p chroma (540 rows) hit this: the final horizontal chroma edge
    (row 536) was silently skipped (round-3 regression)."""
    rng = np.random.default_rng(7)
    # coded sizes are multiples of 8; luma ≡ 8 (mod 16) makes the
    # chroma dimension ≡ 4 (mod 8) — vertically, horizontally, both
    for H, W in ((136, 96), (96, 136), (136, 264)):
        y = rng.integers(0, 256, (H, W)).astype(np.int32)
        cb = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(0, 256, (H // 2, W // 2)).astype(np.int32)
        qp4 = rng.integers(20, 45, (H // 4, W // 4)).astype(np.int32)
        bs_v = np.full((H // 4, W // 4), 2, np.int8)
        bs_h = np.full((H // 4, W // 4), 2, np.int8)
        planes = [y.copy(), cb.copy(), cr.copy()]
        DB.deblock_frame(planes, qp4, bs_v, bs_h, bit_depth=8,
                         beta_offset=0, tc_offset=0)
        jy, jcb, jcr = deblock_jax(
            jnp.asarray(y), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qp4), jnp.asarray(bs_v.astype(np.int32)),
            jnp.asarray(bs_h.astype(np.int32)), 0, 0, 0, 0)
        for name, got, want in (("y", jy, planes[0]),
                                ("cb", jcb, planes[1]),
                                ("cr", jcr, planes[2])):
            assert (np.asarray(got) == want).all(), \
                f"{name} @ {H}x{W}: " \
                f"{(np.asarray(got) != want).sum()} wrong"


def test_sao_jax_bitexact():
    rng = np.random.default_rng(1)
    H, W, CS = 64, 96, 16
    cty, ctx = H // CS, W // CS
    for trial in range(6):
        plane = rng.integers(0, 256, (H, W)).astype(np.int32)
        # random per-CTB params
        sao_map = {}
        type_map = np.zeros((cty, ctx), np.int32)
        band_pos = np.zeros((cty, ctx), np.int32)
        offs4 = np.zeros((cty, ctx, 4), np.int32)
        eo_class = np.zeros((cty, ctx), np.int32)
        for yc in range(cty):
            for xc in range(ctx):
                prm = SAO.SaoParams()
                t = int(rng.integers(0, 3))
                prm.type_idx = [t, 0, 0]
                type_map[yc, xc] = t
                offs = [int(v) for v in rng.integers(-7, 8, 4)]
                prm.offsets[0] = offs
                offs4[yc, xc] = offs
                if t == SAO.SAO_BAND:
                    pos = int(rng.integers(0, 29))
                    prm.band_position[0] = pos
                    band_pos[yc, xc] = pos
                elif t == SAO.SAO_EDGE:
                    ec = int(rng.integers(0, 4))
                    prm.eo_class[0] = ec
                    eo_class[yc, xc] = ec
                sao_map[(xc, yc)] = prm
        planes = [plane.copy(), np.zeros((1, 1), np.int32),
                  np.zeros((1, 1), np.int32)]
        SAO.apply_sao_frame(planes, sao_map, CS, 8, 2, 2)
        out = sao_plane_jax(jnp.asarray(plane), jnp.asarray(type_map),
                            jnp.asarray(band_pos), jnp.asarray(offs4),
                            jnp.asarray(eo_class), 4, 8)
        assert (np.asarray(out) == planes[0]).all(), f"trial {trial}"
