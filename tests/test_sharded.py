"""Tile-sharded deblock+SAO with halo exchange == single-device result.

The multi-chip analogue of the reference's thread-config bit-exactness
check (SURVEY.md §4 point 4): the same frame filtered under every
sharding layout must be bit-identical to the 1-device result.  Runs on
the virtual 8-device CPU mesh from conftest.py.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp
from jax.sharding import Mesh

from hevc_tpu.tpu.filters import deblock_jax, sao_plane_jax
from hevc_tpu.tpu.sharded import filter_frame_sharded


def _random_frame(rng, w, h, bd=8, sub=2):
    maxv = (1 << bd) - 1
    y = rng.integers(0, maxv + 1, (h, w), np.int32)
    cb = rng.integers(0, maxv + 1, (h // sub, w // sub), np.int32)
    cr = rng.integers(0, maxv + 1, (h // sub, w // sub), np.int32)
    qp4 = rng.integers(20, 45, (h // 4, w // 4), np.int32)
    bs_v = rng.integers(0, 3, (h // 4, w // 4), np.int32)
    bs_h = rng.integers(0, 3, (h // 4, w // 4), np.int32)
    bs_v[:, 0] = 0   # picture-boundary edges carry bs=0
    bs_h[0, :] = 0
    return y, cb, cr, qp4, bs_v, bs_h


def _random_sao(rng, w, h, ctb_log2=6):
    cty, ctx = h >> ctb_log2, w >> ctb_log2
    st, sp, so, sc = [], [], [], []
    for p in range(3):
        st.append(rng.integers(0, 3, (cty, ctx), np.int32))
        sp.append(rng.integers(0, 29, (cty, ctx), np.int32))
        so.append(rng.integers(-7, 8, (cty, ctx, 4), np.int32))
        sc.append(rng.integers(0, 4, (cty, ctx), np.int32))
    return tuple(st), tuple(sp), tuple(so), tuple(sc)


@pytest.mark.parametrize("n_shards", [2, 4, 8])
@pytest.mark.parametrize("bd,sub", [(8, 2), (10, 2), (8, 1)])
def test_sharded_filters_bit_exact(n_shards, bd, sub):
    w, h, ctb_log2 = 512, 128, 6
    rng = np.random.default_rng(7 * n_shards + bd + sub)
    y, cb, cr, qp4, bs_v, bs_h = _random_frame(rng, w, h, bd, sub)
    st, sp, so, sc = _random_sao(rng, w, h, ctb_log2)
    beta_off, tc_off, cb_off, cr_off = 0, 0, 1, -1

    # single-device reference
    ry, rcb, rcr = deblock_jax(jnp.asarray(y), jnp.asarray(cb),
                               jnp.asarray(cr), jnp.asarray(qp4),
                               jnp.asarray(bs_v), jnp.asarray(bs_h),
                               beta_off, tc_off, cb_off, cr_off,
                               bd=bd, sub_w=sub, sub_h=sub)
    ref = []
    for i, p in enumerate((ry, rcb, rcr)):
        lg = ctb_log2 - (0 if i == 0 else (sub.bit_length() - 1))
        ref.append(np.asarray(sao_plane_jax(p, jnp.asarray(st[i]),
                                            jnp.asarray(sp[i]),
                                            jnp.asarray(so[i]),
                                            jnp.asarray(sc[i]), lg, bd)))

    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if len(devs) < n_shards:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(devs[:n_shards]), ("tile",))
    gy, gcb, gcr = filter_frame_sharded(
        mesh, y, cb, cr, qp4, bs_v, bs_h, beta_off, tc_off, cb_off,
        cr_off, st, sp, so, sc, bit_depth=bd, ctb_log2=ctb_log2,
        sub_w=sub, sub_h=sub)
    for got, want in zip((gy, gcb, gcr), ref):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_sharded_deblock_only():
    w, h = 256, 64
    rng = np.random.default_rng(3)
    y, cb, cr, qp4, bs_v, bs_h = _random_frame(rng, w, h)
    ry, rcb, rcr = deblock_jax(jnp.asarray(y), jnp.asarray(cb),
                               jnp.asarray(cr), jnp.asarray(qp4),
                               jnp.asarray(bs_v), jnp.asarray(bs_h),
                               2, -2, 0, 0, bd=8, sub_w=2, sub_h=2)
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("not enough devices")
    mesh = Mesh(np.array(devs[:4]), ("tile",))
    z = tuple(np.zeros((h >> 6 or 1, w >> 6, *(4,) * (i == 2)), np.int32)
              for i in range(3))
    gy, gcb, gcr = filter_frame_sharded(
        mesh, y, cb, cr, qp4, bs_v, bs_h, 2, -2, 0, 0,
        (z[0],) * 3, (z[0],) * 3, (z[2],) * 3, (z[0],) * 3,
        bit_depth=8, ctb_log2=6, do_sao=False)
    for got, want in zip((gy, gcb, gcr), (ry, rcb, rcr)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
