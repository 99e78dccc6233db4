"""Device-side SHVC inter-layer upsampling (JAX/XLA), bit-exact.

TPU-first re-design of the reference's SIMD upsamplers (reference:
libavcodec/x86/hevc_il_pred_sse.c): both separable passes become
per-tap shifted multiply-accumulates with per-output-coordinate phase
taps gathered once from 16-entry tables — fully vectorized VPU work,
no per-sample gathers (source columns/rows are selected by a
precomputed index vector, a single gather per tap)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import upsample as U


@partial(jax.jit, static_argnames=("el_h", "el_w", "bl_bd", "el_bd",
                                   "chroma"))
def resample_plane_jax(src, ref_x, ph_x, ref_y, ph_y, el_h, el_w,
                       bl_bd, el_bd, chroma=False):
    """src: int32 [bl_h, bl_w]; ref/ph: precomputed position vectors."""
    taps = jnp.asarray(U.UP_FILTER_CHROMA if chroma else U.UP_FILTER_LUMA)
    ntaps = 4 if chroma else 8
    center = ntaps // 2 - 1
    bl_h, bl_w = src.shape
    shift_up = bl_bd - 8
    n_shift = 20 - el_bd
    tmp = jnp.zeros((bl_h, el_w), jnp.int32)
    tx = taps[ph_x]  # [el_w, ntaps]
    for t in range(ntaps):
        cols = jnp.clip(ref_x + t - center, 0, bl_w - 1)
        tmp = tmp + tx[:, t][None, :] * src[:, cols]
    if shift_up:
        tmp = tmp >> shift_up
    out = jnp.zeros((el_h, el_w), jnp.int32)
    ty = taps[ph_y]
    for t in range(ntaps):
        rows = jnp.clip(ref_y + t - center, 0, bl_h - 1)
        out = out + ty[:, t][:, None] * tmp[rows, :]
    out = (out + (1 << (n_shift - 1))) >> n_shift
    return jnp.clip(out, 0, (1 << el_bd) - 1)


def upsample_frame_jax(bl_planes, el_w, el_h, *, sub_w=2, sub_h=2,
                       bl_bit_depth=8, el_bit_depth=8):
    """Device mirror of ops.upsample.upsample_frame."""
    bl_h, bl_w = bl_planes[0].shape
    sx = U.scale_factor(bl_w, el_w)
    sy = U.scale_factor(bl_h, el_h)
    out = []
    rx, px = U._positions(el_w, sx, U.phase_add(0, sx))
    ry, py = U._positions(el_h, sy, U.phase_add(0, sy))
    out.append(resample_plane_jax(
        jnp.asarray(bl_planes[0], jnp.int32), jnp.asarray(rx),
        jnp.asarray(px), jnp.asarray(ry), jnp.asarray(py),
        el_h, el_w, bl_bit_depth, el_bit_depth, chroma=False))
    ph_v = (4 * el_h + (bl_h >> 1)) // bl_h - 4 if sub_h == 2 else 0
    rxc, pxc = U._positions(el_w // sub_w, sx, U.phase_add(0, sx))
    ryc, pyc = U._positions(el_h // sub_h, sy, U.phase_add(ph_v, sy))
    for c in (1, 2):
        out.append(resample_plane_jax(
            jnp.asarray(bl_planes[c], jnp.int32), jnp.asarray(rxc),
            jnp.asarray(pxc), jnp.asarray(ryc), jnp.asarray(pyc),
            el_h // sub_h, el_w // sub_w, bl_bit_depth, el_bit_depth,
            chroma=True))
    return out
