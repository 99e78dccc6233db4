"""Device-side motion compensation (JAX/XLA), bit-exact.

Stage-B replacement for the reference's qpel/epel SIMD kernel grid
(reference: libavcodec/hevcdsp_template.c:2359-3375, x86/hevc_mc.asm) —
TPU-first: all PBs of one (plane-kind, w, h) group across a frame are
vmapped; interpolation runs as a unified two-stage separable filter
(full-pel positions use a unit tap, which reproduces the spec's shift
algebra exactly), reads come from replication-padded reference stacks
via dynamic_slice, and each group commits with one scatter.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import mc as M

# unified tap tables: row 0 = unit (full-pel)
QPEL_TAPS = np.zeros((4, 8), np.int32)
QPEL_TAPS[0, 3] = 64
for f in (1, 2, 3):
    QPEL_TAPS[f] = M.QPEL_FILTERS[f]
EPEL_TAPS = np.zeros((8, 4), np.int32)
EPEL_TAPS[0, 1] = 64
for f in range(1, 8):
    EPEL_TAPS[f] = M.EPEL_FILTERS[f]


def _interp_one(win, th, tv, w, h, ntaps, bd):
    """win: [h+ntaps-1, w+ntaps-1] int32; th/tv: [ntaps] taps."""
    shift1 = bd - 8
    tmp = jnp.zeros((h + ntaps - 1, w), jnp.int32)
    for i in range(ntaps):
        tmp = tmp + th[i] * win[:, i:i + w]
    tmp = tmp >> shift1 if shift1 else tmp
    out = jnp.zeros((h, w), jnp.int32)
    for i in range(ntaps):
        out = out + tv[i] * tmp[i:i + h, :]
    out = out >> 6
    # default uni weighted prediction (8.5.4.3.2)
    shift = 14 - bd
    return jnp.clip((out + (1 << (shift - 1))) >> shift, 0, (1 << bd) - 1)


def make_mc_group_fn(is_chroma: bool, w: int, h: int, bd: int):
    """Build the vmapped MC for one (kind, w, h) group.

    Record fields (int32): ref_sel, base_y, base_x (padded-ref coords of
    the window origin), frac_x, frac_y, cy, cx (canvas target)."""
    ntaps = 4 if is_chroma else 8
    taps = jnp.asarray(EPEL_TAPS if is_chroma else QPEL_TAPS)

    def one(refs, ref_sel, by, bx, fx, fy):
        win = jax.lax.dynamic_slice(
            refs, (ref_sel, by, bx), (1, h + ntaps - 1, w + ntaps - 1))[0]
        return _interp_one(win, taps[fx], taps[fy], w, h, ntaps, bd)

    return jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0))


def mc_phase(canvas, refs_l, refs_c, groups, bd):
    """Apply all MC predictions.  groups: tuple of
    (is_chroma, w, h, fields) with fields int32 [N, 7]."""
    for is_chroma, w, h, fields in groups:
        refs = refs_c if is_chroma else refs_l
        fn = make_mc_group_fn(is_chroma, w, h, bd)
        blk = fn(refs, fields[:, 0], fields[:, 1], fields[:, 2],
                 fields[:, 3], fields[:, 4])
        cy, cx = fields[:, 5], fields[:, 6]
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2)
        canvas = canvas.at[cy[:, None, None] + ii,
                           cx[:, None, None] + jj].set(blk, mode="drop")
    return canvas


def resid_phase(canvas, groups, resids, bd):
    """Add inter residuals onto the canvas.  groups: tuple per size class
    of int32 [N, 3] = (cy, cx, slot); resids: per-class pools."""
    maxv = (1 << bd) - 1
    for c, fields in enumerate(groups):
        if fields.shape[0] == 0:
            continue
        s = 4 << c
        cy, cx, slot = fields[:, 0], fields[:, 1], fields[:, 2]

        def read(canvas, y, x):
            return jax.lax.dynamic_slice(canvas, (y, x), (s, s))

        base = jax.vmap(read, in_axes=(None, 0, 0))(canvas, cy, cx)
        rec = jnp.clip(base + resids[c][slot], 0, maxv)
        ii = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
        canvas = canvas.at[cy[:, None, None] + ii,
                           cx[:, None, None] + jj].set(rec, mode="drop")
    return canvas
