"""Stage-B orchestrator: packed frame → reconstructed planes on device.

Pipeline (all inside one jit):
 1. batched dequant + inverse transform per TU size class (MXU matmuls)
 2. sequential intra predict/add replay over the canvas (lax.scan)

The result is bit-exact with the NumPy stage-B oracle
(decoder.core.execute_plan_numpy); tests enforce this on the CPU backend.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .intra import reconstruct_wavefront
from .pack import PackedFrame, pack_frame
from .transforms import residual_batch


def _residuals(levels, rmeta, bit_depth):
    """Per-class residual batches with a zeros slot prepended.

    rmeta: per class int32 [Nc, 4] = (qp, dst, ts, raw)."""
    out = []
    for c, log2 in enumerate((2, 3, 4, 5)):
        m = rmeta[c]
        r = residual_batch(levels[c], m[:, 0], m[:, 1] != 0, m[:, 2] != 0,
                           log2, bit_depth)
        r = jnp.where((m[:, 3] != 0)[:, None, None], levels[c], r)
        zero = jnp.zeros((1,) + r.shape[1:], r.dtype)
        out.append(jnp.concatenate([zero, r]))
    return tuple(out)


@partial(jax.jit, static_argnames=("bit_depth", "n_chunks"))
def reconstruct_device(canvas, scal, avail, levels, rmeta,
                       bit_depth, n_chunks):
    resids = _residuals(levels, rmeta, bit_depth)
    return reconstruct_wavefront(canvas, scal, avail, resids, bit_depth,
                                 n_chunks)


def run_packed(pf: PackedFrame):
    """Execute a packed frame; returns the reconstructed canvas (np)."""
    canvas = reconstruct_device(
        jnp.asarray(pf.canvas),
        tuple(jnp.asarray(v) for v in pf.scal),
        tuple(jnp.asarray(v) for v in pf.avail),
        tuple(jnp.asarray(v) for v in pf.levels),
        tuple(jnp.asarray(v) for v in pf.rmeta),
        pf.bit_depth, pf.n_chunks)
    return np.asarray(canvas)


def reconstruct_plan_jax(pic, plan) -> None:
    """Decoder hook: reconstruct a frame's plan on device into pic.planes."""
    pf = pack_frame(pic, plan)
    canvas = run_packed(pf)
    for plane, (oy, ox, h, w) in pf.region.items():
        pic.planes[plane][:] = canvas[oy:oy + h, ox:ox + w].astype(
            pic.planes[plane].dtype)
