"""Decompose stage-B MC/resid phase cost on the real chip.

Uses the cached bench bundle (.bench/*.pkl).  Times, per variant, a
jitted 16-iteration on-device fori_loop (same methodology as bench.py):

  interp   — MC interpolation only (windows gathered + filtered, result
             reduced, no canvas write)
  scatter  — current per-element .at[rows,cols].set commit
  gather   — gather-merge commit: flat = concat(blk.ravel()); canvas =
             where(map>=0, flat[map], canvas) with a host-precomputed map
  resid_rd — vmapped dynamic_slice reads of resid bases only
  resid_cur/resid_gather — full resid phase, scatter vs gather-merge
"""
from __future__ import annotations

import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hevc_tpu.tpu.mc import make_mc_group_fn, mc_phase, resid_phase
from hevc_tpu.tpu.recon import _mc_args, _residuals

with open("/root/repo/.bench/ipp_1280x720_qp30_ctb64_filt.pkl", "rb") as f:
    bundles = pickle.load(f)
b = bundles[-1]
pf = b["pf"]
bd = pf.bit_depth
mc_fields, refs_l, refs_c, resid_fields, mc_shapes = _mc_args(pf)
groups = tuple((ic, bi, w, h, f)
               for (ic, bi, w, h), f in zip(mc_shapes, mc_fields))
canvas = jnp.asarray(pf.canvas)
CH, CW = pf.canvas.shape
print("canvas", pf.canvas.shape, "groups:",
      [(k, f.shape[0]) for *k, f in groups],
      "resid:", [g.shape[0] for g in resid_fields])

# ---- host-side maps for gather-merge ---------------------------------
off = 0
mc_map = np.full((CH, CW), -1, np.int64)
for ic, bi, w, h, f in groups:
    fn = np.asarray(f)
    for i in range(fn.shape[0]):
        cy, cx = int(fn[i, -2]), int(fn[i, -1])
        idx = off + i * h * w
        mc_map[cy:cy + h, cx:cx + w] = (
            idx + np.arange(h * w).reshape(h, w))
    off += fn.shape[0] * h * w
mc_total = off
mc_map_j = jnp.asarray(np.maximum(mc_map, 0).astype(np.int32))
mc_keep = jnp.asarray((mc_map >= 0))

roff = 0
r_map = np.full((CH, CW), -1, np.int64)
for c, g in enumerate(resid_fields):
    gn = np.asarray(g)
    s = 4 << c
    for i in range(gn.shape[0]):
        cy, cx = int(gn[i, 0]), int(gn[i, 1])
        r_map[cy:cy + s, cx:cx + s] = (
            roff + i * s * s + np.arange(s * s).reshape(s, s))
    roff += gn.shape[0] * s * s
r_total = roff
r_map_j = jnp.asarray(np.maximum(r_map, 0).astype(np.int32))
r_keep = jnp.asarray((r_map >= 0))

levels = tuple(jnp.asarray(v) for v in pf.levels)
rmeta = tuple(jnp.asarray(v) for v in pf.rmeta)


def interp_only(canvas, i):
    acc = jnp.int32(0)
    for ic, bi, w, h, fields in groups:
        refs = (refs_c if ic else refs_l) + i
        fn = make_mc_group_fn(ic, bi, w, h, bd)
        blk = fn(refs, fields[:, :-2])
        acc = acc + blk.sum()
    return canvas + acc


def mc_cur(canvas, i):
    return mc_phase(canvas + i, refs_l, refs_c, groups, bd)


def mc_gather(canvas, i):
    parts = []
    for ic, bi, w, h, fields in groups:
        refs = (refs_c if ic else refs_l) + i
        fn = make_mc_group_fn(ic, bi, w, h, bd)
        parts.append(fn(refs, fields[:, :-2]).reshape(-1))
    flat = jnp.concatenate(parts)
    return jnp.where(mc_keep, flat[mc_map_j], canvas)


RES = _residuals(levels, rmeta, bd)


def resid_rd(canvas, i):
    acc = jnp.int32(0)
    cv = canvas + i
    for c, fields in enumerate(resid_fields):
        if fields.shape[0] == 0:
            continue
        s = 4 << c
        read = lambda cv, y, x: jax.lax.dynamic_slice(cv, (y, x), (s, s))
        base = jax.vmap(read, in_axes=(None, 0, 0))(
            cv, fields[:, 0], fields[:, 1])
        acc = acc + base.sum()
    return canvas + acc


def resid_cur(canvas, i):
    return resid_phase(canvas + i, resid_fields, RES, bd)


def resid_gather(canvas, i):
    cv = canvas + i
    maxv = (1 << bd) - 1
    parts = []
    for c, fields in enumerate(resid_fields):
        if fields.shape[0] == 0:
            continue
        s = 4 << c
        read = lambda cv, y, x: jax.lax.dynamic_slice(cv, (y, x), (s, s))
        base = jax.vmap(read, in_axes=(None, 0, 0))(
            cv, fields[:, 0], fields[:, 1])
        rec = jnp.clip(base + RES[c][fields[:, 2]], 0, maxv)
        parts.append(rec.reshape(-1))
    if not parts:
        return cv
    flat = jnp.concatenate(parts)
    return jnp.where(r_keep, flat[r_map_j], cv)


def timeit(name, fn):
    @jax.jit
    def loop(canvas):
        def body(i, cv):
            return fn(cv, i)
        return jax.lax.fori_loop(0, 16, body, canvas)

    loop(canvas).block_until_ready()
    t0 = time.time()
    loop(canvas).block_until_ready()
    dt = (time.time() - t0) / 16 * 1000
    print(f"{name:14s} {dt:8.3f} ms/frame")
    return dt


# correctness of gather variants vs current
a = np.asarray(jax.jit(lambda c: mc_phase(c, refs_l, refs_c, groups, bd))(canvas))
g = np.asarray(jax.jit(mc_gather)(canvas, jnp.int32(0)))
assert (a == g).all(), "mc gather mismatch"
ar = np.asarray(jax.jit(lambda c: resid_phase(c, resid_fields, RES, bd))(jnp.asarray(a)))
gr = np.asarray(jax.jit(resid_gather)(jnp.asarray(a), jnp.int32(0)))
assert (ar == gr).all(), "resid gather mismatch"
print("gather variants bit-exact OK")

timeit("interp_only", interp_only)
timeit("mc_cur", mc_cur)
timeit("mc_gather", mc_gather)
timeit("resid_rd", resid_rd)
timeit("resid_cur", resid_cur)
timeit("resid_gather", resid_gather)
