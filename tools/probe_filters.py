"""On-chip A/B probe of filter-kernel formulations (deblock / SAO).

Times the production kernels and candidate restructurings on synthetic
720p/1080p planes with a fori-loop (host dispatch excluded), printing
ms/frame and achieved GB/s vs the minimal traffic (in+out int32).

Run on the real chip:  python tools/probe_filters.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3  # ms


def loop_time(step, args, iters=16):
    """fori-loop timing: excludes per-iter host dispatch."""
    @jax.jit
    def run(*a):
        def body(i, acc):
            return acc + step(i, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))
    run(*args).block_until_ready()
    t0 = time.time()
    run(*args).block_until_ready()
    return (time.time() - t0) / iters * 1e3


def main():
    from hevc_tpu.tpu.filters import deblock_jax, sao_plane_jax

    h, w = 720, 1280
    cs, lg = 64, 6
    cty, ctx = -(-h // cs), -(-w // cs)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (h, w), np.int32))
    cb = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    cr = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2), np.int32))
    qp4 = jnp.asarray(rng.integers(20, 45, (h // 4, w // 4), np.int32))
    bs_v = jnp.asarray(rng.integers(0, 3, (h // 4, w // 4), np.int32))
    bs_h = jnp.asarray(rng.integers(0, 3, (h // 4, w // 4), np.int32))
    st = jnp.asarray(rng.integers(0, 3, (cty, ctx), np.int32))
    sp = jnp.asarray(rng.integers(0, 29, (cty, ctx), np.int32))
    so = jnp.asarray(rng.integers(-7, 8, (cty, ctx, 4), np.int32))
    sc = jnp.asarray(rng.integers(0, 4, (cty, ctx), np.int32))

    mb = h * w * 4 * 2 / 1e6  # luma in+out MB

    t = loop_time(lambda i, p: sao_plane_jax(
        p + i, st, sp, so, sc, lg, 8)[0, 0], (y,))
    print(f"sao_plane_jax 720p luma: {t:.3f} ms  "
          f"{mb / t:.1f} GB/s (in+out)")

    t = loop_time(lambda i, *a: deblock_jax(
        a[0] + i, *a[1:], 0, 0, 0, 0, bd=8)[0][0, 0],
        (y, cb, cr, qp4, bs_v, bs_h))
    mb3 = (h * w + 2 * (h // 2) * (w // 2)) * 4 * 2 / 1e6
    print(f"deblock_jax 720p: {t:.3f} ms  {mb3 / t:.1f} GB/s (in+out)")

    # reference: a pure elementwise roundtrip (the bandwidth ceiling)
    t = loop_time(lambda i, p: (p + i)[0, 0], (y,))
    print(f"elementwise add 720p luma: {t:.4f} ms  {mb / t:.1f} GB/s")

    # reference: one full-plane pad+shift (SAO-style neighbour access)
    def shift_probe(i, p):
        pad = jnp.pad(p + i, 1, mode="edge")
        s = 0
        for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
            s = s + jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))
        return s[0, 0]
    t = loop_time(shift_probe, (y,))
    print(f"4-neighbour shifts 720p: {t:.3f} ms")

    # SAO restructure candidate: single-pass category computation with
    # class-selected neighbours (2 gathered shift pairs via select)
    def sao_v2(i, p):
        plane = p + i
        maxv = 255
        pad = jnp.pad(plane, 1, mode="edge")

        def sh(dy, dx):
            return jax.lax.dynamic_slice(pad, (1 + dy, 1 + dx), (h, w))

        blocks = lambda m: jnp.broadcast_to(
            m[:, None, :, None], (cty, cs, ctx, cs)).reshape(
                cty * cs, ctx * cs)[:h, :w]
        clsm = blocks(sc)
        tmap = blocks(st)
        posm = blocks(sp)
        # class-selected neighbours (4 selects instead of 4 full passes)
        a = jnp.where(clsm == 0, sh(0, -1),
                      jnp.where(clsm == 1, sh(-1, 0),
                                jnp.where(clsm == 2, sh(-1, -1),
                                          sh(1, -1))))
        b = jnp.where(clsm == 0, sh(0, 1),
                      jnp.where(clsm == 1, sh(1, 0),
                                jnp.where(clsm == 2, sh(1, 1),
                                          sh(-1, 1))))
        idx = 2 + jnp.sign(plane - a) + jnp.sign(plane - b)
        cat = jnp.where(idx == 2, 0, jnp.where(idx < 2, idx + 1, idx))
        off = jnp.zeros_like(plane)
        offb = [blocks(so[:, :, k]) for k in range(4)]
        for c in range(4):
            off = off + jnp.where(cat == c + 1, offb[c], 0)
        edge_out = jnp.clip(plane + off, 0, maxv)
        band = plane >> 3
        boff = jnp.zeros_like(plane)
        for k in range(4):
            boff = boff + jnp.where(band == ((posm + k) & 31), offb[k], 0)
        band_out = jnp.clip(plane + boff, 0, maxv)
        out = jnp.where(tmap == 1, band_out,
                        jnp.where(tmap == 2, edge_out, plane))
        return out[0, 0]

    t = loop_time(sao_v2, (y,))
    print(f"sao_v2 (class-selected) 720p luma: {t:.3f} ms  "
          f"{mb / t:.1f} GB/s")


if __name__ == "__main__":
    main()
