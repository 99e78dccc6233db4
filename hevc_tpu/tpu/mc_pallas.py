"""Pallas TPU kernels for the inter path: MC interpolation + residual add.

Why Pallas: the XLA formulation (vmapped dynamic_slice + scatter,
hevc_tpu/tpu/mc.py) costs ~2.6 us per gathered window on TPU — two
orders of magnitude off HBM speed-of-light for the ~20 MB actually
moved per frame.  Mosaic DMA requires tile-aligned (8 sublane / 128
lane) slice offsets and shapes, so the kernels here work on aligned
*superwindows* and place blocks with dynamic rotates:

  - the frame canvas lives in a VMEM scratch for the whole kernel
    (DMA'd in once, out once); block read-modify-writes are synchronous
    vector ops, so overlapping covering tiles of neighbouring blocks
    need no ordering protocol;
  - per block, an aligned (sel, by&~7, bx&~127) superwindow is DMA'd
    from the padded reference stack (double-buffered, NBUF in flight);
  - the 8/4-tap separable filter runs on all 256 lanes; dynamic
    row/lane rotates move the result from its window offset to its
    canvas offset; an iota mask blends exactly the block's pixels;
  - per-block scalar metadata is streamed HBM->SMEM in CHUNK-sized
    slabs (scalar-prefetch SMEM is capped at ~12 KB, too small for a
    frame's worth of fields).

This replaces the reference's qpel/epel SIMD grid
(libavcodec/hevcdsp_template.c:2359-3375, x86/hevc_mc.asm) and the
transform_add loop (hevcdsp_template.c:55) on the TPU.  Bit-exactness
vs the XLA path (and transitively the openHEVC oracle) is enforced by
interpret-mode tests and re-checked on hardware by bench.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mc import EPEL_TAPS, QPEL_TAPS

NBUF = 4      # reference-window DMAs in flight
VMEM_LIMIT = 100 * 1024 * 1024  # scoped VMEM cap (v5e has 128 MiB);
# the frame canvas lives in VMEM for the whole kernel, which exceeds
# the 16 MiB default at 4K (54.5 MB canvas)
CHUNK = 256   # per-block field records per SMEM slab
LANES = 256   # superwindow / covering width (two 128-lane tiles)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# field-row layout (transposed [F, Npad] so slab DMA slices lanes)
# uni MC:  sel, by0, ry, bx0, rx, fx, fy, covy, py, covx, px
# bi MC :  two (sel, by0, ry, bx0, rx, fx, fy) tuples, covy, py, covx, px
# resid :  slot, covy, py, covx, px


def _split_mc_fields(fields, bi, wp=False):
    """[N, 7|12 (+5 wp)] device-layout fields -> transposed
    aligned-split rows (wp appends w0, o0, w1, o1, log2wd)."""
    f = np.asarray(fields)
    npred = 2 if bi else 1
    rows = []
    for p in range(npred):
        sel, by, bx = f[:, 5 * p + 0], f[:, 5 * p + 1], f[:, 5 * p + 2]
        fx, fy = f[:, 5 * p + 3], f[:, 5 * p + 4]
        rows += [sel, by & ~7, by & 7, bx & ~127, bx & 127, fx, fy]
    cy, cx = f[:, npred * 5], f[:, npred * 5 + 1]
    rows += [cy & ~7, cy & 7, cx & ~127, cx & 127]
    if wp:
        b = npred * 5 + 2
        rows += [f[:, b], f[:, b + 1], f[:, b + 2], f[:, b + 3],
                 f[:, b + 4]]
    return np.stack(rows).astype(np.int32)


def _split_resid_fields(fields, s):
    """(cy, cx, slot) rows -> [row, covy, py, covx, px, off]: the pool
    is lane-packed k = 128 // s blocks per row (pack_resid_pool), so a
    block lives at pool[slot // k, :, off:off + s], off = (slot % k)*s."""
    f = np.asarray(fields)
    k = 128 // s
    cy, cx, slot = f[:, 0], f[:, 1], f[:, 2]
    return np.stack([slot // k, cy & ~7, cy & 7,
                     cx & ~127, cx & 127, (slot % k) * s]).astype(np.int32)


def _pad_ft(ft):
    """Pad transposed fields to [8k rows, CHUNKk lanes] for slab DMA."""
    fr = _round_up(ft.shape[0], 8)
    nc = _round_up(max(ft.shape[1], 1), CHUNK)
    out = np.zeros((fr, nc), np.int32)
    out[:ft.shape[0], :ft.shape[1]] = ft
    return out


def _slab_machinery(ft_hbm, fsm, fsems, i, n):
    """Stream fields slabs HBM->SMEM, double buffered.

    Returns F(j, k): scalar field k of block j (valid for j in
    [i, i+NBUF] under the pipeline discipline)."""
    frows = fsm.shape[1]

    def slab_dma(c, slot):
        off = pl.multiple_of(c * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            ft_hbm.at[:, pl.ds(off, CHUNK)], fsm.at[slot], fsems.at[slot])

    @pl.when(i == 0)
    def _():
        slab_dma(0, 0).start()
        slab_dma(0, 0).wait()
        @pl.when(n > CHUNK)
        def _():
            slab_dma(1, 1).start()

    c = i // CHUNK

    @pl.when(jnp.logical_and(i % CHUNK == 0,
                             jnp.logical_and(i > 0, i + CHUNK < n)))
    def _():
        slab_dma(c + 1, (c + 1) % 2).start()

    @pl.when(jnp.logical_and(i % CHUNK == CHUNK - NBUF, i + NBUF < n))
    def _():
        slab_dma(c + 1, (c + 1) % 2).wait()

    def F(j, k):
        return fsm[(j // CHUNK) % 2, k, j % CHUNK]

    return F


def _hint(v, m):
    return pl.multiple_of(v, m)


def _filter_placed(buf, taps_ref, fx, fy, ry, py, rx, px,
                   w, h, ntaps, covh, bd):
    """Filter the superwindow and return the block *placed* at
    (py, px) inside a [covh, LANES] grid (14-bit predSamples >> done).

    buf: [WH, LANES] int32; the window starts at (ry, rx)."""
    shift1 = bd - 8
    tmp = taps_ref[fx, 0] * buf
    for t in range(1, ntaps):
        tmp = tmp + taps_ref[fx, t] * pltpu.roll(buf, LANES - t, axis=1)
    if shift1:
        tmp = tmp >> shift1
    # align rows: row p of tmp2 == source row ry + (p - py)
    tmp2 = pltpu.roll(tmp, py - ry + buf.shape[0], axis=0)
    out = taps_ref[fy, 0] * tmp2
    for t in range(1, ntaps):
        out = out + taps_ref[fy, t] * pltpu.roll(tmp2, buf.shape[0] - t, axis=0)
    out = out[:covh] >> 6
    # align lanes: window lane rx -> canvas lane px
    return pltpu.roll(out, px - rx + LANES, axis=1)


def _mc_kernel(ft, refs, canvas_in, taps_ref, canvas_out,
               cvs, bufs, fsm, fsems, wsems, csem,
               *, bi, wp, w, h, ntaps, bd, wh, covh):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    npred = 2 if bi else 1

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(canvas_in, cvs, csem)
        cp.start()
        cp.wait()

    F = _slab_machinery(ft, fsm, fsems, i, n)

    def win_dma(j, p, slot):
        return pltpu.make_async_copy(
            refs.at[F(j, 7 * p + 0),
                    pl.ds(_hint(F(j, 7 * p + 1), 8), wh),
                    pl.ds(_hint(F(j, 7 * p + 3), 128), LANES)],
            bufs.at[slot, p], wsems.at[slot, p])

    @pl.when(i == 0)
    def _():
        for k in range(NBUF):
            @pl.when(k < n)
            def _():
                for p in range(npred):
                    win_dma(k, p, k).start()

    slot = jax.lax.rem(i, NBUF)
    for p in range(npred):
        win_dma(i, p, slot).wait()

    cb = npred * 7  # index of covy row
    py, px = F(i, cb + 1), F(i, cb + 3)
    maxv = (1 << bd) - 1
    if bi:
        p0 = _filter_placed(bufs[slot, 0], taps_ref, F(i, 5), F(i, 6),
                            F(i, 2), py, F(i, 4), px, w, h, ntaps, covh, bd)
        p1 = _filter_placed(bufs[slot, 1], taps_ref, F(i, 12), F(i, 13),
                            F(i, 9), py, F(i, 11), px, w, h, ntaps, covh,
                            bd)
        if wp:
            # explicit bi weighting (8.5.4.3.3)
            w0, o0 = F(i, cb + 4), F(i, cb + 5)
            w1, o1 = F(i, cb + 6), F(i, cb + 7)
            lwd = F(i, cb + 8)
            val = jnp.clip(
                (p0 * w0 + p1 * w1 + ((o0 + o1 + 1) << lwd))
                >> (lwd + 1), 0, maxv)
        else:
            shift = 15 - bd
            val = jnp.clip((p0 + p1 + (1 << (shift - 1))) >> shift,
                           0, maxv)
    else:
        p0 = _filter_placed(bufs[slot, 0], taps_ref, F(i, 5), F(i, 6),
                            F(i, 2), py, F(i, 4), px, w, h, ntaps, covh, bd)
        if wp:
            # explicit uni weighting (8.5.4.3.2)
            w0, o0 = F(i, cb + 4), F(i, cb + 5)
            lwd = F(i, cb + 8)
            rnd = 1 << jnp.maximum(lwd - 1, 0)
            val = jnp.where(lwd >= 1,
                            ((p0 * w0 + rnd) >> lwd) + o0,
                            p0 * w0 + o0)
            val = jnp.clip(val, 0, maxv)
        else:
            shift = 14 - bd
            val = jnp.clip((p0 + (1 << (shift - 1))) >> shift, 0, maxv)

    # blend the block's pixels into the canvas covering region
    covy = _hint(F(i, cb + 0), 8)
    covx = _hint(F(i, cb + 2), 128)
    rows = jax.lax.broadcasted_iota(jnp.int32, (covh, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (covh, LANES), 1)
    mask = ((rows >= py) & (rows < py + h)
            & (lanes >= px) & (lanes < px + w))
    cov = cvs[pl.ds(covy, covh), pl.ds(covx, LANES)]
    cvs[pl.ds(covy, covh), pl.ds(covx, LANES)] = jnp.where(mask, val, cov)

    @pl.when(i + NBUF < n)
    def _():
        for p in range(npred):
            win_dma(i + NBUF, p, slot).start()

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(cvs, canvas_out, csem)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("n", "bi", "wp", "w", "h",
                                             "is_chroma", "bd", "interpret"))
def _mc_group_pallas(canvas, refs, ft_arr, *, n, is_chroma, bi, w, h, bd,
                     wp=False, interpret=False):
    ntaps = 4 if is_chroma else 8
    taps = jnp.asarray(EPEL_TAPS if is_chroma else QPEL_TAPS)
    npred = 2 if bi else 1
    wh = _round_up(7 + h + ntaps - 1, 8)
    covh = _round_up(7 + h, 8)
    kern = functools.partial(_mc_kernel, bi=bi, wp=wp, w=w, h=h,
                             ntaps=ntaps, bd=bd, wh=wh, covh=covh)
    frows = ft_arr.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # fields (transposed)
            pl.BlockSpec(memory_space=pltpu.HBM),   # refs
            pl.BlockSpec(memory_space=pltpu.HBM),   # canvas (aliased)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # taps
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM(canvas.shape, jnp.int32),            # cvs
            pltpu.VMEM((NBUF, npred, wh, LANES), jnp.int32),  # bufs
            pltpu.SMEM((2, frows, CHUNK), jnp.int32),       # fsm
            pltpu.SemaphoreType.DMA((2,)),                  # fsems
            pltpu.SemaphoreType.DMA((NBUF, npred)),         # wsems
            pltpu.SemaphoreType.DMA(()),                    # csem
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(ft_arr, refs, canvas, taps)


class _FT:
    """Transposed, slab-padded field array + true block count."""

    def __init__(self, arr, n):
        self.arr = jnp.asarray(arr)
        self.n = n


def prepare_mc_fields(mc_groups):
    """Host-side: device-layout groups -> pallas field structs."""
    out = []
    for is_chroma, bi, wp, w, h, fields in mc_groups:
        ft = _pad_ft(_split_mc_fields(fields, bi, wp))
        out.append((is_chroma, bi, wp, w, h, _FT(ft, fields.shape[0])))
    return tuple(out)


def prepare_resid_fields(resid_groups):
    out = []
    for c, fields in enumerate(resid_groups):
        ft = _pad_ft(_split_resid_fields(fields, 4 << c)) \
            if fields.shape[0] else np.zeros((8, CHUNK), np.int32)
        out.append(_FT(ft, fields.shape[0]))
    return tuple(out)


def pad_refs(refs):
    """Zero-pad reference stacks so aligned superwindows stay in
    bounds: rows to 8k + 48 slack, lanes to 128k + 256 slack."""
    r, hp, wp = refs.shape
    nh = _round_up(hp, 8) + 48
    nw = _round_up(wp, 128) + LANES
    return jnp.pad(refs, ((0, 0), (0, nh - hp), (0, nw - wp)))


def pad_canvas(canvas):
    """Pad canvas to [8k + 48, 128k + 256] so covering regions of any
    in-frame block stay in bounds.  Returns (padded, orig_shape)."""
    ch, cw = canvas.shape
    nh = _round_up(ch, 8) + 48
    nw = _round_up(cw, 128) + LANES
    return jnp.pad(canvas, ((0, nh - ch), (0, nw - cw)))


def mc_phase_pallas(canvas, refs_l, refs_c, groups, bd, interpret=False):
    """groups: from prepare_mc_fields; canvas/refs already padded."""
    for is_chroma, bi, wp, w, h, ft in groups:
        if ft.n == 0:
            continue
        refs = refs_c if is_chroma else refs_l
        canvas = _mc_group_pallas(canvas, refs, ft.arr, n=ft.n,
                                  is_chroma=is_chroma, bi=bi, wp=wp,
                                  w=w, h=h, bd=bd, interpret=interpret)
    return canvas


# ---------------------------------------------------------------------------
# residual add (read-modify-write of disjoint canvas blocks)
# ---------------------------------------------------------------------------

def _resid_kernel(ft, pool, canvas_in, canvas_out,
                  cvs, bufs, place, fsm, fsems, rsems, csem, *, s, sp, bd):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(canvas_in, cvs, csem)
        cp.start()
        cp.wait()

    F = _slab_machinery(ft, fsm, fsems, i, n)

    # pool is lane-packed [ceil(N/k), s, 128] (pack_resid_pool): DMA
    # lane dims stay 128-aligned with no per-block padding; the block
    # sits at lanes off..off+s of its row and the placement roll
    # compensates.  Stale lanes outside the blend mask are ignored, so
    # no zero-fill is needed.
    def r_dma(j, slot):
        return pltpu.make_async_copy(
            pool.at[F(j, 0)], bufs.at[slot], rsems.at[slot])

    @pl.when(i == 0)
    def _():
        for k in range(NBUF):
            @pl.when(k < n)
            def _():
                r_dma(k, k).start()

    slot = jax.lax.rem(i, NBUF)
    r_dma(i, slot).wait()

    py, px = F(i, 2), F(i, 4)
    covy = _hint(F(i, 1), 8)
    covx = _hint(F(i, 3), 128)
    maxv = (1 << bd) - 1
    place[pl.ds(0, max(s, 8)), pl.ds(0, 128)] = bufs[slot]
    res = place[...]            # [sp, LANES], block at (0, off)
    res = pltpu.roll(res, py, axis=0)
    res = pltpu.roll(res, px - F(i, 5) + LANES, axis=1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (sp, LANES), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (sp, LANES), 1)
    mask = ((rows >= py) & (rows < py + s)
            & (lanes >= px) & (lanes < px + s))
    cov = cvs[pl.ds(covy, sp), pl.ds(covx, LANES)]
    cvs[pl.ds(covy, sp), pl.ds(covx, LANES)] = jnp.where(
        mask, jnp.clip(cov + res, 0, maxv), cov)

    @pl.when(i + NBUF < n)
    def _():
        r_dma(i + NBUF, slot).start()

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(cvs, canvas_out, csem)
        cp.start()
        cp.wait()


def pack_resid_pool(pool, s):
    """[N, s, s] pool -> lane-packed [ceil(N/k), max(s,8), 128] with
    k = 128 // s blocks per row (XLA fuses the transpose into the
    producer: measured +0.45 ms/frame vs +13 ms for a scatter plane)."""
    k = 128 // s
    N = pool.shape[0]
    nr = -(-max(N, 1) // k)
    p = jnp.pad(pool, ((0, nr * k - N), (0, 0), (0, 0)))
    p = p.reshape(nr, k, s, s).transpose(0, 2, 1, 3).reshape(nr, s, 128)
    if s < 8:
        p = jnp.pad(p, ((0, 0), (0, 8 - s), (0, 0)))
    return p


@functools.partial(jax.jit, static_argnames=("n", "s", "bd", "interpret"))
def _resid_class_pallas(canvas, ft_arr, pool, *, n, s, bd, interpret=False):
    sp = _round_up(7 + s, 8)
    kern = functools.partial(_resid_kernel, s=s, sp=sp, bd=bd)
    frows = ft_arr.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # fields
            pl.BlockSpec(memory_space=pltpu.HBM),  # pool (lane-packed)
            pl.BlockSpec(memory_space=pltpu.HBM),  # canvas (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM(canvas.shape, jnp.int32),
            pltpu.VMEM((NBUF, max(s, 8), 128), jnp.int32),
            pltpu.VMEM((sp, LANES), jnp.int32),
            pltpu.SMEM((2, frows, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(ft_arr, pool, canvas)


def resid_phase_pallas(canvas, fts, pools, bd, interpret=False):
    """fts: from prepare_resid_fields; pools: RAW [N, s, s] per class
    (lane-packed here)."""
    for c, ft in enumerate(fts):
        if ft.n == 0:
            continue
        canvas = _resid_class_pallas(canvas, ft.arr,
                                     pack_resid_pool(pools[c], 4 << c),
                                     n=ft.n, s=4 << c, bd=bd,
                                     interpret=interpret)
    return canvas
