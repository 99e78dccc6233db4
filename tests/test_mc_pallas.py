"""Interpret-mode cross-check of the Pallas inter kernels vs the XLA path.

The Pallas MC/residual kernels (hevc_tpu/tpu/mc_pallas.py) are the TPU
production path for inter frames; on CPU the XLA formulation
(hevc_tpu/tpu/mc.py) is the reference.  These tests run the Pallas
kernels in interpret mode on synthetic groups covering uni/bi,
luma/chroma, 8/10-bit, several block shapes, and all residual size
classes, asserting bit-exact equality with the XLA phase.

Reference kernel grid: /root/reference/libavcodec/hevcdsp.h:98-125
(put_hevc_qpel/epel x {uni, bi}); transform_add :55.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hevc_tpu.tpu import mc_pallas as MP
from hevc_tpu.tpu.mc import mc_phase, resid_phase
from hevc_tpu.tpu.pack import PAD_REF


def _mk_refs(rng, n, h, w, bd):
    return rng.integers(0, (1 << bd) - 1,
                        (n, h + 2 * PAD_REF, w + 2 * PAD_REF),
                        dtype=np.int64).astype(np.int32)


def _mk_fields(rng, n_blk, bi, w, h, ch, cw, nref, rh, rw, ntaps,
               wp=False, bd=8):
    """Random non-overlapping MC rows in device layout
    [N, 7|12 (+5 wp)]."""
    rows = []
    # lay blocks on a grid so canvas writes never overlap
    cols = max(1, cw // (w + 8))
    for i in range(n_blk):
        cy = 8 + (i // cols) * (h + 8)
        cx = 8 + (i % cols) * (w + 8)
        assert cy + h < ch and cx + w < cw
        preds = []
        for _ in range(2 if bi else 1):
            sel = int(rng.integers(0, nref))
            by = int(rng.integers(0, rh + 2 * PAD_REF - h - ntaps))
            bx = int(rng.integers(0, rw + 2 * PAD_REF - w - ntaps))
            fx = int(rng.integers(0, 4 if ntaps == 8 else 8))
            fy = int(rng.integers(0, 4 if ntaps == 8 else 8))
            preds += [sel, by, bx, fx, fy]
        row = preds + [cy, cx]
        if wp:
            denom = 6
            lwd = denom + 14 - bd
            row += [int(rng.integers(50, 80)),
                    int(rng.integers(-8, 8)) << (bd - 8),
                    int(rng.integers(50, 80)),
                    int(rng.integers(-8, 8)) << (bd - 8), lwd]
        rows.append(row)
    return np.asarray(rows, np.int32)


@pytest.mark.parametrize("is_ch,bi,w,h,bd,wp", [
    (False, False, 16, 8, 8, False),
    (False, True, 8, 16, 8, False),
    (False, False, 4, 4, 10, False),
    (True, False, 8, 4, 8, False),
    (True, True, 4, 8, 10, False),
    (False, True, 32, 24, 8, False),
    # explicit weighted prediction in-kernel (8.5.4.3.2/.3)
    (False, False, 16, 8, 8, True),
    (False, True, 8, 8, 8, True),
    (True, False, 8, 4, 10, True),
    (True, True, 4, 8, 8, True),
])
def test_mc_pallas_interpret_matches_xla(is_ch, bi, w, h, bd, wp):
    rng = np.random.default_rng(hash((is_ch, bi, w, h, bd, wp)) % 2**32)
    rh, rw = 96, 160
    ch, cw = 160, 260
    nref = 2
    ntaps = 4 if is_ch else 8
    refs = _mk_refs(rng, nref, rh, rw, bd)
    fields = _mk_fields(rng, 7, bi, w, h, ch, cw, nref, rh, rw, ntaps,
                        wp=wp, bd=bd)
    canvas = np.zeros((ch, cw), np.int32)

    want = mc_phase(jnp.asarray(canvas), jnp.asarray(refs),
                    jnp.asarray(refs),
                    ((is_ch, bi, w, h, wp, jnp.asarray(fields)),), bd)

    pg = MP.prepare_mc_fields(((is_ch, bi, wp, w, h, fields),))
    pc = MP.pad_canvas(jnp.asarray(canvas))
    pr = MP.pad_refs(jnp.asarray(refs))
    got = MP.mc_phase_pallas(pc, pr, pr, pg, bd, interpret=True)
    assert (np.asarray(got[:ch, :cw]) == np.asarray(want)).all()


@pytest.mark.parametrize("cls,bd", [(0, 8), (1, 8), (2, 10), (3, 8)])
def test_resid_pallas_interpret_matches_xla(cls, bd):
    rng = np.random.default_rng(cls * 17 + bd)
    s = 4 << cls
    ch, cw = 160, 220
    n_blk = 6
    n_pool = n_blk + 2
    pool = rng.integers(-200, 200, (n_pool, s, s),
                        dtype=np.int64).astype(np.int32)
    pool[0] = 0  # slot 0 = zeros by convention
    canvas = rng.integers(0, (1 << bd) - 1, (ch, cw),
                          dtype=np.int64).astype(np.int32)
    cols = max(1, cw // (s + 8))
    rows = []
    for i in range(n_blk):
        cy = 8 + (i // cols) * (s + 8)
        cx = 8 + (i % cols) * (s + 8)
        assert cy + s < ch and cx + s < cw
        rows.append((cy, cx, int(rng.integers(0, n_pool))))
    fields = np.asarray(rows, np.int32)

    resids = [jnp.zeros((1, 4 << c, 4 << c), jnp.int32) for c in range(4)]
    resids[cls] = jnp.asarray(pool)
    rfields = [jnp.zeros((0, 3), jnp.int32) for _ in range(4)]
    rfields[cls] = jnp.asarray(fields)
    want = resid_phase(jnp.asarray(canvas), tuple(rfields),
                       tuple(resids), bd)

    fts = MP.prepare_resid_fields(tuple(np.asarray(f) for f in rfields))
    pc = MP.pad_canvas(jnp.asarray(canvas))
    got = MP.resid_phase_pallas(pc, fts, tuple(resids), bd, interpret=True)
    assert (np.asarray(got[:ch, :cw]) == np.asarray(want)).all()
