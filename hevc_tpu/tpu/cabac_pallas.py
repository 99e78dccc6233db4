"""On-device CABAC: the arithmetic-engine core as a Pallas TPU kernel.

SURVEY §7's north star asks for stage A itself on-device — a wavefront
of CABAC row decoders (one program instance per WPP row, sequential
bit-serial inner loop, SMEM state, 2-CTU-lag handoff).  This module is
the PROTOTYPE of that stage's irreducible core: the binary arithmetic
decoder (9.3.4.3 / reference cabac_functions.h:107 get_cabac_inline)
running entirely on-device, one grid instance per row, with:

  * context states, range/offset, and the byte cursor in SMEM;
  * the rangeTabLps/transIdx tables in SMEM;
  * a precomputed per-row SCHEDULE of bin kinds (ctx index, bypass,
    terminate) driving the loop — in the full stage the schedule is
    produced by the syntax layer's control flow; here it is captured
    from the encoder so the kernel decodes REAL arithmetic streams
    bit-exactly (tests/test_cabac_pallas.py).

What this prototype establishes (see docs/ONDEVICE_CABAC.md for the
measured feasibility analysis): the per-bin dependent chain runs at
device scalar-unit speed; throughput scales with the row grid exactly
like the reference's WPP threads (pthread_slice.c row counters), and
the remaining gap to a full on-device stage A is the syntax state
machine, not the arithmetic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..cabac.engine import RANGE_TAB_LPS, TRANS_IDX_LPS, TRANS_IDX_MPS

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = pltpu = None

BYPASS = -1
TERMINATE = -2

_RTAB = np.asarray(RANGE_TAB_LPS, np.int32)          # [64, 4]
_TLPS = np.asarray(TRANS_IDX_LPS, np.int32)          # [64]
_TMPS = np.asarray(TRANS_IDX_MPS, np.int32)          # [64]


def _cabac_kernel(data_ref, sched_ref, init_ref, rtab_ref, tlps_ref,
                  tmps_ref, bins_ref, states, *, n_bins, n_ctx,
                  n_bytes):
    """One row's arithmetic decode.  All state scalar, all refs SMEM."""
    for c in range(n_ctx):
        states[c] = init_ref[0, 0, c]

    def read_bit(carry):
        rng, off, bitbuf, nbits, bytepos = carry
        def refill(c):
            _, bb, bp = c
            b = jnp.where(bp < n_bytes, data_ref[0, 0, bp], 0)
            return (jnp.int32(8), b, bp + 1)
        nbits, bitbuf, bytepos = jax.lax.cond(
            nbits == 0, refill, lambda c: c, (nbits, bitbuf, bytepos))
        nbits = nbits - 1
        bit = (bitbuf >> nbits) & 1
        return bit, (rng, off, bitbuf, nbits, bytepos)

    def renorm(carry):
        def cond(c):
            return c[0] < 256

        def body(c):
            bit, (rng, off, bitbuf, nbits, bytepos) = read_bit(c)
            return (rng << 1, (off << 1) | bit, bitbuf, nbits, bytepos)

        return jax.lax.while_loop(cond, body, carry)

    def one_bin(i, carry):
        rng, off, bitbuf, nbits, bytepos = carry
        kind = sched_ref[0, 0, i]

        # context-coded path (computed unconditionally on scalars)
        idx = jnp.maximum(kind, 0)
        s = states[idx]
        p = s >> 1
        mps = s & 1
        rlps = rtab_ref[p, (rng >> 6) & 3]
        rng_c = rng - rlps
        lps = off >= rng_c
        bit_ctx = jnp.where(lps, 1 - mps, mps)
        off_c = jnp.where(lps, off - rng_c, off)
        rng_c2 = jnp.where(lps, rlps, rng_c)
        mps_n = jnp.where(lps & (p == 0), 1 - mps, mps)
        s_new = jnp.where(lps, (tlps_ref[p] << 1) | mps_n,
                          (tmps_ref[p] << 1) | mps)

        is_ctx = kind >= 0
        is_byp = kind == BYPASS
        is_term = kind == TERMINATE

        @pl.when(is_ctx)
        def _():
            states[idx] = s_new

        # bypass: offset consumes one bit first
        bbit, (rng2, off2, bitbuf2, nbits2, bytepos2) = read_bit(
            (rng, off, bitbuf, nbits, bytepos))
        off_b = (off2 << 1) | bbit
        bit_byp = (off_b >= rng2).astype(jnp.int32)
        off_b = jnp.where(bit_byp == 1, off_b - rng2, off_b)

        # terminate: range -= 2, no renorm when bit==1
        rng_t = rng - 2
        bit_term = (off >= rng_t).astype(jnp.int32)

        bit = jnp.where(is_ctx, bit_ctx,
                        jnp.where(is_byp, bit_byp, bit_term))
        bins_ref[0, 0, i] = bit

        # post-state per kind (renorm where required)
        rng3 = jnp.where(is_ctx, rng_c2, jnp.where(is_byp, rng2, rng_t))
        off3 = jnp.where(is_ctx, off_c, jnp.where(is_byp, off_b, off))
        bitbuf3 = jnp.where(is_byp, bitbuf2, bitbuf)
        nbits3 = jnp.where(is_byp, nbits2, nbits)
        bytepos3 = jnp.where(is_byp, bytepos2, bytepos)
        do_renorm = is_ctx | (is_term & (bit == 0))
        rng4, off4, bitbuf4, nbits4, bytepos4 = jax.lax.cond(
            do_renorm, renorm, lambda c: c,
            (rng3, off3, bitbuf3, nbits3, bytepos3))
        return (rng4, off4, bitbuf4, nbits4, bytepos4)

    # 9.3.2.2 init: range = 510, 9 bits of offset
    b0 = data_ref[0, 0, 0]
    b1 = jnp.where(n_bytes > 1, data_ref[0, 0, 1], 0)
    bitbuf = (b0 << 8) | b1
    off0 = bitbuf >> 7
    carry = (jnp.int32(510), off0, bitbuf & 0x7F, jnp.int32(7),
             jnp.int32(2))
    jax.lax.fori_loop(0, n_bins, one_bin, carry)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "n_ctx", "n_bytes",
                                    "interpret"))
def decode_rows_pallas(data, sched, init_states, *, n_bins, n_ctx,
                       n_bytes, interpret=False):
    """Decode R independent CABAC rows concurrently on-device.

    data: int32 [R, n_bytes] byte values (EPB-removed rbsp segments);
    sched: int32 [R, n_bins] (>=0: context slot, -1 bypass,
    -2 terminate); init_states: int32 [R, n_ctx] engine context states
    ((pStateIdx << 1) | valMps).  Returns bins int32 [R, n_bins]."""
    R = data.shape[0]
    kern = functools.partial(_cabac_kernel, n_bins=n_bins, n_ctx=n_ctx,
                             n_bytes=n_bytes)
    # (R, 1, X) with (1, 1, X) blocks: per-row SMEM blocks whose last
    # two dims equal the array dims (the TPU block-shape rule)
    row = lambda X: pl.BlockSpec((1, 1, X), lambda r: (r, 0, 0),
                                 memory_space=pltpu.SMEM)
    tab = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        grid=(R,),
        in_specs=[row(n_bytes), row(n_bins), row(n_ctx),
                  tab(), tab(), tab()],
        out_specs=row(n_bins),
        out_shape=jax.ShapeDtypeStruct((R, 1, n_bins), jnp.int32),
        scratch_shapes=[pltpu.SMEM((n_ctx,), jnp.int32)],
        interpret=interpret,
    )(data.reshape(R, 1, n_bytes), sched.reshape(R, 1, n_bins),
      init_states.reshape(R, 1, n_ctx), jnp.asarray(_RTAB),
      jnp.asarray(_TLPS), jnp.asarray(_TMPS))
    return out.reshape(R, n_bins)
