"""Probe Mosaic DMA slicing rules: which (shape, offset) combos compile.

Each case: HBM->VMEM window DMA at dynamic offsets, and VMEM->HBM
block write at dynamic offsets, with various shapes.
"""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = jnp.asarray(np.arange(512 * 1408, dtype=np.int32).reshape(512, 1408))


def try_case(name, wh, ww, oy, ox):
    def kern(off, x, out, buf, sem):
        pltpu.make_async_copy(
            x.at[pl.ds(off[0], wh), pl.ds(off[1], ww)],
            buf, sem).start()
        pltpu.make_async_copy(
            x.at[pl.ds(off[0], wh), pl.ds(off[1], ww)],
            buf, sem).wait()
        out[:] = buf[:]

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((wh, ww), jnp.int32),
                        pltpu.SemaphoreType.DMA(())])
    try:
        off = jnp.asarray([oy, ox], jnp.int32)
        r = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((wh, ww), jnp.int32),
        )(off, X)
        ok = (np.asarray(r) == np.asarray(X[oy:oy + wh, ox:ox + ww])).all()
        print(f"READ  {name}: shape=({wh},{ww}) off=({oy},{ox}) -> "
              f"{'OK' if ok else 'WRONG DATA'}")
    except Exception as e:
        msg = " | ".join(l for l in str(e).split("\n") if ("must" in l or "align" in l or "Mosaic" in l or "NotImplemented" in l or "error:" in l))[:300]
        print(f"READ  {name}: shape=({wh},{ww}) off=({oy},{ox}) -> FAIL {msg}")


def try_write(name, wh, ww, oy, ox):
    def kern(off, x, out, buf, sem):
        buf[:] = jnp.full((wh, ww), 7, jnp.int32)
        cp = pltpu.make_async_copy(
            buf, out.at[pl.ds(off[0], wh), pl.ds(off[1], ww)], sem)
        cp.start()
        cp.wait()

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[pltpu.VMEM((wh, ww), jnp.int32),
                        pltpu.SemaphoreType.DMA(())])
    try:
        off = jnp.asarray([oy, ox], jnp.int32)
        r = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct(X.shape, jnp.int32),
            input_output_aliases={1: 0},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(off, X)
        got = np.asarray(r)
        exp = np.asarray(X).copy()
        exp[oy:oy + wh, ox:ox + ww] = 7
        ok = (got == exp).all()
        print(f"WRITE {name}: shape=({wh},{ww}) off=({oy},{ox}) -> "
              f"{'OK' if ok else 'WRONG DATA'}")
    except Exception as e:
        msg = " | ".join(l for l in str(e).split("\n") if ("must" in l or "align" in l or "Mosaic" in l or "NotImplemented" in l or "error:" in l))[:300]
        print(f"WRITE {name}: shape=({wh},{ww}) off=({oy},{ox}) -> FAIL {msg}")


try_case("fully aligned", 8, 128, 16, 256)
try_case("aligned-shape, odd offset", 40, 128, 13, 37)
try_case("rows8, lanes39", 40, 39, 13, 37)
try_write("aligned", 8, 128, 16, 256)
try_write("16x32 odd", 16, 32, 13, 37)
