"""Probe in-kernel dynamic extraction options + aligned-DMA pipeline cost.

1. pltpu.roll with dynamic shift (both axes)
2. masked static-roll decomposition
3. jax.lax.dynamic_slice on a loaded value
4. timing: aligned superwindow read + covering write pipeline (no compute)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = jnp.asarray(np.arange(1024 * 1536, dtype=np.int32).reshape(1024, 1536))


def run(name, kern, out_shape, *args, **kw):
    try:
        r = pl.pallas_call(kern, out_shape=out_shape, **kw)(*args)
        return np.asarray(r)
    except Exception as e:
        msg = " | ".join(l for l in str(e).split("\n")
                         if ("must" in l or "align" in l or "divis" in l
                             or "NotImplemented" in l or "error:" in l
                             or "Unsupported" in l))[:200]
        print(f"{name}: FAIL {msg or str(e)[:200]}")
        return None


# --- 1. dynamic roll ---------------------------------------------------
def dynroll_kern(s_ref, x_ref, o_ref):
    v = x_ref[:]
    v = pltpu.roll(v, s_ref[0], axis=0)
    v = pltpu.roll(v, s_ref[1], axis=1)
    o_ref[:] = v


r = run("dyn-roll",
        dynroll_kern, jax.ShapeDtypeStruct((48, 256), jnp.int32),
        jnp.asarray([3, 37], jnp.int32), jnp.asarray(np.arange(48 * 256, dtype=np.int32).reshape(48, 256)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
if r is not None:
    exp = np.roll(np.roll(np.arange(48 * 256, dtype=np.int32).reshape(48, 256), 3, 0), 37, 1)
    print("dyn-roll:", "OK" if (r == exp).all() else "WRONG")

# --- 3. dynamic_slice on value ----------------------------------------
def dynslice_kern(s_ref, x_ref, o_ref):
    v = x_ref[:]
    o_ref[:] = jax.lax.dynamic_slice(v, (s_ref[0], s_ref[1]), (40, 128))


r = run("dyn-slice-value",
        dynslice_kern, jax.ShapeDtypeStruct((40, 128), jnp.int32),
        jnp.asarray([3, 37], jnp.int32), jnp.asarray(np.arange(48 * 256, dtype=np.int32).reshape(48, 256)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)))
if r is not None:
    exp = np.arange(48 * 256, dtype=np.int32).reshape(48, 256)[3:43, 37:165]
    print("dyn-slice-value:", "OK" if (r == exp).all() else "WRONG")


# --- 4. aligned DMA pipeline throughput --------------------------------
N = 2880
NBUF = 4
rng = np.random.RandomState(0)
by = (rng.randint(0, 900, N) & ~7).astype(np.int32)
bx = (rng.randint(0, 1200, N) & ~127).astype(np.int32)
fields = jnp.asarray(np.stack([by, bx], 1))


def pipe_kern(f, x, out, bufs, sems, osems):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def rd(j, slot):
        oy = pl.multiple_of(f[j, 0], 8)
        ox = pl.multiple_of(f[j, 1], 128)
        return pltpu.make_async_copy(
            x.at[pl.ds(oy, 48), pl.ds(ox, 256)], bufs.at[slot],
            sems.at[slot])

    def wr(j, slot):
        oy = pl.multiple_of(f[j, 0], 8)
        ox = pl.multiple_of(f[j, 1], 128)
        return pltpu.make_async_copy(
            bufs.at[slot], out.at[pl.ds(oy, 48), pl.ds(ox, 256)],
            osems.at[slot])

    @pl.when(i == 0)
    def _():
        for k in range(NBUF):
            rd(k, k).start()

    slot = jax.lax.rem(i, NBUF)
    rd(i, slot).wait()

    @pl.when(i >= NBUF)
    def _():
        wr(i - NBUF, slot).wait()

    wr(i, slot).start()

    @pl.when(i + NBUF < n)
    def _():
        rd(i + NBUF, slot).start()

    @pl.when(i == n - 1)
    def _():
        for k in range(NBUF):
            wr(n - 1 - k, jax.lax.rem(n - 1 - k, NBUF)).wait()


gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(N,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
    scratch_shapes=[pltpu.VMEM((NBUF, 48, 256), jnp.int32),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                    pltpu.SemaphoreType.DMA((NBUF,))])


@jax.jit
def pipe(fields, x):
    return pl.pallas_call(
        pipe_kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct(X.shape, jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(fields, x)


try:
    pipe(fields, X).block_until_ready()
    t0 = time.time()
    for _ in range(16):
        r = pipe(fields, X)
    r.block_until_ready()
    dt = (time.time() - t0) / 16 * 1000
    print(f"dma-pipeline({N} blocks rd+wr 48x256): {dt:.3f} ms "
          f"({dt/N*1000:.2f} us/block)")
except Exception as e:
    print("dma-pipeline FAIL:", str(e)[:300])
