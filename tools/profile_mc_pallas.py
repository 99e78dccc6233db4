"""Time the Pallas MC/resid kernels vs the XLA path on the real chip."""
import pickle
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from hevc_tpu.tpu.mc import mc_phase, resid_phase
from hevc_tpu.tpu.mc_pallas import mc_phase_pallas, resid_phase_pallas
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
levels = tuple(jnp.asarray(v) for v in pf.levels)
rmeta = tuple(jnp.asarray(v) for v in pf.rmeta)
RES = _residuals(levels, rmeta, bd)

# bit-exactness on hardware
a = np.asarray(jax.jit(
    lambda c: mc_phase(c, refs_l, refs_c, groups, bd))(canvas))
g = np.asarray(mc_phase_pallas(canvas, refs_l, refs_c, groups, bd))
assert (a == g).all(), f"mc pallas mismatch: {(a != g).sum()} px"
ar = np.asarray(jax.jit(
    lambda c: resid_phase(c, resid_fields, RES, bd))(jnp.asarray(a)))
gr = np.asarray(resid_phase_pallas(jnp.asarray(a), resid_fields, RES, bd))
assert (ar == gr).all(), f"resid pallas mismatch: {(ar != gr).sum()} px"
print("pallas kernels bit-exact on hardware OK")


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
    print(f"{name:16s} {dt:8.3f} ms/frame")


timeit("mc_xla", lambda cv, i: mc_phase(cv + i, refs_l, refs_c, groups, bd))
timeit("mc_pallas",
       lambda cv, i: mc_phase_pallas(cv + i, refs_l, refs_c, groups, bd))
timeit("resid_xla", lambda cv, i: resid_phase(cv + i, resid_fields, RES, bd))
timeit("resid_pallas",
       lambda cv, i: resid_phase_pallas(cv + i, resid_fields, RES, bd))
