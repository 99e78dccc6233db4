"""On-chip stage-B decomposition at 1080p: time the production
_pipeline_frame with stages selectively disabled to locate the cost.

python tools/probe_stageb.py   (uses the cached bench stream)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STREAM = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(__file__), "..", ".bench",
    "e2e_1920x1080_qp30_ctb64_wpp.265")


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(STREAM),
                                       "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.3)
    except Exception:
        pass
    import hevc_tpu.tpu.pipeline as pl
    from hevc_tpu.decoder.core import Decoder

    captured = []
    orig = pl._pipeline_frame

    def wrapper(*args):
        if args[-4]:
            captured.append(args)
        return orig(*args)

    pl._pipeline_frame = wrapper
    try:
        Decoder(check_md5=False, recon_backend="jax").decode_bytes(
            open(STREAM, "rb").read())
    finally:
        pl._pipeline_frame = orig
    args = captured[-1]
    (meta, meta16, meta8, avail, levels, bank, canvas,
     refs_y, refs_cb, refs_cr, spec) = args
    meta = jnp.asarray(meta)
    meta16 = jnp.asarray(meta16)
    meta8 = jnp.asarray(meta8)
    avail = jnp.asarray(avail)
    levels = jax.tree_util.tree_map(jnp.asarray, levels)
    sd = dict(spec)
    print("spec: n_chunks", sd["n_chunks"], "B", sd["B"],
          "nlv", sd["nlv"], "mc groups", len(sd["mc_groups"]),
          "rows/group", [n for *_k, n in sd["mc_groups"]][:12])

    def run_variant(name, **over):
        s2 = dict(sd)
        s2.update(over)
        spec2 = tuple(s2.items())
        iters = 8

        @jax.jit
        def timed(meta8, meta, meta16, avail, levels, canvas):
            def body(i, acc):
                flat, _y, _cb, _cr = orig(
                    meta, meta16, meta8, avail, levels, bank,
                    canvas + i.astype(canvas.dtype), refs_y, refs_cb,
                    refs_cr, spec2)
                return acc + flat[0].astype(jnp.int32)
            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        timed(meta8, meta, meta16, avail, levels,
              canvas).block_until_ready()
        t0 = time.time()
        timed(meta8, meta, meta16, avail, levels,
              canvas).block_until_ready()
        ms = (time.time() - t0) / iters * 1e3
        print(f"{name}: {ms:.1f} ms/frame")
        return ms

    full = run_variant("full")
    run_variant("no deblock", do_deblock=False)
    run_variant("no sao", do_sao=False)
    run_variant("no filters", do_deblock=False, do_sao=False)
    run_variant("no MC (intra+resid+filters)", mc_groups=(),
                n_refs=0)
    run_variant("MC only-ish (1 chunk wavefront)", n_chunks=16)
    print(f"full = {full:.1f} ms")


if __name__ == "__main__":
    main()
