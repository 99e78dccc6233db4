"""Compare MC + resid formulations on the PRODUCTION 1080p frame data.

Variants (all bit-exact checked against the XLA production path):
  mc_xla        — _mc_tile_phase (vmapped dynamic_slice per PU row)
  mc_xla_i16    — same, refs stored int16 (half gather bytes)
  mc_pallas     — per-block Pallas kernel (explicit DMA pipeline)
  resid_xla     — resid_phase (vmapped dynamic_slice per TU)
  resid_pallas  — per-block Pallas residual kernel

python tools/probe_mc_prod.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

STREAM = os.path.join(os.path.dirname(__file__), "..", ".bench",
                      "e2e_1920x1080_qp30_ctb64_wpp.265")


def capture():
    import hevc_tpu.tpu.pipeline as pl
    from hevc_tpu.decoder.core import Decoder
    captured = []
    orig = pl._pipeline_frame

    def wrapper(*args):
        if args[-4]:  # has refs => inter frame
            captured.append(args)
        return orig(*args)

    pl._pipeline_frame = wrapper
    try:
        Decoder(check_md5=False, recon_backend="jax").decode_bytes(
            open(STREAM, "rb").read())
    finally:
        pl._pipeline_frame = orig
    return captured[-1]


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(STREAM), "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass
    from hevc_tpu.tpu import mc_pallas as MP
    from hevc_tpu.tpu.pipeline import DUMP16, _mc_tile_phase
    (meta, meta16, meta8, avail, levels, bank, canvas,
     refs_y, refs_cb, refs_cr, spec) = capture()
    S = dict(spec)
    bd = S["bd"]
    meta_np = np.asarray(meta)
    m16 = np.asarray(meta16)

    # --- extract MC groups from meta16 ---
    groups = []     # (is_ch, bi, wp, kind, w, h, rows[n,17]) true rows
    pos16 = 0
    for (is_ch, bi, wp, kind, w, h, nrow) in S["mc_groups"]:
        rows = m16[pos16:pos16 + nrow * 17].reshape(nrow, 17)
        pos16 += nrow * 17
        true = rows[rows[:, 10] != DUMP16]
        groups.append((is_ch, bi, wp, kind, w, h, true.astype(np.int32)))
    n_blocks = sum(g[-1].shape[0] for g in groups)
    print(f"MC groups: {len(groups)}, true blocks {n_blocks}")

    # --- extract resid fields from meta (prod layout) ---
    pos = 0
    for c in range(4):
        pos += S["n_chunks"] * S["B"][c] * 8
    for c in range(4):
        pos += S["nlv"][c] * 9
    resid_fields = []
    for c in range(4):
        n = S["resid_rows"][c]
        rf = meta_np[pos:pos + n * 3].reshape(n, 3)
        pos += n * 3
        resid_fields.append(rf)
    n_resid = sum((rf[:, 0] >= 0).sum() for rf in resid_fields)
    print(f"resid rows (true): {n_resid}")

    refs_l = jnp.stack(refs_y)
    refs_c = jnp.stack(refs_cb + refs_cr)
    canvas0 = jnp.asarray(canvas).astype(jnp.int32)

    xg = tuple((ic, bi, wp, k, w, h, jnp.asarray(r))
               for ic, bi, wp, k, w, h, r in groups)

    def timeit(name, fn, iters=16):
        @jax.jit
        def loop(cv):
            def body(i, c):
                return fn(c + i - i)
            return jax.lax.fori_loop(0, iters, body, cv)
        loop(canvas0).block_until_ready()
        t0 = time.time()
        r = loop(canvas0).block_until_ready()
        dt = (time.time() - t0) / iters * 1e3
        print(f"{name:14s} {dt:8.2f} ms/frame")
        return r

    ref_out = np.asarray(timeit(
        "mc_xla", lambda cv: _mc_tile_phase(cv, refs_l, refs_c, xg, bd)))

    refs_l16 = refs_l.astype(jnp.int16)
    refs_c16 = refs_c.astype(jnp.int16)

    def mc_i16(cv):
        return _mc_tile_phase(cv, refs_l16.astype(jnp.int32),
                              refs_c16.astype(jnp.int32), xg, bd)
    # NOTE: astype outside dynamic_slice would materialize full int32
    # stacks — this variant only measures whether XLA sinks the convert.
    timeit("mc_xla_i16", mc_i16)

    # --- pallas: generic-kind rows (fx/fy==0 -> unit taps) ---
    pgroups = []
    for is_ch, bi, wp, kind, w, h, rows in groups:
        if rows.shape[0] == 0:
            continue
        if bi:
            f = rows[:, list(range(10)) + [10, 11]]
        else:
            f = rows[:, [0, 1, 2, 3, 4, 10, 11]]
        if wp:
            f = np.concatenate([f, rows[:, 12:17]], axis=1)
        pgroups.append((bool(is_ch), bool(bi), bool(wp), w, h, f))
    pg = MP.prepare_mc_fields(tuple(pgroups))
    prl = MP.pad_refs(refs_l)
    prc = MP.pad_refs(refs_c)
    ch, cw = canvas0.shape

    def mc_pal(cv):
        pc = MP.pad_canvas(cv)
        pc = MP.mc_phase_pallas(pc, prl, prc, pg, bd)
        return pc[:ch, :cw]

    pal_out = np.asarray(timeit("mc_pallas", mc_pal))
    ok = (pal_out == ref_out).all()
    print("pallas MC bit-exact:", ok,
          "" if ok else f"({(pal_out != ref_out).sum()} px differ)")

    # --- resid ---
    from hevc_tpu.tpu.pipeline import _residuals
    rmeta = []
    pos = 0
    for c in range(4):
        pos += S["n_chunks"] * S["B"][c] * 8
    for c in range(4):
        n = S["nlv"][c]
        rmeta.append(jnp.asarray(meta_np[pos:pos + n * 9].reshape(n, 9)))
        pos += n * 9
    lv = []
    lpos = 0
    lv16 = np.asarray(levels)
    for c, s in enumerate((4, 8, 16, 32)):
        n = S["nlv"][c] * s * s
        lv.append(jnp.asarray(lv16[lpos:lpos + n].reshape(-1, s, s)
                              .astype(np.int32)))
        lpos += n
    RES = _residuals(tuple(lv), tuple(rmeta), bd, tuple(bank))
    RES = tuple(jnp.asarray(np.asarray(r)) for r in RES)
    rfj = tuple(jnp.asarray(rf) for rf in resid_fields)

    from hevc_tpu.tpu.mc import resid_phase
    r_ref = np.asarray(timeit(
        "resid_xla", lambda cv: resid_phase(cv, rfj, RES, bd)))

    true_rf = tuple(rf[rf[:, 0] >= 0] for rf in resid_fields)
    fts = MP.prepare_resid_fields(true_rf)
    pools = tuple(MP.pad_resid_pool(RES[c], 4 << c) for c in range(4))

    def resid_pal(cv):
        pc = MP.pad_canvas(cv)
        pc = MP.resid_phase_pallas(pc, fts, pools, bd)
        return pc[:ch, :cw]

    r_pal = np.asarray(timeit("resid_pallas", resid_pal))
    ok = (r_pal == r_ref).all()
    print("pallas resid bit-exact:", ok,
          "" if ok else f"({(r_pal != r_ref).sum()} px differ)")


if __name__ == "__main__":
    main()
