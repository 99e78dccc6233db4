"""Frame-axis parallel decode of independent B frames over a mesh.

The TPU-native frame-level parallelism: a parallel-B GOP (I0, P(n+1),
B1..Bn — encoder/pgop.py) has n mutually-independent B pictures, and
device k reconstructs frame k+1 END TO END (MC + residual + intra
wavefront + deblock + SAO) with the anchor reference windows
REPLICATED over the ("frame",) mesh axis.  This is the reference's
frame-thread wavefront re-expressed as SPMD sharding: where
pthread_frame.c:395/484 keeps N decoder clones in flight gated by
row-progress counters, here the independence is structural (non-ref
Bs), so no progress gating is needed and every device runs the same
compiled program on different per-frame metadata.

Bit-exactness: each device's output equals the sequential single-chip
decode of its frame (__graft_entry__.dryrun_multichip frame axis,
tests/test_pgop.py).
"""
from __future__ import annotations

import numpy as np


def decode_bframes_frame_axis(n_devices, devs, width=128, height=64,
                              qp=30):
    """Encode a parallel-B GOP, decode its n B frames concurrently over
    a ("frame",) mesh, and return (got, want): per-B (y, cb, cr) from
    the sharded decode and from the sequential (plan-backend) decode."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    import hevc_tpu.decoder.core as dcore
    from hevc_tpu.encoder.core import EncoderConfig
    from hevc_tpu.encoder.generate import synth_frame
    from hevc_tpu.encoder.pgop import ParallelBGopEncoder
    from .band import unify_bands
    from .filters import deblock_jax, sao_plane_jax
    from .intra import reconstruct_wavefront
    from .mc import mc_phase, resid_phase
    from .pack import pack_frame
    from .recon import _residuals, pack_sao_params

    n_b = n_devices
    cfg = EncoderConfig(width=width, height=height, qp=qp,
                        log2_ctb_size=5, log2_cu_size=5, gop="ra",
                        deblocking=True, sao=True, seed=2,
                        search_range=2)
    enc = ParallelBGopEncoder(cfg, n_b)
    stream = enc.encode([synth_frame("noise", width, height, t, seed=4)
                         for t in range(n_b + 2)])

    captured = []
    orig = dcore.execute_plan_numpy

    def capture(pic, plan):
        captured.append((pic, list(plan),
                         getattr(pic, "deblock_params", None)))
        orig(pic, plan)

    dcore.execute_plan_numpy = capture
    try:
        decoded = dcore.Decoder(recon_backend="plan").decode_bytes(stream)
    finally:
        dcore.execute_plan_numpy = orig
    by_poc = {f.poc: f for f in decoded}
    assert all(f.md5_ok for f in decoded)

    # B pictures are decode order 2.. (after the I and P anchors)
    bees = [(pic, plan, dbp) for pic, plan, dbp in captured
            if 1 <= pic.poc <= n_b]
    assert len(bees) == n_b
    pfs, qp4s, bss_v, bss_h, dboffs, saos = [], [], [], [], [], []
    for pic, plan, dbp in bees:
        pfs.append(pack_frame(pic, plan))
        pic.compute_bs()
        qp4s.append(pic.qp_y.astype(np.int32))
        bss_v.append(pic.bs_v.astype(np.int32))
        bss_h.append(pic.bs_h.astype(np.int32))
        dboffs.append([dbp["beta_offset"], dbp["tc_offset"],
                       dbp["cb_qp_offset"], dbp["cr_qp_offset"]]
                      if dbp else [0, 0, 0, 0])
        saos.append(tuple(np.asarray(a) for a in pack_sao_params(pic)))
    arrays, spec = unify_bands(pfs)  # leading axis = frame here
    bd = spec["bit_depth"]
    n_chunks = spec["n_chunks"]
    regions = spec["regions"]
    mc_shapes = spec["mc_shapes"]
    pic0 = bees[0][0]
    sps = pic0.sps
    do_deblock = bees[0][2] is not None
    do_sao = bool(getattr(pic0, "has_sao", False)) \
        or bool(getattr(pic0, "sao_map", None))

    # every B shares the same (I, P) anchor refs -> replicate
    refs_l = jnp.asarray(pfs[0].refs_l)
    refs_c = jnp.asarray(pfs[0].refs_c)
    for pf in pfs[1:]:
        assert (pf.refs_l == pfs[0].refs_l).all(), \
            "B frames disagree on anchor refs"

    mesh = Mesh(np.asarray(devs[:n_devices]), ("frame",))

    def body(canvas, scal, avail, levels, rmeta, mc_fields,
             resid_fields, refs_l, refs_c, bank, qp4, bs_v, bs_h,
             dboff, sao_t, sao_b, sao_o, sao_e):
        canvas = canvas[0].astype(jnp.int32)
        scal = tuple(s[0] for s in scal)
        avail = tuple(a[0] for a in avail)
        levels = tuple(v[0] for v in levels)
        rmeta = tuple(m[0] for m in rmeta)
        resids = _residuals(levels, rmeta, bd, bank)
        groups = tuple(k + (f[0],) for k, f in zip(mc_shapes, mc_fields))
        canvas = mc_phase(canvas, refs_l, refs_c, groups, bd)
        canvas = resid_phase(canvas, tuple(g[0] for g in resid_fields),
                             resids, bd)
        out = reconstruct_wavefront(canvas, scal, avail, resids, bd,
                                    n_chunks)
        y, cb, cr = [jax.lax.dynamic_slice(out, (oy, ox), (h, w))
                     for oy, ox, h, w in regions]
        if do_deblock:
            d = dboff[0]
            y, cb, cr = deblock_jax(y, cb, cr, qp4[0], bs_v[0], bs_h[0],
                                    d[0], d[1], d[2], d[3], bd=bd,
                                    sub_w=sps.sub_w, sub_h=sps.sub_h)
        if do_sao:
            planes = []
            for i, p in enumerate((y, cb, cr)):
                lg = sps.log2_ctb_size - (0 if i == 0
                                          else sps.sub_w.bit_length() - 1)
                planes.append(sao_plane_jax(
                    p, sao_t[0][i], sao_b[0][i], sao_o[0][i],
                    sao_e[0][i], lg, bd))
            y, cb, cr = planes
        return y[None], cb[None], cr[None]

    f = P("frame")
    in_specs = (f, (f,) * 4, (f,) * 4, (f,) * 4, (f,) * 4,
                (f,) * len(mc_shapes), (f,) * 4,
                P(), P(), (P(),) * 4,
                f, f, f, f,
                f, f, f, f)
    out_specs = (f, f, f)
    kw = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        fn = shard_map(body, check_rep=False, **kw)
    except TypeError:
        fn = shard_map(body, **kw)

    args = (arrays["canvas"], tuple(arrays["scal"]),
            tuple(arrays["avail"]), tuple(arrays["levels"]),
            tuple(arrays["rmeta"]), tuple(arrays["mc_fields"]),
            tuple(arrays["resid_fields"]), refs_l, refs_c,
            tuple(jnp.asarray(b) for b in spec["scale_bank"]),
            np.stack(qp4s), np.stack(bss_v), np.stack(bss_h),
            np.asarray(dboffs, np.int32),
            np.stack([s[0] for s in saos]),
            np.stack([s[1] for s in saos]),
            np.stack([s[2] for s in saos]),
            np.stack([s[3] for s in saos]))
    ys, cbs, crs = jax.jit(fn)(*args)
    got = [(np.asarray(ys[k]), np.asarray(cbs[k]), np.asarray(crs[k]))
           for k in range(n_b)]
    want = [[np.asarray(p) for p in by_poc[k + 1].planes]
            for k in range(n_b)]
    return got, want
