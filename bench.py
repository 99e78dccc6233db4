"""Benchmark: end-to-end TPU decode throughput vs the openHEVC oracle.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.

Headline metric: END-TO-END frames/sec of the production decode path
(native MT stage A -> native pack -> device-resident stage B pipeline
-> per-frame MD5 check) on a generated 1080p WPP IPP stream, measured
exactly like the reference CLI measures itself (whole-stream wall
clock, MD5 verification on; reference: ohplay.c:377 fps line).
Baseline = the openHEVC oracle binary's full-decode fps on the same
stream on this machine's CPU (single-thread, its only mode here).

extra carries the stage split (stage A / pack / device dispatch / fetch
ms per frame from the built-in tracer) and the legacy 720p device
stage-B kernel metric for cross-round comparability (BENCH_r01).

Artifacts are cached under .bench/ — delete the directory to regenerate.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(ROOT, ".bench")
ORACLE = os.path.join(ROOT, ".oracle", "build", "hevc_nodisplay")

E2E_W, E2E_H, E2E_QP, E2E_FRAMES = 1920, 1080, 30, 8
E2E_TAG = f"e2e_{E2E_W}x{E2E_H}_qp{E2E_QP}_ctb64_wpp"
K4_W, K4_H, K4_QP, K4_FRAMES = 3840, 2160, 30, 4
K4_TAG = f"e2e_{K4_W}x{K4_H}_qp{K4_QP}_ctb64_wpp"


def _synth_stream(path, w, h, qp, frames, wpp, kind="gradient"):
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    enc = IntraEncoder(EncoderConfig(
        width=w, height=h, qp=qp, log2_ctb_size=6, log2_cu_size=6,
        deblocking=True, sao=True, seed=1, gop="ipp", search_range=3,
        wpp=wpp))
    data = bytearray()
    base = synth_frame(kind, w, h, 0, seed=9)
    for t in range(frames):
        y = np.roll(base[0], (t * 4, t * 7), (0, 1))
        cb = np.roll(base[1], (t * 2, t * 3), (0, 1))
        cr = np.roll(base[2], (t * 2, t * 3), (0, 1))
        data += enc.encode_frame([y, cb, cr])
    with open(path, "wb") as f:
        f.write(data)


def ensure_stream(tag, w, h, qp, frames, wpp, kind="gradient"):
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, tag + ".265")
    if not os.path.exists(path):
        _synth_stream(path, w, h, qp, frames, wpp, kind)
    return path


def oracle_fps(stream_path, tag, frames):
    meta = os.path.join(CACHE, "oracle_fps_" + tag + ".json")
    if os.path.exists(meta):
        return json.load(open(meta))["fps"]
    if not os.path.exists(ORACLE):
        return None
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        r = subprocess.run([ORACLE, "-i", stream_path, "-o", "/dev/null"],
                           capture_output=True, text=True, timeout=600)
        dt = time.time() - t0
        m = re.search(r"frame=\s*(\d+)", r.stdout + r.stderr)
        n = int(m.group(1)) if m else frames
        best = max(best, n / dt)
    json.dump({"fps": best}, open(meta, "w"))
    return best


def bench_e2e(stream_path):
    """Production-path decode fps + per-stage ms/frame."""
    from hevc_tpu import trace
    from hevc_tpu.decoder.core import Decoder

    data = open(stream_path, "rb").read()

    def run():
        dec = Decoder(check_md5=True, recon_backend="jax")
        frames = dec.decode_bytes(data)
        assert frames and all(f.md5_ok for f in frames), \
            "end-to-end md5 mismatch"
        return len(frames)

    try:
        run()  # warmup: jit compiles, native .so build
    except Exception:
        time.sleep(5)  # transient tunnel hiccup: retry once
        run()
    best = 0.0
    split = {}
    errors = []
    for _ in range(3):
        trace.reset()
        t0 = time.time()
        try:
            n = run()
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))
            time.sleep(5)
            continue
        dt = time.time() - t0
        if n / dt > best:
            best = n / dt
            r = trace.report()
            split = {k: round(v["total_s"] / n * 1e3, 2)
                     for k, v in r.items()}
    if best == 0.0:
        # fail LOUDLY: a silent 0.0 would reach the driver as a real
        # (catastrophic) number instead of a broken run
        raise RuntimeError(f"bench_e2e: all iterations failed: {errors}")
    return best, split


def bench_compute(stream_path):
    """Compute-side decode fps: full production path, outputs stay
    DEVICE-RESIDENT (HBM) — the number a TPU-local consumer sees.
    The device->host tunnel of this rig (a remote-chip RPC link) is
    excluded here and quantified separately; correctness of the same
    stream is asserted by the e2e (md5-checked) run."""
    from hevc_tpu.decoder.core import Decoder

    data = open(stream_path, "rb").read()

    def run():
        dec = Decoder(check_md5=False, recon_backend="jax")
        frames = dec.decode_bytes(data)
        for f in frames:
            rd = getattr(f.planes, "device_ready", None)
            if rd is not None:
                rd()
        return len(frames)

    try:
        run()  # warmup
    except Exception:
        time.sleep(5)
        run()
    best = 0.0
    errors = []
    for _ in range(3):
        t0 = time.time()
        try:
            n = run()
        except Exception as e:  # noqa: BLE001
            errors.append(repr(e))
            time.sleep(5)
            continue
        dt = time.time() - t0
        best = max(best, n / dt)
    if best == 0.0:
        raise RuntimeError(
            f"bench_compute: all iterations failed: {errors}")
    return best


def bench_device_stage_b(stream_path, iters=16):
    """Pure-device stage-B throughput: the production _pipeline_frame
    program fori-looped on-chip over a captured steady-state P frame's
    buffers — no host work, no tunnel.  This is the per-chip stage-B
    ceiling the host pipeline feeds."""
    import jax
    import jax.numpy as jnp

    import hevc_tpu.tpu.pipeline as pl
    from hevc_tpu.decoder.core import Decoder

    data = open(stream_path, "rb").read()
    captured = []
    orig = pl._pipeline_frame

    def wrapper(*args):
        if args[-4]:  # refs_y non-empty: a P frame
            captured.append(args)
        return orig(*args)

    pl._pipeline_frame = wrapper
    try:
        Decoder(check_md5=False, recon_backend="jax").decode_bytes(data)
    finally:
        pl._pipeline_frame = orig
    assert captured, "no P frame captured"
    args = captured[-1]
    (meta, meta16, meta8, avail, levels, bank, canvas,
     refs_y, refs_cb, refs_cr, spec) = args
    meta = jnp.asarray(meta)
    meta16 = jnp.asarray(meta16)
    meta8 = jnp.asarray(meta8)
    avail = jnp.asarray(avail)
    levels = jax.tree_util.tree_map(jnp.asarray, levels)

    @jax.jit
    def timed(meta8, meta, meta16, avail, levels, canvas):
        def body(i, acc):
            flat, _py, _pcb, _pcr = orig(
                meta, meta16, meta8 + i.astype(jnp.int8) * 0 + 0, avail,
                levels, bank, canvas + i.astype(canvas.dtype), refs_y,
                refs_cb, refs_cr, spec)
            return acc + flat[0].astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    timed(meta8, meta, meta16, avail, levels, canvas).block_until_ready()
    t0 = time.time()
    timed(meta8, meta, meta16, avail, levels, canvas).block_until_ready()
    lv_n = dict(spec)["coo"][1] if isinstance(levels, tuple) \
        else int(levels.size)   # dense coeff count (COO rebuilds it)
    return iters / (time.time() - t0), (spec, canvas.shape, lv_n)


def tunnel_probe(nbytes):
    """Measured device->host transfer time for one frame's worth of
    output bytes over this rig's device link."""
    import jax
    import jax.numpy as jnp

    buf = jax.jit(lambda x: x + 1)(jnp.zeros(nbytes, jnp.uint8))
    buf.block_until_ready()
    t0 = time.time()
    np.asarray(buf)
    return (time.time() - t0) * 1e3  # ms


def link_report(tun_ms, nbytes):
    """Link MB/s + a flag when this run's tunnel is >1.5x off the
    rolling median of past runs (VERDICT r4: a 2x-slower tunnel made an
    e2e regression look like a code regression)."""
    mbps = nbytes / 1e6 / max(tun_ms / 1e3, 1e-9)
    hist_path = os.path.join(CACHE, "tunnel_history.json")
    hist = []
    if os.path.exists(hist_path):
        try:
            hist = json.load(open(hist_path))
        except Exception:
            hist = []
    baseline = sorted(hist)[len(hist) // 2] if hist else None
    flagged = bool(baseline
                   and (mbps < baseline / 1.5 or mbps > baseline * 1.5))
    json.dump((hist + [round(mbps, 2)])[-20:], open(hist_path, "w"))
    return round(mbps, 2), flagged, baseline


def _round8(x):
    return -(-x // 8) * 8


def stageb_bytes_model(spec, canvas_shape, levels_n, width, height):
    """Analytic HBM-bytes-per-frame account of the device stage-B
    program (VERDICT r4 next-1a): canvas round-trips per Pallas kernel,
    per-block window DMAs, residual pools, filter + output passes —
    vs the ~1.5*W*H minimum an ideal decoder would write once."""
    S = dict(spec)
    cb = canvas_shape[0] * canvas_shape[1] * 4
    total = 0
    for (is_ch, bi, wp, _kind, w, h, nrow) in S["mc_groups"]:
        ntaps = 4 if is_ch else 8
        wh = _round8(7 + h + ntaps - 1)
        total += 2 * cb                                  # canvas in+out
        total += nrow * wh * 256 * 4 * (2 if bi else 1)  # window DMAs
    pools = sum(n * (4 << c) * (4 << c) * 4
                for c, n in enumerate(S["nlv"]))
    total += levels_n * 2          # levels16 read
    total += 2 * pools             # residual pools write + lane-pack
    for c, n in enumerate(S["resid_rows"]):
        if n:
            s = 4 << c
            total += 2 * cb + n * max(s, 8) * 128 * 4 + pools // 4
    plane = width * height * 4
    frame32 = plane * 3 // 2       # int32 4:2:0 planes
    if S["do_deblock"]:
        total += 4 * frame32       # v pass + h pass (RMW each)
    if S["do_sao"]:
        total += 2 * frame32
    total += 2 * frame32           # region slice + output cast/pads
    minimum = width * height * 3 // 2
    return total, minimum


B720_TAG = "v2ipp_1280x720_qp30_ctb64_filt"


def ensure_packed(stream_path, tag=B720_TAG):
    """Captured + packed per-frame stage-B bundles (cached)."""
    import pickle

    pkl = os.path.join(CACHE, tag + "_v4.pkl")
    if os.path.exists(pkl):
        with open(pkl, "rb") as f:
            return pickle.load(f)
    import hevc_tpu.decoder.core as dcore
    from hevc_tpu.decoder.core import Decoder
    from hevc_tpu.tpu.pack import pack_frame
    from hevc_tpu.tpu.recon import pack_sao_params

    captured = []

    def capture(pic, plan):
        captured.append((pic, list(plan)))
        dcore_orig(pic, plan)

    dcore_orig = dcore.execute_plan_numpy
    dcore.execute_plan_numpy = capture
    try:
        frames = Decoder(recon_backend="plan").decode_bytes(
            open(stream_path, "rb").read())
    finally:
        dcore.execute_plan_numpy = dcore_orig
    assert all(f.md5_ok for f in frames), "stage-A self check failed"
    bundles = []
    for (pic, plan), frame in zip(captured, frames):
        pf = pack_frame(pic, plan)
        sao = pack_sao_params(pic)
        dbp = getattr(pic, "deblock_params", None) or {
            "beta_offset": 0, "tc_offset": 0,
            "cb_qp_offset": 0, "cr_qp_offset": 0}
        bundles.append(dict(
            pf=pf, qp4=pic.qp_y.astype(np.int32),
            bsv=pic.bs_v.astype(np.int32),
            bsh=pic.bs_h.astype(np.int32),
            sao=sao, dbp=dbp,
            do_deblock=getattr(pic, "deblock_params", None) is not None,
            do_sao=bool(getattr(pic, "sao_map", None))
            or bool(getattr(pic, "has_sao", False)),
            sps=(pic.sps.log2_ctb_size, pic.sps.sub_w, pic.sps.sub_h),
            ref=[p.copy() for p in frame.planes]))
    with open(pkl, "wb") as f:
        pickle.dump(bundles, f)
    return bundles


def bench_stage_b_720p():
    """Legacy device-kernel metric (BENCH_r01/r02 comparability):
    on-device stage-B fps at 720p, timed with a fori_loop so host
    dispatch is excluded."""
    stream = ensure_stream(B720_TAG, 1280, 720, 30, 3, wpp=False)
    bundles = ensure_packed(stream, B720_TAG)

    import jax
    import jax.numpy as jnp

    from hevc_tpu.tpu.recon import (_mc_args, _pallas_kwargs,
                                    decode_frame_device)

    b = bundles[-1]  # steady-state P frame
    pf = b["pf"]
    log2_ctb, sub_w, sub_h = b["sps"]
    regions = tuple(pf.region[p] for p in range(3))
    sao_t, sao_b, sao_e, sao_c = b["sao"]
    args = (
        jnp.asarray(pf.canvas),
        tuple(jnp.asarray(v) for v in pf.scal),
        tuple(jnp.asarray(v) for v in pf.avail),
        tuple(jnp.asarray(v) for v in pf.levels),
        tuple(jnp.asarray(v) for v in pf.rmeta),
        jnp.asarray(b["qp4"]), jnp.asarray(b["bsv"]),
        jnp.asarray(b["bsh"]),
        b["dbp"]["beta_offset"], b["dbp"]["tc_offset"],
        b["dbp"]["cb_qp_offset"], b["dbp"]["cr_qp_offset"],
        tuple(jnp.asarray(sao_t[p]) for p in range(3)),
        tuple(jnp.asarray(sao_b[p]) for p in range(3)),
        tuple(jnp.asarray(sao_e[p]) for p in range(3)),
        tuple(jnp.asarray(sao_c[p]) for p in range(3)),
    )
    mc_fields, refs_l, refs_c, resid_fields, mc_shapes = _mc_args(pf)
    kw = dict(mc_fields=mc_fields, refs_l=refs_l, refs_c=refs_c,
              resid_fields=resid_fields, **_pallas_kwargs(pf))
    statics = dict(bit_depth=pf.bit_depth, n_chunks=pf.n_chunks,
                   regions=regions, do_deblock=b["do_deblock"],
                   do_sao=b["do_sao"], ctb_log2=log2_ctb,
                   sub_w=sub_w, sub_h=sub_h, mc_shapes=mc_shapes)
    statics_kw = dict(statics, **kw)

    planes = decode_frame_device(*args, **statics_kw)
    for p, out in enumerate(planes):
        assert (np.asarray(out) == b["ref"][p].astype(np.int32)).all(), \
            f"device pipeline mismatch plane {p}"

    iters = 16
    canvas = args[0]
    rest = args[1:]

    @jax.jit
    def timed_loop(canvas, *rest):
        def body(i, acc):
            y, cb, cr = decode_frame_device(canvas + i, *rest,
                                            **statics_kw)
            return acc + y[0, 0] + cb[0, 0] + cr[0, 0]
        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    timed_loop(canvas, *rest).block_until_ready()
    t0 = time.time()
    timed_loop(canvas, *rest).block_until_ready()
    fps = iters / (time.time() - t0)

    # ---- per-kernel microbenchmarks (720p bundle) -----------------------
    from hevc_tpu.tpu.filters import deblock_jax, sao_plane_jax
    from hevc_tpu.tpu.intra import reconstruct_wavefront
    from hevc_tpu.tpu.recon import _residuals

    def timeit(fn, *a, n=16, **kws):
        jax.block_until_ready(fn(*a, **kws))
        t0 = time.time()
        for _ in range(n):
            out = fn(*a, **kws)
        jax.block_until_ready(out)
        return round((time.time() - t0) / n * 1e6, 1)  # us

    y = jnp.asarray(b["ref"][0].astype(np.int32))
    cb = jnp.asarray(b["ref"][1].astype(np.int32))
    cr = jnp.asarray(b["ref"][2].astype(np.int32))
    kus = {}
    kgb = {}  # achieved GB/s (minimal in+out traffic / time)
    ypix = y.shape[0] * y.shape[1]
    frame_mb = ypix * 1.5 * 4 * 2 / 1e6  # int32 planes in+out
    # measured elementwise ceiling of THIS device (one full-plane
    # read-modify-write) — the honest roofline for these filters
    ew_us = timeit(jax.jit(lambda p: p + 1), y)
    kgb["roofline_elementwise"] = round(ypix * 4 * 2 / 1e6
                                        / (ew_us / 1e3), 2)
    kus["deblock_720p"] = timeit(
        deblock_jax, y, cb, cr, args[5], args[6], args[7], 0, 0, 0, 0,
        bd=pf.bit_depth, sub_w=sub_w, sub_h=sub_h)
    kgb["deblock_720p"] = round(frame_mb / (kus["deblock_720p"] / 1e3),
                                2)
    kus["sao_luma_720p"] = timeit(
        sao_plane_jax, y, args[12][0], args[13][0], args[14][0],
        args[15][0], log2_ctb, pf.bit_depth)
    kgb["sao_luma_720p"] = round(ypix * 4 * 2 / 1e6
                                 / (kus["sao_luma_720p"] / 1e3), 2)
    resids = jax.jit(_residuals, static_argnames=("bit_depth",))(
        tuple(jnp.asarray(v) for v in pf.levels),
        tuple(jnp.asarray(v) for v in pf.rmeta), pf.bit_depth,
        tuple(jnp.asarray(v) for v in pf.scale_bank))
    kus["dequant_idct_720p"] = timeit(
        jax.jit(_residuals, static_argnames=("bit_depth",)),
        tuple(jnp.asarray(v) for v in pf.levels),
        tuple(jnp.asarray(v) for v in pf.rmeta), pf.bit_depth,
        tuple(jnp.asarray(v) for v in pf.scale_bank))
    kus["intra_wavefront_720p"] = timeit(
        jax.jit(reconstruct_wavefront,
                static_argnames=("bd", "n_chunks")),
        args[0], args[1], args[2], resids, bd=pf.bit_depth,
        n_chunks=pf.n_chunks)
    return fps, kus, kgb


def ensure_banded_stream(nb):
    """CTB-64 768p-class IPP GOP with nb column tiles — shared with
    __graft_entry__.dryrun_multichip's production-scale band case."""
    os.makedirs(CACHE, exist_ok=True)
    path = os.path.join(CACHE, f"dryrun_720p_ctb64_ipp_t{nb}.265")
    if not os.path.exists(path):
        from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
        from hevc_tpu.encoder.generate import synth_frame
        enc = IntraEncoder(EncoderConfig(
            width=1280, height=768, qp=32, log2_ctb_size=6,
            log2_cu_size=6, gop="ipp", tiles=(nb, 1), deblocking=True,
            sao=True, seed=3, search_range=3))
        data = bytearray()
        for t in range(2):
            data += enc.encode_frame(synth_frame("gradient", 1280, 768,
                                                 t, seed=5))
        with open(path, "wb") as f:
            f.write(data)
    return path


def bench_multihost():
    """Multi-host scaling efficiency (BASELINE: >=80% 1 -> N hosts).

    fps(2 processes x 2 devices) / fps(1 process x 4 devices) on the
    CTB-64 768p banded GOP, steady-state (reps=2, compile excluded).
    Constant device count isolates the cross-host boundary cost (the
    collectives ride grpc between processes instead of staying
    in-process); on this rig hosts are emulated with virtual CPU
    devices, so adding per-host compute is not measurable — the
    boundary overhead is the honest scaling signal."""
    import socket
    import subprocess as sp
    stream = ensure_banded_stream(4)
    worker = os.path.join(ROOT, "tools", "dist_banded_worker.py")

    def free_port():
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    def run(nproc, ldev):
        port = str(free_port())
        cmds = [[sys.executable, worker, port, str(pid), str(nproc),
                 str(ldev), "2", "1280", "768", stream, "2"]
                for pid in range(nproc)]
        procs = [sp.Popen(c, stdout=sp.PIPE, stderr=sp.STDOUT)
                 for c in cmds]
        outs = [p.communicate(timeout=900)[0].decode(errors="replace")
                for p in procs]
        for p, out in zip(procs, outs):
            if p.returncode != 0:
                raise RuntimeError(f"dist worker failed: {out[-800:]}")
        m = re.search(r"decode_s=([0-9.]+)", outs[0])
        return float(m.group(1))

    t_single = run(1, 4)
    t_multi = run(2, 2)
    return {
        "multihost_scaling_efficiency": round(t_single / t_multi, 3),
        "multihost_geometry": "1280x768 ctb64 ipp 2f, 4 bands: "
                              "1proc x 4dev vs 2proc x 2dev, reps=2",
        "multihost_decode_s_1host": round(t_single, 3),
        "multihost_decode_s_2host": round(t_multi, 3),
    }


def bench_shvc():
    """SHVC layer-overlap cost: 2-layer (640x384 BL -> 1280x768 EL)
    decode vs a single-layer stream at EL resolution, compute tier.

    The inter-layer reference is built device-to-device (BL planes ->
    CGS/upsample -> padded EL device-DPB seed) so the layers queue
    back-to-back on the chip with no tunnel rendezvous; the residual
    ratio above 1x is the 2-core host serializing both layers' stage
    A/pack (a >=4-core host pipelines them)."""
    import time as _t

    import numpy as np

    from hevc_tpu.decoder.core import Decoder
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame
    from hevc_tpu.encoder.shvc import ShvcEncoder

    two = os.path.join(CACHE, "shvc_360to720_ipp.265")
    one = os.path.join(CACHE, "shvc_el_only_720.265")
    elb = synth_frame("zoneplate", 1280, 768, 0)
    if not os.path.exists(two):
        bl = EncoderConfig(width=640, height=384, qp=32, log2_ctb_size=5,
                           log2_cu_size=5, gop="ipp", search_range=2,
                           seed=3)
        el = EncoderConfig(width=1280, height=768, qp=30,
                           log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                           search_range=2, seed=4, deblocking=True,
                           sao=True)
        enc = ShvcEncoder(bl, el)
        blb = synth_frame("gradient", 640, 384, 0)
        s = bytearray()
        for t in range(6):
            s += enc.encode_frame(
                [np.roll(p, (t * 2, t * 3), (0, 1)) for p in blb],
                [np.roll(p, (t * 4, t * 6), (0, 1)) for p in elb])
        open(two, "wb").write(bytes(s))
    if not os.path.exists(one):
        el1 = EncoderConfig(width=1280, height=768, qp=30,
                            log2_ctb_size=5, log2_cu_size=5, gop="ipp",
                            search_range=2, seed=4, deblocking=True,
                            sao=True)
        e1 = IntraEncoder(el1)
        s1 = bytearray()
        for t in range(6):
            s1 += e1.encode_frame(
                [np.roll(p, (t * 4, t * 6), (0, 1)) for p in elb])
        open(one, "wb").write(bytes(s1))

    def run(path, layer):
        data = open(path, "rb").read()
        dec = Decoder(check_md5=False, recon_backend="jax",
                      target_layer=layer)
        t0 = _t.time()
        frames = dec.decode_bytes(data)
        for f in frames:
            rd = getattr(f.planes, "device_ready", None)
            if rd:
                rd()
        return _t.time() - t0

    run(two, 1)
    run(one, 0)  # warm compiles
    t2 = min(run(two, 1) for _ in range(3))
    t1 = min(run(one, 0) for _ in range(3))
    return {"shvc_2layer_s": round(t2, 3),
            "shvc_el_only_s": round(t1, 3),
            "shvc_2layer_vs_el_only": round(t2 / t1, 2)}


def _enable_jit_cache():
    """Persist compiled executables under .bench so repeat bench runs
    skip the (minutes-long at 1080p) first-compile cost."""
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(CACHE, "jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.3)
    except Exception:
        pass  # older jax: run uncached


def main():
    _enable_jit_cache()
    stream = ensure_stream(E2E_TAG, E2E_W, E2E_H, E2E_QP, E2E_FRAMES,
                           wpp=True)
    base = oracle_fps(stream, E2E_TAG, E2E_FRAMES)
    k4 = ensure_stream(K4_TAG, K4_W, K4_H, K4_QP, K4_FRAMES, wpp=True)
    k4_base = oracle_fps(k4, K4_TAG, K4_FRAMES)
    # compute tiers FIRST: measured in-process after the e2e runs they
    # read up to 5x lower (the e2e fetches leave the shared tunnel and
    # allocator hot), which misattributes link artifacts to compute
    compute_fps = bench_compute(stream)
    k4_compute = bench_compute(k4)
    e2e_fps, split = bench_e2e(stream)
    k4_e2e, k4_split = bench_e2e(k4)

    # harder content: high-entropy noise at 720p (VERDICT r3 weak 7 —
    # the gradient stream flatters stage A and MC)
    nz = ensure_stream("e2e_1280x720_qp28_noise_wpp", 1280, 720, 28, 6,
                       wpp=True, kind="noise")
    nz_e2e, _nz_split = bench_e2e(nz)
    nz_base = oracle_fps(nz, "e2e_1280x720_qp28_noise_wpp", 6)
    nz_compute = bench_compute(nz)

    dev_1080, cap_1080 = bench_device_stage_b(stream)
    dev_4k, cap_4k = bench_device_stage_b(k4, iters=6)
    by_1080, min_1080 = stageb_bytes_model(*cap_1080, E2E_W, E2E_H)
    by_4k, min_4k = stageb_bytes_model(*cap_4k, K4_W, K4_H)

    # rig tunnel cost for one frame of 4:2:0 8-bit output
    tun_1080 = tunnel_probe(E2E_W * E2E_H * 3 // 2)
    tun_4k = tunnel_probe(K4_W * K4_H * 3 // 2)
    link_mbps, link_flagged, link_base = link_report(
        tun_1080, E2E_W * E2E_H * 3 // 2)

    stage_b_720, kernel_us, kernel_gbps = bench_stage_b_720p()

    try:
        mh = bench_multihost()
    except Exception as e:  # noqa: BLE001 — auxiliary metric, loud note
        mh = {"multihost_scaling_efficiency": None,
              "multihost_error": repr(e)[:300]}
    try:
        mh.update(bench_shvc())
    except Exception as e:  # noqa: BLE001
        mh["shvc_error"] = repr(e)[:300]

    vs = round(e2e_fps / base, 3) if base else None
    print(json.dumps({
        "metric": f"e2e_decode_fps_{E2E_W}x{E2E_H}_wpp_ipp",
        "value": round(e2e_fps, 2),
        "unit": "fps",
        "vs_baseline": vs,
        "extra": {
            "oracle_fps": round(base, 2) if base else None,
            # outputs HBM-resident; tunnel (rig artifact) excluded:
            "compute_fps_1080p": round(compute_fps, 2),
            "compute_vs_oracle_1080p":
                round(compute_fps / base, 3) if base else None,
            "e2e_fps_4k": round(k4_e2e, 2),
            "compute_fps_4k": round(k4_compute, 2),
            "oracle_fps_4k": round(k4_base, 2) if k4_base else None,
            "compute_vs_oracle_4k":
                round(k4_compute / k4_base, 3) if k4_base else None,
            # pure-device stage-B fps (production program fori-looped
            # on-chip, zero host/tunnel involvement): the per-chip
            # throughput ceiling the host stage-A pipeline feeds
            "device_stageB_fps_1080p": round(dev_1080, 2),
            "device_stageB_fps_4k": round(dev_4k, 2),
            "device_stageB_vs_oracle_1080p":
                round(dev_1080 / base, 3) if base else None,
            "device_stageB_vs_oracle_4k":
                round(dev_4k / k4_base, 3) if k4_base else None,
            # measured device->host transfer of one frame's YUV over
            # this rig's remote-chip RPC tunnel — the hard floor under
            # every e2e (md5-on) number on this machine
            "e2e_fps_720p_noise": round(nz_e2e, 2),
            "compute_fps_720p_noise": round(nz_compute, 2),
            "oracle_fps_720p_noise":
                round(nz_base, 2) if nz_base else None,
            "tunnel_ms_per_frame_1080p": round(tun_1080, 1),
            "tunnel_ms_per_frame_4k": round(tun_4k, 1),
            # measured link bandwidth + drift flag vs rolling median of
            # past runs (>1.5x off => e2e numbers are link artifacts)
            "link_MBps": link_mbps,
            "link_flagged": link_flagged,
            "link_rolling_median_MBps": link_base,
            # analytic HBM bytes/frame of the stage-B program vs the
            # 1.5*W*H 8-bit minimum an ideal decoder writes once
            "stageB_bytes_per_frame_1080p": by_1080,
            "stageB_bytes_per_frame_4k": by_4k,
            "stageB_bytes_vs_min_1080p": round(by_1080 / min_1080, 1),
            "stageB_bytes_vs_min_4k": round(by_4k / min_4k, 1),
            "stage_ms_per_frame": split,
            "stage_ms_per_frame_4k": k4_split,
            "stageB_720p_device_fps": round(stage_b_720, 2),
            "kernel_us": kernel_us,
            # achieved GB/s (minimal int32 in+out traffic / time) next
            # to the measured elementwise ceiling of THIS device — the
            # rig's chip tunnels to a device with ~4.5 GB/s effective
            # bandwidth, so "roofline_elementwise" IS the local 100%
            "kernel_gbps": kernel_gbps,
            **mh,
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
