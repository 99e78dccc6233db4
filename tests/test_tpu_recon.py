"""JAX stage-B reconstruction: bit-exactness vs the NumPy oracle path.

Runs on the virtual-CPU backend (conftest).  The same jitted pipeline is
what bench.py runs on the real chip.
"""
import numpy as np
import pytest

from hevc_tpu.decoder.core import Decoder
from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
from hevc_tpu.encoder.generate import synth_frame


def _roundtrip_jax(cfg, frames):
    enc = IntraEncoder(cfg)
    stream = bytearray()
    for f in frames:
        stream += enc.encode_frame(f)
    ref = Decoder(recon_backend="inline").decode_bytes(bytes(stream))
    jx = Decoder(recon_backend="jax").decode_bytes(bytes(stream))
    assert len(ref) == len(jx)
    for a, b in zip(ref, jx):
        assert b.md5_ok
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()


def test_jax_recon_basic():
    cfg = EncoderConfig(width=64, height=32, qp=30)
    _roundtrip_jax(cfg, [synth_frame("gradient", 64, 32, t) for t in (0, 1)])


def test_jax_recon_structures():
    cfg = EncoderConfig(width=128, height=64, qp=28, log2_ctb_size=6,
                        split_policy="random",
                        max_transform_hierarchy_depth_intra=2, seed=1,
                        full_mode_search=True)
    _roundtrip_jax(cfg, [synth_frame("noise", 128, 64, 0)])


def test_jax_recon_with_filters():
    cfg = EncoderConfig(width=96, height=48, qp=33, sao=True,
                        deblocking=True, seed=4)
    _roundtrip_jax(cfg, [synth_frame("gradient", 96, 48, 0)])


def test_transforms_bitexact():
    import jax.numpy as jnp

    from hevc_tpu.ops import reference as R
    from hevc_tpu.tpu.transforms import residual_batch

    rng = np.random.default_rng(0)
    for log2 in (2, 3, 4, 5):
        size = 1 << log2
        for bd in (8, 10):
            n = 32
            lv = rng.integers(-32768, 32768, (n, size, size)).astype(np.int32)
            qp = rng.integers(0, 52 + (12 if bd == 10 else 0),
                              n).astype(np.int32)
            dst = (rng.random(n) < 0.5) if log2 == 2 else np.zeros(n, bool)
            ts = (rng.random(n) < 0.3) if log2 == 2 else np.zeros(n, bool)
            out = np.asarray(residual_batch(
                jnp.asarray(lv), jnp.asarray(qp), jnp.asarray(dst),
                jnp.asarray(ts), log2, bd))
            for i in range(n):
                d = R.dequant(lv[i], int(qp[i]), log2, bd)
                ref = (R.transform_skip_residual(d, bd) if ts[i]
                       else R.inverse_transform(d, bd, dst=bool(dst[i])))
                assert (out[i] == ref).all(), (log2, bd, i)


def test_jax_full_pipeline_with_filters():
    """finish_frame_jax: recon + deblock + SAO fused on device."""
    cfg = EncoderConfig(width=64, height=48, qp=33, sao=True,
                        deblocking=True, seed=9)
    frames = [synth_frame("gradient", 64, 48, t, 9) for t in (0, 1)]
    enc = IntraEncoder(cfg)
    stream = bytearray()
    for f in frames:
        stream += enc.encode_frame(f)
    ref = Decoder(recon_backend="inline").decode_bytes(bytes(stream))
    jx = Decoder(recon_backend="jax").decode_bytes(bytes(stream))
    for a, b in zip(ref, jx):
        assert b.md5_ok
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()
