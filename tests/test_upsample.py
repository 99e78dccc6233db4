"""SHVC inter-layer upsampling: invariants + JAX/NumPy bit-exactness."""
import numpy as np

from hevc_tpu.ops import upsample as U


def test_x2_constant_preserved():
    bl = [np.full((24, 32), 111, np.int32), np.full((12, 16), 60, np.int32),
          np.full((12, 16), 200, np.int32)]
    out = U.upsample_frame(bl, 64, 48)
    assert (out[0] == 111).all()
    assert (out[1] == 60).all() and (out[2] == 200).all()


def test_x2_phase_structure():
    """x2: even outputs are copies (phase 0 = unit tap)."""
    rng = np.random.default_rng(0)
    bl = rng.integers(0, 256, (16, 24)).astype(np.int32)
    out = U.upsample_frame([bl, bl[:8, :12], bl[:8, :12]], 48, 32)
    assert (out[0][::2, ::2] == bl).all()


def test_x15_and_arbitrary_ratio_shapes():
    rng = np.random.default_rng(1)
    bl = [rng.integers(0, 256, (32, 48)).astype(np.int32),
          rng.integers(0, 256, (16, 24)).astype(np.int32),
          rng.integers(0, 256, (16, 24)).astype(np.int32)]
    for (w, h) in ((72, 48), (100, 60), (96, 64)):
        out = U.upsample_frame(bl, w, h)
        assert out[0].shape == (h, w)
        assert out[1].shape == (h // 2, w // 2)
        assert (out[0] >= 0).all() and (out[0] <= 255).all()


def test_jax_matches_numpy():
    from hevc_tpu.tpu.upsample import upsample_frame_jax
    rng = np.random.default_rng(2)
    bl = [rng.integers(0, 256, (24, 32)).astype(np.int32),
          rng.integers(0, 256, (12, 16)).astype(np.int32),
          rng.integers(0, 256, (12, 16)).astype(np.int32)]
    for (w, h) in ((64, 48), (48, 36), (80, 56)):
        ref = U.upsample_frame(bl, w, h)
        dev = upsample_frame_jax(bl, w, h)
        for a, b in zip(ref, dev):
            assert (a == np.asarray(b)).all(), (w, h)


def test_mv_upscale():
    mv = np.array([[[16, -8], [0, 4]]], np.int32)
    out = U.upscale_mv_field(mv, 32, 24, 64, 48)
    assert (out == np.array([[[32, -16], [0, 8]]])).all()
