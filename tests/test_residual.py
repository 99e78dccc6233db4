"""Roundtrip tests for residual_coding encode/decode mirrors."""
import numpy as np
import pytest

from hevc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from hevc_tpu.cabac.ctx import ContextModel
from hevc_tpu.coding.residual import decode_residual, encode_residual


def roundtrip(levels, log2, c_idx, scan, qp=30, init_type=0):
    cm_e = ContextModel(init_type, qp)
    e = CabacEncoder()
    encode_residual(e, cm_e, levels, log2, c_idx, scan)
    e.encode_terminate(1)
    e.terminate_and_align()
    cm_d = ContextModel(init_type, qp)
    d = CabacDecoder(e.getvalue())
    out, *_ = decode_residual(d, cm_d, log2, c_idx, scan)
    assert (out == levels).all(), (levels, out)
    # context states must evolve identically on both sides
    assert cm_e.states == cm_d.states


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_random_blocks(log2, c_idx):
    rng = np.random.default_rng(log2 * 10 + c_idx)
    size = 1 << log2
    for trial in range(40):
        density = rng.uniform(0.02, 0.9)
        lv = (rng.integers(-40, 40, (size, size))
              * (rng.random((size, size)) < density)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = 1
        scan = int(rng.integers(0, 3)) if log2 <= 3 else 0
        roundtrip(lv, log2, c_idx, scan)


def test_escape_golomb_levels():
    for v in (5, 13, 100, 5000, 32767):
        lv = np.zeros((8, 8), np.int32)
        lv[0, 0] = v
        lv[3, 2] = -v
        roundtrip(lv, 3, 0, 0)


def test_single_far_coefficient():
    # exercises last_sig_coeff prefix>3 suffix path and csbf scan
    for (y, x) in ((13, 8), (31, 31), (0, 31), (31, 0), (7, 7)):
        lv = np.zeros((32, 32), np.int32)
        lv[y, x] = 1
        roundtrip(lv, 5, 0, 0)


def test_dc_only_subblock_inference():
    # sub-block with only its DC significant: sig[0] must be inferred
    lv = np.zeros((16, 16), np.int32)
    lv[0, 0] = 2
    lv[4, 4] = 3   # middle sub-block DC only
    lv[12, 12] = 1  # last sub-block
    roundtrip(lv, 4, 0, 0)


def test_rice_adaptation_sequence():
    rng = np.random.default_rng(5)
    lv = rng.integers(-200, 200, (8, 8)).astype(np.int32)
    lv[0, 0] = 2000
    roundtrip(lv, 3, 0, 0)


def test_state_continuity_across_blocks():
    """Multiple blocks sharing one CABAC stream + context model."""
    rng = np.random.default_rng(9)
    blocks = []
    for _ in range(10):
        log2 = int(rng.integers(2, 5))
        size = 1 << log2
        lv = (rng.integers(-9, 9, (size, size))
              * (rng.random((size, size)) < 0.3)).astype(np.int32)
        if not lv.any():
            lv[0, 0] = -2
        blocks.append((lv, log2, int(rng.integers(0, 2))))
    cm_e = ContextModel(0, 26)
    e = CabacEncoder()
    for lv, log2, cidx in blocks:
        encode_residual(e, cm_e, lv, log2, cidx, 0)
    e.encode_terminate(1)
    e.terminate_and_align()
    cm_d = ContextModel(0, 26)
    d = CabacDecoder(e.getvalue())
    for lv, log2, cidx in blocks:
        out, *_ = decode_residual(d, cm_d, log2, cidx, 0)
        assert (out == lv).all()
