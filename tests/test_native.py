"""Native C++ residual front-end: bit-exact vs the Python CABAC oracle.

Strategy mirrors the reference's "same streams, every engine, identical
output" validation (SURVEY.md §4): (a) unit level — encode random
residual blocks with the Python CabacEncoder, decode with both the
Python and the C++ decoder, compare levels AND the complete engine +
context state after each block; (b) stream level — full decode of an
encoded sequence with the native path on and off must produce identical
planes.
"""
import os

import numpy as np
import pytest

from hevc_tpu import native
from hevc_tpu.cabac.ctx import ContextModel
from hevc_tpu.cabac.engine import CabacDecoder, CabacEncoder
from hevc_tpu.coding.residual import decode_residual, encode_residual
from hevc_tpu.coding.scans import SCAN_DIAG, SCAN_HORIZ, SCAN_VERT

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


def _random_levels(rng, size, density, mag):
    lv = np.zeros((size, size), np.int32)
    n = max(1, int(size * size * density))
    ys = rng.integers(0, size, n)
    xs = rng.integers(0, size, n)
    vals = rng.integers(1, mag, n) * rng.choice([-1, 1], n)
    lv[ys, xs] = vals
    if not lv.any():
        lv[0, 0] = 1
    return lv


def _apply_sdh_parity(lv, log2_size, scan):
    """Force the hidden-sign convention per 4x4 sub-block: where sign data
    hiding applies, the first-in-coding-order coefficient's sign must equal
    the parity of the sub-block's absolute sum (the quantizer's job)."""
    from hevc_tpu.coding.scans import block_scan

    size = lv.shape[0]
    sub_scan, coef_scan, _ = block_scan(scan, log2_size)
    for xs, ys in sub_scan:
        blk = lv[ys * 4:ys * 4 + 4, xs * 4:xs * 4 + 4]
        pos = [n for n in range(16)
               if blk[coef_scan[n][1], coef_scan[n][0]] != 0]
        if not pos or pos[-1] - pos[0] < 4:
            continue
        sum_abs = int(np.abs(blk).sum())
        y0, x0 = coef_scan[pos[0]][1], coef_scan[pos[0]][0]
        want = -1 if (sum_abs & 1) else 1
        blk[y0, x0] = want * abs(blk[y0, x0])
    return lv


@pytest.mark.parametrize("log2_size", [2, 3, 4, 5])
@pytest.mark.parametrize("scan", [SCAN_DIAG, SCAN_HORIZ, SCAN_VERT])
def test_native_residual_bit_exact(log2_size, scan):
    if scan != SCAN_DIAG and log2_size > 3:
        pytest.skip("mode-dependent scans only for small TUs")
    rng = np.random.default_rng(100 * log2_size + scan)
    size = 1 << log2_size
    for trial in range(12):
        c_idx = int(rng.integers(0, 3))
        sdh = bool(rng.integers(0, 2))
        ts_allowed = bool(rng.integers(0, 2)) and log2_size == 2
        density = float(rng.uniform(0.02, 0.9))
        mag = int(rng.integers(2, 200))
        blocks = [_random_levels(rng, size, density, mag) for _ in range(4)]
        if sdh:
            blocks = [_apply_sdh_parity(lv, log2_size, scan)
                      for lv in blocks]

        # encode all blocks in one CABAC payload (shared engine + contexts)
        enc = CabacEncoder()
        cme = ContextModel(0, 30)
        for lv in blocks:
            encode_residual(enc, cme, lv, log2_size, c_idx, scan,
                            sign_data_hiding=sdh,
                            transform_skip_allowed=ts_allowed,
                            ts_flag=0)
        enc.encode_terminate(1)
        enc.terminate_and_align()
        payload = enc.getvalue()

        # decode twice: Python oracle vs native, comparing full state
        dp = CabacDecoder(payload)
        cmp_ = ContextModel(0, 30)
        dn = CabacDecoder(payload)
        cmn = ContextModel(0, 30)
        for lv in blocks:
            got_p, ts_p, *_rx = decode_residual(
                dp, cmp_, log2_size, c_idx, scan, sign_data_hiding=sdh,
                transform_skip_allowed=ts_allowed, tq_bypass=False)
            got_n, ts_n = native.decode_residual(
                dn, cmn, log2_size, c_idx, scan, sign_data_hiding=sdh,
                transform_skip_allowed=ts_allowed, tq_bypass=False)
            assert (got_p == lv).all()
            assert (got_n == lv).all()
            assert ts_p == ts_n
            assert cmp_.states == cmn.states
            assert (dp.bytepos, dp.range, dp.offset, dp._bitbuf,
                    dp._nbits) == (dn.bytepos, dn.range, dn.offset,
                                   dn._bitbuf, dn._nbits)


def test_native_stream_decode_matches_python(monkeypatch):
    """Full decode with native on vs off → identical planes."""
    from hevc_tpu.encoder.core import EncoderConfig, IntraEncoder
    from hevc_tpu.encoder.generate import synth_frame

    w, h = 128, 64
    enc = IntraEncoder(EncoderConfig(width=w, height=h, qp=27,
                                     deblocking=True, sao=True))
    data = bytearray()
    for t in range(2):
        data += enc.encode_frame(synth_frame("gradient", w, h, t))
    data = bytes(data)

    import hevc_tpu.decoder.core as dcore
    from hevc_tpu.decoder.core import Decoder

    def run():
        dcore._NATIVE_RESIDUAL = None  # re-resolve under the env toggle
        frames = Decoder().decode_bytes(data)
        dcore._NATIVE_RESIDUAL = None
        return frames

    monkeypatch.setenv("HEVC_TPU_NATIVE", "1")
    fast = run()
    monkeypatch.setenv("HEVC_TPU_NATIVE", "0")
    slow = run()
    assert len(fast) == len(slow) == 2
    for a, b in zip(fast, slow):
        assert a.md5_ok is not False and b.md5_ok is not False
        for pa, pb in zip(a.planes, b.planes):
            assert (pa == pb).all()
