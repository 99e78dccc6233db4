"""On-device CABAC engine (Pallas) vs the Python engine, bit-exact.

Round-trips real arithmetic streams: random schedules of context-coded
/ bypass / terminate bins are ENCODED with the production CabacEncoder
(contexts initialized per 9.3.2.2 from real init types), then decoded
by the Pallas kernel in interpret mode — one grid row per stream, the
wavefront shape of SURVEY §7's on-device stage A."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.cabac.ctx import ContextModel  # noqa: E402
from hevc_tpu.cabac.engine import CabacDecoder, CabacEncoder  # noqa: E402
from hevc_tpu.tpu.cabac_pallas import (BYPASS, TERMINATE,  # noqa: E402
                                       decode_rows_pallas)


def _make_row(rng, n_bins, init_type=1, qp=30):
    """Encode one random schedule; returns (bytes, sched, init_states,
    expected_bins)."""
    cm = ContextModel(init_type, qp)
    n_ctx = len(cm.states)
    init_states = list(cm.states)
    enc = CabacEncoder()
    sched = []
    bins = []
    for i in range(n_bins):
        r = rng.random()
        if r < 0.70:
            idx = int(rng.integers(0, n_ctx))
            bit = int(rng.integers(0, 2))
            enc.encode_bin((cm.states, idx), bit)
            sched.append(idx)
        elif r < 0.95:
            bit = int(rng.integers(0, 2))
            enc.encode_bypass(bit)
            sched.append(BYPASS)
        else:
            bit = 0  # mid-stream terminate is always 0
            enc.encode_terminate(0)
            sched.append(TERMINATE)
        bins.append(bit)
    enc.encode_terminate(1)
    enc.terminate_and_align()
    return enc.getvalue(), sched, init_states, bins


def test_pallas_cabac_rows_bit_exact():
    rng = np.random.default_rng(11)
    R, n_bins = 4, 400
    rows = [_make_row(rng, n_bins, init_type=t % 3) for t in range(R)]
    n_ctx = len(rows[0][2])
    n_bytes = max(len(r[0]) for r in rows)
    data = np.zeros((R, n_bytes), np.int32)
    sched = np.zeros((R, n_bins), np.int32)
    init = np.zeros((R, n_ctx), np.int32)
    for k, (buf, sc, st, _b) in enumerate(rows):
        data[k, :len(buf)] = np.frombuffer(buf, np.uint8)
        sched[k] = sc
        init[k] = st

    # sanity: the Python decoder reproduces the bins
    for k, (buf, sc, st, bins) in enumerate(rows):
        d = CabacDecoder(buf)
        states = list(st)
        got = []
        for kind in sc:
            if kind >= 0:
                got.append(d.decode_bin((states, kind)))
            elif kind == BYPASS:
                got.append(d.decode_bypass())
            else:
                got.append(d.decode_terminate())
        assert got == bins, f"python engine row {k}"

    out = decode_rows_pallas(data, sched, init, n_bins=n_bins,
                             n_ctx=n_ctx, n_bytes=n_bytes,
                             interpret=True)
    for k, (_buf, _sc, _st, bins) in enumerate(rows):
        assert np.asarray(out)[k].tolist() == bins, f"pallas row {k}"
