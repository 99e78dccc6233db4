import random

import pytest

from hevc_tpu.cabac.ctx import (ContextModel, TOTAL_CONTEXTS,
                                init_context_states)
from hevc_tpu.cabac.engine import CabacDecoder, CabacEncoder


def test_ctx_init_known_values():
    # initValue=154 (CNU) at any qp: slope=(9*5-45)=0, offset=(10<<3)-16=64
    # → pre=64 → state 0, mps 1
    states = init_context_states(0, 26)
    # cu_transquant_bypass_flag has initValue 154 in all types
    from hevc_tpu.cabac.ctx import CTX_OFFSET
    s = states[CTX_OFFSET["cu_transquant_bypass_flag"]]
    assert s == 1  # pState 0, MPS 1


def test_total_contexts():
    assert TOTAL_CONTEXTS == 178


@pytest.mark.parametrize("seed", range(5))
def test_cabac_roundtrip_ctx(seed):
    rng = random.Random(seed)
    nbins = 3000
    # random interleaving of ctx-coded, bypass, and chunked bypass bins
    plan = []
    for _ in range(nbins):
        kind = rng.randrange(6)
        if kind < 3:
            plan.append(("ctx", rng.randrange(TOTAL_CONTEXTS), rng.randrange(2)))
        elif kind < 5:
            plan.append(("byp", None, rng.randrange(2)))
        else:
            n = rng.randrange(1, 17)
            plan.append(("bypn", n, rng.getrandbits(n)))

    enc_ctx = ContextModel(init_type=rng.randrange(3), qp=rng.randrange(52))
    init_snapshot = enc_ctx.save()
    enc = CabacEncoder()
    for kind, a, v in plan:
        if kind == "ctx":
            enc.encode_bin((enc_ctx.states, a), v)
        elif kind == "byp":
            enc.encode_bypass(v)
        else:
            enc.encode_bypass_bits(v, a)
    enc.encode_terminate(1)
    enc.terminate_and_align()
    data = enc.getvalue()

    dec_ctx = ContextModel(0, 26)
    dec_ctx.load(init_snapshot)
    dec = CabacDecoder(data)
    for kind, a, v in plan:
        if kind == "ctx":
            assert dec.decode_bin((dec_ctx.states, a)) == v
        elif kind == "byp":
            assert dec.decode_bypass() == v
        else:
            assert dec.decode_bypass_bits(a) == v
    assert dec.decode_terminate() == 1
    # final context states must agree (encoder and decoder walk in lockstep)
    assert dec_ctx.states == enc_ctx.states


def test_cabac_terminate_zero():
    """end_of_slice_flag=0 occurrences (per CTU) must round-trip."""
    ctx = ContextModel(0, 26)
    snap = ctx.save()
    enc = CabacEncoder()
    for i in range(100):
        enc.encode_bin(ctx.at("split_cu_flag", 0), i & 1)
        enc.encode_terminate(0)
    enc.encode_terminate(1)
    enc.terminate_and_align()
    ctx2 = ContextModel(0, 26)
    ctx2.load(snap)
    dec = CabacDecoder(enc.getvalue())
    for i in range(100):
        assert dec.decode_bin(ctx2.at("split_cu_flag", 0)) == (i & 1)
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1
