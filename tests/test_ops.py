"""Unit tests for the scalar NumPy reference ops (hevc_tpu.ops.reference).

These pin the spec constants (transform matrices, scans) and basic
properties of dequant / inverse transform / intra prediction; full
conformance is arbitrated end-to-end against the openHEVC oracle.
"""
import math

import numpy as np
import pytest

from hevc_tpu.ops import reference as R


def test_dct4_exact():
    exp = np.array([
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ])
    assert (R.dct_matrix(4) == exp).all()


def test_dct8_exact():
    T = R.dct_matrix(8)
    assert list(T[0]) == [64] * 8
    assert list(T[1]) == [89, 75, 50, 18, -18, -50, -75, -89]
    assert list(T[2]) == [83, 36, -36, -83, -83, -36, 36, 83]
    assert list(T[4]) == [64, -64, -64, 64, 64, -64, -64, 64]


def test_dct_symmetry_and_float_match():
    for n in (4, 8, 16, 32):
        T = R.dct_matrix(n).astype(np.int64)
        # even rows symmetric, odd rows antisymmetric
        for r in range(0, n, 2):
            assert (T[r][::-1] == T[r]).all(), (n, r)
        for r in range(1, n, 2):
            assert (T[r][::-1] == -T[r]).all(), (n, r)
        F = np.array([[math.cos((2 * j + 1) * k * math.pi / (2 * n))
                       for j in range(n)] for k in range(n)]) * 64 * math.sqrt(2)
        F[0] = 64
        assert np.abs(T - F).max() < 1.5, n


def test_dst4_matrix():
    assert (R.DST4[0] == [29, 55, 74, 84]).all()
    assert (R.DST4[3] == [55, -84, 74, -29]).all()


def test_diag_scan_4x4():
    # spec 6.5.3 up-right diagonal order for a 4x4 block
    exp = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0), (0, 3), (1, 2),
           (2, 1), (3, 0), (1, 3), (2, 2), (3, 1), (2, 3), (3, 2), (3, 3)]
    got = [tuple(p) for p in R.diag_scan(4)]
    assert got == exp


def test_dequant_dc_only():
    # qp=0..51 grid: d = (level*16*levelScale[qp%6]<<(qp//6) + rnd) >> shift
    lv = np.zeros((4, 4), np.int64)
    lv[0, 0] = 10
    d = R.dequant(lv, qp=28, log2_size=2, bit_depth=8)
    bd_shift = 8 + 2 - 5
    exp = (10 * 16 * (R.LEVEL_SCALE[28 % 6] << (28 // 6)) + (1 << (bd_shift - 1))) >> bd_shift
    assert d[0, 0] == exp


def test_idct_dc_flat():
    # DC-only coefficient produces a flat residual
    d = np.zeros((8, 8), np.int32)
    d[0, 0] = 256
    r = R.inverse_transform(d, bit_depth=8)
    assert (r == r[0, 0]).all()
    # value: ((256*64+64)>>7)*64 + 2048 >> 12
    e = (256 * 64 + 64) >> 7
    exp = (e * 64 + (1 << 11)) >> 12
    assert r[0, 0] == exp


def test_intra_dc_flat():
    n = 8
    left = np.full(2 * n, 100, np.int32)
    top = np.full(2 * n, 100, np.int32)
    pred = R.intra_predict(R.INTRA_DC, left, top, 100, n, cidx=0, bit_depth=8)
    assert (pred == 100).all()


def test_intra_planar_flat():
    n = 8
    left = np.full(2 * n, 73, np.int32)
    top = np.full(2 * n, 73, np.int32)
    pred = R.intra_predict(R.INTRA_PLANAR, left, top, 73, n, cidx=0, bit_depth=8)
    assert (pred == 73).all()


def test_intra_vertical_copies_top():
    # mode 26, chroma (no post-filter column fix) copies the top row
    n = 8
    top = (np.arange(2 * n) * 3 + 7).astype(np.int32)
    left = np.full(2 * n, 50, np.int32)
    pred = R.intra_predict(26, left, top, 60, n, cidx=1, bit_depth=8)
    for y in range(n):
        assert (pred[y] == top[:n]).all()


def test_intra_horizontal_copies_left():
    n = 8
    left = (np.arange(2 * n) * 2 + 9).astype(np.int32)
    top = np.full(2 * n, 50, np.int32)
    pred = R.intra_predict(10, left, top, 60, n, cidx=1, bit_depth=8)
    for x in range(n):
        assert (pred[:, x] == left[:n]).all()


def test_intra_angular_diag():
    # mode 34 (angle +32): pred[y][x] = top[x+y+1] (45-degree down-left)
    n = 4
    top = np.arange(2 * n, dtype=np.int32) * 10
    left = np.zeros(2 * n, np.int32)
    pred = R.intra_predict(34, left, top, 0, n, cidx=1, bit_depth=8)
    for y in range(n):
        for x in range(n):
            assert pred[y, x] == top[x + y + 1], (x, y)


def test_substitution_all_unavailable():
    n = 4
    left = np.zeros(2 * n, np.int32)
    top = np.zeros(2 * n, np.int32)
    l, t, c = R.prepare_intra_refs(left, top, 0, np.zeros(2 * n, bool),
                                   np.zeros(2 * n, bool), False, n, 8)
    assert (l == 128).all() and (t == 128).all() and c == 128


def test_substitution_propagates():
    n = 4
    left = np.array([10, 20, 30, 40, 0, 0, 0, 0], np.int32)
    top = np.zeros(2 * n, np.int32)
    avail_l = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    l, t, c = R.prepare_intra_refs(left, top, 0, avail_l,
                                   np.zeros(2 * n, bool), False, n, 8)
    # scan starts at bottom of left: left[7] unavailable -> first avail is
    # left[3]=40 (scanning upward), then propagation fills the rest
    assert list(l) == [10, 20, 30, 40, 40, 40, 40, 40]
    assert c == 10
    assert (t == 10).all()


def test_chroma_qp_mapping():
    assert R.chroma_qp(17, 0, 1) == 17
    assert R.chroma_qp(30, 0, 1) == 29
    assert R.chroma_qp(43, 0, 1) == 37
    assert R.chroma_qp(44, 0, 1) == 38
    assert R.chroma_qp(51, 0, 1) == 45
    # 4:4:4 / 4:2:2 use identity clipped at 51
    assert R.chroma_qp(45, 0, 3) == 45
