"""Native (C++) stage-A front-end: build, load, and marshal.

The reference implements its entropy front-end in C with per-arch
assembly (reference: libavcodec/cabac.c, hevc_cabac.c:2408); this module
is our native-runtime equivalent — a C++ shared library compiled on
first use with the baked-in toolchain and driven through ctypes.  The
Python CABAC engine (hevc_tpu/cabac) remains the correctness oracle;
bit-exact equivalence is asserted by tests/test_native.py.

Set HEVC_TPU_NATIVE=0 to force the pure-Python path.
"""
from __future__ import annotations

import ctypes as C
import os
import subprocess
import sys
from functools import lru_cache

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "residual.cpp")
_SO = os.path.join(_DIR, "_residual.so")

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO + ".tmp"],
            check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
    return _SO


@lru_cache(maxsize=1)
def _lib():
    lib = C.CDLL(_build())
    fn = lib.hevc_native_decode_residual
    fn.restype = C.c_int
    fn.argtypes = [
        C.c_char_p, C.c_int64,                       # data, nbytes
        C.POINTER(C.c_int64),                        # io_bytepos
        C.POINTER(C.c_int32), C.POINTER(C.c_int32),  # io_range, io_offset
        C.POINTER(C.c_int32), C.POINTER(C.c_int32),  # io_bitbuf, io_nbits
        _U8P, _I32P,                                 # ctx, off
        C.c_int32, C.c_int32, C.c_int32,             # log2_size, c_idx, scan
        C.c_int32, C.c_int32, C.c_int32,             # sdh, ts_allowed, tqb
        _I32P, _I32P, _I32P,                         # sub/coef scan, pos map
        _I32P, C.POINTER(C.c_int32),                 # levels, ts_flag
    ]
    return fn


def available() -> bool:
    if os.environ.get("HEVC_TPU_NATIVE", "1") == "0":
        return False
    try:
        _lib()
        return True
    except Exception as e:  # missing toolchain etc. — fall back to Python
        print(f"hevc_tpu.native: disabled ({e})", file=sys.stderr)
        return False


@lru_cache(maxsize=None)
def _ctx_offsets() -> np.ndarray:
    from ..cabac.ctx import CTX_OFFSET

    names = ("transform_skip_flag", "last_sig_coeff_x_prefix",
             "last_sig_coeff_y_prefix", "coded_sub_block_flag",
             "sig_coeff_flag", "coeff_abs_level_greater1_flag",
             "coeff_abs_level_greater2_flag")
    return np.array([CTX_OFFSET[n] for n in names], np.int32)


@lru_cache(maxsize=None)
def _scan_tables(scan_idx: int, log2_size: int):
    from ..coding.scans import block_scan

    sub_scan, coef_scan, pos_of_xy = block_scan(scan_idx, log2_size)
    return (np.ascontiguousarray(sub_scan.reshape(-1), np.int32),
            np.ascontiguousarray(coef_scan.reshape(-1), np.int32),
            np.ascontiguousarray(pos_of_xy.reshape(-1), np.int32))


def decode_residual(d, cm, log2_size: int, c_idx: int, scan_idx: int, *,
                    sign_data_hiding: bool = False,
                    transform_skip_allowed: bool = False,
                    tq_bypass: bool = False):
    """Drop-in replacement for coding.residual.decode_residual backed by
    the C++ kernel.  Marshals the CabacDecoder + ContextModel state in
    and out around the call."""
    fn = _lib()
    size = 1 << log2_size
    ctx = np.array(cm.states, np.uint8)
    sub_scan, coef_scan, pos_of_xy = _scan_tables(scan_idx, log2_size)
    levels = np.empty((size, size), np.int32)

    bytepos = C.c_int64(d.bytepos)
    rng = C.c_int32(d.range)
    off = C.c_int32(d.offset)
    bitbuf = C.c_int32(d._bitbuf)
    nbits = C.c_int32(d._nbits)
    ts_flag = C.c_int32(0)
    rc = fn(d.data, len(d.data), C.byref(bytepos), C.byref(rng),
            C.byref(off), C.byref(bitbuf), C.byref(nbits),
            ctx, _ctx_offsets(),
            log2_size, c_idx, scan_idx,
            int(sign_data_hiding), int(transform_skip_allowed),
            int(tq_bypass),
            sub_scan, coef_scan, pos_of_xy,
            levels.reshape(-1), C.byref(ts_flag))
    assert rc == 0
    d.bytepos = bytepos.value
    d.range = rng.value
    d.offset = off.value
    d._bitbuf = bitbuf.value
    d._nbits = nbits.value
    cm.states[:] = ctx.tolist()
    return levels, int(ts_flag.value)
