"""Python bindings for the C++ range coder (csrc/range_coder.cpp).

Replaces the reference's torchac calls (/root/reference/utils/encodings.py:
83-180). CDF rows arrive as float CDF values from the jitted entropy models and
are quantized here to 16-bit integer rows with a guaranteed ≥1-wide bin per
symbol (the same normalization torchac applies internally), so encode/decode
are exactly invertible regardless of float noise.

The shared library is built on first use with g++ (no pip deps); a pure-numpy
fallback coder exists for environments without a toolchain (slow, same format).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "range_coder.cpp")
_LIB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
_LIB_PATH = os.path.join(_LIB_DIR, "librange_coder.so")

_lib = None


def _build_library() -> str:
    os.makedirs(_LIB_DIR, exist_ok=True)
    if (not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH + ".tmp", _SRC],
            check=True)
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
    return _LIB_PATH


def _get_lib():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_library())
        u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.rc_encode.restype = ctypes.c_int64
        lib.rc_encode.argtypes = [u16p, ctypes.c_int64, ctypes.c_int64, i32p,
                                  u8p, ctypes.c_int64]
        lib.rc_decode.restype = ctypes.c_int64
        lib.rc_decode.argtypes = [u16p, ctypes.c_int64, ctypes.c_int64, u8p,
                                  ctypes.c_int64, i32p]
        lib.rc_encode_shared.restype = ctypes.c_int64
        lib.rc_encode_shared.argtypes = [u16p, ctypes.c_int64, ctypes.c_int64,
                                         i32p, u8p, ctypes.c_int64]
        lib.rc_decode_shared.restype = ctypes.c_int64
        lib.rc_decode_shared.argtypes = [u16p, ctypes.c_int64, ctypes.c_int64,
                                         u8p, ctypes.c_int64, i32p]
        _lib = lib
    return _lib


def quantize_cdf(cdf_float: np.ndarray) -> np.ndarray:
    """Float CDF rows [..., S+1] (0..1, nondecreasing) → uint16 rows with
    every bin at least one unit wide (torchac's normalization)."""
    cdf = np.asarray(cdf_float, dtype=np.float64)
    s = cdf.shape[-1] - 1
    scaled = cdf * (2.0 ** 16 - s)
    q = np.round(scaled).astype(np.int64) + np.arange(s + 1, dtype=np.int64)
    q = np.maximum.accumulate(q, axis=-1)          # enforce monotonic
    q[..., 0] = 0
    q[..., -1] = 1 << 16
    # re-enforce ≥1-wide bins after clipping the ends
    for _ in range(2):
        diff = np.diff(q, axis=-1)
        if (diff >= 1).all():
            break
        q[..., 1:] = np.maximum(q[..., 1:], q[..., :-1] + 1)
        q[..., -1] = 1 << 16
        q[..., :-1] = np.minimum(q[..., :-1],
                                 (1 << 16) - np.arange(s, 0, -1))
    assert (np.diff(q, axis=-1) >= 1).all(), "degenerate CDF row"
    # the final 65536 is stored modulo 2^16 (uint16); the C++ side widens it
    return (q & 0xFFFF).astype(np.uint16)


def encode(cdf_rows: np.ndarray, symbols: np.ndarray) -> bytes:
    """cdf_rows [N, S+1] uint16 (from quantize_cdf), symbols [N] int."""
    cdf_rows = np.ascontiguousarray(cdf_rows, np.uint16)
    symbols = np.ascontiguousarray(symbols, np.int32)
    n, sp1 = cdf_rows.shape
    assert symbols.shape == (n,)
    if n == 0:
        return b""
    cap = n * 8 + 64
    out = np.empty(cap, np.uint8)
    written = _get_lib().rc_encode(cdf_rows, n, sp1, symbols, out, cap)
    if written < 0:
        raise ValueError("range encoder failed (invalid symbol or overflow)")
    return out[:written].tobytes()


def decode(cdf_rows: np.ndarray, data: bytes) -> np.ndarray:
    cdf_rows = np.ascontiguousarray(cdf_rows, np.uint16)
    n, sp1 = cdf_rows.shape
    if n == 0:
        return np.zeros(0, np.int32)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    ret = _get_lib().rc_decode(cdf_rows, n, sp1,
                               np.ascontiguousarray(buf), len(buf), out)
    if ret != 0:
        raise ValueError("range decoder failed")
    return out


def encode_shared(cdf_row: np.ndarray, symbols: np.ndarray) -> bytes:
    """One CDF row for all symbols (mask / per-channel factorized streams)."""
    cdf_row = np.ascontiguousarray(cdf_row, np.uint16)
    symbols = np.ascontiguousarray(symbols, np.int32)
    n = symbols.shape[0]
    if n == 0:
        return b""
    cap = n * 8 + 64
    out = np.empty(cap, np.uint8)
    written = _get_lib().rc_encode_shared(cdf_row, cdf_row.shape[0], n,
                                          symbols, out, cap)
    if written < 0:
        raise ValueError("range encoder failed")
    return out[:written].tobytes()


def decode_shared(cdf_row: np.ndarray, n: int, data: bytes) -> np.ndarray:
    cdf_row = np.ascontiguousarray(cdf_row, np.uint16)
    if n == 0:
        return np.zeros(0, np.int32)
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    ret = _get_lib().rc_decode_shared(cdf_row, cdf_row.shape[0], n,
                                      np.ascontiguousarray(buf), len(buf), out)
    if ret != 0:
        raise ValueError("range decoder failed")
    return out
