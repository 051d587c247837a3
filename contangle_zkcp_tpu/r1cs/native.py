"""ctypes bridge to the native host-side R1CS evaluation engine.

Builds native/r1cs_eval.cpp on first use (g++ -O3 -shared); every entry
point degrades gracefully to the pure-Python path when the toolchain or
the .so is unavailable.  Only fields with <=256-bit moduli ride the native
path (4x64 limbs).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SO = None
_TRIED = False
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "r1cs_eval.cpp")
_OUT = os.path.join(_ROOT, "native", "libr1cs_eval.so")


def _load():
    global _SO, _TRIED
    if _TRIED:
        return _SO
    _TRIED = True
    try:
        if not os.path.exists(_OUT) or os.path.getmtime(_OUT) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _OUT],
                check=True,
                capture_output=True,
            )
        so = ctypes.CDLL(_OUT)
        so.r1cs_eval_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        so.fp256_mul_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        _SO = so
    except Exception:
        _SO = None
    return _SO


def available() -> bool:
    return _load() is not None


def _limbs64(x: int) -> np.ndarray:
    out = np.empty(4, dtype=np.uint64)
    for i in range(4):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64
    return out


def _to_arr(vals) -> np.ndarray:
    out = np.empty((len(vals), 4), dtype=np.uint64)
    for i, v in enumerate(vals):
        for j in range(4):
            out[i, j] = v & 0xFFFFFFFFFFFFFFFF
            v >>= 64
    return out


def _from_arr(arr) -> list:
    out = []
    for row in arr:
        v = 0
        for j in range(3, -1, -1):
            v = (v << 64) | int(row[j])
        out.append(v)
    return out


def eval_rows(p: int, coo, z, nrows: int):
    """COO [(row, col, coeff)] x assignment z -> per-row dot products.

    Returns None when the native engine is unavailable (caller falls back).
    """
    so = _load()
    if so is None or p.bit_length() > 256 or not coo:
        return None
    p_l = _limbs64(p)
    r2_l = _limbs64((1 << 512) % p)
    n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    rows = np.asarray([t[0] for t in coo], dtype=np.uint32)
    cols = np.asarray([t[1] for t in coo], dtype=np.uint32)
    coeffs = _to_arr([t[2] % p for t in coo])
    z_arr = _to_arr([v % p for v in z])
    out = np.zeros((nrows, 4), dtype=np.uint64)
    so.r1cs_eval_rows(
        p_l.ctypes.data, r2_l.ctypes.data, ctypes.c_uint64(n0inv),
        rows.ctypes.data, cols.ctypes.data, coeffs.ctypes.data,
        ctypes.c_int64(len(coo)),
        z_arr.ctypes.data, ctypes.c_int64(len(z)),
        out.ctypes.data, ctypes.c_int64(nrows),
    )
    return _from_arr(out)
