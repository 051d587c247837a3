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
        so.r1cs_eval_abc.argtypes = (
            [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
            + [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64] * 3
            + [ctypes.c_void_p, ctypes.c_int64]
            + [ctypes.c_void_p] * 3
            + [ctypes.c_int64, ctypes.c_int64]
        )
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
    """Canonical ints (< 2^256) -> contiguous (N, 4) little-endian u64.

    One shared byte buffer instead of a per-limb Python loop: the
    conversion layer, not the C++ kernel, was the measured bottleneck
    (xcheck_evalrows: 20s 'native' vs 0.9s pure-Python at 2M nonzeros)."""
    buf = b"".join(v.to_bytes(32, "little") for v in vals)
    return np.frombuffer(buf, dtype="<u8").reshape(-1, 4).copy()


def _coeffs_to_arr(coo, p: int) -> np.ndarray:
    """COO coefficients -> (nnz, 4) u64, memoizing repeated values
    (R1CS coefficients are overwhelmingly ±1 and small constants)."""
    memo = {}
    parts = []
    for _, _, cf in coo:
        bs = memo.get(cf)
        if bs is None:
            bs = (cf % p).to_bytes(32, "little")
            memo[cf] = bs
        parts.append(bs)
    buf = b"".join(parts)
    return np.frombuffer(buf, dtype="<u8").reshape(-1, 4).copy()


def _from_arr(arr) -> list:
    buf = np.ascontiguousarray(arr, dtype="<u8").tobytes()
    return [
        int.from_bytes(buf[i : i + 32], "little") for i in range(0, len(buf), 32)
    ]


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
    rows = np.fromiter((t[0] for t in coo), dtype=np.uint32, count=len(coo))
    cols = np.fromiter((t[1] for t in coo), dtype=np.uint32, count=len(coo))
    coeffs = _coeffs_to_arr(coo, p)
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


def eval_rows_abc(p: int, A, B, C, z, nrows: int, nthreads: int | None = None):
    """All three matrices against one assignment in one native call.

    z is converted once (vs 3x in eval_rows) and row spans run on a small
    thread pool; requires each COO's rows sorted ascending (the builder's
    emission order) — falls back to None otherwise so callers can degrade.
    Returns (a, b, c) lists or None.
    """
    arrs = eval_rows_abc_arr(p, A, B, C, z, nrows, nthreads)
    if arrs is None:
        return None
    return tuple(_from_arr(o) for o in arrs)


def eval_rows_abc_arr(
    p: int, A, B, C, z, nrows: int, nthreads: int | None = None
):
    """eval_rows_abc returning raw (nrows, 4)-u64 canonical limb arrays.

    Skips the array->Python-int decode — callers that feed the device NTT
    (groth16 prove) reinterpret the limbs directly (Fp.encode_u64), so the
    per-element Python boundary disappears from the prove hot path."""
    so = _load()
    if so is None or p.bit_length() > 256 or not (A or B or C):
        return None
    p_l = _limbs64(p)
    r2_l = _limbs64((1 << 512) % p)
    n0inv = (-pow(p, -1, 1 << 64)) % (1 << 64)
    if nthreads is None:
        nthreads = min(4, os.cpu_count() or 1)

    mats = []
    for coo in (A, B, C):
        rows = np.fromiter((t[0] for t in coo), dtype=np.uint32, count=len(coo))
        if len(rows) and (np.diff(rows.astype(np.int64)) < 0).any():
            return None
        cols = np.fromiter((t[1] for t in coo), dtype=np.uint32, count=len(coo))
        mats.append((rows, cols, _coeffs_to_arr(coo, p)))
    z_arr = _to_arr([v % p for v in z])
    outs = [np.zeros((nrows, 4), dtype=np.uint64) for _ in range(3)]
    args = [p_l.ctypes.data, r2_l.ctypes.data, ctypes.c_uint64(n0inv)]
    for rows, cols, coeffs in mats:
        args += [
            rows.ctypes.data, cols.ctypes.data, coeffs.ctypes.data,
            ctypes.c_int64(len(rows)),
        ]
    args += [z_arr.ctypes.data, ctypes.c_int64(len(z))]
    args += [o.ctypes.data for o in outs]
    args += [ctypes.c_int64(nrows), ctypes.c_int64(nthreads)]
    so.r1cs_eval_abc(*args)
    return tuple(outs)
