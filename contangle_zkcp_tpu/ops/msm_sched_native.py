"""ctypes bridge to the native MSM scheduling engine.

Builds native/msm_schedule.cpp on first use (g++ -O3 -shared) and
returns (order, sgn, counts) for the balanced-lane engine; degrades to
None (callers fall back to the numpy path) when the toolchain or .so
is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SO = None
_TRIED = False
_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_ROOT, "native", "msm_schedule.cpp")
_OUT = os.path.join(_ROOT, "native", "libmsm_schedule.so")


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
        so.msm_schedule.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        _SO = so
    except Exception:
        _SO = None
    return _SO


def available() -> bool:
    return _load() is not None


def schedule(limbs: np.ndarray, K: int, c: int, signed: bool):
    """limbs: (N, L) uint16-valued canonical limbs (any int dtype).

    Returns (order (K,N) int32, sgn (K,N) int8, counts (K,nb) int64)
    with the dead lane (digit 0) dropped from counts, or None if the
    native engine is unavailable.
    """
    so = _load()
    if so is None:
        return None
    N, L = limbs.shape
    limbs16 = np.ascontiguousarray(limbs.astype(np.uint16))
    nb = 1 << (c - 1) if signed else 1 << c
    order = np.empty((K, N), dtype=np.int32)
    sgn = np.empty((K, N), dtype=np.int8)
    counts = np.empty((K, nb + 1), dtype=np.int64)
    so.msm_schedule(
        limbs16.ctypes.data, N, L, K, c, 1 if signed else 0,
        order.ctypes.data, sgn.ctypes.data, counts.ctypes.data,
        os.cpu_count() or 1,
    )
    return order, sgn, counts[:, :nb]
