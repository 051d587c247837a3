"""Host-side big-integer <-> limb-array helpers.

Device field elements are arrays of 16-bit limbs stored in uint32 lanes,
little-endian limb order.  16-bit limbs are chosen so that a limb product
fits exactly in a uint32 lane (the widest integer multiply the TPU VPU
supports) and so that column sums of schoolbook products stay far below
2**32 without carry propagation.
"""

from __future__ import annotations

import numpy as np

LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1


def num_limbs(nbits: int) -> int:
    return -(-nbits // LIMB_BITS)


def int_to_limbs(x: int, L: int) -> np.ndarray:
    """Non-negative int -> (L,) uint32 array of 16-bit limbs (LE)."""
    if x < 0:
        raise ValueError("negative")
    out = np.empty(L, dtype=np.uint32)
    for i in range(L):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    if x:
        raise ValueError("integer does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[-1] - 1, -1, -1):
        x = (x << LIMB_BITS) | int(limbs[..., i])
    return x


def ints_to_limbs(xs, L: int) -> np.ndarray:
    """Iterable of ints -> (N, L) uint32 array.

    Vectorized through a little-endian byte buffer (int.to_bytes +
    np.frombuffer) — the per-element Python limb loop was the host-side
    bottleneck for CRS/witness uploads at reference scale (n=196,608)."""
    xs = list(xs)
    nbytes = 2 * L
    try:
        buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    except OverflowError as e:
        raise ValueError("integer does not fit in limbs") from e
    return (
        np.frombuffer(buf, dtype="<u2").reshape(len(xs), L).astype(np.uint32)
    )


def limbs_to_ints(arr) -> list:
    """(..., L) array -> nested list of ints (flattened to leading dim).

    Vectorized: limbs -> one little-endian byte buffer -> per-row
    int.from_bytes (the only remaining per-element work)."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    n, L = flat.shape
    buf = flat.astype("<u2").tobytes()
    nbytes = 2 * L
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(n)
    ]
