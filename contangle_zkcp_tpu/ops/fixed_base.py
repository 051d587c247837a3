"""Batched fixed-base scalar multiplication on device (CRS generation).

Groth16 `setup` computes millions of k_i·G for a handful of fixed bases
(tau powers, a/b/h/l queries — ark-groth16's CRS; SURVEY.md §3.1).  The
round-1 host `FixedBaseTable` did one serial Python windowed mul per CRS
element, which cannot reach the reference's n=196,608 scale.  This engine
is the TPU formulation:

  * host precomputes the small window table once per base:
    table[j][d] = d * 2^(j*c) * G for j < K windows, d < 2^c
    (K * 2^c ≈ 8k host adds — milliseconds-scale one-time cost);
  * the table lives on device as a flat (K * 2^c) point batch;
  * a batch of N scalars becomes (K, N) digits (ops.msm.digits_from_limbs),
    gathers K points per scalar, and reduces over K with a balanced tree
    of batched complete adds — log2(K) fused-kernel rounds, each a single
    (K/2^level * N)-lane EC add.

Identity handling is free: table entry d=0 is the identity (0:1:0) and the
RCB formula is complete.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.weierstrass import SWDevice
from ..fields.bigint import LIMB_BITS, ints_to_limbs
from .msm import digits_from_limbs


class FixedBaseDevice:
    """Device windowed fixed-base multiplier for one base point."""

    def __init__(self, dev: SWDevice, base, bits: int, c: int = 8, chunk: int | None = None):
        self.dev = dev
        self.c = c
        self.bits = bits
        if chunk is not None:
            self.CHUNK = chunk
        self.K = -(-bits // c)
        # host: build the K x 2^c window table (exact Python ints)
        add = dev.host_add
        rows = []
        cur = base
        for _ in range(self.K):
            row = [None]
            acc = None
            for _ in range(1, 1 << c):
                acc = add(acc, cur)
                row.append(acc)
            rows.append(row)
            for _ in range(c):
                cur = add(cur, cur)
        flat = [p for row in rows for p in row]
        self._table = dev.encode_points(flat)  # (K * 2^c) batch
        self._mul_batch = jax.jit(self._mul_batch_impl)

    def _mul_batch_impl(self, digits):
        """digits: (K, N) uint32 -> point batch (N,)."""
        dev, c = self.dev, self.c
        K = self.K
        N = digits.shape[1]
        base = jnp.arange(K, dtype=digits.dtype)[:, None] * (1 << c)
        flat_idx = (digits + base).reshape(-1)  # (K*N,)
        pts = {
            k: jnp.take(self._table[k], flat_idx, axis=0) for k in ("x", "y", "z")
        }
        pts = jax.tree.map(lambda a: a.reshape((K, N) + a.shape[1:]), pts)
        # balanced tree reduce over the window axis
        k = K
        while k > 1:
            half = k // 2
            lo = jax.tree.map(lambda a: a[:half], pts)
            hi = jax.tree.map(lambda a: a[half : 2 * half], pts)
            merged = dev.add(
                jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), lo),
                jax.tree.map(lambda a: a.reshape((-1,) + a.shape[2:]), hi),
            )
            merged = jax.tree.map(
                lambda a: a.reshape((half, N) + a.shape[1:]), merged
            )
            if k % 2:
                tail = jax.tree.map(lambda a: a[k - 1 : k], pts)
                first = dev.add(
                    jax.tree.map(lambda a: a[0], merged),
                    jax.tree.map(lambda a: a[0], tail),
                )
                merged = jax.tree.map(
                    lambda m, f: m.at[0].set(f), merged, first
                )
            pts = merged
            k = half
        return jax.tree.map(lambda a: a[0], pts)

    CHUNK = 1 << 17

    def mul_ints(self, scalars, pad_pow2: bool = True):
        """Host ints -> device point batch (projective).

        Work is chunked (CHUNK scalars per dispatch): the gathered
        (K, N) point tree peaks at K*N*3 coordinate planes, which at CRS
        scale (millions of elements) would blow HBM unchunked.  Padding
        to the chunk multiple / power of two keeps the compiled add-tree
        at one shape (zero scalars multiply to identity and are sliced
        off)."""
        n = len(scalars)
        L = -(-self.bits // LIMB_BITS)
        r = self.dev.host_curve.order if self.dev.host_curve else None
        vals = [s if r is None else s % r for s in scalars]
        chunk = self.CHUNK
        if n > chunk:
            pad_to = -(-n // chunk) * chunk
        elif pad_pow2 and n & (n - 1):
            pad_to = 1 << n.bit_length()
        else:
            pad_to = n
        vals = vals + [0] * (pad_to - n)
        arr = ints_to_limbs(vals, L)
        outs = []
        for lo in range(0, pad_to, chunk):
            part = jnp.asarray(arr[lo : lo + chunk])
            digits = digits_from_limbs(part, self.c, self.K)
            outs.append(self._mul_batch(digits))
        out = (
            outs[0]
            if len(outs) == 1
            else {
                k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
            }
        )
        if pad_to != n:
            out = {k: v[:n] for k, v in out.items()}
        return out

    def mul_ints_host(self, scalars):
        """Host ints -> list of affine host points (decode included)."""
        return self.dev.decode_points(self.mul_ints(scalars))
