"""Batched Fq2 = Fq[u]/(u^2+1) arithmetic on limb planes (device).

Elements are (..., 2, L) uint32 Montgomery limb arrays (c0 at [..., 0, :]).
Duck-types the subset of the `Fp` interface the Weierstrass module needs,
so G1 (over Fp) and G2 (over Fq2) share one group-law implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import Fp


class Fq2Device:
    def __init__(self, F: Fp):
        self.F = F
        self.p = F.p
        self.mul = jax.jit(self._mul_impl)
        self.add = jax.jit(self._add_impl)
        self.sub = jax.jit(self._sub_impl)
        self.neg = jax.jit(self._neg_impl)
        self.square = jax.jit(self._square_impl)
        self.inv = jax.jit(self._inv_impl)

    # host conversions: element = (c0, c1) int tuple
    def encode(self, cs):
        single = isinstance(cs, tuple) and len(cs) == 2 and isinstance(cs[0], int)
        if single:
            cs = [cs]
        c0 = self.F.encode([c[0] for c in cs])
        c1 = self.F.encode([c[1] for c in cs])
        arr = np.stack([c0, c1], axis=-2)  # (N, 2, L)
        return arr[0] if single else arr

    def decode(self, arr):
        arr = np.asarray(arr)
        single = arr.ndim == 2
        flat = arr.reshape(-1, 2, self.F.L)
        c0 = self.F.decode(flat[:, 0])
        c1 = self.F.decode(flat[:, 1])
        out = list(zip(c0, c1))
        return out[0] if single else out

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + (2, self.F.L), dtype=jnp.uint32)

    def one_mont(self, shape=()):
        one = jnp.asarray(self.F.one_mont_limbs)
        zero = jnp.zeros_like(one)
        e = jnp.stack([one, zero], axis=-2)
        return jnp.broadcast_to(e, tuple(shape) + (2, self.F.L))

    # batched ops; operands (..., 2, L)
    def _add_impl(self, a, b):
        return self.F._add_impl(a, b)

    def _sub_impl(self, a, b):
        return self.F._sub_impl(a, b)

    def _neg_impl(self, a):
        return self.F._neg_impl(a)

    def _mul_impl(self, a, b):
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        v0 = F._mul_impl(a0, b0)
        v1 = F._mul_impl(a1, b1)
        c0 = F._sub_impl(v0, v1)
        t = F._mul_impl(F._add_impl(a0, a1), F._add_impl(b0, b1))
        c1 = F._sub_impl(F._sub_impl(t, v0), v1)
        return jnp.stack([c0, c1], axis=-2)

    def _square_impl(self, a):
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        c0 = F._mul_impl(F._add_impl(a0, a1), F._sub_impl(a0, a1))
        t = F._mul_impl(a0, a1)
        c1 = F._add_impl(t, t)
        return jnp.stack([c0, c1], axis=-2)

    def _inv_impl(self, a):
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = F._add_impl(F._mul_impl(a0, a0), F._mul_impl(a1, a1))
        ninv = F._inv_impl(norm)
        c0 = F._mul_impl(a0, ninv)
        c1 = F._neg_impl(F._mul_impl(a1, ninv))
        return jnp.stack([c0, c1], axis=-2)

    def batch_inv(self, a):
        """Batched inversion via the norm map: (a0 + a1 u)^-1 =
        (a0 - a1 u) / (a0^2 + a1^2) — ONE Fp batched inversion (the
        Montgomery product tree in fp.py) plus two multiplies, so the
        affine MSM tree pays the same per-level Fermat chain for G2 as
        for G1.  Zero maps to zero (p = 3 mod 4: the norm vanishes only
        at zero; Fp.batch_inv is zero-preserving)."""
        F = self.F
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = F._add_impl(F._mul_impl(a0, a0), F._mul_impl(a1, a1))
        ninv = F.batch_inv(norm)
        c0 = F._mul_impl(a0, ninv)
        c1 = F._neg_impl(F._mul_impl(a1, ninv))
        return jnp.stack([c0, c1], axis=-2)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def select(self, cond, a, b):
        return jnp.where(cond[..., None, None], a, b)
