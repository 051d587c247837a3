"""Pallas TPU kernel for batched Montgomery multiplication.

The XLA path (fields/fp.py) lowers the schoolbook column reduction to
exact f32 MXU matmuls — correct, but it pays dtype conversions and a
structurally-sparse matmul (~(2L+1)x redundant MACs, see
benchmarks/SOL.md).  This kernel keeps the whole multiply in VMEM as
uint32 VPU arithmetic: shifted-add column accumulation, Kogge-Stone
carry resolution via log-step shifts, wide (SOS) Montgomery reduction —
one fused kernel per batch tile, no HBM roundtrips between steps.

The algorithm is bit-identical to `Fp._mul_impl`; `mont_mul_reference`
below is the same function run as plain jnp (used for interpret-mode and
CPU cross-checks).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bigint import LIMB_BITS, LIMB_MASK, int_to_limbs
from ..fields.fp import Fp

_U32 = jnp.uint32


def _shift_limbs_up(x, k):
    """Shift along the last (limb) axis toward higher indices by k."""
    if k == 0:
        return x
    pad = jnp.zeros(x.shape[:-1] + (k,), x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _ks_resolve(s):
    """Exact carry resolution of limbwise sums (< 2^17 per lane) into
    16-bit limbs, Kogge-Stone with explicit log-step shifts (no
    associative_scan — keeps the graph Pallas-friendly)."""
    g = (s >> LIMB_BITS) & 1
    lo = s & LIMB_MASK
    p = (lo == LIMB_MASK).astype(_U32)
    L = s.shape[-1]
    sh = 1
    while sh < L:
        g_sh = _shift_limbs_up(g, sh)
        p_sh = _shift_limbs_up(p, sh)
        g = g | (p & g_sh)
        p = p & p_sh
        sh *= 2
    cin = _shift_limbs_up(g, 1)
    return (lo + cin) & LIMB_MASK


def _ks_sub(a, b):
    """Exact a - b on 16-bit limb vectors -> (diff, no_borrow mask)."""
    bc = (~b) & LIMB_MASK
    # +1 at limb 0, built via iota (array constants can't be captured in
    # Pallas kernels)
    one = (
        jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1) == 0
    ).astype(_U32)
    s = a + bc + one
    g = (s >> LIMB_BITS) & 1
    lo = s & LIMB_MASK
    p = (lo == LIMB_MASK).astype(_U32)
    L = a.shape[-1]
    sh = 1
    while sh < L:
        g_sh = _shift_limbs_up(g, sh)
        p_sh = _shift_limbs_up(p, sh)
        g = g | (p & g_sh)
        p = p & p_sh
        sh *= 2
    cin = _shift_limbs_up(g, 1)
    out = (lo + cin) & LIMB_MASK
    # after the full scan, g at the top limb is the carry-out of the whole
    # vector: 1 means a >= b (no borrow).  Keep-dims static slice: Mosaic
    # has no lowering for rank-reducing/negative indexing.
    L = a.shape[-1]
    return out, g[..., L - 1 : L]


def _place(v, off, total):
    """Embed (.., L) at limb offset `off` inside a (.., total) vector.
    Pure concatenation — Pallas TPU has no scatter-add lowering."""
    parts = []
    if off:
        parts.append(jnp.zeros(v.shape[:-1] + (off,), v.dtype))
    parts.append(v)
    rest = total - off - v.shape[-1]
    if rest:
        parts.append(jnp.zeros(v.shape[:-1] + (rest,), v.dtype))
    return jnp.concatenate(parts, axis=-1)


def _product_cols(x, y, L):
    """Redundant schoolbook columns (.., 2L+1) via shifted VPU adds."""
    total = 2 * L + 1
    c = jnp.zeros(x.shape[:-1] + (total,), _U32)
    for i in range(L):
        p = x[..., i : i + 1] * y  # (.., L) exact uint32
        c = c + _place(p & LIMB_MASK, i, total)
        c = c + _place(p >> LIMB_BITS, i + 1, total)
    return c


def _normalize(cols, out_len):
    """Resolve redundant columns (lanes < 2^26) exactly to 16-bit limbs."""
    lo = cols & LIMB_MASK
    hi = _shift_limbs_up(cols >> LIMB_BITS, 1)
    s = lo + hi  # lanes < 2^16 + 2^10
    return _ks_resolve(s)[..., :out_len]


def mont_mul_block(a, b, p_limbs, npinv_limbs, L):
    """The full Montgomery multiply on one batch block (pure jnp)."""
    t_cols = _product_cols(a, b, L)
    t_lo = _normalize(t_cols[..., : L + 1], L)
    m_cols = _product_cols(t_lo, npinv_limbs, L)
    m = _normalize(m_cols[..., : L + 1], L)
    mp_cols = _product_cols(m, p_limbs, L)
    total = t_cols + mp_cols
    res = _normalize(total, 2 * L + 1)[..., L : 2 * L + 1]
    out, top = res[..., :L], res[..., L : L + 1]
    d, no_borrow = _ks_sub(out, jnp.broadcast_to(p_limbs, out.shape))
    take = (no_borrow | top) != 0  # (.., 1), broadcasts over limbs
    return jnp.where(take, d, out)


class PallasFieldOps:
    """Pallas-tiled Montgomery multiply for a field instance."""

    def __init__(self, F: Fp, tile: int = 512):
        self.F = F
        self.L = F.L
        self.tile = tile
        self._p = jnp.asarray(F.p_limbs)
        self._np = jnp.asarray(F.npinv_limbs)
        self.mul = jax.jit(partial(self._mul, interpret=False), static_argnames="interpret")
        self.mul_interpret = jax.jit(partial(self._mul, interpret=True), static_argnames="interpret")
        self.mul_reference = jax.jit(self._reference)

    def _reference(self, a, b):
        return mont_mul_block(a, b, self._p, self._np, self.L)

    def _kernel(self, p_ref, np_ref, a_ref, b_ref, o_ref):
        # keep the constants (1, L)-shaped: Mosaic lowers 2D broadcasts
        # fine, while rank-reducing indexing emits unsupported primitives
        o_ref[...] = mont_mul_block(
            a_ref[...], b_ref[...], p_ref[...], np_ref[...], self.L
        )

    def _mul(self, a, b, interpret=False):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n = a.shape[0]
        L = self.L
        tile = min(self.tile, n)
        assert n % tile == 0, "batch must divide the tile size"
        grid = (n // tile,)
        spec = pl.BlockSpec((tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            self._kernel,
            out_shape=jax.ShapeDtypeStruct((n, L), _U32),
            grid=grid,
            in_specs=[cspec, cspec, spec, spec],
            out_specs=spec,
            interpret=interpret,
        )(self._p[None, :], self._np[None, :], a, b)


def make(F: Fp, tile: int = 512) -> PallasFieldOps:
    return PallasFieldOps(F, tile)
