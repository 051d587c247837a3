"""Fused complete EC point addition as a single Pallas TPU kernel.

The MSM bucket loop and scalar-mul ladders spend everything on the
Renes-Costello-Batina complete short-Weierstrass addition (a = 0,
Algorithm 7 — see curves/weierstrass.py).  Composed from discrete field
ops, each of the 12 Montgomery multiplies round-trips its operands
through HBM; this kernel runs the whole formula on a (L, T) lane-major
block in VMEM: 12 in-register Montgomery multiplies (ops/pallas_mont.py
body) plus the ~17 modular add/subs, one HBM read of 6 coordinate planes
and one write of 3.

Replaces (TPU-natively) the arkworks ark-ec projective addition that the
reference's Groth16 MSMs bottleneck on (SURVEY.md §2.2, §3.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.bigint import LIMB_BITS, LIMB_MASK
from .pallas_mont import (
    _bcast_rows,
    _ks_resolve_rows,
    _ks_sub_rows,
    _shift_rows_up,
    mont_mul_kernel_body,
)

_U32 = jnp.uint32


def _add_exact_rows(a, b):
    """Exact limbwise a + b in rows layout -> (limbs, carry_out (1, T))."""
    s = a + b
    g = (s >> LIMB_BITS) & 1
    lo = s & LIMB_MASK
    p = (lo == LIMB_MASK).astype(_U32)
    R = a.shape[0]
    sh = 1
    while sh < R:
        g = g | (p & _shift_rows_up(g, sh))
        p = p & _shift_rows_up(p, sh)
        sh *= 2
    out = (lo + _shift_rows_up(g, 1)) & LIMB_MASK
    return out, g[R - 1 : R]


def mod_add_rows(a, b, p):
    s, carry = _add_exact_rows(a, b)
    d, no_borrow = _ks_sub_rows(s, p)
    take = (no_borrow | carry) != 0
    return jnp.where(_bcast_rows(take, d.shape), d, s)


def mod_sub_rows(a, b, p):
    d, no_borrow = _ks_sub_rows(a, b)
    dp, _ = _add_exact_rows(d, p)
    return jnp.where(_bcast_rows(no_borrow != 0, d.shape), d, dp)


def rcb_add_body(p, npinv, b3, P1, P2, c_ref, t_ref, L, mxu=None):
    """RCB complete addition (a=0) on (L, T) coordinate planes in VMEM.

    P1 = (X1, Y1, Z1), P2 = (X2, Y2, Z2); returns (X3, Y3, Z3).
    b3 is 3*b in Montgomery form, (L, 1).  mxu: optional (M_np, M_p)
    cat-Toeplitz matrices routing each multiply's fixed-operand reduction
    products to the MXU (ops/pallas_mont.py).
    """
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    # constants arrive pre-tiled to (L, T) — no in-kernel broadcasts
    assert p.shape == X1.shape and b3.shape == X1.shape, (p.shape, X1.shape)

    def mul(x, y):
        return mont_mul_kernel_body(p, npinv, x, y, c_ref, t_ref, L, mxu=mxu)

    b3b = b3
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    u1 = mul(mod_add_rows(X1, Y1, p), mod_add_rows(X2, Y2, p))
    u2 = mul(mod_add_rows(Y1, Z1, p), mod_add_rows(Y2, Z2, p))
    u3 = mul(mod_add_rows(X1, Z1, p), mod_add_rows(X2, Z2, p))
    t3 = mod_sub_rows(u1, mod_add_rows(t0, t1, p), p)  # X1Y2 + X2Y1
    t4 = mod_sub_rows(u2, mod_add_rows(t1, t2, p), p)  # Y1Z2 + Y2Z1
    y3p = mod_sub_rows(u3, mod_add_rows(t0, t2, p), p)  # X1Z2 + X2Z1
    t2b = mul(b3b, t2)
    y3b = mul(b3b, y3p)
    Z3p = mod_add_rows(t1, t2b, p)
    t1p = mod_sub_rows(t1, t2b, p)
    t0p = mod_add_rows(mod_add_rows(t0, t0, p), t0, p)  # 3*X1X2
    m1 = mul(t4, y3b)
    m2 = mul(t3, t1p)
    m3 = mul(y3b, t0p)
    m4 = mul(t1p, Z3p)
    m5 = mul(t0p, t3)
    m6 = mul(Z3p, t4)
    X3 = mod_sub_rows(m2, m1, p)
    Y3 = mod_add_rows(m4, m3, p)
    Z3 = mod_add_rows(m6, m5, p)
    return X3, Y3, Z3


class PallasSWAdd:
    """Compiled fused RCB addition for one SW group over a prime field."""

    def __init__(self, F, b3_limbs, lane_tile: int = 512, mxu: bool = False):
        import numpy as np

        from .pallas_mont import _const_byte_planes, _toeplitz_cat

        self.F = F
        self.L = F.L
        self.lane_tile = lane_tile
        self.mxu = mxu
        L = F.L
        self._Mnp = _toeplitz_cat(_const_byte_planes(F.npinv_limbs), L, L)
        self._Mp = _toeplitz_cat(_const_byte_planes(F.p_limbs), 2 * L, L)

        def tile_const(limbs):
            # numpy on purpose: engines are lazily built inside jit traces
            # (SWDevice._add_impl dispatch); jnp constants made there would
            # be trace-local tracers (see pallas_mont.MontMulLanes)
            return np.tile(
                np.asarray(limbs, np.uint32).reshape(self.L)[:, None],
                (1, lane_tile),
            )

        self._p = tile_const(F.p_limbs)
        self._np = tile_const(F.npinv_limbs)
        self._b3 = tile_const(b3_limbs)

    def _kernel(
        self, p_ref, np_ref, b3_ref, x1, y1, z1, x2, y2, z2, xo, yo, zo, c_ref, t_ref
    ):
        X3, Y3, Z3 = rcb_add_body(
            p_ref[...],
            np_ref[...],
            b3_ref[...],
            (x1[...], y1[...], z1[...]),
            (x2[...], y2[...], z2[...]),
            c_ref,
            t_ref,
            self.L,
        )
        xo[...] = X3
        yo[...] = Y3
        zo[...] = Z3

    def _kernel_mxu(
        self,
        p_ref,
        np_ref,
        b3_ref,
        mnp_ref,
        mp_ref,
        x1,
        y1,
        z1,
        x2,
        y2,
        z2,
        xo,
        yo,
        zo,
        c_ref,
        t_ref,
    ):
        X3, Y3, Z3 = rcb_add_body(
            p_ref[...],
            np_ref[...],
            b3_ref[...],
            (x1[...], y1[...], z1[...]),
            (x2[...], y2[...], z2[...]),
            c_ref,
            t_ref,
            self.L,
            mxu=(mnp_ref[...], mp_ref[...]),
        )
        xo[...] = X3
        yo[...] = Y3
        zo[...] = Z3

    @functools.partial(jax.jit, static_argnums=0, static_argnames="interpret")
    def add_t(self, P1, P2, interpret=False):
        """Transposed fused add: P1, P2 tuples of (L, N) planes."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, T = self.L, self.lane_tile
        N = P1[0].shape[1]
        assert N % T == 0, (N, T)
        grid = (N // T,)
        spec = pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
        rows = 2 * L + 1
        sds = jax.ShapeDtypeStruct((L, N), _U32)
        in_specs = [cspec, cspec, cspec]
        args = [self._p, self._np, self._b3]
        if self.mxu:
            in_specs += [
                pl.BlockSpec(
                    (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            args += [self._Mnp, self._Mp]
        return pl.pallas_call(
            self._kernel_mxu if self.mxu else self._kernel,
            out_shape=(sds, sds, sds),
            grid=grid,
            in_specs=in_specs + [spec] * 6,
            out_specs=(spec, spec, spec),
            scratch_shapes=[
                pltpu.VMEM((rows, T), _U32),
                pltpu.VMEM((rows, T), _U32),
            ],
            interpret=interpret,
        )(*args, *P1, *P2)

    def add(self, P, Q, interpret=False):
        """Drop-in for SWDevice.add on {x,y,z} dict batches (..., L).

        Batch shapes broadcast like the XLA path (e.g. (N,1,L)+(1,M,L))."""
        L, T = self.L, self.lane_tile
        batch = jnp.broadcast_shapes(P["x"].shape[:-1], Q["x"].shape[:-1])
        P = {k: jnp.broadcast_to(v, batch + (L,)) for k, v in P.items()}
        Q = {k: jnp.broadcast_to(v, batch + (L,)) for k, v in Q.items()}
        n = 1
        for d in batch:
            n *= int(d)
        npad = -(-n // T) * T

        def prep(c):
            c = c.reshape(n, L)
            if npad != n:
                c = jnp.pad(c, ((0, npad - n), (0, 0)))
            return c.T

        P1 = tuple(prep(P[k]) for k in ("x", "y", "z"))
        P2 = tuple(prep(Q[k]) for k in ("x", "y", "z"))
        X3, Y3, Z3 = self.add_t(P1, P2, interpret=interpret)

        def post(c):
            return c.T[:n].reshape(batch + (L,))

        return {"x": post(X3), "y": post(Y3), "z": post(Z3)}


@functools.lru_cache(maxsize=None)
def get_engine(F, b3_key, lane_tile: int = 512, mxu: bool | None = None) -> PallasSWAdd:
    import numpy as np

    from .pallas_mont import _use_mxu

    if mxu is None:
        mxu = _use_mxu()
    return PallasSWAdd(F, np.asarray(b3_key, dtype=np.uint32), lane_tile, mxu=mxu)
