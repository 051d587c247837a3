"""Batch-on-lanes Pallas Montgomery multiply — the hot field kernel.

TPU-native replacement for the arkworks `ark-ff` Montgomery backend's
inner multiply (SURVEY.md §2.2), round-2 rewrite of `ops/pallas_field.py`.

Layout
------
The XLA path (`fields/fp.py`) and the round-1 kernel keep field elements
as (N, L) with the L=16..24 limb axis on *lanes* — every VPU op wastes
104/128 lanes.  This kernel transposes to **(L, N)**: the batch rides the
128-wide lane axis (fully utilized), limbs live on sublanes, and every
limb-product `a_i * b_j` is one full-width VPU multiply over the batch.

Inside one grid step (block (L, T) in VMEM):
  * schoolbook columns accumulate into a (2L+1, T) VMEM scratch via
    static row-slice updates (col k += a_i*b_j for i+j=k);
  * the low product of the Montgomery step only computes columns < L
    (mod-R truncation) — ~1/6 of the total multiplies saved;
  * carries resolve exactly with a Kogge-Stone generate/propagate scan
    done as log2(rows) row-shifted and/or steps (no associative_scan —
    Mosaic-friendly);
  * final conditional subtract of p, all in-register.

The transposes (N, L) <-> (L, N) happen *outside* the kernel as plain XLA
ops — cheap relative to the ~5*L^2 VPU ops per element — so the kernel is
a drop-in for `Fp._mul_impl` on any (..., L) batch.

Exactness: bit-identical to `Fp._mul_xla` (same wide/SOS reduction);
`tests/test_pallas_field.py` cross-checks against host ints in interpret
mode, and the TPU drive scripts check the compiled kernel on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bigint import LIMB_BITS, LIMB_MASK

_U32 = jnp.uint32


def _shift_rows_up(x, k):
    """Shift along the leading (limb) axis toward higher indices by k."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[:-k]], axis=0)


def _ks_resolve_rows(s):
    """Exact carry resolution of row-limb sums (each lane < 2^17) into
    16-bit limbs; carries out of the top row are dropped (callers size the
    row count so the true value fits)."""
    g = (s >> LIMB_BITS) & 1
    lo = s & LIMB_MASK
    p = (lo == LIMB_MASK).astype(_U32)
    R = s.shape[0]
    sh = 1
    while sh < R:
        g = g | (p & _shift_rows_up(g, sh))
        p = p & _shift_rows_up(p, sh)
        sh *= 2
    return (lo + _shift_rows_up(g, 1)) & LIMB_MASK


def _ks_sub_rows(a, b):
    """Exact a - b on row-limb vectors -> (diff, no_borrow (1, T) mask)."""
    bc = (~b) & LIMB_MASK
    one = (jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) == 0).astype(_U32)
    s = a + bc + one
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


def _bcast_rows(m, shape):
    """(1, T) mask -> (rows, T), explicit single-axis (sublane) broadcast."""
    return jnp.broadcast_to(m, shape)


def _accum_product(c_ref, x, y, L, low_only=False):
    """Accumulate schoolbook columns of x*y into c_ref.

    x: (L, T) or (L, 1); y: (L, T).  Column k of the product is
    sum_{i+j=k} x_i*y_j; each x_i*y_j splits into a 16-bit lo at row i+j
    and hi at row i+j+1, accumulated with static row-slice updates.
    With low_only, only columns < L are produced (mod-R truncation).
    """
    for i in range(L):
        jmax = L if not low_only else L - i
        if jmax <= 0:
            break
        prod = x[i : i + 1] * y[:jmax]  # (jmax, T) exact uint32
        lo = prod & LIMB_MASK
        hi = prod >> LIMB_BITS
        c_ref[i : i + jmax] += lo
        if low_only:
            # hi at rows i+1 .. i+jmax; row L would be dropped mod R anyway
            if jmax > 1:
                c_ref[i + 1 : i + jmax] += hi[: jmax - 1]
        else:
            c_ref[i + 1 : i + 1 + jmax] += hi


def _resolve_cols_rows(cols):
    """Resolve redundant u32 columns (< 2^32 each) to 16-bit limbs; carries
    out of the top row are dropped (callers size rows so the value fits)."""
    lo = cols & LIMB_MASK
    hi = _shift_rows_up(cols >> LIMB_BITS, 1)
    return _ks_resolve_rows(lo + hi)


def _normalize_scratch(c_ref, rows):
    """Resolve the redundant scratch columns to 16-bit limbs (functional)."""
    return _resolve_cols_rows(c_ref[:rows])


# --------------------------------------------------------------------- MXU
# The Montgomery step's two inner products have a COMPILE-TIME-CONSTANT
# operand: m = (T mod R) * N' mod R and m * p.  A multiply by a constant
# is a Toeplitz matrix applied to the limb planes — i.e. an MXU matmul —
# so both ride the systolic array while the VPU keeps only the a*b
# schoolbook and the carry scans.  Exactness: operands split to 8-bit
# byte planes, so every f32 product is < 2^16 and a 2L-term column sum
# < 2^22 — exact in f32 with precision="highest" (the same guarantee the
# XLA path's column-reduction matmuls rely on, fields/fp.py).
#
# Layout ("cat" basis, no strided row ops in-kernel): byte planes of a
# (L, T) limb block are concatenated as [low bytes; high bytes] (2L, T),
# and the constant matrix's rows are likewise [low output bytes; high
# output bytes], so the fold back to 16-bit columns is one shift-add of
# two contiguous row slabs.


def _const_byte_planes(limbs):
    b = np.zeros(2 * len(limbs), np.int64)
    arr = np.asarray(limbs, np.int64)
    b[0::2] = arr & 0xFF
    b[1::2] = arr >> 8
    return b


def _toeplitz_cat(byte_planes, out16: int, L: int):
    """(2*out16, 2L) f32 matrix: M @ cat_bytes(x) = cat_bytes8(const * x)
    where output byte k = sum_{i+j=k} const_byte_i * x_byte_j."""
    nb = len(byte_planes)
    M = np.zeros((2 * out16, 2 * L), np.float32)
    for r in range(2 * out16):
        br = 2 * r if r < out16 else 2 * (r - out16) + 1
        for c2 in range(2 * L):
            bc = 2 * c2 if c2 < L else 2 * (c2 - L) + 1
            d = br - bc
            if 0 <= d < nb:
                M[r, c2] = float(byte_planes[d])
    return M


def _mxu_const_product_cols(M, t16, out16: int):
    """Columns of (const * t16) in 16-bit basis via one exact f32 matmul.

    M: (2*out16, 2L) f32 cat-Toeplitz; t16: (L, T) u32 canonical limbs.
    Returns (out16, T) u32 redundant columns, each < 2^30.
    """
    # Mosaic has no direct u32<->f32 casts; values are < 2^16 (bytes) and
    # < 2^24 (column sums), so a signed-int32 hop is exact both ways.
    t8 = (
        jnp.concatenate([t16 & 0xFF, t16 >> 8], axis=0)
        .astype(jnp.int32)
        .astype(jnp.float32)
    )
    c8 = (
        jax.lax.dot_general(
            M,
            t8,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        .astype(jnp.int32)
        .astype(_U32)
    )
    return c8[:out16] + (c8[out16:] << 8)


def mont_mul_kernel_body(p, npinv, a, b, c_ref, t_ref, L, mxu=None):
    """One block of Montgomery multiplies, all operands (rows, T) in VMEM.

    p, npinv: (L, 1) constants; a, b: (L, T); c_ref/t_ref: (2L+1, T)
    scratches.  Returns the (L, T) canonical product a*b*R^-1 mod p.

    mxu: optional (M_np, M_p) cat-Toeplitz constant matrices — when given,
    the two fixed-operand reduction products run as exact f32 MXU matmuls
    (concurrent with the VPU's a*b schoolbook) instead of VPU columns.
    """
    rows = 2 * L + 1
    # Constants arrive pre-tiled to (L, T) (see MontMulLanes): Mosaic has
    # no both-axes broadcast, so no degenerate dims may appear in-kernel.
    assert p.shape == a.shape and npinv.shape == a.shape, (p.shape, a.shape)
    # T = a*b (full columns)
    c_ref[...] = jnp.zeros(c_ref.shape, c_ref.dtype)
    _accum_product(c_ref, a, b, L)
    t_lo = _normalize_scratch(c_ref, L)  # T mod R, (L, T)
    if mxu is not None:
        M_np, M_p = mxu
        # m = (T mod R) * N' mod R: one (2L, 2L) @ (2L, T) MXU product
        m = _resolve_cols_rows(_mxu_const_product_cols(M_np, t_lo, L))
        # m*p full columns: one (4L, 2L) @ (2L, T) MXU product, folded
        # straight into the a*b scratch (sums stay < 2^31)
        c_ref[0 : 2 * L] += _mxu_const_product_cols(M_p, m, 2 * L)
    else:
        # m = (T mod R) * N' mod R (low columns only)
        t_ref[...] = jnp.zeros(t_ref.shape, t_ref.dtype)
        _accum_product(t_ref, npinv, t_lo, L, low_only=True)
        m = _normalize_scratch(t_ref, L)  # (L, T)
        # T + m*p  (accumulate m*p straight into the T columns)
        _accum_product(c_ref, p, m, L)
    res = _normalize_scratch(c_ref, rows)[L : rows]  # (L+1, T), value < 2p
    out, top = res[:L], res[L : L + 1]
    d, no_borrow = _ks_sub_rows(out, p)
    take = (no_borrow | top) != 0  # (1, T)
    return jnp.where(_bcast_rows(take, d.shape), d, out)


class MontMulLanes:
    """Compiled batch-on-lanes Montgomery multiply for one field."""

    def __init__(self, F, lane_tile: int = 2048, mxu: bool = False):
        self.F = F
        self.L = F.L
        self.lane_tile = lane_tile
        self.mxu = mxu
        # constants pre-tiled across the lane tile (no in-kernel broadcast).
        # KEPT AS NUMPY: engines are lazily constructed inside jit traces
        # (Fp._mul_impl dispatch); a jnp constant created there would be a
        # tracer and leak into later traces.
        self._p = np.tile(np.asarray(F.p_limbs, np.uint32)[:, None], (1, lane_tile))
        self._np = np.tile(
            np.asarray(F.npinv_limbs, np.uint32)[:, None], (1, lane_tile)
        )
        L = self.L
        self._Mnp = _toeplitz_cat(_const_byte_planes(F.npinv_limbs), L, L)
        self._Mp = _toeplitz_cat(_const_byte_planes(F.p_limbs), 2 * L, L)

    def _mxu_specs(self, pl, pltpu):
        L = self.L
        return [
            pl.BlockSpec(
                (2 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4 * L, 2 * L), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]

    def _kernel(self, p_ref, np_ref, a_ref, b_ref, o_ref, c_ref, t_ref):
        o_ref[...] = mont_mul_kernel_body(
            p_ref[...], np_ref[...], a_ref[...], b_ref[...], c_ref, t_ref, self.L
        )

    def _kernel_mxu(
        self, p_ref, np_ref, mnp_ref, mp_ref, a_ref, b_ref, o_ref, c_ref, t_ref
    ):
        o_ref[...] = mont_mul_kernel_body(
            p_ref[...],
            np_ref[...],
            a_ref[...],
            b_ref[...],
            c_ref,
            t_ref,
            self.L,
            mxu=(mnp_ref[...], mp_ref[...]),
        )

    @functools.partial(jax.jit, static_argnums=0, static_argnames="interpret")
    def mul_t(self, at, bt, interpret=False):
        """Transposed multiply: at, bt (L, N) with N a lane_tile multiple."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, T = self.L, self.lane_tile
        N = at.shape[1]
        assert N % T == 0, (N, T)
        grid = (N // T,)
        spec = pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
        rows = 2 * L + 1
        in_specs = [cspec, cspec]
        args = [self._p, self._np]
        if self.mxu:
            in_specs += self._mxu_specs(pl, pltpu)
            args += [self._Mnp, self._Mp]
        return pl.pallas_call(
            self._kernel_mxu if self.mxu else self._kernel,
            out_shape=jax.ShapeDtypeStruct((L, N), _U32),
            grid=grid,
            in_specs=in_specs + [spec, spec],
            out_specs=spec,
            scratch_shapes=[
                pltpu.VMEM((rows, T), _U32),
                pltpu.VMEM((rows, T), _U32),
            ],
            interpret=interpret,
        )(*args, at, bt)

    # ------------------------------------------------------- NTT butterfly
    def _bf_kernel(
        self, p_ref, np_ref, u_ref, v_ref, tw_ref, hi_ref, lo_ref, c_ref, t_ref
    ):
        self._bf_common(
            p_ref, np_ref, None, u_ref, v_ref, tw_ref, hi_ref, lo_ref, c_ref, t_ref
        )

    def _bf_kernel_mxu(
        self,
        p_ref,
        np_ref,
        mnp_ref,
        mp_ref,
        u_ref,
        v_ref,
        tw_ref,
        hi_ref,
        lo_ref,
        c_ref,
        t_ref,
    ):
        self._bf_common(
            p_ref,
            np_ref,
            (mnp_ref[...], mp_ref[...]),
            u_ref,
            v_ref,
            tw_ref,
            hi_ref,
            lo_ref,
            c_ref,
            t_ref,
        )

    def _bf_common(
        self, p_ref, np_ref, mxu, u_ref, v_ref, tw_ref, hi_ref, lo_ref, c_ref, t_ref
    ):
        p = p_ref[...]
        u = u_ref[...]
        vw = mont_mul_kernel_body(
            p, np_ref[...], v_ref[...], tw_ref[...], c_ref, t_ref, self.L, mxu=mxu
        )
        # hi = u + vw mod p  (sum < 2p fits L limbs for all our moduli)
        t = _ks_resolve_rows(u + vw)
        d, nb = _ks_sub_rows(t, p)
        hi_ref[...] = jnp.where(_bcast_rows(nb != 0, d.shape), d, t)
        # lo = u - vw mod p  via u + (p - vw), p - vw exact (vw < p)
        pm, _ = _ks_sub_rows(p, vw)
        t2 = _ks_resolve_rows(u + pm)
        d2, nb2 = _ks_sub_rows(t2, p)
        lo_ref[...] = jnp.where(_bcast_rows(nb2 != 0, d2.shape), d2, t2)

    @functools.partial(jax.jit, static_argnums=0, static_argnames="interpret")
    def butterfly_t(self, ut, vt, twt, interpret=False):
        """Fused NTT butterfly, all operands (L, N) lane-major Montgomery:
        returns (u + v*tw mod p, u - v*tw mod p) in one VMEM pass — the
        radix-2 stage's multiply/add/sub never round-trips to HBM
        separately, and no layout transposes occur per stage."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        L, T = self.L, self.lane_tile
        N = ut.shape[1]
        assert N % T == 0, (N, T)
        grid = (N // T,)
        spec = pl.BlockSpec((L, T), lambda i: (0, i), memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((L, T), lambda i: (0, 0), memory_space=pltpu.VMEM)
        rows = 2 * L + 1
        in_specs = [cspec, cspec]
        args = [self._p, self._np]
        if self.mxu:
            in_specs += self._mxu_specs(pl, pltpu)
            args += [self._Mnp, self._Mp]
        return pl.pallas_call(
            self._bf_kernel_mxu if self.mxu else self._bf_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((L, N), _U32),
                jax.ShapeDtypeStruct((L, N), _U32),
            ),
            grid=grid,
            in_specs=in_specs + [spec, spec, spec],
            out_specs=(spec, spec),
            scratch_shapes=[
                pltpu.VMEM((rows, T), _U32),
                pltpu.VMEM((rows, T), _U32),
            ],
            interpret=interpret,
        )(*args, ut, vt, twt)

    def mul(self, a, b, interpret=False):
        """Drop-in (..., L) multiply: transpose, tile-pad, kernel, restore."""
        L, T = self.L, self.lane_tile
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, batch + (L,)).reshape(-1, L)
        b = jnp.broadcast_to(b, batch + (L,)).reshape(-1, L)
        n = a.shape[0]
        npad = -(-n // T) * T
        if npad != n:
            pad = ((0, npad - n), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        out_t = self.mul_t(a.T, b.T, interpret=interpret)
        return out_t.T[:n].reshape(batch + (L,))


def _use_mxu() -> bool:
    """MXU constant-product reduction (env-gated until it wins on-chip)."""
    import os

    return os.environ.get("ZKCP_MXU", "0") == "1"


@functools.lru_cache(maxsize=None)
def get_engine(F, lane_tile: int = 2048, mxu: bool | None = None) -> MontMulLanes:
    if mxu is None:
        mxu = _use_mxu()
    return MontMulLanes(F, lane_tile, mxu=mxu)
