"""Vectorized prime-field arithmetic on 16-bit limb planes.

This is the foundation of the whole framework: every curve op, Poseidon
round, NTT butterfly and MSM bucket add reduces to the batched modular
arithmetic defined here.  (TPU-native replacement for the arkworks `ark-ff`
Montgomery field backend the reference relies on everywhere; see
/root/reference/circuits-ark/Cargo.toml:10 and SURVEY.md §2.2.)

Representation
--------------
A field element batch is a `(..., L)` uint32 array of 16-bit limbs,
little-endian limb order, holding the *canonical* residue in `[0, p)`
(callers choose whether the residue is in Montgomery form; `mul` is a
Montgomery multiply, so compute-heavy pipelines keep values in Montgomery
form via `to_mont`/`from_mont`).

Why 16-bit limbs in uint32 lanes:
  * a limb product `a_i * b_j <= (2^16-1)^2 < 2^32` fits one uint32 lane —
    the widest exact integer multiply on the TPU VPU;
  * schoolbook column sums stay < 2^22, so carries can be deferred across
    an entire CIOS step and resolved with a single exact Kogge-Stone pass.

All functions are pure jnp, jit-friendly (static shapes, no data-dependent
control flow) and shape-polymorphic over leading batch axes.  Carry/borrow
propagation is done exactly in O(log L) with `jax.lax.associative_scan`
(Kogge-Stone), never with bounded "hope the carries settle" passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .bigint import LIMB_BITS, LIMB_MASK, int_to_limbs, ints_to_limbs, limbs_to_int, num_limbs

_U32 = jnp.uint32

# Batched multiplies at or above this many elements dispatch to the
# batch-on-lanes Pallas kernel (ops/pallas_mont.py) when tracing for TPU;
# smaller batches and CPU tracing keep the pure-XLA formulation.
PALLAS_MIN_BATCH = 1024
# Escape hatch for A/B benchmarking and debugging.
PALLAS_ENABLED = True


def _use_pallas() -> bool:
    if not PALLAS_ENABLED:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _carry_scan_combine(x, y):
    # Kogge-Stone (generate, propagate) composition; x is the lower prefix.
    gx, px = x
    gy, py = y
    return (gy | (py & gx), px & py)


def _resolve_carries(s):
    """Exact carry resolution for limbwise sums `s` with each lane < 2^17.

    Returns (limbs, carry_out) where limbs are <= 0xffff and carry_out is a
    boolean array for the carry out of the top limb.
    """
    g = (s >> LIMB_BITS) != 0
    lo = s & LIMB_MASK
    p = lo == LIMB_MASK
    g_scan, _ = jax.lax.associative_scan(_carry_scan_combine, (g, p), axis=-1)
    zeros = jnp.zeros_like(g_scan[..., :1])
    cin = jnp.concatenate([zeros, g_scan[..., :-1]], axis=-1)
    out = (lo + cin.astype(_U32)) & LIMB_MASK
    return out, g_scan[..., -1]


def _add_exact(a, b):
    """Exact limbwise a + b -> (limbs, carry_out bool)."""
    return _resolve_carries(a + b)


def _sub_exact(a, b):
    """Exact limbwise a - b via two's complement -> (limbs, no_borrow bool)."""
    bc = (~b) & LIMB_MASK
    s = a + bc
    # add 1 at limb 0 (the +1 of two's complement)
    one = jnp.zeros(a.shape[-1], dtype=_U32).at[0].set(1)
    s = s + one
    out, carry = _resolve_carries(s)
    return out, carry  # carry_out==1  <=>  a >= b


class Fp:
    """A prime field instance with batched device arithmetic.

    Values handed to/returned from the `*_mont`-free ops are canonical
    residues in [0, p); `mul` computes the Montgomery product a*b*R^-1.
    """

    def __init__(self, p: int, name: str = "Fp"):
        self.p = p
        self.name = name
        self.nbits = p.bit_length()
        self.L = num_limbs(self.nbits)
        L = self.L
        self.R = 1 << (LIMB_BITS * L)
        assert self.R > p
        self.R_mod_p = self.R % p
        self.R2_mod_p = (self.R * self.R) % p
        # -p^{-1} mod 2^16 (per-limb Montgomery constant)
        self.n0inv = (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.p_limbs = int_to_limbs(p, L)
        self.r2_limbs = int_to_limbs(self.R2_mod_p, L)
        self.one_limbs = int_to_limbs(1, L)
        self.one_mont_limbs = int_to_limbs(self.R_mod_p, L)
        self.zero_limbs = np.zeros(L, dtype=np.uint32)
        # N' = -p^{-1} mod R, full width (for the wide/SOS Montgomery reduce)
        self.npinv_limbs = int_to_limbs((-pow(p, -1, self.R)) % self.R, L)
        # Anti-diagonal reduction matrices: column k of the schoolbook product
        # is sum_{i+j=k} lo[i,j] (+ hi at k+1).  Encoded as 0/1 f32 matmuls so
        # XLA can run the reduction on the MXU; every operand/sum is < 2^24 so
        # f32 accumulation is exact.
        m_lo = np.zeros((L * L, 2 * L + 1), dtype=np.float32)
        m_hi = np.zeros((L * L, 2 * L + 1), dtype=np.float32)
        for i in range(L):
            for j in range(L):
                m_lo[i * L + j, i + j] = 1.0
                m_hi[i * L + j, i + j + 1] = 1.0
        self._m_lo = m_lo
        self._m_hi = m_hi
        # jit-wrapped public ops (eager dispatch of limb graphs is far too slow)
        self.mul = jax.jit(self._mul_impl)
        self.add = jax.jit(self._add_impl)
        self.sub = jax.jit(self._sub_impl)
        self.neg = jax.jit(self._neg_impl)
        self.inv = jax.jit(self._inv_impl)
        self.square = jax.jit(self._square_impl)
        self.to_mont = jax.jit(self._to_mont_impl)
        self.from_mont = jax.jit(self._from_mont_impl)
        self.pow_const = jax.jit(self._pow_const_impl, static_argnums=1)
        self.batch_inv = jax.jit(self._batch_inv_impl)

    # ---------------------------------------------------------------- host
    def encode(self, xs, mont: bool = True):
        """Host ints -> device limb array ((N, L) for a list, (L,) for one)."""
        single = isinstance(xs, int)
        if single:
            xs = [xs]
        xs = [x % self.p for x in xs]
        if mont:
            xs = [(x * self.R) % self.p for x in xs]
        arr = ints_to_limbs(xs, self.L)
        return arr[0] if single else arr

    def encode_u64(self, arr, mont: bool = True):
        """(N, W) little-endian u64 canonical values -> device limb array.

        Vectorized reinterpretation (u64 words -> 16-bit limbs via a numpy
        byte view) with the Montgomery conversion as ONE batched device
        multiply by R^2 — no per-element Python.  Feeds the prover's NTT
        directly from the native row-eval engine (r1cs/native.py)."""
        arr = np.ascontiguousarray(np.asarray(arr, dtype="<u8"))
        n, w = arr.shape
        limbs16 = arr.view("<u2").reshape(n, 4 * w).astype(np.uint32)
        if 4 * w < self.L:
            limbs16 = np.pad(limbs16, ((0, 0), (0, self.L - 4 * w)))
        elif 4 * w > self.L:
            assert not limbs16[:, self.L :].any(), "values exceed field width"
            limbs16 = limbs16[:, : self.L]
        out = jnp.asarray(limbs16)
        if mont:
            out = self.to_mont(out)
        return out

    def decode(self, arr, mont: bool = True):
        """Device limb array -> host ints (flattened over leading axes)."""
        arr = np.asarray(arr)
        single = arr.ndim == 1
        flat = arr.reshape(-1, self.L)
        rinv = pow(self.R, -1, self.p) if mont else 1
        from .bigint import limbs_to_ints

        out = [(v * rinv) % self.p for v in limbs_to_ints(flat)]
        return out[0] if single else out

    def zeros(self, shape=()):
        return jnp.zeros(tuple(shape) + (self.L,), dtype=_U32)

    def broadcast_const(self, x: int, shape=(), mont: bool = True):
        """Embed host constant into a broadcast device array of given batch shape."""
        limbs = jnp.asarray(self.encode(x, mont=mont))
        return jnp.broadcast_to(limbs, tuple(shape) + (self.L,))

    # -------------------------------------------------------------- device
    def _add_impl(self, a, b):
        # true value = s + overflow*R, and a+b < 2p <= R+p, so overflow implies
        # the value is >= R > p and d = (s - p) mod R = a+b-p is the answer.
        s, overflow = _add_exact(a, b)
        d, no_borrow = _sub_exact(s, jnp.asarray(self.p_limbs))
        take = jnp.logical_or(no_borrow, overflow)
        return jnp.where(take[..., None], d, s)

    def _sub_impl(self, a, b):
        d, no_borrow = _sub_exact(a, b)
        dp, _ = _add_exact(d, jnp.asarray(self.p_limbs))
        return jnp.where(no_borrow[..., None], d, dp)

    def _neg_impl(self, a):
        # p - a, with -0 = 0
        d, _ = _sub_exact(jnp.asarray(self.p_limbs), a)
        return jnp.where(self.is_zero(a)[..., None], a, d)

    def _product_columns(self, x, y):
        """Schoolbook limb product of x (.., L) and y (L,) or (.., L).

        Returns redundant column sums (.., 2L+1) uint32, each lane < 2^22.
        The anti-diagonal reduction runs as two exact f32 matmuls (values
        < 2^24), which XLA maps onto the MXU instead of a scalar carry loop.
        """
        L = self.L
        prod = x[..., :, None] * y[..., None, :]  # (.., L, L) uint32, exact
        lo = (prod & LIMB_MASK).astype(jnp.float32)
        hi = (prod >> LIMB_BITS).astype(jnp.float32)
        lo = lo.reshape(lo.shape[:-2] + (L * L,))
        hi = hi.reshape(hi.shape[:-2] + (L * L,))
        # precision="highest" is required: the TPU MXU's default f32 matmul
        # uses bf16 passes and silently rounds our 24-bit integer columns.
        cols = jnp.dot(
            lo,
            jnp.asarray(self._m_lo),
            precision="highest",
            preferred_element_type=jnp.float32,
        )
        cols = cols + jnp.dot(
            hi,
            jnp.asarray(self._m_hi),
            precision="highest",
            preferred_element_type=jnp.float32,
        )
        return cols.astype(_U32)

    def _mul_impl(self, a, b):
        """Montgomery product a*b*R^-1 mod p.

        Trace-time dispatch: large batches on TPU run the batch-on-lanes
        Pallas kernel; everything else takes the XLA wide/SOS path below.
        Both are bit-identical (tests/test_pallas_field.py).
        """
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        n = 1
        for d in batch:
            n *= int(d)
        if n >= PALLAS_MIN_BATCH and _use_pallas():
            from ..ops import pallas_mont

            return pallas_mont.get_engine(self).mul(a, b)
        return self._mul_xla(a, b)

    def _mul_xla(self, a, b):
        """Montgomery product a*b*R^-1 mod p (wide/SOS reduction).

        T = a*b;  m = (T mod R) * N' mod R;  res = (T + m*p) / R, which is
        < 2p and reduced to canonical with one exact conditional subtract.
        Three limb-products, no serial per-limb reduction loop: the whole
        multiply is ~30 XLA ops, so it can be inlined hundreds of times in
        larger jitted programs (Poseidon rounds, EC formulas) without
        blowing up compile time.
        """
        L = self.L
        batch = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, batch + (L,))
        b = jnp.broadcast_to(b, batch + (L,))
        t_cols = self._product_columns(a, b)  # (.., 2L+1), redundant
        # m = (T * N') mod R: need T's limbs mod R normalized first
        t_lo_norm = self._normalize_low(t_cols[..., : L + 1])[..., :L]
        m_cols = self._product_columns(t_lo_norm, jnp.asarray(self.npinv_limbs))
        m = self._normalize_low(m_cols[..., : L + 1])[..., :L]  # mod R
        mp_cols = self._product_columns(m, jnp.asarray(self.p_limbs))
        total = t_cols + mp_cols  # lanes < 2^23, exact
        # exact carry resolution over all 2L+1 columns; low L limbs become 0
        res = self._normalize_full(total)[..., L : 2 * L + 1]
        # res value < 2p; top limb is 0 or 1
        out, top = res[..., :L], res[..., L]
        d, no_borrow = _sub_exact(out, jnp.asarray(self.p_limbs))
        take = jnp.logical_or(no_borrow, top != 0)
        return jnp.where(take[..., None], d, out)

    def _normalize_low(self, cols):
        """Resolve redundant columns (lanes < 2^26) to 16-bit limbs, dropping
        carries out of the top (callers use this for mod-R truncation)."""
        lo = cols & LIMB_MASK
        hi = cols >> LIMB_BITS
        hi = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        out, _ = _resolve_carries(lo + hi)
        return out

    def _normalize_full(self, cols):
        """Exact normalization of redundant columns; the value must fit in
        the given number of limbs (no carry out of the top)."""
        lo = cols & LIMB_MASK
        hi = cols >> LIMB_BITS
        hi = jnp.concatenate([jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        s = lo + hi
        # one more fold: s lanes < 2^17 - safe for _resolve_carries
        out, _ = _resolve_carries(s)
        return out

    def _square_impl(self, a):
        return self._mul_impl(a, a)

    def _to_mont_impl(self, a):
        return self._mul_impl(a, jnp.asarray(self.r2_limbs))

    def _from_mont_impl(self, a):
        return self._mul_impl(a, jnp.asarray(self.one_limbs))

    def one_mont(self, shape=()):
        return jnp.broadcast_to(
            jnp.asarray(self.one_mont_limbs), tuple(shape) + (self.L,)
        )

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, cond, a, b):
        """cond ? a : b with cond shaped like the batch (no limb axis)."""
        return jnp.where(cond[..., None], a, b)

    def _pow_const_impl(self, a, e: int):
        """a^e for a host-known exponent, in Montgomery form (a is Mont)."""
        if e == 0:
            return self.one_mont(a.shape[:-1])
        bits = np.array(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32,
        )
        bits_d = jnp.asarray(bits)

        def body(k, acc):
            acc = self._mul_impl(acc, acc)
            amul = self._mul_impl(acc, a)
            return jnp.where((bits_d[k] == 1), amul, acc)

        acc = self._mul_impl(jnp.broadcast_to(self.one_mont(), a.shape), a)
        return jax.lax.fori_loop(1, int(bits.shape[0]), body, acc)

    def _inv_impl(self, a):
        """Batched inversion via a^(p-2) (Montgomery in, Montgomery out)."""
        return self._pow_const_impl(a, self.p - 2)

    def _batch_inv_impl(self, a):
        """Montgomery-trick batched inversion: ~3 multiplies per element
        via a binary product tree (up-sweep pairwise products, ONE Fermat
        inversion at the root, down-sweep distributing the inverse), vs
        ~380 multiplies each under Fermat.  This is what makes affine EC
        formulas (one field inversion per batched add) cheaper than the
        12-multiply complete projective law in the MSM bucket loop.

        Zero lanes map to zero (Fermat semantics), and never poison the
        tree: they are substituted with 1 before the up-sweep.
        """
        shp = a.shape
        L = self.L
        flat = a.reshape(-1, L)
        n = flat.shape[0]
        one = jnp.asarray(self.one_mont_limbs)
        zero_mask = self.is_zero(flat)
        x = jnp.where(zero_mask[:, None], one, flat)
        np2 = 1 << max(0, (n - 1).bit_length())
        if np2 > n:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(one, (np2 - n, L))], axis=0
            )
        levels = [x]
        while x.shape[0] > 1:
            x = self._mul_impl(x[0::2], x[1::2])
            levels.append(x)
        inv = self._pow_const_impl(levels[-1], self.p - 2)  # (1, L)
        for lvl in levels[-2::-1]:
            even = self._mul_impl(inv, lvl[1::2])
            odd = self._mul_impl(inv, lvl[0::2])
            m = lvl.shape[0]
            inv = jnp.stack([even, odd], axis=1).reshape(m, L)
        out = inv[:n]
        out = jnp.where(zero_mask[:, None], jnp.zeros((L,), _U32), out)
        return out.reshape(shp)

    # host-side scalar helpers (exact, for tests/tooling)
    def h_mul(self, x: int, y: int) -> int:
        return (x * y) % self.p

    def h_inv(self, x: int) -> int:
        return pow(x, -1, self.p)
