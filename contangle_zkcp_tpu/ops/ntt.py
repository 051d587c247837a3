"""Radix-2 NTT / iNTT over a SNARK scalar field (device).

Replaces the arkworks `ark-poly` Radix2 evaluation domain the reference's
Groth16 prover uses for the H-quotient polynomial (SURVEY.md §3.4; called
from every `Groth16::prove`).

Design: natural-order in/out Cooley-Tukey with an up-front bit-reversal
gather, then log2(N) fully-vectorized butterfly stages.  Each stage is one
batched field multiply of N/2 elements plus an add/sub — shapes stay
(N/2, L) so the VPU/MXU limb pipeline from `fields.fp` is saturated; there
is no scalar loop anywhere.  Twiddle tables are host-precomputed per stage
in Montgomery form and baked as device constants.

The multi-chip four-step decomposition (local NTTs + all_to_all transpose
over ICI) lives in `parallel/ntt_sharded.py`.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import Fp
from ..fields import instances as fi


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


class NTT:
    """NTT engine for a fixed field + domain size n (power of two)."""

    def __init__(self, F: Fp, n: int):
        assert n & (n - 1) == 0
        self.F = F
        self.n = n
        self.logn = n.bit_length() - 1
        w = fi.root_of_unity(F.p, n)
        self.omega = w
        self.omega_inv = pow(w, -1, F.p)
        self.n_inv = pow(n, -1, F.p)
        # per-stage twiddles (Montgomery), stage s has block m=2^(s+1) and
        # uses w_m^j, j in [0, m/2).  Tables, the bit-reversal permutation
        # and 1/n are passed to the jitted kernels as runtime ARGUMENTS —
        # closure constants would be serialized into the XLA program
        # (hundreds of MB at n=2^22, over the remote-compile size limit).
        self._tw_fwd = self._stage_twiddles(w)
        self._tw_inv = self._stage_twiddles(self.omega_inv)
        # lane-major copies for the fused-butterfly Pallas pipeline
        self._tw_fwd_t = [t.T for t in self._tw_fwd]
        self._tw_inv_t = [t.T for t in self._tw_inv]
        self._brev = jnp.asarray(_bit_reverse_perm(n))
        self._n_inv_m = jnp.asarray(F.encode(self.n_inv))
        self._fwd_jit = jax.jit(self._butterflies_args)
        self._inv_jit = jax.jit(self._inverse_args)
        self._fwd_b_jit = jax.jit(self._butterflies_batched_args)
        self._inv_b_jit = jax.jit(self._inverse_batched_args)
        self._fwd_lanes_jit = jax.jit(self._fwd_lanes_args)
        self._inv_lanes_jit = jax.jit(self._inv_lanes_args)

    def _stage_twiddles(self, w_root: int):
        F, n, p = self.F, self.n, self.F.p
        tables = []
        for s in range(self.logn):
            m = 1 << (s + 1)
            wm = pow(w_root, n // m, p)
            tw = [1] * (m // 2)
            for j in range(1, m // 2):
                tw[j] = tw[j - 1] * wm % p
            tables.append(jnp.asarray(F.encode(tw)))  # (m/2, L) Mont
        return tables

    def _butterflies_args(self, a, tables, brev):
        return self._butterflies(a, tables, brev)

    def _inverse_args(self, a, tables, brev, n_inv_m):
        out = self._butterflies(a, tables, brev)
        return self.F._mul_impl(out, n_inv_m[None, :])

    def _butterflies_batched_args(self, a, tables, brev):
        return self._butterflies_batched(a, tables, brev)

    def _inverse_batched_args(self, a, tables, brev, n_inv_m):
        out = self._butterflies_batched(a, tables, brev)
        return self.F._mul_impl(out, n_inv_m[None, None, :])

    def _butterflies(self, a, tables, brev=None):
        """a: (n, L) Montgomery; applies all stages after bit-reversal.

        Every stage's twiddle multiply is flattened to the same (n/2, L)
        shape — the per-stage block structure lives only in the cheap
        reshapes/adds — so the whole transform reuses ONE compiled field-
        multiply kernel (the Pallas batch-on-lanes kernel on TPU) instead
        of log2(n) distinct shapes.
        """
        F, n = self.F, self.n
        if brev is None:
            brev = self._brev
        a = jnp.take(a, brev, axis=0)
        for s in range(self.logn):
            m = 1 << (s + 1)
            half = m // 2
            blk = a.reshape(n // m, 2, half, F.L)
            u = blk[:, 0].reshape(n // 2, F.L)
            v = blk[:, 1].reshape(n // 2, F.L)
            tw = jnp.broadcast_to(
                tables[s][None, :, :], (n // m, half, F.L)
            ).reshape(n // 2, F.L)
            vw = F._mul_impl(v, tw)
            hi = F._add_impl(u, vw).reshape(n // m, half, F.L)
            lo = F._sub_impl(u, vw).reshape(n // m, half, F.L)
            a = jnp.stack([hi, lo], axis=1).reshape(n, F.L)
        return a

    # ------------------------------------------------- lane-major pipeline
    def _use_lanes(self) -> bool:
        from ..fields.fp import _use_pallas

        return self.n >= 4096 and self.n % 4096 == 0 and _use_pallas()

    def _butterflies_lanes(self, at, tables_t, brev, eng, interpret=False):
        """at: (L, n) lane-major Montgomery.  Each stage is ONE fused
        Pallas butterfly call (mul+add+sub in VMEM) — no per-stage layout
        transposes and no XLA add/sub HBM round-trips.  All stages share
        the (L, n/2) operand shape, so one compiled kernel serves the
        whole transform."""
        F, n = self.F, self.n
        L = F.L
        at = jnp.take(at, brev, axis=1)
        for s in range(self.logn):
            m = 1 << (s + 1)
            half = m // 2
            blk = at.reshape(L, n // m, 2, half)
            u = blk[:, :, 0].reshape(L, n // 2)
            v = blk[:, :, 1].reshape(L, n // 2)
            tw = jnp.broadcast_to(
                tables_t[s][:, None, :], (L, n // m, half)
            ).reshape(L, n // 2)
            hi, lo = eng.butterfly_t(u, v, tw, interpret=interpret)
            at = jnp.stack(
                [hi.reshape(L, n // m, half), lo.reshape(L, n // m, half)],
                axis=2,
            ).reshape(L, n)
        return at

    def _lanes_engine(self):
        from . import pallas_mont

        return pallas_mont.get_engine(self.F)

    def _fwd_lanes_args(self, a, tables_t, brev):
        out = self._butterflies_lanes(a.T, tables_t, brev, self._lanes_engine())
        return out.T

    def _inv_lanes_args(self, a, tables_t, brev, n_inv_m):
        eng = self._lanes_engine()
        out = self._butterflies_lanes(a.T, tables_t, brev, eng)
        scaled = eng.mul_t(
            out, jnp.broadcast_to(n_inv_m[:, None], out.shape)
        )
        return scaled.T

    def forward(self, a):
        """Coefficients -> evaluations at the n-th roots (natural order)."""
        if self._use_lanes():
            return self._fwd_lanes_jit(a, tuple(self._tw_fwd_t), self._brev)
        return self._fwd_jit(a, tuple(self._tw_fwd), self._brev)

    def inverse(self, a):
        """Evaluations -> coefficients."""
        if self._use_lanes():
            return self._inv_lanes_jit(
                a, tuple(self._tw_inv_t), self._brev, self._n_inv_m
            )
        return self._inv_jit(a, tuple(self._tw_inv), self._brev, self._n_inv_m)

    def _forward_impl(self, a):
        return self._butterflies(a, self._tw_fwd)

    def _butterflies_batched(self, a, tables, brev=None):
        """(B, n, L) batch of transforms along axis 1 (same stage pipeline,
        multiplies flattened to (B*n/2, L) so the device kernel sees one
        shape).  Used by the four-step distributed NTT for its local
        column/row transforms."""
        F, n = self.F, self.n
        B = a.shape[0]
        if brev is None:
            brev = self._brev
        a = jnp.take(a, brev, axis=1)
        for s in range(self.logn):
            m = 1 << (s + 1)
            half = m // 2
            blk = a.reshape(B, n // m, 2, half, F.L)
            u = blk[:, :, 0].reshape(B * (n // 2), F.L)
            v = blk[:, :, 1].reshape(B * (n // 2), F.L)
            tw = jnp.broadcast_to(
                tables[s][None, None, :, :], (B, n // m, half, F.L)
            ).reshape(B * (n // 2), F.L)
            vw = F._mul_impl(v, tw)
            hi = F._add_impl(u, vw).reshape(B, n // m, half, F.L)
            lo = F._sub_impl(u, vw).reshape(B, n // m, half, F.L)
            a = jnp.stack([hi, lo], axis=2).reshape(B, n, F.L)
        return a

    def forward_batched(self, a):
        """(B, n, L) -> (B, n, L), DFT along axis 1 (natural order).

        When called inside an outer trace (e.g. the four-step shard_map),
        the tables come from the enclosing scope; standalone calls go
        through the args-jit so tables stay runtime inputs."""
        import jax.core

        if isinstance(a, jax.core.Tracer):
            return self._butterflies_batched(a, self._tw_fwd)
        return self._fwd_b_jit(a, tuple(self._tw_fwd), self._brev)

    def inverse_batched(self, a):
        import jax.core

        if isinstance(a, jax.core.Tracer):
            out = self._butterflies_batched(a, self._tw_inv)
            return self.F._mul_impl(out, self._n_inv_m[None, None, :])
        return self._inv_b_jit(a, tuple(self._tw_inv), self._brev, self._n_inv_m)

    def _inverse_impl(self, a):
        """Evaluations -> coefficients."""
        out = self._butterflies(a, self._tw_inv)
        return self.F._mul_impl(out, self._n_inv_m[None, :])

    # ------------------------------------------------------------ coset ops
    @lru_cache(maxsize=4)
    def _coset_scale(self, g: int):
        """(g^i)_{i<n} in Montgomery form as a device constant."""
        p = self.F.p
        scale = [1] * self.n
        for i in range(1, self.n):
            scale[i] = scale[i - 1] * g % p
        return jnp.asarray(self.F.encode(scale))

    def coset_forward(self, a, g: int):
        """Evaluate the polynomial on the coset g*<omega>."""
        a = self.F.mul(a, self._coset_scale(g))
        return self.forward(a)

    def coset_inverse(self, a, g: int):
        """Interpolate from evaluations on the coset g*<omega>."""
        out = self.inverse(a)
        return self.F.mul(out, self._coset_scale(pow(g, -1, self.F.p)))

    # --------------------------------------------------------------- host
    def h_forward(self, coeffs):
        """Exact host reference (for tests): evaluate at w^0..w^{n-1}."""
        p, n, w = self.F.p, self.n, self.omega
        out = []
        for i in range(n):
            x = pow(w, i, p)
            acc = 0
            for c in reversed(coeffs):
                acc = (acc * x + c) % p
            out.append(acc)
        return out
