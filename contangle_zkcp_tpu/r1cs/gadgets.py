"""R1CS gadget library.

Mirrors the *semantics* of the ark-r1cs-std gadgets the reference's
circuits use (FpVar, Boolean/UInt8 bits, twisted-Edwards `scalar_mul_le`,
`PoseidonSpongeVar`, `enforce_equal`/`conditional_enforce_equal`,
`is_zero` — /root/reference/circuits-ark/src/encryption.rs:219-263), built
on our ConstraintSystem.  Constraint counts may differ from arkworks;
soundness and the public-input interface are what we preserve.

All gadget methods compute witness values eagerly (exact host ints) while
emitting constraints, so a single pass yields both the matrices and the
full assignment.
"""

from __future__ import annotations

from ..curves.host import EdwardsCurve
from ..ops.poseidon import PoseidonHost, RATE, CAPACITY, WIDTH
from .builder import LC, ConstraintSystem


class Gadgets:
    def __init__(self, cs: ConstraintSystem):
        self.cs = cs
        self.p = cs.p

    # ------------------------------------------------------------- basics
    def witness(self, value: int) -> LC:
        return self.cs.lc(self.cs.new_witness(value))

    def input(self, value: int) -> LC:
        return self.cs.lc(self.cs.new_input(value))

    def mul(self, a: LC, b: LC) -> LC:
        """Product LC; folds constant operands into a linear combination
        (matching ark-r1cs-std, where FpVar::Constant products are free)."""
        ca, cb = a.constant_value(), b.constant_value()
        if ca is not None:
            return b * ca
        if cb is not None:
            return a * cb
        va, vb = self.cs.eval_lc(a), self.cs.eval_lc(b)
        w = self.witness(va * vb % self.p)
        self.cs.enforce(a, b, w)
        return w

    def square(self, a: LC) -> LC:
        return self.mul(a, a)

    def div(self, num: LC, den: LC) -> LC:
        """Quotient witness with den * q = num (den must be non-zero)."""
        cd = den.constant_value()
        if cd is not None:
            return num * pow(cd, -1, self.p)
        vd = self.cs.eval_lc(den)
        vn = self.cs.eval_lc(num)
        q = self.witness(vn * pow(vd, -1, self.p) % self.p)
        self.cs.enforce(den, q, num)
        return q

    def alloc_bit(self, value: int) -> LC:
        b = self.witness(value & 1)
        # b * (1 - b) = 0
        self.cs.enforce(b, self.cs.constant(1) - b, self.cs.constant(0))
        return b

    def bits_le(self, value: int, nbits: int):
        """Witness `value` as nbits little-endian boolean bits (the
        reference's UInt8::new_witness_vec + to_bits_le pattern)."""
        return [self.alloc_bit((value >> i) & 1) for i in range(nbits)]

    def is_zero(self, a: LC) -> LC:
        """Boolean LC that is 1 iff a == 0 (ark FpVar::is_zero)."""
        v = self.cs.eval_lc(a)
        b_val = 1 if v == 0 else 0
        inv_val = 0 if v == 0 else pow(v, -1, self.p)
        b = self.witness(b_val)
        inv = self.witness(inv_val)
        one = self.cs.constant(1)
        self.cs.enforce(a, b, self.cs.constant(0))  # a*b = 0
        self.cs.enforce(a, inv, one - b)  # a*inv = 1-b
        return b

    def select(self, cond: LC, a: LC, b: LC) -> LC:
        """cond ? a : b  (cond boolean)."""
        return b + self.mul(cond, a - b)

    def enforce_equal(self, a: LC, b: LC):
        self.cs.enforce_equal(a, b)

    def conditional_enforce_equal(self, a: LC, b: LC, cond: LC):
        """(a - b) * cond = 0 (ark's conditional_enforce_equal)."""
        self.cs.enforce(a - b, cond, self.cs.constant(0))

    # --------------------------------------------- twisted Edwards points
    # Point var = (x LC, y LC); constants are constant LCs.
    def ed_constant(self, P):
        return (self.cs.constant(P[0]), self.cs.constant(P[1]))

    def ed_witness(self, curve: EdwardsCurve, P):
        """Witness an Edwards point, enforcing the curve equation
        (ark AllocVar for AffineVar checks membership)."""
        x = self.witness(P[0])
        y = self.witness(P[1])
        x2 = self.square(x)
        y2 = self.square(y)
        # a x^2 + y^2 = 1 + d x^2 y^2
        x2y2 = self.mul(x2, y2)
        lhs = x2 * curve.a + y2
        rhs = self.cs.constant(1) + x2y2 * curve.d
        self.enforce_equal(lhs, rhs)
        return (x, y)

    def ed_input(self, P):
        """Edwards point as public input: exposes (x, y) in instance order
        (TE ToConstraintField = [x, y])."""
        return (self.input(P[0]), self.input(P[1]))

    def ed_add(self, curve: EdwardsCurve, P, Q):
        """Complete affine Edwards addition (7 constraints, fewer if one
        operand is constant)."""
        x1, y1 = P
        x2, y2 = Q
        t1 = self.mul(x1, y2)
        t2 = self.mul(y1, x2)
        t3 = self.mul(y1, y2)
        t4 = self.mul(x1, x2)
        u = self.mul(t3, t4)
        dxy = u * curve.d
        x3 = self.div(t1 + t2, self.cs.constant(1) + dxy)
        # a = -1: y3 = (y1y2 + x1x2) / (1 - d x1x2 y1y2)
        assert curve.a == self.p - 1
        y3 = self.div(t3 + t4, self.cs.constant(1) - dxy)
        return (x3, y3)

    def ed_double(self, curve: EdwardsCurve, P):
        return self.ed_add(curve, P, P)

    def ed_select(self, cond: LC, P, Q):
        return (self.select(cond, P[0], Q[0]), self.select(cond, P[1], Q[1]))

    def ed_scalar_mul_le(self, curve: EdwardsCurve, base, bits):
        """Double-and-add with little-endian bit LCs (ark `scalar_mul_le`
        semantics, encryption.rs:243-248).  `base` may be a constant point
        (x/y constant LCs) — constant doubles then cost no constraints."""
        acc = self.ed_constant((0, 1))
        cur = base
        for b in bits:
            added = self.ed_add(curve, acc, cur)
            acc = self.ed_select(b, added, acc)
            cur = self.ed_double(curve, cur)
        return acc

    # ------------------------------------------------------------ Poseidon
    def poseidon_permute(self, perm: PoseidonHost, state):
        """In-circuit Poseidon permutation on a list of 3 LCs."""
        cs = self.cs
        half = perm.rf // 2
        total = perm.rf + perm.rp
        for r in range(total):
            state = [s + perm.ark[r][i] for i, s in enumerate(state)]
            full = r < half or r >= half + perm.rp
            rng = range(WIDTH) if full else range(1)
            state = list(state)
            for i in rng:
                state[i] = self._pow17(state[i])
            state = [
                sum(
                    (state[j] * perm.mds[i][j] for j in range(WIDTH)),
                    cs.constant(0),
                )
                for i in range(WIDTH)
            ]
        return state

    def _pow17(self, x: LC) -> LC:
        x2 = self.square(x)
        x4 = self.square(x2)
        x8 = self.square(x4)
        x16 = self.square(x8)
        return self.mul(x16, x)

    def poseidon_hash2(self, perm: PoseidonHost, a: LC, b: LC) -> LC:
        """Absorb [a, b], squeeze 1 — the in-circuit PoseidonSpongeVar
        pattern of encryption.rs:250-254 (absorb point coords, squeeze dh)."""
        state = [self.cs.constant(0), a, b]
        return self.poseidon_permute(perm, state)[CAPACITY]

    def poseidon_hash1(self, perm: PoseidonHost, a: LC) -> LC:
        state = [self.cs.constant(0), a, self.cs.constant(0)]
        return self.poseidon_permute(perm, state)[CAPACITY]
