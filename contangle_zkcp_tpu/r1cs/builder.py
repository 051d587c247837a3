"""Host-side R1CS constraint-system builder.

TPU-native replacement for ark-relations' `ConstraintSystem` + ark-r1cs-std
gadgets (used by the reference's circuits at
/root/reference/circuits-ark/src/encryption.rs:219-317): circuit synthesis
is inherently host-side graph construction; the output is sparse A/B/C
matrices plus a witness vector, which feed the TPU prover (witness maps,
NTTs and MSMs all run on device).

Variables live in two spaces (instance/public and witness/private) that can
be allocated in any order — the reference's EncryptCircuit allocates the
plaintext witnesses *before* the ciphertext public inputs — and are
remapped at export to the Groth16 layout z = [1, instances..., witnesses...].
Variable ids: 0 = ONE, +k = k-th instance (1-based), -k = k-th witness.
Each constraint enforces <A_i, z> * <B_i, z> = <C_i, z>.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class LC:
    """Sparse linear combination {var_id: coeff} over F_p."""

    __slots__ = ("terms", "p")

    def __init__(self, p: int, terms=None):
        self.p = p
        self.terms = dict(terms or {})

    def __add__(self, other):
        if isinstance(other, int):
            other = LC(self.p, {0: other % self.p})
        out = dict(self.terms)
        for v, c in other.terms.items():
            nc = (out.get(v, 0) + c) % self.p
            if nc:
                out[v] = nc
            elif v in out:
                del out[v]
        return LC(self.p, out)

    __radd__ = __add__

    def __sub__(self, other):
        if isinstance(other, int):
            return self + (-other)
        return self + (other * (self.p - 1))

    def __rsub__(self, other):
        return (self * (self.p - 1)) + other

    def __mul__(self, k: int):
        k %= self.p
        if k == 0:
            return LC(self.p, {})
        return LC(self.p, {v: c * k % self.p for v, c in self.terms.items()})

    __rmul__ = __mul__

    def __neg__(self):
        return self * (self.p - 1)

    def constant_value(self):
        """If the LC is a pure constant, return it, else None."""
        if all(v == 0 for v in self.terms):
            return self.terms.get(0, 0)
        return None


@dataclass
class ConstraintSystem:
    p: int
    instance_values: list = field(default_factory=list)
    witness_values: list = field(default_factory=list)
    constraints: list = field(default_factory=list)  # (LC, LC, LC)

    # ---------------------------------------------------------- allocation
    def new_input(self, value: int) -> int:
        self.instance_values.append(value % self.p)
        return len(self.instance_values)  # +k

    def new_witness(self, value: int) -> int:
        self.witness_values.append(value % self.p)
        return -len(self.witness_values)  # -k

    @property
    def one(self) -> int:
        return 0

    def lc(self, var: int, coeff: int = 1) -> LC:
        return LC(self.p, {var: coeff % self.p})

    def constant(self, c: int) -> LC:
        return LC(self.p, {0: c % self.p})

    # ---------------------------------------------------------- constraints
    def enforce(self, a: LC, b: LC, c: LC):
        self.constraints.append((a, b, c))

    def enforce_equal(self, a: LC, b: LC):
        self.enforce(a - b, self.constant(1), self.constant(0))

    @property
    def num_constraints(self):
        return len(self.constraints)

    @property
    def num_instance(self):
        """Instance variables including the leading ONE."""
        return 1 + len(self.instance_values)

    @property
    def num_witness(self):
        return len(self.witness_values)

    @property
    def num_variables(self):
        return self.num_instance + self.num_witness

    # ---------------------------------------------------------- evaluation
    def value_of(self, var: int) -> int:
        if var == 0:
            return 1
        if var > 0:
            return self.instance_values[var - 1]
        return self.witness_values[-var - 1]

    def eval_lc(self, lc: LC) -> int:
        return sum(c * self.value_of(v) for v, c in lc.terms.items()) % self.p

    def is_satisfied(self, verbose: bool = False) -> bool:
        """Host satisfiability check (the reference's `cs.is_satisfied()`
        test pattern; the vectorized device version is r1cs/checker.py)."""
        for i, (a, b, c) in enumerate(self.constraints):
            if self.eval_lc(a) * self.eval_lc(b) % self.p != self.eval_lc(c):
                if verbose:
                    print(f"constraint {i} unsatisfied")
                return False
        return True

    # ------------------------------------------------------------- export
    def flat_index(self, var: int) -> int:
        """Variable id -> index into z = [1, instances..., witnesses...]."""
        if var >= 0:
            return var
        return self.num_instance + (-var) - 1

    def matrices_coo(self):
        """(A, B, C) as lists of (row, col, coeff) with flat columns."""
        mats = ([], [], [])
        for row, lcs in enumerate(self.constraints):
            for m, lc in zip(mats, lcs):
                for var, coeff in lc.terms.items():
                    m.append((row, self.flat_index(var), coeff))
        return mats

    def full_assignment(self):
        return [1] + list(self.instance_values) + list(self.witness_values)

    def public_inputs(self):
        """Instance values excluding the leading ONE."""
        return list(self.instance_values)
