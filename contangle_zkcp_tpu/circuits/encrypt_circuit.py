"""Proof-of-Encryption circuit (R1CS).

Constraint-level mirror of the reference's `EncryptCircuit`
(/root/reference/circuits-ark/src/encryption.rs:219-317):

  witnesses: plaintext m_0..m_{n-1} (zero padded), randomness bits (256,
             little-endian over the 32 serialized bytes of r), pk point;
  inputs:    c1 (x, y), then c2_0..c2_{n-1} (zero padded) — allocated
             AFTER the plaintext witnesses, matching the reference's
             allocation order and its public-input vector
             [c1.x, c1.y, c2...] (get_public_inputs, :139-152);
  logic:     s = bits*pk;  c1' = bits*G;  dh = Poseidon(s.x, s.y);
             c1' == c1;  for each i: (dh + m_i == c2_i) unless c2_i == 0
             (zero blocks are excused via conditional_enforce_equal —
             the reference's padding-soundness quirk, :258-260, preserved
             deliberately; see SURVEY.md §7 faithfulness notes).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.host import EdwardsCurve
from ..r1cs.builder import ConstraintSystem
from ..r1cs.gadgets import Gadgets
from . import elgamal

RAND_BITS = 256  # 32 serialized bytes of the Jubjub scalar, bit-decomposed


@dataclass
class EncryptCircuit:
    params: elgamal.ElGamalParams

    def synthesize(self, pk, msg, r: int, ciphertext) -> ConstraintSystem:
        """Build constraints + assignment for one encryption instance."""
        curve = self.params.curve
        n = self.params.n
        cs = ConstraintSystem(p=curve.p)
        g = Gadgets(cs)

        # plaintext witnesses (zero-padded to n), allocated first
        msg_vars = []
        for i in range(n):
            m = msg[i] if i < len(msg) else 0
            msg_vars.append(g.witness(m))

        # ciphertext as public inputs: c1 point then n c2 values
        c1, c2 = ciphertext
        c1_var = g.ed_input(c1)
        c2_vars = []
        for i in range(n):
            v = c2[i] if i < len(c2) else 0
            c2_vars.append(g.input(v))

        # randomness bits (LE), from the 256-bit serialized scalar
        bits = g.bits_le(r, RAND_BITS)

        # pk witness with curve-membership check
        pk_var = g.ed_witness(curve, pk)

        # s = bits * pk ; c1' = bits * G (G constant: cheaper adds)
        s_var = g.ed_scalar_mul_le(curve, pk_var, bits)
        c1p = g.ed_scalar_mul_le(curve, g.ed_constant(curve.generator), bits)

        # dh = Poseidon sponge over s's affine coords
        dh = g.poseidon_hash2(self.params.poseidon, s_var[0], s_var[1])

        # c1 equality
        g.enforce_equal(c1p[0], c1_var[0])
        g.enforce_equal(c1p[1], c1_var[1])

        # per-block: dh + m_i == c2_i unless the input block is zero
        for m_var, c2_var in zip(msg_vars, c2_vars):
            not_empty = g.cs.constant(1) - g.is_zero(c2_var)
            g.conditional_enforce_equal(dh + m_var, c2_var, not_empty)

        return cs

    def dummy_instance(self):
        """Deterministic structural instance for setup (the reference
        compiles with a random pk and a 1-element message, :160-168)."""
        curve = self.params.curve
        pk = curve.mul(2, curve.generator)
        msg = [1]
        r = 3
        cipher = elgamal.encrypt(self.params, pk, msg, r)
        return pk, msg, r, cipher
