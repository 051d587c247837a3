"""Poseidon permutation + duplex sponge (ark-sponge 0.3 semantics).

The reference's only hash: a width-3 (rate 2, capacity 1) Poseidon with
alpha=17, 8 full + 31 partial rounds, using the hard-coded
"bls12377_rate2_constraints" constant set parsed *into the circuit field*
(constants reduce mod p — /root/reference/circuits-ark/src/poseidon.rs:13-41,
parameters at parameters.rs:11-230, transcribed to poseidon_params_p1.json).

Used for: the ElGamal KDF `dh = H(r*pk)` (encryption.rs:154-172), the
Merkle leaf/2-to-1 CRHs of the SampleEntries circuit, and the in-circuit
`PoseidonSpongeVar` — all of which reduce to the two fixed absorb/squeeze
patterns `hash2` / `hash1` below.

Sponge semantics (ark-sponge 0.3 duplex):
  state layout [capacity | rate]; fresh state = zeros, mode Absorbing(0);
  absorb adds into state[capacity+i], permuting when the rate is full;
  squeeze permutes once then reads state[capacity+i].
Absorbing a curve point absorbs its affine coordinates [x, y].

Two implementations, bit-identical:
  * host: exact Python ints (witness generation, protocol layer, tests);
  * device: batched over a leading axis on limb planes — the n-block
    encryption hash and Merkle tree layers are embarrassingly parallel,
    which is our main data-parallel axis (SURVEY.md §2.3).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.fp import Fp

_PARAMS_PATH = os.path.join(os.path.dirname(__file__), "poseidon_params_p1.json")

WIDTH = 3
RATE = 2
CAPACITY = 1


@lru_cache(maxsize=1)
def _raw_params():
    with open(_PARAMS_PATH) as f:
        d = json.load(f)
    return d


@lru_cache(maxsize=None)
def p1_params(p: int):
    """(ark, mds, alpha, full_rounds, partial_rounds) with constants mod p."""
    d = _raw_params()
    ark = [[int(x) % p for x in row] for row in d["ark"]]
    mds = [[int(x) % p for x in row] for row in d["mds"]]
    return ark, mds, d["alpha"], d["full_rounds"], d["partial_rounds"]


# --------------------------------------------------------------------- host
class PoseidonHost:
    """Exact scalar Poseidon over F_p (Python ints)."""

    def __init__(self, p: int):
        self.p = p
        self.ark, self.mds, self.alpha, self.rf, self.rp = p1_params(p)

    def permute(self, state):
        p = self.p
        state = list(state)
        half = self.rf // 2
        total = self.rf + self.rp
        for r in range(total):
            state = [(s + a) % p for s, a in zip(state, self.ark[r])]
            full = r < half or r >= half + self.rp
            if full:
                state = [pow(s, self.alpha, p) for s in state]
            else:
                state[0] = pow(state[0], self.alpha, p)
            state = [
                sum(self.mds[i][j] * state[j] for j in range(WIDTH)) % p
                for i in range(WIDTH)
            ]
        return state

    def hash2(self, x: int, y: int) -> int:
        """Absorb [x, y] into a fresh sponge, squeeze 1 (the ElGamal KDF /
        TwoToOne CRH pattern)."""
        return self.permute([0, x % self.p, y % self.p])[CAPACITY]

    def hash1(self, x: int) -> int:
        """Absorb [x], squeeze 1 (leaf CRH pattern)."""
        return self.permute([0, x % self.p, 0])[CAPACITY]


class SpongeHost:
    """Full duplex sponge (ark-sponge 0.3), exact host ints."""

    def __init__(self, perm: PoseidonHost):
        self.perm = perm
        self.state = [0] * WIDTH
        self.absorb_index = 0  # next rate slot to absorb into
        self.squeeze_index = None  # None = absorbing mode

    def absorb(self, elems):
        if not elems:
            return
        if self.squeeze_index is not None:
            self.state = self.perm.permute(self.state)
            self.absorb_index = 0
            self.squeeze_index = None
        i = self.absorb_index
        if i == RATE:
            self.state = self.perm.permute(self.state)
            i = 0
        for e in elems:
            if i == RATE:
                self.state = self.perm.permute(self.state)
                i = 0
            self.state[CAPACITY + i] = (self.state[CAPACITY + i] + e) % self.perm.p
            i += 1
        self.absorb_index = i

    def squeeze(self, n: int):
        out = []
        if self.squeeze_index is None:
            self.state = self.perm.permute(self.state)
            i = 0
        else:
            i = self.squeeze_index
        while len(out) < n:
            if i == RATE:
                self.state = self.perm.permute(self.state)
                i = 0
            out.append(self.state[CAPACITY + i])
            i += 1
        self.squeeze_index = i
        self.absorb_index = None
        return out


# ------------------------------------------------------------------- device
class PoseidonDevice:
    """Batched Poseidon on limb planes: state is (..., 3, L) uint32 in
    Montgomery form; all lanes of the leading batch axes run one permutation
    in lockstep on the VPU/MXU."""

    def __init__(self, F: Fp):
        self.F = F
        ark, mds, self.alpha, self.rf, self.rp = p1_params(F.p)
        assert self.alpha == 17, "device s-box addition chain assumes alpha=17"
        self.total_rounds = self.rf + self.rp
        self.half = self.rf // 2
        # constants in Montgomery form, shaped (rounds, 3, L) / (3, 3, L)
        self.ark_m = np.stack([F.encode(row) for row in ark])
        self.mds_m = np.stack([F.encode(row) for row in mds])
        self.permute = jax.jit(self._permute_impl)
        self.hash2 = jax.jit(self._hash2_impl)
        self.hash1 = jax.jit(self._hash1_impl)

    def _pow_alpha(self, x):
        # alpha = 17 = 10001b: 4 squarings + 1 multiply
        F = self.F
        s = x
        for _ in range(4):
            s = F._mul_impl(s, s)
        return F._mul_impl(s, x)

    def _round(self, r, state, full):
        F = self.F
        ark = jnp.asarray(self.ark_m)[r]  # (3, L)
        state = F._add_impl(state, ark)
        powered = self._pow_alpha(state)
        if full:
            state = powered
        else:
            keep = jnp.concatenate([powered[..., :1, :], state[..., 1:, :]], axis=-2)
            state = keep
        # MDS: new_i = sum_j mds[i][j] * s_j  (3x3 over the field)
        mds = jnp.asarray(self.mds_m)  # (3, 3, L)
        prod = F._mul_impl(mds, state[..., None, :, :])
        # prod: (..., 3, 3, L); sum over j with field adds
        acc = prod[..., 0, :]
        acc = F._add_impl(acc, prod[..., 1, :])
        acc = F._add_impl(acc, prod[..., 2, :])
        return acc

    def _permute_impl(self, state):
        """state: (..., 3, L) Montgomery limbs -> same shape."""

        def body(r, st):
            is_full = jnp.logical_or(r < self.half, r >= self.half + self.rp)
            full_state = self._round(r, st, full=True)
            part_state = self._round(r, st, full=False)
            return jnp.where(is_full, full_state, part_state)

        return jax.lax.fori_loop(0, self.total_rounds, body, state)

    def _hash2_impl(self, x, y):
        """Batched hash2: x, y (..., L) Mont -> (..., L) Mont."""
        zero = jnp.zeros_like(x)
        state = jnp.stack([zero, x, y], axis=-2)
        out = self._permute_impl(state)
        return out[..., CAPACITY, :]

    def _hash1_impl(self, x):
        zero = jnp.zeros_like(x)
        state = jnp.stack([zero, x, zero], axis=-2)
        out = self._permute_impl(state)
        return out[..., CAPACITY, :]
