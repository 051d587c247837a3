"""ElGamal-with-Poseidon-KDF encryption (native, non-circuit).

Semantics of the reference's `EncryptCircuit::{keygen,encrypt,decrypt,
decrypt_at}` (/root/reference/circuits-ark/src/encryption.rs:126-217):
  c1 = r*G;  dh = Poseidon([x, y] of r*pk);  c2_i = m_i + dh
over a twisted Edwards curve whose base field is the SNARK field.

The n-block body (c2_i = m_i + dh) is the protocol's data-parallel axis;
`encrypt_blocks_device` runs it batched on the TPU.  The two scalar muls
per encryption are host-side one-offs.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import jax.numpy as jnp

from ..curves.host import EdwardsCurve
from ..fields.fp import Fp
from ..ops.poseidon import PoseidonHost, PoseidonDevice


@dataclass
class ElGamalParams:
    """Mirror of the reference's `Parameters{n, poseidon}`."""

    curve: EdwardsCurve
    n: int = 1

    def __post_init__(self):
        self.poseidon = PoseidonHost(self.curve.p)


def keygen(params: ElGamalParams, rng=None):
    """(sk, pk) with pk = sk*G (encryption.rs:126-137)."""
    order = params.curve.order
    sk = (rng.randrange(1, order) if rng else secrets.randbelow(order - 1) + 1)
    pk = params.curve.mul(sk, params.curve.generator)
    return sk, pk


def random_scalar(params: ElGamalParams, rng=None) -> int:
    order = params.curve.order
    return rng.randrange(1, order) if rng else secrets.randbelow(order - 1) + 1


def shared_digest(params: ElGamalParams, point) -> int:
    """dh = Poseidon sponge over the affine coords of a curve point."""
    return params.poseidon.hash2(point[0], point[1])


def encrypt(params: ElGamalParams, pk, msg, r: int):
    """msg: list of field ints (len <= n). Returns (c1 point, c2 list)."""
    cv = params.curve
    c1 = cv.mul(r, cv.generator)
    dh = shared_digest(params, cv.mul(r, pk))
    c2 = [(m + dh) % cv.p for m in msg]
    return (c1, c2)


def decrypt(params: ElGamalParams, sk: int, cipher):
    c1, c2 = cipher
    dh = shared_digest(params, params.curve.mul(sk, c1))
    return [(c - dh) % params.curve.p for c in c2]


def decrypt_at(params: ElGamalParams, sk: int, cipher, idx: int) -> int:
    c1, c2 = cipher
    dh = shared_digest(params, params.curve.mul(sk, c1))
    return (c2[idx] - dh) % params.curve.p


def public_inputs(params: ElGamalParams, cipher):
    """Groth16 public-input vector for the PoE proof: [c1.x, c1.y,
    c2_0..c2_{n-1}] zero-padded (encryption.rs:139-152)."""
    c1, c2 = cipher
    out = [c1[0], c1[1]]
    for i in range(params.n):
        out.append(c2[i] if i < len(c2) else 0)
    return out


# ------------------------------------------------------------------ device
class ElGamalDevice:
    """Bulk (many-block / many-message) encryption on TPU."""

    def __init__(self, F: Fp, params: ElGamalParams):
        self.F = F
        self.params = params
        self.poseidon = PoseidonDevice(F)

    def encrypt_blocks(self, dh: int, msgs):
        """c2 = m + dh for a (possibly huge) batch of blocks on device.

        msgs: (N, L) Montgomery limb array; dh: host int.
        """
        F = self.F
        dh_m = jnp.asarray(F.encode(dh))
        return F.add(msgs, dh_m)

    def decrypt_blocks(self, dh: int, c2):
        F = self.F
        dh_m = jnp.asarray(F.encode(dh))
        return F.sub(c2, dh_m)
