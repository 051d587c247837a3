"""Inner-product-argument polynomial commitment over the Pasta curves.

The halo2 pipeline's commitment scheme (halo2_proofs 0.2 uses IPA over
Pasta; SURVEY.md §2.2): polynomials over the Pallas base field are
committed on the Vesta curve (whose scalar field is that same field).
Bulletproofs-style log-round opening argument with Fiat-Shamir challenges.

Commitment MSMs ride the TPU Pippenger engine for large degrees; the
log-n folding tail is host-side.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..curves import instances as ci
from ..curves.host import SWCurve, sqrt_mod
from ..fields import instances as fi
from ..ops.msm import msm_host

CURVE = ci.VESTA  # commitments live on Vesta; scalars in PASTA_P
SCALAR_P = fi.PASTA_P


def _hash_to_point(tag: bytes, i: int):
    """Deterministic generator derivation (try-and-increment)."""
    ctr = 0
    while True:
        h = hashlib.sha256(tag + i.to_bytes(4, "little") + ctr.to_bytes(4, "little")).digest()
        x = int.from_bytes(h, "big") % CURVE.p
        y2 = (x * x * x + CURVE.b) % CURVE.p
        y = sqrt_mod(y2, CURVE.p)
        if y is not None:
            return (x, y if y % 2 == 0 else CURVE.p - y)
        ctr += 1


@dataclass
class IpaProof:
    rounds: list  # [(L, R)] points
    a_final: int


class IPA:
    def __init__(self, n: int, use_device_msm: bool = False):
        assert n & (n - 1) == 0
        self.n = n
        self.G = [_hash_to_point(b"contangle-ipa-g", i) for i in range(n)]
        self.U = _hash_to_point(b"contangle-ipa-u", 0)
        self._msm = None
        self._dev = None
        self._G_dev = None
        if use_device_msm:
            from ..curves.weierstrass import SWDevice
            from ..ops.msm import MSM

            self._dev = SWDevice(fi.pasta_fq(), CURVE)
            self._msm = MSM(self._dev, scalar_bits=SCALAR_P.bit_length(), c=8)
            self._G_dev = self._dev.encode_points(self.G)

    # ------------------------------------------------------------ commit
    def _msm_run(self, points, scalars):
        scalars = [s % SCALAR_P for s in scalars]
        if self._msm is not None and len(points) >= 256:
            return self._msm.run(list(points), scalars)
        return msm_host(CURVE, points, scalars)

    def _msm_dev(self, pts_dev, scalars):
        """MSM over an on-device point dict slice."""
        n = int(pts_dev["x"].shape[0])
        if self._msm is not None and n >= 256:
            return self._msm.run(pts_dev, [s % SCALAR_P for s in scalars])
        return msm_host(
            CURVE, self._dev.decode_points(pts_dev), scalars
        )

    def commit(self, coeffs):
        assert len(coeffs) <= self.n
        coeffs = list(coeffs) + [0] * (self.n - len(coeffs))
        return self._msm_run(self.G, coeffs)

    # -------------------------------------------------------------- open
    @staticmethod
    def _challenge(transcript: bytes) -> int:
        return int.from_bytes(hashlib.sha256(transcript).digest(), "big") % SCALAR_P

    @staticmethod
    def _pt_bytes(P) -> bytes:
        if P is None:
            return b"\x00" * 33
        return bytes([2 + (P[1] & 1)]) + P[0].to_bytes(32, "big")

    def open(self, coeffs, x: int, transcript=None):
        """Prove p(x) = v for the committed coefficients.

        With the device engine, the generator vector stays resident on
        device across the log-n folding rounds (each fold is two batched
        fixed-scalar ladders + one fused add); the round-1 version folded
        G with per-element host scalar muls — ~n*log(n) host EC ops,
        hopeless at halo2's k=12.

        `transcript`: optional shared Blake2bTranscript (halo2 style —
        the IPA rounds absorb L/R into the SAME running transcript the
        outer protocol uses and squeeze challenges from it); without
        one, the standalone SHA256 chain below keeps old proofs valid."""
        p = SCALAR_P
        a = list(coeffs) + [0] * (self.n - len(coeffs))
        b = [pow(x, i, p) for i in range(self.n)]
        use_dev = self._dev is not None and self.n >= 1024
        G = None if use_dev else list(self.G)
        G_dev = dict(self._G_dev) if use_dev else None
        if transcript is None:
            chain = self._pt_bytes(self.commit(coeffs)) + x.to_bytes(32, "big")
        else:
            transcript.common_scalar(x)
        rounds = []
        while len(a) > 1:
            h = len(a) // 2
            a_lo, a_hi = a[:h], a[h:]
            b_lo, b_hi = b[:h], b[h:]
            vL = sum(ai * bi for ai, bi in zip(a_lo, b_hi)) % p
            vR = sum(ai * bi for ai, bi in zip(a_hi, b_lo)) % p
            if use_dev:
                G_lo = {k: v[:h] for k, v in G_dev.items()}
                G_hi = {k: v[h:] for k, v in G_dev.items()}
                L = CURVE.add(self._msm_dev(G_hi, a_lo), CURVE.mul(vL, self.U))
                R = CURVE.add(self._msm_dev(G_lo, a_hi), CURVE.mul(vR, self.U))
            else:
                G_lo, G_hi = G[:h], G[h:]
                L = CURVE.add(self._msm_run(G_hi, a_lo), CURVE.mul(vL, self.U))
                R = CURVE.add(self._msm_run(G_lo, a_hi), CURVE.mul(vR, self.U))
            if transcript is None:
                chain = hashlib.sha256(
                    chain + self._pt_bytes(L) + self._pt_bytes(R)
                ).digest()
                u = self._challenge(chain)
            else:
                transcript.common_point(L)
                transcript.common_point(R)
                u = transcript.squeeze_challenge() % p
            ui = pow(u, -1, p)
            a = [(lo * u + hi * ui) % p for lo, hi in zip(a_lo, a_hi)]
            b = [(lo * ui + hi * u) % p for lo, hi in zip(b_lo, b_hi)]
            if use_dev:
                import numpy as np
                import jax.numpy as jnp

                nb = SCALAR_P.bit_length()
                bits_ui = jnp.asarray(
                    np.array([(ui >> i) & 1 for i in range(nb)], np.uint32)
                )
                bits_u = jnp.asarray(
                    np.array([(u >> i) & 1 for i in range(nb)], np.uint32)
                )
                folded = self._dev.add(
                    self._dev.scalar_mul_bits(G_lo, bits_ui),
                    self._dev.scalar_mul_bits(G_hi, bits_u),
                )
                G_dev = folded
                if h < 256:  # tail rounds on host (few points left)
                    use_dev = False
                    G = self._dev.decode_points(G_dev)
            else:
                G = [
                    CURVE.add(CURVE.mul(ui, gl), CURVE.mul(u, gh))
                    for gl, gh in zip(G_lo, G_hi)
                ]
            rounds.append((L, R))
        return IpaProof(rounds=rounds, a_final=a[0])

    # ------------------------------------------------------------ verify
    def verify(self, commitment, x: int, v: int, proof: IpaProof, transcript=None) -> bool:
        p = SCALAR_P
        P = CURVE.add(commitment, CURVE.mul(v % p, self.U))
        if transcript is None:
            chain = self._pt_bytes(commitment) + x.to_bytes(32, "big")
        else:
            transcript.common_scalar(x)
        us = []
        for L, R in proof.rounds:
            if transcript is None:
                chain = hashlib.sha256(
                    chain + self._pt_bytes(L) + self._pt_bytes(R)
                ).digest()
                u = self._challenge(chain)
            else:
                transcript.common_point(L)
                transcript.common_point(R)
                u = transcript.squeeze_challenge() % p
            us.append(u)
            P = CURVE.add(
                P,
                CURVE.add(
                    CURVE.mul(u * u % p, L), CURVE.mul(pow(u, -2, p), R)
                ),
            )
        # fold the generator/point vectors with the s-vector
        k = len(us)
        assert (1 << k) == self.n
        s = []
        for i in range(self.n):
            acc = 1
            for j in range(k):
                bit = (i >> (k - 1 - j)) & 1
                acc = acc * (us[j] if bit else pow(us[j], -1, p)) % p
            s.append(acc)
        G_final = self._msm_run(self.G, s)
        b_final = sum(si * pow(x, i, p) for i, si in enumerate(s)) % p
        rhs = CURVE.add(
            CURVE.mul(proof.a_final, G_final),
            CURVE.mul(proof.a_final * b_final % p, self.U),
        )
        return P == rhs
