"""arkworks-0.3 wire formats for Groth16 artifacts.

Mirrors the reference's artifact I/O (/root/reference/lib/src/utils.rs:85-118):
  * `circuit.zkey`     : ProvingKey via serialize_unchecked (uncompressed,
                         no validation on read);
  * `verification.key` : VerifyingKey via checked (compressed) serialize;
  * proofs cross the wire compressed (Proof = A G1, B G2, C G1).

Layouts (ark-serialize 0.3):
  G1 compressed   = x (48B LE for BLS12-381) with flags in the top bits of
                    the last byte (bit7 = y-is-larger, bit6 = infinity);
  G1 uncompressed = x || y-with-flags;
  G2              = same over Fq2 (c0 || c1 per coordinate);
  Vec<T>          = u64 LE length || items.
"""

from __future__ import annotations

import struct

from ..curves import fq2
from ..curves import instances as ci
from ..fields import instances as fi
from ..utils.errors import SerializationError
from ..utils import serialize as ser
from .groth16 import Proof, ProvingKey, VerifyingKey, curve_ctx


class _Codec:
    def __init__(self, curve_name: str):
        self.ctx = curve_ctx(curve_name)
        self.p = self.ctx.g1.p
        self.curve = self.ctx.g1
        if curve_name == "bls12_381":
            self.b2 = (4, 4)
        else:
            self.b2 = fq2.mul((3, 0), fq2.inv((9, 1), self.p), self.p)
        self.flen = ser.field_byte_len(self.p)

    # G1
    def g1_ser(self, P):
        return ser.sw_to_bytes(P, self.curve)

    def g1_de(self, b):
        return ser.sw_from_bytes(b, self.curve)

    def g1_ser_unck(self, P):
        p = self.p
        if P is None:
            out = bytearray(ser.fp_to_bytes(0, p) * 2)
            out[-1] |= 0x40
            return bytes(out)
        out = bytearray(ser.fp_to_bytes(P[0], p) + ser.fp_to_bytes(P[1], p))
        return bytes(out)

    def g1_de_unck(self, b):
        p = self.p
        half = self.flen
        buf = bytearray(b)
        flags = buf[-1] & 0xC0
        buf[-1] &= 0x3F
        if flags & 0x40:
            return None
        x = ser.fp_from_bytes(bytes(buf[:half]), p)
        y = ser.fp_from_bytes(bytes(buf[half:]), p)
        return (x, y)

    # G2
    def g2_ser(self, P):
        return ser.g2_to_bytes(P, self.p, self.b2)

    def g2_de(self, b):
        return ser.g2_from_bytes(b, self.p, self.b2)

    def g2_ser_unck(self, P):
        p = self.p
        if P is None:
            out = bytearray(ser.fq2_to_bytes((0, 0), p) * 2)
            out[-1] |= 0x40
            return bytes(out)
        return ser.fq2_to_bytes(P[0], p) + ser.fq2_to_bytes(P[1], p)

    def g2_de_unck(self, b):
        half = 2 * self.flen
        buf = bytearray(b)
        flags = buf[-1] & 0xC0
        buf[-1] &= 0x3F
        if flags & 0x40:
            return None
        x = ser.fq2_from_bytes(bytes(buf[:half]), self.p)
        y = ser.fq2_from_bytes(bytes(buf[half:]), self.p)
        return (x, y)


# ------------------------------------------------------------------- proof
def proof_to_bytes(proof: Proof, curve: str = "bls12_381") -> bytes:
    c = _Codec(curve)
    return c.g1_ser(proof.a) + c.g2_ser(proof.b) + c.g1_ser(proof.c)


def proof_from_bytes(data: bytes, curve: str = "bls12_381") -> Proof:
    c = _Codec(curve)
    n1, n2 = c.flen, 2 * c.flen
    if len(data) != 2 * n1 + n2:
        raise SerializationError("bad proof length")
    a = c.g1_de(data[:n1])
    b = c.g2_de(data[n1 : n1 + n2])
    cc = c.g1_de(data[n1 + n2 :])
    return Proof(a=a, b=b, c=cc)


def _host_points(vec, curve: str, g2: bool = False):
    """Device-resident query dicts (setup engine='device') -> host affine
    lists for serialization; host lists pass through."""
    if isinstance(vec, dict):
        from .groth16 import curve_ctx

        ctx = curve_ctx(curve)
        dev = ctx.g2_dev if g2 else ctx.g1_dev
        return dev.decode_points(vec)
    return vec


# ---------------------------------------------------------------------- vk
def vk_to_bytes(vk: VerifyingKey, curve: str = "bls12_381") -> bytes:
    c = _Codec(curve)
    out = c.g1_ser(vk.alpha_g1)
    out += c.g2_ser(vk.beta_g2) + c.g2_ser(vk.gamma_g2) + c.g2_ser(vk.delta_g2)
    abc = _host_points(vk.gamma_abc_g1, curve)
    out += struct.pack("<Q", len(abc))
    for P in abc:
        out += c.g1_ser(P)
    return out


def vk_from_bytes(data: bytes, curve: str = "bls12_381") -> VerifyingKey:
    c = _Codec(curve)
    n1, n2 = c.flen, 2 * c.flen
    off = 0
    alpha = c.g1_de(data[off : off + n1]); off += n1
    beta = c.g2_de(data[off : off + n2]); off += n2
    gamma = c.g2_de(data[off : off + n2]); off += n2
    delta = c.g2_de(data[off : off + n2]); off += n2
    (n,) = struct.unpack_from("<Q", data, off); off += 8
    abc = []
    for _ in range(n):
        abc.append(c.g1_de(data[off : off + n1])); off += n1
    return VerifyingKey(alpha, beta, gamma, delta, abc)


# ---------------------------------------------------------------------- pk
def pk_to_bytes(pk: ProvingKey, curve: str = "bls12_381") -> bytes:
    """serialize_unchecked layout (the reference's zkey format,
    lib/src/utils.rs:90-92); the domain size is re-derived on read from
    len(h_query) + 1, as arkworks does."""
    c = _Codec(curve)
    out = vk_to_bytes(pk.vk, curve)
    out += c.g1_ser_unck(pk.beta_g1) + c.g1_ser_unck(pk.delta_g1)
    for vec, g2 in (
        (pk.a_query, False),
        (pk.b_g1_query, False),
        (pk.b_g2_query, True),
        (pk.h_query, False),
        (pk.l_query, False),
    ):
        vec = _host_points(vec, curve, g2)
        out += struct.pack("<Q", len(vec))
        f = c.g2_ser_unck if g2 else c.g1_ser_unck
        for P in vec:
            out += f(P)
    return out


def pk_from_bytes(data: bytes, curve: str = "bls12_381") -> ProvingKey:
    c = _Codec(curve)
    n1, n2 = c.flen, 2 * c.flen
    vk = vk_from_bytes(data, curve)
    off = n1 + 3 * n2 + 8 + len(vk.gamma_abc_g1) * n1
    beta_g1 = c.g1_de_unck(data[off : off + 2 * n1]); off += 2 * n1
    delta_g1 = c.g1_de_unck(data[off : off + 2 * n1]); off += 2 * n1
    vecs = []
    for g2 in (False, False, True, False, False):
        (n,) = struct.unpack_from("<Q", data, off); off += 8
        sz = 2 * (n2 if g2 else n1)
        f = c.g2_de_unck if g2 else c.g1_de_unck
        items = []
        for _ in range(n):
            items.append(f(data[off : off + sz])); off += sz
        vecs.append(items)
    a_q, b1_q, b2_q, h_q, l_q = vecs
    return ProvingKey(
        vk=vk,
        beta_g1=beta_g1,
        delta_g1=delta_g1,
        a_query=a_q,
        b_g1_query=b1_q,
        b_g2_query=b2_q,
        h_query=h_q,
        l_query=l_q,
        domain=len(h_q) + 1,
    )
