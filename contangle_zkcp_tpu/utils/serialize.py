"""arkworks 0.3 `CanonicalSerialize` wire-format compatibility.

The protocol's artifacts (keys, proofs, ciphertexts) must interoperate
byte-for-byte with the reference's serialization
(/root/reference/lib/src/utils.rs:12-22 `ark_to_bytes`/`ark_from_bytes`).

arkworks 0.3 conventions:
  * Fp: little-endian bytes of the canonical BigInteger, padded to
    8*ceil(nbits/64) bytes (BigInteger is u64 limbs).
  * Twisted Edwards affine (compressed): serialize y, with a 1-bit flag in
    the MSB of the final byte recording the "sign" of x (set when x is the
    lexicographically larger of {x, -x}); identity = y=0 encoding... the
    identity (0, 1) serializes as y=1 with flag clear.
  * Short Weierstrass affine (compressed): serialize x with 2 flag bits in
    the final byte: bit7 = y is larger ("negative" per from_y_sign), bit6 =
    point at infinity (x serialized as 0).
  * Vec<T>: u64 little-endian length prefix followed by items.
The exact flag polarity is covered by the golden-vector test against the
reference's hex keypair (circuits-ark/src/utils.rs:114-115).
"""

from __future__ import annotations

import struct

from .errors import SerializationError
from ..curves.host import EdwardsCurve, SWCurve, sqrt_mod


def field_byte_len(p: int) -> int:
    """8 * number of u64 limbs arkworks uses for this modulus."""
    return 8 * ((p.bit_length() + 63) // 64)


def fp_to_bytes(x: int, p: int) -> bytes:
    return int(x % p).to_bytes(field_byte_len(p), "little")


def fp_from_bytes(data: bytes, p: int) -> int:
    n = field_byte_len(p)
    if len(data) != n:
        raise SerializationError(f"expected {n} bytes, got {len(data)}")
    x = int.from_bytes(data, "little")
    if x >= p:
        raise SerializationError("field element >= modulus")
    return x


def fp_from_random_bytes(data: bytes, p: int):
    """arkworks `from_random_bytes`: LE-interpret (zero-padded), mask the
    top limb by u64::MAX >> REPR_SHAVE_BITS (ark-ff 0.3
    `from_random_bytes_with_flags`), accept iff the result is < p.

    The shave mask matters: the reference's `test_ciphertext_decode`
    (/root/reference/circuits-ark/src/utils.rs:148-151) feeds 32 random
    bytes whose top bit is set — only the masked value parses."""
    n = field_byte_len(p)
    if len(data) > n:
        return None
    shave = 8 * n - p.bit_length()
    mask = (1 << (8 * n - shave)) - 1
    x = int.from_bytes(data.ljust(n, b"\0"), "little") & mask
    if x >= p:
        return None
    return x


# --------------------------------------------------------- twisted Edwards
def edwards_to_bytes(P, curve: EdwardsCurve) -> bytes:
    x, y = P
    p = curve.p
    out = bytearray(fp_to_bytes(y, p))
    if x != 0 and x > p - x:
        out[-1] |= 0x80
    return bytes(out)


def edwards_from_bytes(data: bytes, curve: EdwardsCurve):
    p = curve.p
    buf = bytearray(data)
    x_is_larger = bool(buf[-1] & 0x80)
    buf[-1] &= 0x7F
    y = fp_from_bytes(bytes(buf), p)
    x = curve.solve_x(y, x_is_larger)
    if x is None:
        raise SerializationError("not a curve point")
    return (x, y)


# -------------------------------------------------------- short Weierstrass
def sw_to_bytes(P, curve: SWCurve) -> bytes:
    p = curve.p
    if P is None:
        out = bytearray(fp_to_bytes(0, p))
        out[-1] |= 0x40
        return bytes(out)
    x, y = P
    out = bytearray(fp_to_bytes(x, p))
    if y > p - y:
        out[-1] |= 0x80
    return bytes(out)


def sw_from_bytes(data: bytes, curve: SWCurve):
    p = curve.p
    buf = bytearray(data)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    x = fp_from_bytes(bytes(buf), p)
    if flags & 0x40:
        return None
    y2 = (x * x * x + curve.a * x + curve.b) % p
    y = sqrt_mod(y2, p)
    if y is None:
        raise SerializationError("not a curve point")
    y_is_larger = bool(flags & 0x80)
    if (y > p - y) != y_is_larger:
        y = (p - y) % p
    return (x, y)


# ---------------------------------------------------------------- Fq2 / G2
def fq2_to_bytes(c, p: int) -> bytes:
    return fp_to_bytes(c[0], p) + fp_to_bytes(c[1], p)


def fq2_from_bytes(data: bytes, p: int):
    n = field_byte_len(p)
    return (fp_from_bytes(data[:n], p), fp_from_bytes(data[n:], p))


def g2_to_bytes(P, p: int, b2) -> bytes:
    """BLS12-381-style G2 compressed: x (c0||c1 LE each), flags in last byte."""
    if P is None:
        out = bytearray(fq2_to_bytes((0, 0), p))
        out[-1] |= 0x40
        return bytes(out)
    x, y = P
    out = bytearray(fq2_to_bytes(x, p))
    if _fq2_is_larger(y, p):
        out[-1] |= 0x80
    return bytes(out)


def g2_from_bytes(data: bytes, p: int, b2):
    from ..curves import fq2 as f2

    buf = bytearray(data)
    flags = buf[-1] & 0xC0
    buf[-1] &= 0x3F
    x = fq2_from_bytes(bytes(buf), p)
    if flags & 0x40:
        return None
    y2 = f2.add(f2.mul(f2.mul(x, x, p), x, p), b2, p)
    y = f2.sqrt(y2, p)
    if y is None:
        raise SerializationError("not a G2 point")
    if _fq2_is_larger(y, p) != bool(flags & 0x80):
        y = f2.neg(y, p)
    return (x, y)


def _fq2_is_larger(c, p: int) -> bool:
    """arkworks Fq2 ordering: lexicographic on (c1, c0) vs its negation."""
    n = (( -c[0]) % p, (-c[1]) % p)
    return (c[1], c[0]) > (n[1], n[0])


# -------------------------------------------------------------- containers
def vec_to_bytes(items, ser) -> bytes:
    out = struct.pack("<Q", len(items))
    for it in items:
        out += ser(it)
    return out


def read_vec(data: bytes, offset: int, item_len: int):
    (n,) = struct.unpack_from("<Q", data, offset)
    offset += 8
    items = []
    for _ in range(n):
        items.append(data[offset : offset + item_len])
        offset += item_len
    return items, offset
