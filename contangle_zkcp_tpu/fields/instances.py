"""Concrete field instances used across the framework.

Curve/field configuration mirrors the reference stack
(/root/reference/lib/src/lib.rs:21-24): the arkworks pipeline fixes the
pairing engine to BLS12-381 with Jubjub (ed-on-bls12-381) as the embedded
curve, so Jubjub's base field IS the BLS12-381 scalar field.  The halo2
pipeline runs over the Pasta curves, the circom pipeline over BN254, and
the payment layer over secp256k1 (host-side only).
"""

from __future__ import annotations

from functools import lru_cache

from .fp import Fp

# --- BLS12-381 ---------------------------------------------------------------
# base field (G1/G2 coordinates)
BLS12_381_P = int(
    "0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f624"
    "1eabfffeb153ffffb9feffffffffaaab",
    16,
)
# scalar field == Jubjub base field
BLS12_381_R = int(
    "0x73eda753299d7d483339d80809a1d80553bda402fffe5bfeffffffff00000001", 16
)
# BLS parameter x (negative): p = (x-1)^2 * r / 3 + x
BLS_X = -0xD201000000010000

# --- Jubjub (ed-on-bls12-381) ------------------------------------------------
# prime-subgroup order of the twisted Edwards curve; cofactor 8
JUBJUB_FR = int(
    "0x0e7db4ea6533afa906673b0101343b00a6682093ccc81082d0970e5ed6f72cb7", 16
)
JUBJUB_COFACTOR = 8

# --- BN254 (circom pipeline) -------------------------------------------------
BN254_P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

# --- Pasta (halo2 pipeline) --------------------------------------------------
# pallas base field == vesta scalar field
PASTA_P = int("0x40000000000000000000000000000000224698fc094cf91b992d30ed00000001", 16)
# vesta base field == pallas scalar field
PASTA_Q = int("0x40000000000000000000000000000000224698fc0994a8dd8c46eb2100000001", 16)

# --- secp256k1 (payment layer; host-side arithmetic only) --------------------
SECP256K1_P = 2**256 - 2**32 - 977
SECP256K1_N = int(
    "0xfffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16
)

# --- BLS12-377 / BW6-761 (recursion-friendly alternative instantiation,
#     re-exported by the reference at circuits-ark/src/lib.rs:15-19) ----------
BLS12_377_P = int(
    "0x01ae3a4617c510eac63b05c06ca1493b1a22d9f300f5138f1ef3622fba094800"
    "170b5d44300000008508c00000000001",
    16,
)
BLS12_377_R = int(
    "0x12ab655e9a2ca55660b44d1e5c37b00159aa76fed00000010a11800000000001", 16
)
# BLS family parameter; validated in tests: r = x^4-x^2+1,
# p = (x-1)^2 r / 3 + x reproduce the constants above.
BLS12_377_X = 0x8508C00000000001
BLS12_377_G1_COFACTOR = (BLS12_377_X - 1) ** 2 // 3

# BW6-761 (El Housni-Guillevic one-layer composition curve): base field
# q from the paper's degree-12 polynomial in the same x; its scalar
# field IS BLS12-377's base field (r_BW6 = p_377).  Curve y^2 = x^3 - 1
# with trace t = t0 + 13*r_BW6 (t0 = x^5-3x^4+3x^3-x+3); q primality,
# the 761-bit size, and the group order q+1-t are all re-verified
# empirically in tests/test_recursion_curves.py.
BW6_761_P = (
    103 * BLS12_377_X**12
    - 379 * BLS12_377_X**11
    + 250 * BLS12_377_X**10
    + 691 * BLS12_377_X**9
    - 911 * BLS12_377_X**8
    - 79 * BLS12_377_X**7
    + 623 * BLS12_377_X**6
    - 640 * BLS12_377_X**5
    + 274 * BLS12_377_X**4
    + 763 * BLS12_377_X**3
    + 73 * BLS12_377_X**2
    + 254 * BLS12_377_X
    + 229
) // 9
BW6_761_R = BLS12_377_P
_BW6_T = (
    BLS12_377_X**5
    - 3 * BLS12_377_X**4
    + 3 * BLS12_377_X**3
    - BLS12_377_X
    + 3
    + 13 * BW6_761_R
)
BW6_761_G1_COFACTOR = (BW6_761_P + 1 - _BW6_T) // BW6_761_R


@lru_cache(maxsize=None)
def get_field(p: int, name: str) -> Fp:
    return Fp(p, name)


def bls12_381_fq() -> Fp:
    return get_field(BLS12_381_P, "bls12_381_fq")


def bls12_381_fr() -> Fp:
    """BLS12-381 scalar field == Jubjub base field (the SNARK field)."""
    return get_field(BLS12_381_R, "bls12_381_fr")


def jubjub_fq() -> Fp:
    return bls12_381_fr()


def jubjub_fr() -> Fp:
    return get_field(JUBJUB_FR, "jubjub_fr")


def bn254_fq() -> Fp:
    return get_field(BN254_P, "bn254_fq")


def bn254_fr() -> Fp:
    return get_field(BN254_R, "bn254_fr")


def pasta_fp() -> Fp:
    """Pallas base field (== Vesta scalar field)."""
    return get_field(PASTA_P, "pasta_fp")


def pasta_fq() -> Fp:
    """Vesta base field (== Pallas scalar field)."""
    return get_field(PASTA_Q, "pasta_fq")


def bls12_377_fq() -> Fp:
    return get_field(BLS12_377_P, "bls12_377_fq")


def bls12_377_fr() -> Fp:
    return get_field(BLS12_377_R, "bls12_377_fr")


def bw6_761_fq() -> Fp:
    """BW6-761 base field; its scalar field is BLS12-377's base field."""
    return get_field(BW6_761_P, "bw6_761_fq")


# Multiplicative generators & two-adicity (for NTT domains), matching the
# standard parametrization used by arkworks 0.3.
FIELD_GENERATORS = {
    BLS12_381_R: 7,       # two-adicity 32
    BN254_R: 5,           # two-adicity 28
    PASTA_P: 5,           # two-adicity 32
    PASTA_Q: 5,           # two-adicity 32
}


def two_adicity(r: int) -> int:
    n = r - 1
    s = 0
    while n % 2 == 0:
        n //= 2
        s += 1
    return s


def root_of_unity(r: int, order: int) -> int:
    """Primitive `order`-th root of unity in F_r (order a power of two)."""
    g = FIELD_GENERATORS[r]
    s = two_adicity(r)
    assert order & (order - 1) == 0 and order <= (1 << s)
    root = pow(g, (r - 1) >> s, r)  # primitive 2^s-th root
    for _ in range(s - order.bit_length() + 1):
        root = (root * root) % r
    return root
