"""Concrete curve instances (constants + generators).

Jubjub constants follow arkworks `ark-ed-on-bls12-381` 0.3 (the reference's
embedded curve, /root/reference/lib/src/lib.rs:22-24): a = -1,
d = -(10240/10241), and the arkworks prime-subgroup generator.  These are
cross-validated in tests against the reference's golden keypair
(/root/reference/circuits-ark/src/utils.rs:114-115): pk == sk*G byte-exact
under arkworks 0.3 compressed serialization.
"""

from __future__ import annotations

from ..fields import instances as fi
from .host import EdwardsCurve, SWCurve

# ------------------------------------------------------------------- Jubjub
_q = fi.BLS12_381_R  # Jubjub base field == BLS12-381 scalar field
JUBJUB_D = (-10240 * pow(10241, -1, _q)) % _q
JUBJUB_A = _q - 1
# arkworks prime-subgroup generator (ed_on_bls12_381/src/curves/mod.rs)
JUBJUB_GX = 8076246640662884909881801758704306714034609987455869804520522091855516602923
JUBJUB_GY = 13262374693698910701929044844600465831413122818447359594527400194675274060458

JUBJUB = EdwardsCurve(
    p=_q,
    a=JUBJUB_A,
    d=JUBJUB_D,
    order=fi.JUBJUB_FR,
    cofactor=8,
    gx=JUBJUB_GX,
    gy=JUBJUB_GY,
)

# -------------------------------------------------------------- BLS12-381 G1
BLS12_381_G1 = SWCurve(
    p=fi.BLS12_381_P,
    a=0,
    b=4,
    order=fi.BLS12_381_R,
    gx=3685416753713387016781088315183077757961620795782546409894578378688607592378376318836054947676345821548104185464507,
    gy=1339506544944476473020471379941921221584933875938349620426543736416511423956333506472724655353366534992391756441569,
)

# G2 lives over Fq2 = Fq[u]/(u^2+1); points are pairs of (c0, c1) tuples.
BLS12_381_G2_GX = (
    352701069587466618187139116011060144890029952792775240219908644239793785735715026873347600343865175952761926303160,
    3059144344244213709971259814753781636986470325476647558659373206291635324768958432433509563104347017837885763365758,
)
BLS12_381_G2_GY = (
    1985150602287291935568054521177171638300868978215655730859378665066344726373823718423869104263333984641494340347905,
    927553665492332455747201965776037880757740193453592970025027978793976877002675564980949289727957565575433344219582,
)
# G2 curve: y^2 = x^3 + 4(u+1)
BLS12_381_G2_B = (4, 4)

# ------------------------------------------------------------------- BN254
BN254_G1 = SWCurve(
    p=fi.BN254_P,
    a=0,
    b=3,
    order=fi.BN254_R,
    gx=1,
    gy=2,
)
# BN254 G2 over Fq2 = Fq[u]/(u^2+1); b2 = 3/(u+9)
BN254_G2_GX = (
    10857046999023057135944570762232829481370756359578518086990519993285655852781,
    11559732032986387107991004021392285783925812861821192530917403151452391805634,
)
BN254_G2_GY = (
    8495653923123431417604973247489272438418190587263600148770280649306958101930,
    4082367875863433681332203403145435568316851327593401208105741076214120093531,
)

# ------------------------------------------------------------------- Pasta
PALLAS = SWCurve(
    p=fi.PASTA_P,
    a=0,
    b=5,
    order=fi.PASTA_Q,
    gx=fi.PASTA_P - 1,
    gy=2,
)
VESTA = SWCurve(
    p=fi.PASTA_Q,
    a=0,
    b=5,
    order=fi.PASTA_P,
    gx=fi.PASTA_Q - 1,
    gy=2,
)


# -------------------------------------------- BLS12-377 G1 / BW6-761 G1
# The recursion-friendly pair the reference stages at
# circuits-ark/src/lib.rs:15-19 (inner curve BLS12-377, outer BW6-761,
# whose scalar field is BLS12-377's base field).  Generators here are
# derived deterministically (smallest-x curve point, cofactor-cleared)
# — documented as NOT arkworks' pinned generators; cross-curve artifact
# compatibility for this pair is not a reference requirement (the
# reference only re-exports the types).
def _derive_generator(p, b, cofactor, order):
    from .host import sqrt_mod

    x = 1
    while True:
        y2 = (x * x * x + b) % p
        y = sqrt_mod(y2, p)
        if y is not None:
            cand = SWCurve(p=p, a=0, b=b % p, order=order, gx=x, gy=min(y, p - y))
            G = cand.mul(cofactor, (x, min(y, p - y)))
            if G is not None and cand.mul(order, G) is None:
                return G
        x += 1


_g377 = _derive_generator(
    fi.BLS12_377_P, 1, fi.BLS12_377_G1_COFACTOR, fi.BLS12_377_R
)
BLS12_377_G1 = SWCurve(
    p=fi.BLS12_377_P,
    a=0,
    b=1,
    order=fi.BLS12_377_R,
    gx=_g377[0],
    gy=_g377[1],
)

_gbw6 = _derive_generator(
    fi.BW6_761_P, fi.BW6_761_P - 1, fi.BW6_761_G1_COFACTOR, fi.BW6_761_R
)
BW6_761_G1 = SWCurve(
    p=fi.BW6_761_P,
    a=0,
    b=fi.BW6_761_P - 1,
    order=fi.BW6_761_R,
    gx=_gbw6[0],
    gy=_gbw6[1],
)
