"""Pallas Montgomery-mul kernel: exactness vs host ints (interpret mode
on CPU; the compiled TPU path is exercised by benchmarks/bench_fieldmul.py)."""

import random

import pytest

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops import pallas_field


@pytest.mark.parametrize("F", [fi.bls12_381_fr(), fi.bls12_381_fq()], ids=lambda f: f.name)
def test_kernel_logic_matches_host(F):
    ops = pallas_field.make(F, tile=64)
    rng = random.Random(121)
    n = 64
    xs = [rng.randrange(F.p) for _ in range(n - 3)] + [0, 1, F.p - 1]
    ys = [rng.randrange(F.p) for _ in range(n - 3)] + [F.p - 1, F.p - 1, F.p - 1]
    a = F.encode(xs)
    b = F.encode(ys)
    # pure-jnp reference of the kernel body
    got = F.decode(ops.mul_reference(a, b))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]
    # pallas interpret mode (same lowering path as the TPU kernel)
    got = F.decode(ops.mul_interpret(a, b))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


def test_kernel_tiling_multiblock():
    F = fi.bls12_381_fr()
    ops = pallas_field.make(F, tile=32)
    rng = random.Random(122)
    n = 128  # 4 grid tiles
    xs = [rng.randrange(F.p) for _ in range(n)]
    ys = [rng.randrange(F.p) for _ in range(n)]
    got = F.decode(ops.mul_interpret(F.encode(xs), F.encode(ys)))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", [fi.bls12_381_fr(), fi.bls12_381_fq()], ids=lambda f: f.name)
def test_lanes_kernel_matches_host(F):
    """Round-2 batch-on-lanes kernel (ops/pallas_mont.py): bit-exactness vs
    host ints, incl. edge values, through the interpret-mode lowering."""
    from contangle_zkcp_tpu.ops import pallas_mont

    eng = pallas_mont.MontMulLanes(F, lane_tile=128)
    rng = random.Random(321)
    n = 200  # not a tile multiple: exercises padding
    xs = [rng.randrange(F.p) for _ in range(n - 4)] + [0, 1, F.p - 1, F.p - 1]
    ys = [rng.randrange(F.p) for _ in range(n - 4)] + [F.p - 1, F.p - 1, F.p - 1, 0]
    got = F.decode(eng.mul(F.encode(xs), F.encode(ys), interpret=True))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


def test_lanes_kernel_broadcast_and_ndim():
    """(S, N, L) stacked batches and (L,)-constant broadcasting."""
    from contangle_zkcp_tpu.ops import pallas_mont

    F = fi.bls12_381_fr()
    eng = pallas_mont.MontMulLanes(F, lane_tile=128)
    rng = random.Random(323)
    xs = [rng.randrange(F.p) for _ in range(64)]
    ys = [rng.randrange(F.p) for _ in range(64)]
    a = F.encode(xs).reshape(4, 16, F.L)
    b = F.encode(ys).reshape(4, 16, F.L)
    got = F.decode(eng.mul(a, b, interpret=True))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]
    c = rng.randrange(F.p)
    got = F.decode(eng.mul(a, F.encode(c), interpret=True))
    assert got == [(x * c) % F.p for x in xs]


def test_butterfly_kernel_matches_host():
    """Fused NTT butterfly (u + v*tw, u - v*tw) vs host ints, interpret
    lowering, incl. vw == 0 and wraparound edges."""
    import jax.numpy as jnp

    from contangle_zkcp_tpu.ops import pallas_mont

    F = fi.bls12_381_fr()
    eng = pallas_mont.MontMulLanes(F, lane_tile=128)
    rng = random.Random(555)
    n = 128
    us = [rng.randrange(F.p) for _ in range(n - 3)] + [0, F.p - 1, 1]
    vs = [rng.randrange(F.p) for _ in range(n - 3)] + [0, F.p - 1, 0]
    tws = [rng.randrange(F.p) for _ in range(n - 3)] + [1, F.p - 1, 5]
    ut = jnp.asarray(F.encode(us)).T
    vt = jnp.asarray(F.encode(vs)).T
    twt = jnp.asarray(F.encode(tws)).T
    hi, lo = eng.butterfly_t(ut, vt, twt, interpret=True)
    got_hi, got_lo = F.decode(hi.T), F.decode(lo.T)
    for i in range(n):
        vw = vs[i] * tws[i] % F.p  # encode/decode carry the R factors
        assert got_hi[i] == (us[i] + vw) % F.p
        assert got_lo[i] == (us[i] - vw) % F.p


def test_ntt_lanes_pipeline_matches_xla():
    """Lane-major fused-butterfly NTT == the XLA stage pipeline."""
    import jax.numpy as jnp

    from contangle_zkcp_tpu.ops import pallas_mont
    from contangle_zkcp_tpu.ops.ntt import NTT

    F = fi.bls12_381_fr()
    n = 256
    eng = pallas_mont.MontMulLanes(F, lane_tile=128)
    ntt = NTT(F, n)
    rng = random.Random(77)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    a = jnp.asarray(F.encode(coeffs))
    want = F.decode(ntt._fwd_jit(a, tuple(ntt._tw_fwd), ntt._brev))
    got = ntt._butterflies_lanes(
        a.T, tuple(ntt._tw_fwd_t), ntt._brev, eng, interpret=True
    )
    assert F.decode(got.T) == want


def test_mxu_toeplitz_matrices_exact():
    """Host check of the cat-Toeplitz constant matrices: M @ cat_bytes(x)
    reproduces const*x column-exactly for both reduction constants."""
    import numpy as np

    from contangle_zkcp_tpu.ops import pallas_mont

    for F in (fi.bls12_381_fr(), fi.bls12_381_fq()):
        L = F.L
        rng = random.Random(99)
        x = rng.randrange(F.p)
        limbs = [(x >> (16 * i)) & 0xFFFF for i in range(L)]
        t8 = np.zeros(2 * L, np.float64)
        t8[:L] = [v & 0xFF for v in limbs]
        t8[L:] = [v >> 8 for v in limbs]
        npinv = sum(int(v) << (16 * i) for i, v in enumerate(F.npinv_limbs))
        for const, out16 in (
            (npinv, L),
            (F.p, 2 * L),
        ):
            cl = [(const >> (16 * i)) & 0xFFFF for i in range(L)]
            M = pallas_mont._toeplitz_cat(
                pallas_mont._const_byte_planes(cl), out16, L
            ).astype(np.float64)
            c8 = M @ t8
            assert c8.max() < 2**24  # exact-f32 bound
            cols = c8[:out16] + 256.0 * c8[out16:]
            val = sum(int(c) << (16 * i) for i, c in enumerate(cols))
            mask = (1 << (16 * out16)) - 1
            assert val & mask == (const * x) & mask


@pytest.mark.parametrize("F", [fi.bls12_381_fr(), fi.bls12_381_fq()], ids=lambda f: f.name)
def test_lanes_kernel_mxu_matches_host(F):
    """MXU constant-product reduction path: bit-exact vs host ints."""
    from contangle_zkcp_tpu.ops import pallas_mont

    eng = pallas_mont.MontMulLanes(F, lane_tile=128, mxu=True)
    rng = random.Random(842)
    n = 200
    xs = [rng.randrange(F.p) for _ in range(n - 4)] + [0, 1, F.p - 1, F.p - 1]
    ys = [rng.randrange(F.p) for _ in range(n - 4)] + [F.p - 1, F.p - 1, F.p - 1, 0]
    got = F.decode(eng.mul(F.encode(xs), F.encode(ys), interpret=True))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


def test_butterfly_kernel_mxu_matches_host():
    import jax.numpy as jnp

    from contangle_zkcp_tpu.ops import pallas_mont

    F = fi.bls12_381_fr()
    eng = pallas_mont.MontMulLanes(F, lane_tile=128, mxu=True)
    rng = random.Random(556)
    n = 128
    us = [rng.randrange(F.p) for _ in range(n)]
    vs = [rng.randrange(F.p) for _ in range(n)]
    tws = [rng.randrange(F.p) for _ in range(n)]
    ut = jnp.asarray(F.encode(us)).T
    vt = jnp.asarray(F.encode(vs)).T
    twt = jnp.asarray(F.encode(tws)).T
    hi, lo = eng.butterfly_t(ut, vt, twt, interpret=True)
    got_hi, got_lo = F.decode(hi.T), F.decode(lo.T)
    for i in range(n):
        vw = vs[i] * tws[i] % F.p
        assert got_hi[i] == (us[i] + vw) % F.p
        assert got_lo[i] == (us[i] - vw) % F.p
