"""Native C++ R1CS evaluation engine vs exact Python."""

import random

import pytest

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.r1cs import native


@pytest.mark.skipif(not native.available(), reason="native engine not built")
def test_eval_rows_matches_python():
    r = fi.BLS12_381_R
    rng = random.Random(101)
    nrows, nz, nnz = 64, 40, 500
    z = [rng.randrange(r) for _ in range(nz)]
    coo = [
        (rng.randrange(nrows), rng.randrange(nz), rng.randrange(r))
        for _ in range(nnz)
    ]
    got = native.eval_rows(r, coo, z, nrows)
    exp = [0] * nrows
    for row, col, coeff in coo:
        exp[row] = (exp[row] + coeff * z[col]) % r
    assert got == exp


@pytest.mark.skipif(not native.available(), reason="native engine not built")
def test_eval_rows_bn254_and_edge_values():
    r = fi.BN254_R
    coo = [(0, 0, r - 1), (0, 1, 1), (1, 2, r - 1), (2, 0, 0)]
    z = [r - 1, 5, 1]
    got = native.eval_rows(r, coo, z, 4)
    exp = [((r - 1) * (r - 1) + 5) % r, (r - 1) % r, 0, 0]
    assert got == exp


def test_groth16_prove_uses_native_or_fallback():
    # QAP.eval_rows must be exact either way
    from contangle_zkcp_tpu.groth16.groth16 import QAP
    from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem
    from contangle_zkcp_tpu.r1cs.gadgets import Gadgets

    r = fi.BLS12_381_R
    cs = ConstraintSystem(p=r)
    g = Gadgets(cs)
    x = g.witness(3)
    y = g.witness(5)
    z_in = g.input(15)
    g.enforce_equal(g.mul(x, y), z_in)
    qap = QAP(cs, r)
    a, b, c = qap.eval_rows(cs.full_assignment())
    # constraint row: a*b == c must hold on evaluations
    for i in range(qap.nc):
        assert a[i] * b[i] % r == c[i]


@pytest.mark.skipif(not native.available(), reason="native engine not built")
def test_eval_rows_abc_matches_python():
    r = fi.BLS12_381_R
    rng = random.Random(7)
    nrows, nz = 128, 60
    z = [rng.randrange(r) for _ in range(nz)]
    mats = []
    for _ in range(3):
        # row-sorted COO with duplicate rows (the builder's emission shape)
        coo = sorted(
            (rng.randrange(nrows), rng.randrange(nz), rng.randrange(r))
            for _ in range(700)
        )
        mats.append(coo)
    got = native.eval_rows_abc(r, *mats, z, nrows)
    assert got is not None
    for coo, g_vec in zip(mats, got):
        exp = [0] * nrows
        for row, col, coeff in coo:
            exp[row] = (exp[row] + coeff * z[col]) % r
        assert g_vec == exp


@pytest.mark.skipif(not native.available(), reason="native engine not built")
def test_eval_rows_abc_unsorted_falls_back():
    r = fi.BN254_R
    coo = [(5, 0, 1), (1, 0, 1)]  # rows out of order
    assert native.eval_rows_abc(r, coo, [], [], [3], 8) is None


def test_eval_rows_device_matches_encode():
    import numpy as np

    from contangle_zkcp_tpu.groth16.groth16 import QAP
    from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem
    from contangle_zkcp_tpu.r1cs.gadgets import Gadgets

    r = fi.BLS12_381_R
    Fr = fi.bls12_381_fr()
    cs = ConstraintSystem(p=r)
    g = Gadgets(cs)
    rng = random.Random(3)
    acc = g.witness(1)
    for _ in range(5):
        acc = g.mul(acc, g.witness(rng.randrange(r)))
    g.enforce_equal(acc, g.input(cs.eval_lc(acc)))
    qap = QAP(cs, r)
    z = cs.full_assignment()
    a, b, c = qap.eval_rows(z)
    da, db, dc = qap.eval_rows_device(Fr, z)
    for ints, dev in ((a, da), (b, db), (c, dc)):
        assert np.asarray(dev).tolist() == np.asarray(Fr.encode(list(ints))).tolist()


def test_encode_u64_matches_encode():
    import numpy as np

    Fr = fi.bls12_381_fr()
    rng = random.Random(11)
    xs = [0, 1, Fr.p - 1] + [rng.randrange(Fr.p) for _ in range(61)]
    u64 = np.zeros((len(xs), 4), dtype=np.uint64)
    for i, v in enumerate(xs):
        for j in range(4):
            u64[i, j] = v & 0xFFFFFFFFFFFFFFFF
            v >>= 64
    got = np.asarray(Fr.encode_u64(u64))
    want = np.asarray(Fr.encode(xs))
    assert got.tolist() == want.tolist()
    got_c = np.asarray(Fr.encode_u64(u64, mont=False))
    want_c = np.asarray(Fr.encode(xs, mont=False))
    assert got_c.tolist() == want_c.tolist()
