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
