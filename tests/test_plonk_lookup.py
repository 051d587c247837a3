"""halo2-style lookup argument: range-check circuit, real prover.

Mirrors the role of halo2_gadgets' LookupRangeCheckConfig
(/root/reference/circuits-halo2/src/encryption.rs:94-99): a fixed table
column holds [0, 2^k) and a lookup constrains an advice column into it.
"""

import random

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.plonkish.circuit import Assignment, CircuitMeta, Expr
from contangle_zkcp_tpu.plonkish.mock import MockProver
from contangle_zkcp_tpu.plonkish.prover import PlonkSystem

P = fi.PASTA_P
N = 32
RANGE = 16  # table = [0, 16)


def _build():
    meta = CircuitMeta(p=P)
    val = meta.advice_column()
    table = meta.fixed_column()
    meta.lookup("range16", [(Expr.col(val), Expr.col(table))])
    return meta, val, table


class RangeCircuit:
    def __init__(self, values):
        self.values = values

    def synthesize(self, meta, asg: Assignment):
        val = meta_cols[1]
        table = meta_cols[2]
        for r in range(N):
            asg.assign(table, r, r % RANGE)
        for r, v in enumerate(self.values):
            asg.assign(val, r, v)


meta_cols = None


def _setup(values):
    global meta_cols
    meta, val, table = _build()
    meta_cols = (meta, val, table)
    asg = Assignment(meta, N)
    RangeCircuit(values).synthesize(meta, asg)
    return meta, asg


def test_lookup_mock_and_real_prover():
    rng = random.Random(5)
    values = [rng.randrange(RANGE) for _ in range(N)]
    meta, asg = _setup(values)
    mock = MockProver(meta, asg, [])
    assert mock.verify() == []
    sys = PlonkSystem(meta, N, asg)
    proof = sys.prove(asg, [])
    assert sys.verify(proof, [])


def test_lookup_rejects_out_of_range():
    rng = random.Random(6)
    values = [rng.randrange(RANGE) for _ in range(N)]
    values[7] = RANGE + 3  # out of table
    meta, asg = _setup(values)
    mock = MockProver(meta, asg, [])
    assert any("lookup" in f for f in mock.verify())
    sys = PlonkSystem(meta, N, asg)
    import pytest

    with pytest.raises(ValueError):
        sys.prove(asg, [])


def test_blinded_proofs_differ_but_both_verify():
    """ZK blinding: two proofs of the same witness have different advice
    commitments (randomized) and both verify."""
    rng = random.Random(7)
    values = [rng.randrange(RANGE) for _ in range(N)]
    meta, asg = _setup(values)
    sys = PlonkSystem(meta, N, asg)
    p1 = sys.prove(asg, [], rng=random.Random(100))
    p2 = sys.prove(asg, [], rng=random.Random(200))
    assert p1.advice_comms != p2.advice_comms
    assert p1.evals["advice_x"] != p2.evals["advice_x"]
    assert sys.verify(p1, []) and sys.verify(p2, [])
