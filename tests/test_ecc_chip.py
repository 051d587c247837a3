"""EccChip fixed-base scalar multiplication (halo2 find_zs_and_us model).

The reference configures halo2_gadgets' EccChip + window tables
(circuits-halo2/src/constants.rs:12-136) but never constrains a scalar
mul; this chip does, and these tests check it end-to-end with the
MockProver (incl. tamper rejection).
"""

import random

import pytest

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.plonkish import ecc_chip
from contangle_zkcp_tpu.plonkish.circuit import Assignment, CircuitMeta
from contangle_zkcp_tpu.plonkish.mock import MockProver


@pytest.fixture(scope="module")
def chip_setup():
    tables = ecc_chip.build_tables()
    meta = CircuitMeta(p=fi.PASTA_P)
    chip = ecc_chip.EccChip(meta, tables)
    return tables, meta, chip


def test_find_zs_and_us_properties(chip_setup):
    from contangle_zkcp_tpu.curves.host import sqrt_mod

    tables, _, _ = chip_setup
    P = fi.PASTA_P
    for w in (0, 37, ecc_chip.NUM_WINDOWS - 1):
        z = tables.zs[w]
        for d, (x, y) in enumerate(tables.window_points[w]):
            u = tables.us[w][d]
            assert u * u % P == (y + z) % P
            assert sqrt_mod((P - y + z) % P, P) is None


def test_window_tables_sum_to_scalar_mul(chip_setup):
    tables, _, _ = chip_setup
    C = ecc_chip.CURVE
    rng = random.Random(8)
    for _ in range(3):
        k = rng.randrange(1 << 255)
        ks = [(k >> (3 * w)) & 7 for w in range(ecc_chip.NUM_WINDOWS)]
        acc = None
        for w, d in enumerate(ks):
            acc = C.add(acc, tables.window_points[w][d])
        assert acc == C.mul(k % ecc_chip.ORDER, C.generator)


def test_ecc_chip_constrains_scalar_mul(chip_setup):
    tables, meta, chip = chip_setup
    C = ecc_chip.CURVE
    rng = random.Random(9)
    k = rng.randrange(1 << 255)
    n = 128
    asg = Assignment(meta, n)
    last_row, result = chip.assign_mul(asg, k)
    assert result == C.mul(k % ecc_chip.ORDER, C.generator)
    assert MockProver(meta, asg, []).verify() == []


def test_ecc_chip_rejects_tampered_point(chip_setup):
    tables, meta, chip = chip_setup
    rng = random.Random(10)
    k = rng.randrange(1 << 255)
    asg = Assignment(meta, 128)
    chip.assign_mul(asg, k)
    # tamper: swap window 5's selected digit value without updating k
    pt = tables.window_points[5][(((k >> 15) & 7) + 1) % 8]
    asg.assign(chip.x_col, 5, pt[0])
    asg.assign(chip.y_col, 5, pt[1])
    failures = MockProver(meta, asg, []).verify()
    assert failures
