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
