"""Field arithmetic correctness vs exact host integers."""

import random

import numpy as np
import pytest

from contangle_zkcp_tpu.fields import instances
from contangle_zkcp_tpu.fields.fp import Fp

FIELDS = [
    instances.bls12_381_fq(),
    instances.bls12_381_fr(),
    instances.jubjub_fr(),
    instances.bn254_fr(),
    instances.pasta_fp(),
]


def rand_elems(F, n, rng):
    return [rng.randrange(F.p) for _ in range(n)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_encode_decode_roundtrip(F):
    rng = random.Random(1)
    xs = rand_elems(F, 32, rng) + [0, 1, F.p - 1]
    arr = F.encode(xs, mont=False)
    assert F.decode(arr, mont=False) == xs
    arr = F.encode(xs, mont=True)
    assert F.decode(arr, mont=True) == xs


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F):
    rng = random.Random(2)
    xs = rand_elems(F, 64, rng) + [0, 1, F.p - 1, F.p - 1]
    ys = rand_elems(F, 64, rng) + [0, F.p - 1, F.p - 1, 1]
    a = F.encode(xs, mont=False)
    b = F.encode(ys, mont=False)
    got = F.decode(F.add(a, b), mont=False)
    assert got == [(x + y) % F.p for x, y in zip(xs, ys)]
    got = F.decode(F.sub(a, b), mont=False)
    assert got == [(x - y) % F.p for x, y in zip(xs, ys)]
    got = F.decode(F.neg(a), mont=False)
    assert got == [(-x) % F.p for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_montgomery_mul(F):
    rng = random.Random(3)
    xs = rand_elems(F, 64, rng) + [0, 1, F.p - 1, F.p - 1]
    ys = rand_elems(F, 64, rng) + [F.p - 1, F.p - 1, F.p - 1, 0]
    a = F.encode(xs)  # Montgomery form
    b = F.encode(ys)
    got = F.decode(F.mul(a, b))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_inv_and_pow(F):
    rng = random.Random(4)
    xs = [rng.randrange(1, F.p) for _ in range(16)] + [1, F.p - 1]
    a = F.encode(xs)
    got = F.decode(F.inv(a))
    assert got == [pow(x, -1, F.p) for x in xs]
    got = F.decode(F.pow_const(a, 17))
    assert got == [pow(x, 17, F.p) for x in xs]


@pytest.mark.parametrize("n", [1, 2, 7, 32, 33])
def test_batch_inv(n):
    F = instances.bls12_381_fq()
    rng = random.Random(7)
    xs = [rng.randrange(1, F.p) for _ in range(n)]
    if n >= 7:
        xs[3] = 0  # zero lane maps to zero, must not poison the tree
    a = F.encode(xs)
    got = F.decode(F.batch_inv(a))
    want = [pow(x, -1, F.p) if x else 0 for x in xs]
    assert got == want


def test_mont_round_trip_device():
    F = instances.bls12_381_fr()
    rng = random.Random(5)
    xs = rand_elems(F, 8, rng)
    a = F.encode(xs, mont=False)
    am = F.to_mont(a)
    back = F.from_mont(am)
    assert F.decode(back, mont=False) == xs


def test_batch_shapes():
    F = instances.bls12_381_fr()
    rng = random.Random(6)
    xs = rand_elems(F, 12, rng)
    a = F.encode(xs).reshape(3, 4, F.L)
    out = F.mul(a, a)
    assert out.shape == (3, 4, F.L)
    sq = F.decode(np.asarray(out).reshape(12, F.L))
    assert sq == [(x * x) % F.p for x in xs]


def test_small_field_generic():
    # generic Fp also works for small/odd-size primes (host tooling paths)
    F = Fp((1 << 61) - 1, "mersenne61")
    rng = random.Random(7)
    xs = [rng.randrange(F.p) for _ in range(16)]
    ys = [rng.randrange(F.p) for _ in range(16)]
    got = F.decode(F.mul(F.encode(xs), F.encode(ys)))
    assert got == [(x * y) % F.p for x, y in zip(xs, ys)]
