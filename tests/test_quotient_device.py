"""Device quotient assembler (plonkish/quotient_device.py) vs the host
per-row loop: identical t_evals on the ElGamal circuit (gates + copy
constraints) and on a lookup circuit (all four lookup terms live)."""

import random

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.plonkish import Assignment, CircuitMeta, ElGamalCircuit, ElGamalPallas
from contangle_zkcp_tpu.plonkish.prover import BLIND, P, PlonkSystem, _coeffs_from_evals


def _elgamal_setup(seed=301):
    scheme = ElGamalPallas()
    rng = random.Random(seed)
    sk, pk = scheme.keygen(rng)
    r = rng.randrange(1, scheme.curve.order)
    m = rng.randrange(scheme.curve.p)
    (c1, c2), s = scheme.encrypt(pk, m, r)
    meta = CircuitMeta(p=fi.PASTA_P)
    circ = ElGamalCircuit.build(meta, s, c1, m, c2)
    n = 128
    asg = Assignment(meta, n)
    circ.synthesize(meta, asg)
    return meta, asg, [[c1[0], c1[1], c2]], n


def _quotient_inputs(sys, asg, instances, rng):
    """Everything prove() hands the quotient step, reproduced with a
    fixed rng so both paths see identical blinded polynomials."""
    n = sys.n
    inst_cols = [list(col) + [0] * (n - len(col)) for col in instances]
    advice_polys = [
        sys._blind(_coeffs_from_evals(list(c)), rng) for c in asg.advice
    ]
    inst_polys = [_coeffs_from_evals(c) for c in inst_cols]
    # arbitrary-but-valid challenges; the quotient is a pure function
    theta, beta, gamma, alpha = (
        rng.randrange(1, P) for _ in range(4)
    )
    # a consistent grand product z (its exact values do not matter for
    # path equality — both paths consume the same z_poly)
    z_poly = sys._blind(_coeffs_from_evals([1] * n), rng)
    return advice_polys, inst_polys, z_poly, theta, beta, gamma, alpha


def test_device_quotient_matches_host_elgamal():
    meta, asg, instances, n = _elgamal_setup()
    sys = PlonkSystem(meta, n, asg)
    rng = random.Random(7)
    advice_polys, inst_polys, z_poly, theta, beta, gamma, alpha = (
        _quotient_inputs(sys, asg, instances, rng)
    )
    host = sys._quotient_host(
        advice_polys, inst_polys, z_poly, [], theta, beta, gamma, alpha
    )
    dev = sys._quotient_device(
        advice_polys, inst_polys, z_poly, [], theta, beta, gamma, alpha
    )
    assert host == dev


def test_device_quotient_matches_host_lookup():
    import tests.test_plonk_lookup as tpl

    rng0 = random.Random(5)
    values = [rng0.randrange(tpl.RANGE) for _ in range(tpl.N)]
    meta, asg = tpl._setup(values)
    instances = []
    n = tpl.N
    sys = PlonkSystem(meta, n, asg)
    rng = random.Random(9)
    advice_polys, inst_polys, z_poly, theta, beta, gamma, alpha = (
        _quotient_inputs(sys, asg, instances, rng)
    )
    # lookup data exactly as prove() builds it (permute + blind)
    base_tables = {
        "advice": [list(c) for c in asg.advice],
        "fixed": [list(c) for c in asg.fixed],
        "instance": [list(col) + [0] * (n - len(col)) for col in instances],
    }
    lookup_data = []
    for lk in meta.lookups:
        a_vec = [0] * n
        s_vec = [0] * n
        t_pow = 1
        for inp, tab in lk.pairs:
            iv = inp.eval_vec(base_tables, P, n)
            tv = tab.eval_vec(base_tables, P, n)
            for r in range(n):
                a_vec[r] = (a_vec[r] + t_pow * iv[r]) % P
                s_vec[r] = (s_vec[r] + t_pow * tv[r]) % P
            t_pow = t_pow * theta % P
        ap_vals, sp_vals = sys._permute_lookup(a_vec, s_vec)
        lookup_data.append(
            {
                "a": a_vec,
                "s": s_vec,
                "ap": ap_vals,
                "sp": sp_vals,
                "ap_poly": sys._blind(_coeffs_from_evals(ap_vals), rng),
                "sp_poly": sys._blind(_coeffs_from_evals(sp_vals), rng),
                "z_poly": sys._blind(_coeffs_from_evals([1] * n), rng),
            }
        )
    host = sys._quotient_host(
        advice_polys, inst_polys, z_poly, lookup_data,
        theta, beta, gamma, alpha,
    )
    dev = sys._quotient_device(
        advice_polys, inst_polys, z_poly, lookup_data,
        theta, beta, gamma, alpha,
    )
    assert host == dev


def test_prove_verify_with_device_quotient():
    """End-to-end: a proof produced with use_device=True verifies (and
    the tamper probe still rejects)."""
    meta, asg, instances, n = _elgamal_setup(303)
    sys = PlonkSystem(meta, n, asg, use_device=True)
    proof = sys.prove(asg, instances)
    assert sys.verify(proof, instances)
    bad = [[instances[0][0], instances[0][1], (instances[0][2] + 1) % P]]
    assert not sys.verify(proof, bad)
