"""Folding decider (groth16/decider.py): sumcheck + vector-IPA proof
that a folded accumulator is satisfied, without revealing the witness.

Covers: sumcheck primitives, the vector-IPA against the fold's own
Pedersen commitments, the full decide of a 3-instance PoE fold, and the
negative probes (corrupted witness, wrong accumulator, truncated proof).
"""

import random

import pytest

from contangle_zkcp_tpu.groth16 import sumcheck as sc
from contangle_zkcp_tpu.groth16.decider import Decider, DeciderTranscript
from contangle_zkcp_tpu.groth16.folding import FoldingScheme
from contangle_zkcp_tpu.groth16.ipa_vec import VectorIPA, hash_to_g1
from contangle_zkcp_tpu.fields import instances as fi

from tests.test_folding import _mini_poe_cs

P = fi.BLS12_381_R


# ------------------------------------------------------------- sumcheck
def test_sumcheck_roundtrip():
    rng = random.Random(1)
    s = 4
    n = 1 << s
    f = [rng.randrange(P) for _ in range(n)]
    g = [rng.randrange(P) for _ in range(n)]
    claimed = sum(a * b % P for a, b in zip(f, g)) % P
    tr_p = DeciderTranscript(b"t")
    polys, rs, finals, final_claim = sc.prove(
        P, [f, g], lambda v: v[0] * v[1] % P, 2, claimed, tr_p
    )
    tr_v = DeciderTranscript(b"t")
    rs_v, claim_v = sc.verify(P, claimed, 2, s, polys, tr_v)
    assert rs_v == rs
    assert claim_v == final_claim == finals[0] * finals[1] % P
    # final values are the multilinear evaluations at rs
    eq_r = sc.eq_table(P, rs)
    assert finals[0] == sum(a * e % P for a, e in zip(f, eq_r)) % P


def test_sumcheck_rejects_tampering():
    rng = random.Random(2)
    n = 8
    f = [rng.randrange(P) for _ in range(n)]
    claimed = sum(f) % P
    tr = DeciderTranscript(b"t")
    polys, _, _, _ = sc.prove(P, [f], lambda v: v[0], 1, claimed, tr)
    bad = [list(ev) for ev in polys]
    bad[1][0] = (bad[1][0] + 1) % P
    with pytest.raises(ValueError):
        sc.verify(P, claimed, 1, 3, bad, DeciderTranscript(b"t"))


def test_eq_table_matches_eq_point():
    rng = random.Random(3)
    taus = [rng.randrange(P) for _ in range(3)]
    tbl = sc.eq_table(P, taus)
    for i in range(8):
        bits = [(i >> (2 - j)) & 1 for j in range(3)]
        assert tbl[i] == sc.eq_point(P, taus, bits)


# ----------------------------------------------------------- vector IPA
def test_vector_ipa_roundtrip():
    rng = random.Random(4)
    n = 16
    bases = [hash_to_g1(b"test-b", i) for i in range(n)]
    ipa = VectorIPA(bases, use_device_msm=False)
    vec = [rng.randrange(P) for _ in range(n)]
    b = [rng.randrange(P) for _ in range(n)]
    comm = ipa.commit(vec)
    v = sum(a * bb % P for a, bb in zip(vec, b)) % P
    proof = ipa.open(vec, b, DeciderTranscript(b"i"))
    assert ipa.verify(comm, b, v, proof, DeciderTranscript(b"i"))
    # wrong claimed value rejected
    assert not ipa.verify(comm, b, (v + 1) % P, proof, DeciderTranscript(b"i"))
    # transcript domain separation matters
    assert not ipa.verify(comm, b, v, proof, DeciderTranscript(b"j"))


# -------------------------------------------------------------- decider
@pytest.fixture(scope="module")
def folded():
    css = [_mini_poe_cs(4, s) for s in (11, 22, 33)]
    scheme = FoldingScheme(css[0])
    lifted = [scheme.instance_from_cs(cs) for cs in css]
    i01, w01 = scheme.fold(*lifted[0], *lifted[1])
    acc_i, acc_w = scheme.fold(i01, w01, *lifted[2])
    assert scheme.check(acc_i, acc_w)
    return scheme, acc_i, acc_w


def test_decider_accepts_valid_accumulator(folded):
    scheme, acc_i, acc_w = folded
    dec = Decider(scheme, use_device_msm=False)
    proof = dec.prove(acc_i, acc_w)
    assert dec.verify(acc_i, proof)


def test_decider_rejects_wrong_instance(folded):
    scheme, acc_i, acc_w = folded
    dec = Decider(scheme, use_device_msm=False)
    proof = dec.prove(acc_i, acc_w)
    from contangle_zkcp_tpu.groth16.folding import RelaxedInstance

    bad = RelaxedInstance(
        comm_w=acc_i.comm_w,
        comm_e=acc_i.comm_e,
        u=(acc_i.u + 1) % P,
        x=list(acc_i.x),
    )
    assert not dec.verify(bad, proof)


def test_decider_rejects_tampered_proof(folded):
    scheme, acc_i, acc_w = folded
    dec = Decider(scheme, use_device_msm=False)
    proof = dec.prove(acc_i, acc_w)
    proof.va = (proof.va + 1) % P
    assert not dec.verify(acc_i, proof)


def test_decider_rejects_unsatisfied_witness(folded):
    """A prover with a corrupted witness cannot produce an accepting
    proof: the outer sumcheck invariant breaks immediately."""
    scheme, acc_i, acc_w = folded
    dec = Decider(scheme, use_device_msm=False)
    from contangle_zkcp_tpu.groth16.folding import RelaxedWitness

    bad_w = RelaxedWitness(w=list(acc_w.w), e=list(acc_w.e))
    bad_w.w[0] = (bad_w.w[0] + 1) % P
    with pytest.raises(AssertionError):
        dec.prove(acc_i, bad_w)
