"""zkPhoto-shaped circom circuit: nonlinear intermediates + Num2Bits.

The reference exercises an external circom circuit with nonlinear
intermediate wires via its (missing) ark-circom fork + wasm witness
generator (/root/reference/circuits-ark/src/circom_wrapper.rs:153-225).
Our graph-based witness calculator must solve such circuits without
wasm: products, squares, and the Num2Bits bit-decomposition hint.
"""

import random

from contangle_zkcp_tpu.circomx.r1cs_format import R1csFile
from contangle_zkcp_tpu.circomx.wrapper import CircomBuilder, CircomConfig
from contangle_zkcp_tpu.fields import instances as fi

P = fi.BN254_R
M1 = P - 1


def _zkphoto_shaped():
    """wires: 0=1, 1=out(pub), 2=in(prv), 3=u, 4..11=b0..b7, 12=t
    u = in^2; u == sum 2^i b_i (8 bits, booleanity-constrained);
    t = u * b0; out = t + b3."""
    constraints = [
        ({2: 1}, {2: 1}, {3: 1}),  # in*in = u
    ]
    for i in range(8):
        w = 4 + i
        constraints.append(({w: 1}, {w: 1, 0: M1}, {}))  # b(b-1)=0
    decomp = {4 + i: 1 << i for i in range(8)}
    decomp[3] = M1
    constraints.append(({}, {}, decomp))
    constraints.append(({3: 1}, {4: 1}, {12: 1}))  # u*b0 = t
    constraints.append(({}, {}, {12: 1, 7: 1, 1: M1}))  # t + b3 - out = 0
    r1 = R1csFile(
        prime=P,
        n_wires=13,
        n_pub_out=1,
        n_pub_in=0,
        n_prv_in=1,
        n_labels=13,
        constraints=constraints,
        wire2label=list(range(13)),
    )
    return CircomConfig(r1cs=r1, signal_map={"in": 2, "out": 1}, sanity_check=True)


def _expected(x):
    u = x * x % P
    bits = [(u >> i) & 1 for i in range(8)]
    t = u * bits[0] % P
    return (t + bits[3]) % P, u, bits, t


def test_nonlinear_witness_solving():
    cfg = _zkphoto_shaped()
    for x in (13, 7, 0, 15):
        b = CircomBuilder(cfg)
        b.push_variable("in", x)
        wit = b.solve_witness()
        out, u, bits, t = _expected(x)
        assert wit[1] == out and wit[3] == u and wit[12] == t
        assert wit[4:12] == bits


def test_nonlinear_circuit_proves_real_groth16():
    """Solve + embed + REAL Groth16 prove/verify over BN254 (the composed
    circom path with the real backend, not mock)."""
    from contangle_zkcp_tpu.circomx.wrapper import CircomCircuit
    from contangle_zkcp_tpu.groth16 import Groth16
    from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem

    cfg = _zkphoto_shaped()
    b = CircomBuilder(cfg)
    b.push_variable("in", 13)
    wit = b.solve_witness()
    cs = ConstraintSystem(p=P)
    circ = CircomCircuit(cfg, wit)
    var = circ.allocate(cs)
    circ.enforce(cs, var)
    assert cs.is_satisfied()
    rng = random.Random(77)
    eng = Groth16("bn254")
    pk, vk = eng.setup(cs, rng)
    proof = eng.prove(pk, cs, rng)
    inputs = cs.public_inputs()
    assert eng.verify(vk, inputs, proof)
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % P
    assert not eng.verify(vk, bad, proof)
