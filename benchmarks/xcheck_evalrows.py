"""Cross-check the native C++ R1CS row-eval engine against the exact
pure-Python fallback on the REAL n=196,608 PoE constraint system (the
failing run's shape: 595,720 constraints, 792,330 vars).

Host-only. Run: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache_cpu \
  PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/xcheck_evalrows.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from contangle_zkcp_tpu.circuits import elgamal
    from contangle_zkcp_tpu.circuits.encrypt_circuit import EncryptCircuit
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.groth16.groth16 import QAP
    from contangle_zkcp_tpu.r1cs import native

    n = int(os.environ.get("SCALE_N", "196608"))
    rng = random.Random(0)
    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    circ = EncryptCircuit(params)
    msg = [rng.randrange(256) for _ in range(n)]
    sk, pk_pt = elgamal.keygen(params, rng)
    rr = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk_pt, msg, rr)
    cs = circ.synthesize(pk_pt, msg, rr, cipher)
    print("constraints", cs.num_constraints, "vars", cs.num_variables, flush=True)
    assert cs.is_satisfied()

    r = fi.BLS12_381_R
    qap = QAP(cs, r)
    z = cs.full_assignment()
    d = qap.domain
    print("domain", d, "native available:", native.available(), flush=True)

    for name, M in (("A", qap.A), ("B", qap.B), ("C", qap.C)):
        t0 = time.time()
        got = native.eval_rows(r, M, z, d)
        t_nat = time.time() - t0
        t0 = time.time()
        ref = [0] * d
        for row, col, coeff in M:
            ref[row] = (ref[row] + coeff * z[col]) % r
        t_py = time.time() - t0
        same = got == ref
        print(f"{name}: native {t_nat:.1f}s python {t_py:.1f}s match={same}", flush=True)
        if not same:
            bad = [i for i in range(d) if got[i] != ref[i]][:10]
            print("first bad rows:", bad, flush=True)
            for i in bad[:3]:
                print(i, hex(got[i]), hex(ref[i]), flush=True)

    # also: a(i)*b(i) == c(i) on the original (pre-padding) rows
    a = native.eval_rows(r, qap.A, z, d) or []
    b = native.eval_rows(r, qap.B, z, d) or []
    c = native.eval_rows(r, qap.C, z, d) or []
    if a:
        viol = sum(
            1 for i in range(cs.num_constraints) if a[i] * b[i] % r != c[i]
        )
        print("a*b==c violations (native rows):", viol, flush=True)


if __name__ == "__main__":
    main()
