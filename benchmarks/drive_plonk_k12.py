"""halo2-path PLONK prover at the reference's row count (k=12).

The reference runs its ElGamal circuit with MockProver at k=12
(/root/reference/circuits-halo2/src/encryption.rs:335); this drives the
REAL prover (ZK-blinded, IPA multiopen, device MSM/IPA) at n = 2^12.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/drive_plonk_k12.py
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)


def main():
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.plonkish import (
        Assignment,
        CircuitMeta,
        ElGamalCircuit,
        ElGamalPallas,
    )
    from contangle_zkcp_tpu.plonkish.prover import PlonkSystem

    scheme = ElGamalPallas()
    rng = random.Random(7)
    sk, pk = scheme.keygen(rng)
    r = rng.randrange(1, scheme.curve.order)
    m = rng.randrange(scheme.curve.p)
    (c1, c2), s = scheme.encrypt(pk, m, r)
    meta = CircuitMeta(p=fi.PASTA_P)
    circ = ElGamalCircuit.build(meta, s, c1, m, c2)
    n = 1 << 12
    asg = Assignment(meta, n)
    circ.synthesize(meta, asg)
    instances = [[c1[0], c1[1], c2]]

    t0 = time.time()
    system = PlonkSystem(meta, n, asg, use_device=True)
    t_setup = time.time() - t0
    print(json.dumps({"phase": "plonk_setup_k12", "sec": round(t_setup, 2)}))
    from contangle_zkcp_tpu.utils import metrics

    n_rep = int(os.environ.get("PLONK_REPEAT", "2"))
    t_prove = None
    for rep in range(n_rep):
        metrics.registry().reset()
        t0 = time.time()
        proof = system.prove(asg, instances)
        t_prove = time.time() - t0
        snap = metrics.registry().snapshot()["timers"]
        print(json.dumps({"phase": "plonk_prove_k12", "rep": rep,
                          "sec": round(t_prove, 2),
                          "timers": {k: round(v["total_sec"], 2)
                                     for k, v in sorted(snap.items())}}))
    t0 = time.time()
    ok = system.verify(proof, instances)
    t_ver = time.time() - t0
    assert ok, "proof rejected"
    bad = [[c1[0], c1[1], (c2 + 1) % fi.PASTA_P]]
    assert not system.verify(proof, bad), "tampered instance accepted"
    print(
        json.dumps(
            {
                "metric": "plonk_elgamal_k12_prove_sec",
                "value": round(t_prove, 2),
                "unit": "s",
                "verify_sec": round(t_ver, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
