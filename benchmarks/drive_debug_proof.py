"""Trapdoor-instrumented reference-scale proof drive.

Same circuit as drive_scale_proof.py, but setup keeps the toxic waste so
every prover MSM is checked against its expected scalar (host Fr math),
and random CRS entries are spot-checked against host fixed-base muls.
Pinpoints the faulty stage of a failing scale proof in ONE run.

Run: SCALE_N=196608 PYTHONPATH=/root/repo:/root/.axon_site \
     python -u benchmarks/drive_debug_proof.py
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from contangle_zkcp_tpu.circuits import elgamal
    from contangle_zkcp_tpu.circuits.encrypt_circuit import EncryptCircuit
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.groth16 import Groth16

    n = int(os.environ.get("SCALE_N", "196608"))
    rng = random.Random(0)
    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    circ = EncryptCircuit(params)
    msg = [rng.randrange(256) for _ in range(n)]
    sk, pk_pt = elgamal.keygen(params, rng)
    r_enc = elgamal.random_scalar(params, rng)
    cipher = elgamal.encrypt(params, pk_pt, msg, r_enc)
    t0 = time.time()
    cs = circ.synthesize(pk_pt, msg, r_enc, cipher)
    print(json.dumps({"phase": "synthesize", "constraints": cs.num_constraints,
                      "vars": cs.num_variables, "sec": round(time.time() - t0, 2)}),
          flush=True)
    assert cs.is_satisfied()

    eng = Groth16("bls12_381")
    ctx = eng.ctx
    t0 = time.time()
    engine = os.environ.get("SCALE_ENGINE", "device")
    pk, vk = eng.setup(cs, rng, engine=engine, debug_trapdoor=True)
    print(json.dumps({"phase": "setup", "sec": round(time.time() - t0, 2)}), flush=True)

    # ---- CRS spot checks: device-generated entries vs host windowed muls
    td = pk.trapdoor
    if not isinstance(pk.a_query, dict):
        print("[crs] host-engine CRS: spot checks skipped", flush=True)
        _prove_and_verify(eng, ctx, pk, vk, cs, rng, td)
        return
    try:
        _crs_spot_checks(ctx, pk, cs, td)
    except Exception as e:
        print(f"[crs] spot checks crashed: {e!r}", flush=True)
    _prove_and_verify(eng, ctx, pk, vk, cs, rng, td)


def _crs_spot_checks(ctx, pk, cs, td):
    r = ctx.r
    g1, G = ctx.g1, ctx.g1.generator
    u, v, w = td["u"], td["v"], td["w"]
    beta, alpha, delta, tau = td["beta"], td["alpha"], td["delta"], td["tau"]
    dinv = pow(delta, -1, r)
    z_tau = (pow(tau, pk.domain, r) - 1) % r
    spot = random.Random(1)

    def decode1(q, i):
        return ctx.g1_dev.decode_points({k: x[i : i + 1] for k, x in q.items()})[0]

    nv = cs.num_variables
    idxs = [0, 1, nv // 2, nv - 1] + [spot.randrange(nv) for _ in range(6)]
    ok = all(decode1(pk.a_query, i) == g1.mul(u[i], G) for i in idxs)
    print("[crs] a_query spot:", "PASS" if ok else "FAIL", flush=True)
    ok = all(decode1(pk.b_g1_query, i) == g1.mul(v[i], G) for i in idxs)
    print("[crs] b_g1_query spot:", "PASS" if ok else "FAIL", flush=True)
    g2d = ctx.g2_dev
    ok = all(
        g2d.decode_points({k: x[i : i + 1] for k, x in pk.b_g2_query.items()})[0]
        == g2d.host_mul(v[i], ctx.g2_gen)
        for i in idxs[:6]
    )
    print("[crs] b_g2_query spot:", "PASS" if ok else "FAIL", flush=True)
    d = pk.domain
    hidx = [0, 1, d // 2, d - 2] + [spot.randrange(d - 1) for _ in range(4)]
    ok = all(
        decode1(pk.h_query, j) == g1.mul(pow(tau, j, r) * z_tau % r * dinv % r, G)
        for j in hidx
    )
    print("[crs] h_query spot:", "PASS" if ok else "FAIL", flush=True)
    ni = cs.num_instance
    lidx = [0, nv - ni - 1] + [spot.randrange(nv - ni) for _ in range(4)]
    ok = all(
        decode1(pk.l_query, i)
        == g1.mul((beta * u[ni + i] + alpha * v[ni + i] + w[ni + i]) % r * dinv % r, G)
        for i in lidx
    )
    print("[crs] l_query spot:", "PASS" if ok else "FAIL", flush=True)


def _prove_and_verify(eng, ctx, pk, vk, cs, rng, td):
    import time

    g1, G = ctx.g1, ctx.g1.generator
    r = ctx.r
    t0 = time.time()
    proof = eng.prove(pk, cs, rng)
    print(json.dumps({"phase": "prove", "sec": round(time.time() - t0, 2)}), flush=True)

    t0 = time.time()
    ok = eng.verify(vk, cs.public_inputs(), proof)
    print(json.dumps({"phase": "verify", "ok": bool(ok),
                      "sec": round(time.time() - t0, 2)}), flush=True)
    if not ok:
        # verify-side split: recompute the public-input MSM on host
        beta, alpha = td["beta"], td["alpha"]
        u, v, w = td["u"], td["v"], td["w"]
        pub = cs.public_inputs()
        acc_s = (
            (beta * u[0] + alpha * v[0] + w[0])
            + sum(
                x % r * ((beta * u[i + 1] + alpha * v[i + 1] + w[i + 1]) % r)
                for i, x in enumerate(pub)
            )
        ) % r * pow(td["gamma"], -1, r) % r
        if not isinstance(vk.gamma_abc_g1, dict):
            print("[verify] host vk: input-msm split n/a", flush=True)
            assert ok, "proof did not verify"
        nabc = int(vk.gamma_abc_g1["x"].shape[0])
        first = ctx.g1_dev.decode_points(
            {k: x[:1] for k, x in vk.gamma_abc_g1.items()}
        )[0]
        rest = {k: x[1:] for k, x in vk.gamma_abc_g1.items()}
        acc_dev = ctx.msm_g1(nabc - 1).run(rest, [x % r for x in pub])
        acc_dev = g1.add(first, acc_dev)
        print("[verify] input-msm:", "PASS" if acc_dev == g1.mul(acc_s, G) else "FAIL",
              flush=True)
    assert ok, "proof did not verify"


if __name__ == "__main__":
    main()
