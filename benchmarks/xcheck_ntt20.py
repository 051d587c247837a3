"""Cross-platform NTT exactness check at n=2^20.

Mode A (CPU): run the XLA butterfly path (unit-test-validated vs host
ints at small n) on a fixed seed-0 input and save raw Montgomery limb
outputs to benchmarks/xcheck_ntt20_cpu.npz.
Mode B (TPU): run the lane-major fused-butterfly Pallas pipeline on the
same input and compare limb-exactly against the saved CPU outputs.

Run:  XCHECK_MODE=cpu|tpu PYTHONPATH=/root/repo:/root/.axon_site \
      python -u benchmarks/xcheck_ntt20.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = os.environ.get("XCHECK_MODE", "cpu")
N = int(os.environ.get("XCHECK_N", str(1 << 20)))

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np
import random

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.ntt import NTT

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "xcheck_ntt20_cpu.npz")


def main():
    Fr = fi.bls12_381_fr()
    print("backend", jax.default_backend(), "n", N, flush=True)
    rng = random.Random(0)
    xs = [rng.randrange(Fr.p) for _ in range(N)]
    a = Fr.encode(xs)
    ntt = NTT(Fr, N)
    g = fi.FIELD_GENERATORS[Fr.p]

    results = {}
    fwd = ntt.forward(a)
    results["fwd"] = np.asarray(jax.device_get(fwd))
    print("forward done", flush=True)
    inv = ntt.inverse(a)
    results["inv"] = np.asarray(jax.device_get(inv))
    print("inverse done", flush=True)
    cf = ntt.coset_forward(a, g)
    results["cf"] = np.asarray(jax.device_get(cf))
    ci_ = ntt.coset_inverse(a, g)
    results["ci"] = np.asarray(jax.device_get(ci_))
    print("coset done", flush=True)
    rt = ntt.inverse(fwd)
    results["rt"] = np.asarray(jax.device_get(rt))
    a_np = np.asarray(jax.device_get(a))
    print("roundtrip exact:", bool((results["rt"] == a_np).all()), flush=True)

    if MODE == "cpu":
        np.savez(OUT, **results)
        print("saved", OUT, flush=True)
    else:
        ref = np.load(OUT)
        ok = True
        for k in ("fwd", "inv", "cf", "ci", "rt"):
            same = bool((ref[k] == results[k]).all())
            n_bad = int((ref[k] != results[k]).any(axis=-1).sum())
            print(f"{k}: match={same} bad_rows={n_bad}", flush=True)
            ok = ok and same
        print("ALL MATCH" if ok else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
