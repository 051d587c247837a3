"""Exactness check of the balanced-lane MSM engine vs host oracle.

Covers: uniform scalars, witness-skew (many 0/1/small values), signed
and unsigned windows, G1 and G2, overflow-segment fold (forced by a
tiny overflow pool), pow2 padding.

Expected values use the multiplier trick (points are k_i*G with known
k_i, so the MSM equals (sum s_i*k_i mod r)*G — O(1) host math).

Engines are shared across cases with the same window config: XLA:CPU
compiles of the staged reduction cost ~2 min per geometry, so CPU runs
use narrow windows (c=8/10); the TPU run exercises the production
policy configs (c=16 G1 / c=12 G2, signed).

Run (CPU): PYTHONPATH=/root/repo python -u benchmarks/xcheck_balanced.py
Run (TPU): ZKCP_XCHECK_TPU=1 ... (production window configs)
"""

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

ON_TPU = bool(os.environ.get("ZKCP_XCHECK_TPU"))
if not ON_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )

from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
from contangle_zkcp_tpu.ops.msm_balanced import BalancedMSM


def gen_scalars(rng, n, r, skew):
    if skew == "uniform":
        return [rng.randrange(r) for _ in range(n)]
    out = []
    for _ in range(n):
        t = rng.random()
        if t < 0.4:
            out.append(1)
        elif t < 0.6:
            out.append(rng.randrange(256))
        elif t < 0.8:
            out.append(rng.randrange(1 << 16))
        else:
            out.append(rng.randrange(r))
    return out


def main():
    ctx = curve_ctx("bls12_381")
    rng = random.Random(11)

    if ON_TPU:
        combos = [("g1", 16, True), ("g1", 8, False), ("g2", 12, True)]
        sizes = {"g1": (64, 1024), "g2": (64, 512)}
        E = 1 << 10
    else:
        combos = [("g1", 10, True), ("g1", 8, False), ("g2", 10, True)]
        sizes = {"g1": (7, 64, 257), "g2": (33, 64)}
        E = 256

    ok_all = True
    for group, c, signed in combos:
        gd = ctx.g1_dev if group == "g1" else ctx.g2_dev
        gen = ctx.g1.generator if group == "g1" else ctx.g2_gen
        eng = BalancedMSM(gd, scalar_bits=ctx.r.bit_length(), c=c,
                          signed=signed, overflow_lanes=E)
        for n in sizes[group]:
            for skew in ("uniform", "witness"):
                t0 = time.time()
                scalars = gen_scalars(rng, n, ctx.r, skew)
                ks = [i + 1 for i in range(n)]
                pts = [gd.host_mul(k, gen) for k in ks]
                want_k = sum(s * k for s, k in zip(scalars, ks)) % ctx.r
                want = gd.host_mul(want_k, gen)
                got = eng.run(pts, scalars)
                ok = got == want
                ok_all &= ok
                print(json.dumps({
                    "case": f"{group} n={n} {skew} c={c} signed={signed}",
                    "ok": bool(ok), "sec": round(time.time() - t0, 1),
                }), flush=True)
                if not ok:
                    print("  got ", got)
                    print("  want", want)
    print(json.dumps({"all_ok": bool(ok_all)}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
