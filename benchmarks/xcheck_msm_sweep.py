"""Config bisect for the G2 MSM wrongness (reproduced at N=2^19,
c=12/signed/packed, uniform scalars — /tmp/xg2_519.log).

Shares one fixed-base point set per N and sweeps engine configs; each
config is checked against the exact host oracle (sum s_i*k_i)*H.

Env: XSWEEP_N (default 524288), XSWEEP_CONFIGS "c,signed,packed;..."
     (default "12,1,0;12,0,1"), XSWEEP_GROUP g2|g1.
"""

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
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.msm import MSM

    N = int(os.environ.get("XSWEEP_N", "524288"))
    group = os.environ.get("XSWEEP_GROUP", "g2")
    configs = []
    for part in os.environ.get("XSWEEP_CONFIGS", "12,1,0;12,0,1").split(";"):
        c, s, p = part.split(",")
        configs.append((int(c), s == "1", p == "1"))
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    gd = ctx.g2_dev if group == "g2" else ctx.g1_dev
    gen = ctx.g2_gen if group == "g2" else ctx.g1.generator
    print(f"backend {jax.default_backend()} N {N} {group}", flush=True)

    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 20) for _ in range(N)]
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
    pts = fb.mul_ints(ks)
    print(f"fixed-base {N} pts: {time.time()-t0:.1f}s", flush=True)
    ss = [rng.randrange(r) for _ in range(N)]
    want_k = sum(s * k for s, k in zip(ss, ks)) % r
    want = gd.host_mul(want_k, gen)

    for c, signed, packed in configs:
        msm = MSM(
            gd, scalar_bits=r.bit_length(), c=c, signed=signed, packed=packed
        )
        msm.MAX_GATHER_BYTES = 1 << 62  # no chunk split: one program
        t0 = time.time()
        got = msm.run(pts, ss)
        ok = got == want
        print(
            f"c={c} signed={int(signed)} packed={int(packed)}: "
            f"{'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
