"""Config bisect for the G2 MSM wrongness (reproduced at N=2^19,
c=12/signed/packed, uniform scalars — /tmp/xg2_519.log).

Shares one fixed-base point set per N and sweeps engine configs; each
config is checked against the exact host oracle (sum s_i*k_i)*H.

Env: XSWEEP_N (default 524288), XSWEEP_CONFIGS "c,signed,packed;..."
     (default "12,1,0;12,0,1"), XSWEEP_GROUP g2|g1,
     XSWEEP_SIZES "16,17,18" (overrides XSWEEP_N with a 2^k sweep;
     points are generated once at the largest size and prefix-sliced).
Each run also prints the got/want compressed points so that identical
wrong answers across configs can be detected (same-wrong => shared-
input bug, different-wrong => engine bug).
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

    sizes = os.environ.get("XSWEEP_SIZES")
    if sizes:
        Ns = [1 << int(x) for x in sizes.split(",")]
    else:
        Ns = [int(os.environ.get("XSWEEP_N", "524288"))]
    group = os.environ.get("XSWEEP_GROUP", "g2")
    configs = []
    for part in os.environ.get("XSWEEP_CONFIGS", "12,1,0;12,0,1").split(";"):
        c, s, p = part.split(",")
        configs.append((int(c), s == "1", p == "1"))
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    gd = ctx.g2_dev if group == "g2" else ctx.g1_dev
    gen = ctx.g2_gen if group == "g2" else ctx.g1.generator
    Nmax = max(Ns)
    print(f"backend {jax.default_backend()} Ns {Ns} {group}", flush=True)

    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 20) for _ in range(Nmax)]
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
    pts_all = fb.mul_ints(ks)
    print(f"fixed-base {Nmax} pts: {time.time()-t0:.1f}s", flush=True)
    ss = [rng.randrange(r) for _ in range(Nmax)]

    for N in Ns:
        pts = {k: v[:N] for k, v in pts_all.items()}
        want_k = sum(s * k for s, k in zip(ss[:N], ks[:N])) % r
        want = gd.host_mul(want_k, gen)
        for c, signed, packed in configs:
            msm = MSM(
                gd, scalar_bits=r.bit_length(), c=c, signed=signed,
                packed=packed,
            )
            msm.MAX_GATHER_BYTES = 1 << 62  # no chunk split: one program
            t0 = time.time()
            got = msm.run(pts, ss[:N])
            ok = got == want
            print(
                f"N=2^{N.bit_length()-1} c={c} signed={int(signed)} "
                f"packed={int(packed)}: {'PASS' if ok else 'FAIL'} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
            if not ok:
                print(f"  got  {got}", flush=True)
                print(f"  want {want}", flush=True)


if __name__ == "__main__":
    main()
