"""G2 MSM known-answer test at prover scale.

The n=196,608 trapdoor drive isolated the wrong stage to msm_b_g2
(benchmarks/debug_196608.log): the G2 Pippenger engine at the 2^20-padded
program shape.  This reproduces it standalone: points k_i*H from the G2
fixed-base engine, scalars per XCHECK_DIST, expected answer
(sum s_i*k_i mod r)*H by host math (one host scalar-mul).

Knobs (env):
  XCHECK_N        point count (default 792330 = the failing query size)
  XCHECK_MODE     tpu|cpu
  XCHECK_DIST     witness|uniform scalar distribution
  XCHECK_C        window width (default: policy for g2 at N)
  XCHECK_SIGNED   1|0 signed-digit recoding (default: policy)
  XCHECK_PACKED   1|0|auto packed-row gathers (default auto = tpu)
  XCHECK_PEEL     0 disables heavy-bucket peeling
  XCHECK_CHUNK    0 disables the MAX_GATHER_BYTES chunk split
  XCHECK_GROUP    g2|g1

Run: PYTHONPATH=/root/repo python -u benchmarks/xcheck_msm_g2.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODE = os.environ.get("XCHECK_MODE", "tpu")

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)


def main():
    if os.environ.get("XCHECK_PALLAS") == "0":
        from contangle_zkcp_tpu.fields import fp as _fp

        _fp.PALLAS_ENABLED = False
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.msm import MSM
    from contangle_zkcp_tpu.ops.msm_policy import msm_config

    N = int(os.environ.get("XCHECK_N", "792330"))
    group = os.environ.get("XCHECK_GROUP", "g2")
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    if group == "g2":
        gd, gen = ctx.g2_dev, ctx.g2_gen
    else:
        gd, gen = ctx.g1_dev, ctx.g1.generator

    pol = msm_config(group, N)
    c = int(os.environ.get("XCHECK_C", str(pol.c)))
    signed = os.environ.get("XCHECK_SIGNED", "1" if pol.signed else "0") == "1"
    packed_env = os.environ.get("XCHECK_PACKED", "auto")
    packed = None if packed_env == "auto" else packed_env == "1"
    msm = MSM(gd, scalar_bits=r.bit_length(), c=c, signed=signed, packed=packed)
    if os.environ.get("XCHECK_PEEL") == "0":
        msm.HEAVY_CNT = 1 << 62  # never peel
    if os.environ.get("XCHECK_CHUNK") == "0":
        msm.MAX_GATHER_BYTES = 1 << 62
    print(
        f"backend {jax.default_backend()} N {N} {group} c={c} "
        f"signed={signed} packed={packed_env} "
        f"max_gather={msm.MAX_GATHER_BYTES}",
        flush=True,
    )

    rng = random.Random(0)
    # distinct small multipliers so host expected-answer math stays cheap
    ks = [rng.randrange(1, 1 << 20) for _ in range(N)]

    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    t0 = time.time()
    # multipliers are < 2^20, so a 20-bit table suffices (CPU runs depend
    # on this staying cheap); chunk small for the big Fq2 coords
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
    pts = fb.mul_ints(ks)
    print(f"fixed-base {N} pts: {time.time()-t0:.1f}s", flush=True)

    import numpy as np

    dec_idx = [0, 1, N // 2, N - 1]
    sel = gd.decode_points({k: v[np.array(dec_idx)] for k, v in pts.items()})
    ok_fb = all(sel[i] == gd.host_mul(ks[j], gen) for i, j in enumerate(dec_idx))
    print("fixed-base spot check:", ok_fb, flush=True)

    def witness_scalar():
        u = rng.random()
        if u < 0.35:
            return rng.randrange(2)
        if u < 0.75:
            return rng.randrange(256)
        if u < 0.85:
            return rng.randrange(1 << 64)
        return rng.randrange(r)

    dist = os.environ.get("XCHECK_DIST", "witness")
    if dist == "uniform":
        # uniform wide scalars: no bucket exceeds the peel threshold, so
        # this exercises the core bucket program ALONE (no tree peeling)
        # with the exact same compiled shapes as the witness-skew run.
        ss = [rng.randrange(r) for _ in range(N)]
    else:
        ss = [witness_scalar() for _ in range(N)]
    t0 = time.time()
    got = msm.run(pts, ss)
    print(f"msm ran: {time.time()-t0:.1f}s", flush=True)
    want_k = sum(s * k for s, k in zip(ss, ks)) % r
    want = gd.host_mul(want_k, gen)
    print("msm exact:", got == want, flush=True)


if __name__ == "__main__":
    main()
