"""Absolute MSM known-answer check at prove/verify scale on the TPU.

Points are fixed-base multiples k_i*G (FixedBaseDevice), so the true MSM
value is (sum s_i*k_i mod r) * G — one host dot product + one host mul.
Scalar distributions mirror the failing n=196,608 Groth16 run:
  A) witness-like skew at N=792,330 (the a/b/l query shape): mostly
     0/1/bytes, some full-range — exercises c=12, alias spreading,
     heavy-bucket peeling, two-level reduction, pad_pow2 to 2^20;
  B) extreme byte-skew at N=196,610 (the verify public-input MSM shape):
     every scalar < 2^16 — all windows >= 2 empty, window-0/1 buckets all
     peeled;
  C) from_mont exactness at (2^20, L) vs host ints;
  D) fixed-base spot check vs host windowed mul.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/xcheck_msm20.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np


def main():
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    print("backend", jax.default_backend(), flush=True)
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    C = ctx.g1
    Fr = fi.bls12_381_fr()
    rng = random.Random(7)

    # ---- C) from_mont exactness at (2^20, L)
    n = 1 << 20
    xs = [rng.randrange(r) for _ in range(n)]
    enc = Fr.encode(xs)
    back = np.asarray(jax.device_get(Fr.from_mont(enc)))
    want = ints_to_limbs(xs, Fr.L)
    print("from_mont 2^20 exact:", bool((back == want).all()), flush=True)

    # ---- points: k_i * G on device
    N = 792330
    ks = [rng.randrange(1, r) for _ in range(N)]
    t0 = time.time()
    eng = FixedBaseDevice(ctx.g1_dev, C.generator, r.bit_length())
    pts = eng.mul_ints(ks)
    print(f"fixed-base {N} pts: {time.time()-t0:.1f}s", flush=True)

    # ---- D) spot-check 8 fixed-base points vs host
    dec_idx = [0, 1, 2, N // 3, N // 2, N - 3, N - 2, N - 1]
    sel = {k: v[np.array(dec_idx)] for k, v in pts.items()}
    host_sel = ctx.g1_dev.decode_points(sel)
    ok_fb = all(
        host_sel[i] == C.mul(ks[j], C.generator) for i, j in enumerate(dec_idx)
    )
    print("fixed-base spot check:", ok_fb, flush=True)

    # ---- A) witness-like skew at N=792,330
    def witness_scalar():
        u = rng.random()
        if u < 0.35:
            return rng.randrange(2)  # bits
        if u < 0.75:
            return rng.randrange(256)  # bytes
        if u < 0.85:
            return rng.randrange(1 << 64)
        return rng.randrange(r)

    ss = [witness_scalar() for _ in range(N)]
    msm = ctx.msm_g1(N)
    t0 = time.time()
    got = msm.run(pts, ss)
    print(f"msm A ran: {time.time()-t0:.1f}s", flush=True)
    want_k = 0
    for s, k in zip(ss, ks):
        want_k += s * k
    want_pt = C.mul(want_k % r, C.generator)
    print("msm A (witness-skew, N=792330) exact:", got == want_pt, flush=True)

    # ---- B) extreme byte-skew at N=196,610 (verify shape)
    N2 = 196610
    ks2 = ks[:N2]
    pts2 = {k: v[:N2] for k, v in pts.items()}
    ss2 = [rng.randrange(1 << 16) for _ in range(N2)]
    ss2[0] = 0
    ss2[1] = 1
    msm2 = ctx.msm_g1(N2)
    t0 = time.time()
    got2 = msm2.run(pts2, ss2)
    print(f"msm B ran: {time.time()-t0:.1f}s", flush=True)
    want_k2 = 0
    for s, k in zip(ss2, ks2):
        want_k2 += s * k
    want_pt2 = C.mul(want_k2 % r, C.generator)
    print("msm B (byte-skew, N=196610) exact:", got2 == want_pt2, flush=True)


if __name__ == "__main__":
    main()
