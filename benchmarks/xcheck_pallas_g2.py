"""On-chip cross-check of the Pallas Montgomery kernel at the G2 MSM's
exact batch geometries.

The c=12 G2 MSM is wrong at every size on TPU while c=8-era proofs
verified; the only TPU-specific component in the G2 add chain is
`pallas_mont` (G1 takes the fused pallas_curve kernel instead, and G1
MSMs are exact).  Each G2 add runs 3 stacked Fq2 multiplies per
_mul_many round -> Fq batches of (6, K, nb) elements: 49,152 at c=8 vs
270,336 at c=12 (Fq L=24).  This probes, elementwise against host ints:

  stage 1: pallas-dispatch Fq mul at n = 2048 / 49152 / 270336;
  stage 2: full G2 dev.add at batch (22, 2048) vs host affine math.

Env: XPG_STAGES "1,2"; XPG_PALLAS=0 disables the pallas dispatch for
the whole process (fresh jit caches), isolating kernel vs XLA path.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)


def main():
    from contangle_zkcp_tpu.fields import fp as fp_mod
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    if os.environ.get("XPG_PALLAS", "1") == "0":
        fp_mod.PALLAS_ENABLED = False
    stages = set(
        int(x) for x in os.environ.get("XPG_STAGES", "1,2").split(",")
    )
    ctx = curve_ctx("bls12_381")
    Fq = ctx.g2_dev.ops.F  # base field, L=24
    p = Fq.p
    rng = random.Random(1)
    print(
        f"backend {jax.default_backend()} L={Fq.L} "
        f"pallas={fp_mod.PALLAS_ENABLED}",
        flush=True,
    )

    if 1 in stages:
        for n in (2048, 49152, 270336):
            xs = [rng.randrange(p) for _ in range(n)]
            ys = [rng.randrange(p) for _ in range(n)]
            a = jnp.asarray(Fq.encode(xs))  # Montgomery
            b = jnp.asarray(Fq.encode(ys))
            t0 = time.time()
            got = Fq.decode(np.asarray(jax.device_get(Fq.mul(a, b))))
            dt = time.time() - t0
            want = [(x * y) % p for x, y in zip(xs, ys)]
            bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
            print(
                f"stage1 mul n={n}: "
                f"{'PASS' if not bad else f'FAIL {len(bad)} wrong, first {bad[:5]}'}"
                f" ({dt:.1f}s)",
                flush=True,
            )

    if 2 in stages:
        gd = ctx.g2_dev
        gen = ctx.g2_gen
        K, nb = 22, 2048
        n = K * nb
        ks1 = [rng.randrange(1, 1 << 20) for _ in range(n)]
        ks2 = [rng.randrange(1, 1 << 20) for _ in range(n)]
        from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

        fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
        t0 = time.time()
        P = fb.mul_ints(ks1)
        Q = fb.mul_ints(ks2)
        print(f"fixed-base 2x{n}: {time.time()-t0:.1f}s", flush=True)
        P = {k: v.reshape((K, nb) + v.shape[1:]) for k, v in P.items()}
        Q = {k: v.reshape((K, nb) + v.shape[1:]) for k, v in Q.items()}
        t0 = time.time()
        S = gd.add(P, Q)
        flat = {k: v.reshape((K * nb,) + v.shape[2:]) for k, v in S.items()}
        got = gd.decode_points(flat)
        dt = time.time() - t0
        want = [gd.host_mul(k1 + k2, gen) for k1, k2 in zip(ks1, ks2)]
        bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != w]
        print(
            f"stage2 G2 add (22,2048): "
            f"{'PASS' if not bad else f'FAIL {len(bad)} wrong, first {bad[:5]}'}"
            f" ({dt:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
