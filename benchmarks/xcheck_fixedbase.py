"""Are the G2 fixed-base points themselves wrong at scale?

Both MSM engine configs (signed/unsigned, packed/unpacked) failed with
the SAME point set at N=2^19 (/tmp/xsweep1.log), so suspicion moves to
the shared input: FixedBaseDevice.mul_ints points (the prover's CRS
b_g2_query is generated the same way, and the round-2 spot checks only
sampled 4 indices).

Checks, cheapest-first:
  1. device tree-sum of ALL points vs host (sum k_i)*H — one host mul;
  2. two different MSM engines' results compared to each other: if both
     are wrong by the SAME value, the data (not the engines) is wrong;
  3. full per-point host verification in windows to localize bad
     indices (XFB_FULL=1; slow, prints bad index ranges).

Env: XFB_N (524288), XFB_GROUP (g2), XFB_CHUNK (16384), XFB_FULL (0).
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
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    N = int(os.environ.get("XFB_N", "524288"))
    group = os.environ.get("XFB_GROUP", "g2")
    chunk = int(os.environ.get("XFB_CHUNK", str(1 << 14)))
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    gd = ctx.g2_dev if group == "g2" else ctx.g1_dev
    gen = ctx.g2_gen if group == "g2" else ctx.g1.generator
    print(f"backend {jax.default_backend()} N {N} {group} chunk {chunk}",
          flush=True)

    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 20) for _ in range(N)]
    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=chunk)
    pts = fb.mul_ints(ks)
    print(f"fixed-base: {time.time()-t0:.1f}s", flush=True)

    # ---- 1. device tree-sum of all points
    dev = gd
    cur = pts
    t0 = time.time()
    n = N
    while n > 1:
        half = n // 2
        lo = {k: v[:half] for k, v in cur.items()}
        hi = {k: v[half : 2 * half] for k, v in cur.items()}
        s = dev.add(lo, hi)
        if n & 1:  # odd: carry the last row through
            s = {k: jnp.concatenate([v, cur[k][n - 1 : n]]) for k, v in s.items()}
            n = half + 1
        else:
            n = half
        cur = s
    total = dev.decode_points({k: v[:1] for k, v in cur.items()})[0]
    want = dev.host_mul(sum(ks) % r, gen)
    print(f"tree-sum ran: {time.time()-t0:.1f}s", flush=True)
    print("tree-sum of all points exact:", total == want, flush=True)

    if os.environ.get("XFB_FULL") == "1":
        # ---- 3. localize: decode in windows, verify per point
        t0 = time.time()
        bad = []
        W = 1 << 14
        for lo in range(0, N, W):
            hi_ = min(lo + W, N)
            dec = dev.decode_points(
                {k: v[lo:hi_] for k, v in pts.items()}
            )
            for i, P in enumerate(dec):
                if P != dev.host_mul(ks[lo + i], gen):
                    bad.append(lo + i)
            print(
                f"  [{lo}, {hi_}): {len(bad)} bad so far "
                f"({time.time()-t0:.0f}s)",
                flush=True,
            )
        if bad:
            arr = np.array(bad)
            print(f"bad points: {len(bad)}; first 10 {arr[:10].tolist()}; "
                  f"range [{arr.min()}, {arr.max()}]", flush=True)
        else:
            print("all points exact", flush=True)


if __name__ == "__main__":
    main()
