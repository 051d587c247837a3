"""Per-bucket diagnosis of the G2 MSM wrongness.

Runs ONLY the lockstep bucket-accumulation loop (no alias fold, no
weighted reduction) at the failing configuration, decodes the raw
(K, nb) grid, and checks EVERY bucket against exact host math: with
points P_i = k_i*H and host-known digits, bucket (k, lane)'s expected
value is (sum of k_i over its scheduled points) * H.  Prints the wrong
lanes and their (window, lane, count) pattern — pinpointing whether the
corruption is in the gathers, the sign selection, or the add chain,
and which lanes it hits.

Env: XGRID_N (default 524288), XGRID_C (12), XGRID_SIGNED (1),
     XGRID_PACKED (1), XGRID_GROUP (g2).
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
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.msm import MSM

    N = int(os.environ.get("XGRID_N", "524288"))
    c = int(os.environ.get("XGRID_C", "12"))
    signed = os.environ.get("XGRID_SIGNED", "1") == "1"
    packed = os.environ.get("XGRID_PACKED", "1") == "1"
    group = os.environ.get("XGRID_GROUP", "g2")
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    gd = ctx.g2_dev if group == "g2" else ctx.g1_dev
    gen = ctx.g2_gen if group == "g2" else ctx.g1.generator
    print(
        f"backend {jax.default_backend()} N {N} {group} c={c} "
        f"signed={int(signed)} packed={int(packed)}",
        flush=True,
    )

    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 20) for _ in range(N)]
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
    pts = fb.mul_ints(ks)
    print(f"fixed-base: {time.time()-t0:.1f}s", flush=True)
    ss = [rng.randrange(r) for _ in range(N)]

    msm = MSM(gd, scalar_bits=r.bit_length(), c=c, signed=signed, packed=packed)
    limbs = np.asarray(ints_to_limbs(ss, 16))
    if signed:
        order, start, cnt, sgn = msm.host_schedule_signed(limbs)
    else:
        order, start, cnt = msm.host_schedule(limbs)
        sgn = None

    # ---- device: raw bucket grid
    t0 = time.time()
    if signed:
        grid = msm._bucket_acc_s(
            pts,
            jnp.asarray(order),
            jnp.asarray(start),
            jnp.asarray(cnt),
            jnp.asarray(sgn),
        )
    else:
        grid = msm._bucket_acc(
            pts, jnp.asarray(order), jnp.asarray(start), jnp.asarray(cnt)
        )
    grid = jax.device_get(grid)
    print(f"bucket grid ran: {time.time()-t0:.1f}s", flush=True)
    K, nb = msm.K, msm.nb
    flat = {k: v.reshape((K * nb,) + v.shape[2:]) for k, v in grid.items()}
    dec = gd.decode_points(flat)
    print("decoded", flush=True)

    # ---- host: expected bucket scalar sums (signed-aware)
    exp_scalar = np.zeros((K, nb), dtype=object)
    ks_arr = ks
    for k in range(K):
        ordk, cntk, startk = order[k], cnt[k], start[k]
        sg = sgn[k] if sgn is not None else None
        for lane in range(nb):
            n0 = int(cntk[lane])
            if not n0:
                continue
            s0 = int(startk[lane])
            tot = 0
            for j in range(s0, s0 + n0):
                pi = int(ordk[j])
                if sg is not None and sg[j]:
                    tot -= ks_arr[pi]
                else:
                    tot += ks_arr[pi]
            exp_scalar[k, lane] = tot

    t0 = time.time()
    bad = []
    for k in range(K):
        for lane in range(nb):
            got = dec[k * nb + lane]
            es = int(exp_scalar[k, lane]) % ctx.r
            want = gd.host_mul(es, gen) if es else None
            if got != want:
                bad.append((k, lane, int(cnt[k, lane])))
    print(f"host check: {time.time()-t0:.1f}s", flush=True)
    if not bad:
        print("ALL BUCKETS EXACT — bug is in fold/reduction, not the loop",
              flush=True)
    else:
        print(f"{len(bad)}/{K*nb} buckets WRONG", flush=True)
        ws = sorted(set(k for k, _, _ in bad))
        print("windows hit:", ws, flush=True)
        lanes = [l for _, l, _ in bad]
        print(
            f"lane range: [{min(lanes)}, {max(lanes)}]  "
            f"counts of wrong buckets (first 20): {bad[:20]}",
            flush=True,
        )
        # occupancy correlation: are wrong buckets the high-count ones?
        cnts = [cc for _, _, cc in bad]
        print(
            f"wrong-bucket cnt min/mean/max: {min(cnts)}/"
            f"{sum(cnts)/len(cnts):.1f}/{max(cnts)}; "
            f"global cnt max: {int(cnt.max())}",
            flush=True,
        )


if __name__ == "__main__":
    main()
