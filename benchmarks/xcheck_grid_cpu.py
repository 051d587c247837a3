"""CPU lane-level diff of the device bucket grid vs integer simulation.

The c=12 G2 MSM is wrong at every size on TPU while the schedule/fold/
weight logic simulates exactly in Z_r — so the defect is in the device
bucket program.  This reproduces it at debug scale on the CPU backend:
small N, scalar_bits shrunk to 24 (K=3 windows) but the REAL suspicious
lane geometry (c=12 -> nb=2048 signed / 4096 unsigned), both groups.

For each config: run MSM.run end-to-end vs host oracle, then (if wrong)
run _bucket_accumulate and diff every lane against the integer-space
bucket sums mapped through host_mul.

Env: XGC_N (1024), XGC_BITS (24), XGC_CONFIGS "g2:12,1;g2:12,0;g1:12,1"
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def main():
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.msm import MSM

    N = int(os.environ.get("XGC_N", "1024"))
    bits = int(os.environ.get("XGC_BITS", "24"))
    ctx = curve_ctx("bls12_381")
    r = ctx.r
    cfgs = []
    for part in os.environ.get(
        "XGC_CONFIGS", "g2:12,1;g2:12,0;g1:12,1"
    ).split(";"):
        grp, rest = part.split(":")
        c, s = rest.split(",")
        cfgs.append((grp, int(c), s == "1"))

    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 16) for _ in range(N)]
    ss = [rng.randrange(1 << bits) for _ in range(N)]
    L = -(-bits // 16)
    pts_cache = {}

    for grp, c, signed in cfgs:
        gd = ctx.g2_dev if grp == "g2" else ctx.g1_dev
        gen = ctx.g2_gen if grp == "g2" else ctx.g1.generator
        if grp not in pts_cache:
            pts_cache[grp] = gd.encode_points(
                [gd.host_mul(k, gen) for k in ks]
            )
        pts = pts_cache[grp]
        msm = MSM(gd, scalar_bits=bits, c=c, signed=signed)
        t0 = time.time()
        got = msm.run(pts, ss)
        want = gd.host_mul(sum(k * s for k, s in zip(ks, ss)) % r, gen)
        ok = got == want
        print(
            f"{grp} c={c} signed={int(signed)} bits={bits}: "
            f"{'PASS' if ok else 'FAIL'} ({time.time()-t0:.1f}s)",
            flush=True,
        )
        if ok:
            continue
        # ---- lane-level grid diff
        limbs = np.asarray(ints_to_limbs(ss, L))
        if signed:
            order, start, cnt, sgn = msm.host_schedule_signed(limbs)
            grid = msm._bucket_acc_s(
                pts, jnp.asarray(order), jnp.asarray(start),
                jnp.asarray(cnt), jnp.asarray(sgn),
            )
        else:
            order, start, cnt = msm.host_schedule(limbs)
            sgn = None
            grid = msm._bucket_acc(
                pts, jnp.asarray(order), jnp.asarray(start), jnp.asarray(cnt)
            )
        K, nb = msm.K, msm.nb
        grid = jax.device_get(grid)
        flat = {k: v.reshape((K * nb,) + v.shape[2:]) for k, v in grid.items()}
        dec = gd.decode_points(flat)
        bad = []
        for k in range(K):
            for lane in range(nb):
                s0, n0 = int(start[k][lane]), int(cnt[k][lane])
                tot = 0
                for j in range(s0, s0 + n0):
                    pi = int(order[k][j])
                    tot += -ks[pi] if (sgn is not None and sgn[k][j]) else ks[pi]
                es = tot % r
                want_l = gd.host_mul(es, gen) if es else None
                if dec[k * nb + lane] != want_l:
                    bad.append((k, lane, n0))
        if not bad:
            print("  grid EXACT -> bug is in fold/weighted reduction",
                  flush=True)
        else:
            print(f"  {len(bad)}/{K*nb} lanes wrong; first 20: {bad[:20]}",
                  flush=True)
            lanes = sorted(set(l for _, l, _ in bad))
            print(f"  distinct lanes (first 30): {lanes[:30]}", flush=True)
            print(f"  windows: {sorted(set(k for k,_,_ in bad))}", flush=True)


if __name__ == "__main__":
    main()
