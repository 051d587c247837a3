"""Bisect the balanced-engine G2 failure on TPU stage by stage.

Stages: (1) lane partial sums from _lane_loop vs host per-lane math;
(2) _fold_merge grid vs host per-bucket sums; (3) staged window
reduction vs host weighted sums; (4) final combine.

Env: BIS_GROUP (g2), BIS_C (12), BIS_N (64), BIS_PACKED (auto|0|1).
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/xcheck_balanced_g2_bisect.py
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)
import jax.numpy as jnp
import numpy as np

from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
from contangle_zkcp_tpu.ops.msm_balanced import BalancedMSM
from contangle_zkcp_tpu.fields.bigint import ints_to_limbs


def main():
    group = os.environ.get("BIS_GROUP", "g2")
    c = int(os.environ.get("BIS_C", "12"))
    n = int(os.environ.get("BIS_N", "64"))
    packed_env = os.environ.get("BIS_PACKED", "auto")
    ctx = curve_ctx("bls12_381")
    gd = ctx.g1_dev if group == "g1" else ctx.g2_dev
    gen = ctx.g1.generator if group == "g1" else ctx.g2_gen
    rng = random.Random(11)

    eng = BalancedMSM(gd, scalar_bits=ctx.r.bit_length(), c=c, signed=True,
                      overflow_lanes=1 << 10)
    if packed_env != "auto":
        eng.packed = packed_env == "1"
    K, nb, E = eng.K, eng.nb, eng.E

    ks = [i + 1 for i in range(n)]
    pts_h = [gd.host_mul(k, gen) for k in ks]
    scalars = [rng.randrange(ctx.r) for _ in range(n)]
    limbs = np.asarray(ints_to_limbs(scalars, 16))
    sch = eng.schedule(limbs)
    print(json.dumps({"trips": sch["trips"], "nlev": sch["nlev"],
                      "K": K, "nb": nb}), flush=True)

    points = gd.encode_points(pts_h)
    lanes = eng._lane_loop(
        points, jnp.asarray(sch["base"]), jnp.asarray(sch["lcnt"]),
        jnp.asarray(sch["order"]), jnp.asarray(sch["sgn"]),
    )
    got_lanes = gd.decode_points(lanes)

    # host per-lane expectation
    base, lcnt = sch["base"], sch["lcnt"]
    order, sgn = sch["order"], sch["sgn"]
    P = base.shape[0]
    bad = 0
    exp_lanes = []
    for l in range(P):
        acc = None
        for s in range(int(lcnt[l])):
            pos = int(base[l]) + s
            pi = int(order[pos])
            Pp = pts_h[pi] if pi < n else None  # pow2 pad has no extra pts here
            if Pp is None:
                continue
            if sgn[pos]:
                Pp = (Pp[0], tuple((ctx.g1.p - y) % ctx.g1.p for y in Pp[1])
                      if isinstance(Pp[1], tuple) else ctx.g1.p - Pp[1])
            acc = gd.host_add(acc, Pp)
        exp_lanes.append(acc)
        if got_lanes[l] != acc:
            bad += 1
            if bad <= 5:
                print(json.dumps({"stage": "lane", "lane": l,
                                  "cnt": int(lcnt[l])}), flush=True)
    print(json.dumps({"stage": "lane_loop", "bad_lanes": bad, "P": P}),
          flush=True)

    # stage 2: fold+merge grid
    grid = eng._fold_merge(
        lanes, jnp.asarray(sch["fold_idx"]), jnp.asarray(sch["fold_mask"]),
        jnp.int32(sch["nlev"]), jnp.asarray(sch["merge_idx"]),
        jnp.asarray(sch["merge_mask"]),
    )
    flat = {k: v.reshape((K * nb,) + v.shape[2:]) for k, v in grid.items()}
    got_grid = gd.decode_points(flat)
    # host expected bucket sums from exp_lanes
    exp_grid = list(exp_lanes[: K * nb])
    # overflow merge on host
    mi, mm = sch["merge_idx"], sch["merge_mask"]
    # host-fold the overflow region
    ovf = list(exp_lanes[K * nb :])
    lev = 1
    while lev <= (1 << sch["nlev"]) // 2:
        for i in range(E):
            if sch["fold_mask"][lev.bit_length() - 1][i]:
                ovf[i] = gd.host_add(ovf[i], ovf[i + lev])
        lev *= 2
    bad_g = 0
    for b in range(K * nb):
        e = exp_grid[b]
        if mm[b]:
            e = gd.host_add(e, ovf[int(mi[b])])
        if got_grid[b] != e:
            bad_g += 1
            if bad_g <= 5:
                print(json.dumps({"stage": "grid", "bucket": b}), flush=True)
    print(json.dumps({"stage": "fold_merge", "bad_buckets": bad_g}), flush=True)

    # stage 3: staged reduce + combine vs host weighted sum of exp grid
    windows = eng._staged_windows_nofold(grid)
    got_w = gd.decode_points(windows)
    bad_w = 0
    for k in range(K):
        e = None
        for b in range(nb):
            S = exp_grid[k * nb + b]
            if mm[k * nb + b]:
                S = gd.host_add(S, ovf[int(mi[k * nb + b])])
            if S is not None:
                e = gd.host_add(e, gd.host_mul(b + 1, S))
        if got_w[k] != e:
            bad_w += 1
            print(json.dumps({"stage": "window", "k": k}), flush=True)
    print(json.dumps({"stage": "staged", "bad_windows": bad_w}), flush=True)

    res = gd.decode_points(eng._combine_dev(windows))[0]
    want = gd.host_mul(sum(s * k for s, k in zip(scalars, ks)) % ctx.r, gen)
    print(json.dumps({"stage": "final", "ok": res == want}), flush=True)


if __name__ == "__main__":
    main()
