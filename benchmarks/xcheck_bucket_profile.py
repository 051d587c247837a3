"""Bucket-loop phase attribution on the real chip.

The MSM bucket phase is one lockstep while_loop whose body = gather
(packed rows from HBM) + fused RCB add + mask select.  SOL.md's lever
list (batch-affine, MXU Toeplitz, DMA gathers) implicitly assumes the
EC add dominates; this script measures the split directly:

  1. full loop        — production `_bucket_acc_s` program
  2. gather-only loop — same trip structure, body = gather + u32 sum
                        (same HBM traffic, no field math)
  3. standalone fused add at the loop's (K*nb) batch width
  4. the same three with ZKCP_MXU=1 toggled via a second process run

Timing is chained-dependency (runtime-opaque zero) like bench.py.

Run: python benchmarks/xcheck_bucket_profile.py            (on chip)
Env: PROF_LOG2 (default 20), PROF_C (default 16), PROF_ITERS (2).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def main():
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM

    log2n = int(os.environ.get("PROF_LOG2", "20"))
    c = int(os.environ.get("PROF_C", "16"))
    iters = int(os.environ.get("PROF_ITERS", "2"))
    n = 1 << log2n

    Fq = fi.bls12_381_fq()
    dev = SWDevice(Fq, ci.BLS12_381_G1)
    msm = MSM(dev, scalar_bits=255, c=c, signed=True)

    # fake points: random sub-p limb planes.  The loop's runtime does not
    # depend on coordinate VALUES (branch-free complete formula), so
    # timing with random planes is exact while skipping minutes of
    # point-generation setup.
    rng = np.random.RandomState(7)
    L = Fq.L
    pts = {
        k: jnp.asarray(
            rng.randint(0, 1 << 16, size=(n, L)).astype(np.uint32)
        )
        for k in ("x", "y", "z")
    }
    raw = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    raw[:, -1] &= 0x7FFF
    order, start, cnt, sgn = msm.host_schedule_signed(raw)
    trips = int(cnt.max())
    lanes = msm.K * msm.nb
    print(
        json.dumps(
            {
                "n": n,
                "c": c,
                "K": msm.K,
                "nb": msm.nb,
                "trips": trips,
                "lane_adds": trips * lanes,
                "mask_efficiency": round(n * msm.K / (trips * lanes), 3),
            }
        ),
        flush=True,
    )
    o_d, s_d, c_d, g_d = map(jnp.asarray, (order, start, cnt, sgn))

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.util.tree_leaves(out)[0].block_until_ready()
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.tree.util.tree_leaves(out)[0].block_until_ready()
        return (time.time() - t0) / iters

    # 1. full production loop
    t_full = timed(msm._bucket_acc_s, pts, o_d, s_d, c_d, g_d)

    # 2. gather-only: identical trip structure and packed-row gathers,
    #    body reduced to a u32 add (no field math)
    @jax.jit
    def gather_only(points, order, start, cnt):
        K, nb = msm.K, msm.nb
        N = order.shape[1]
        flat_parts = [points[k].reshape(N, -1) for k in ("x", "y", "z")]
        total_w = sum(p.shape[1] for p in flat_parts)
        pad_w = (-total_w) % 128
        if pad_w:
            flat_parts.append(
                jnp.zeros((N, pad_w), dtype=flat_parts[0].dtype)
            )
        packed = jnp.concatenate(flat_parts, axis=1)
        W = packed.shape[1]
        acc = jnp.zeros((K * nb, W), jnp.uint32)
        max_cnt = jnp.max(cnt)

        def body(carry):
            s, acc = carry
            pos = jnp.minimum(start + s, N - 1)
            pidx = jnp.take_along_axis(order, pos, axis=1)
            rows = jnp.take(packed, pidx.reshape(-1), axis=0)
            mask = (s < cnt).reshape(-1, 1)
            return (s + 1, jnp.where(mask, acc + rows, acc))

        _, acc = jax.lax.while_loop(
            lambda c_: c_[0] < max_cnt, body, (jnp.int32(0), acc)
        )
        return acc

    t_gather = timed(gather_only, pts, o_d, s_d, c_d)

    # 3. standalone fused add at the loop's batch width
    grid = {
        k: jnp.asarray(
            rng.randint(0, 1 << 16, size=(lanes, L)).astype(np.uint32)
        )
        for k in ("x", "y", "z")
    }

    @jax.jit
    def add_once(a, b):
        return dev.add(a, b)

    t_add1 = timed(add_once, grid, pts if n == lanes else grid)

    real_adds = int((cnt.astype(np.int64)).sum())
    print(
        json.dumps(
            {
                "t_full_s": round(t_full, 3),
                "t_gather_only_s": round(t_gather, 3),
                "t_add_standalone_s": round(t_add1, 4),
                "implied_add_share": round(1 - t_gather / t_full, 3),
                "full_lane_adds_per_s": round(trips * lanes / t_full, 1),
                "real_points_per_s": round(real_adds / t_full / msm.K, 1),
                "standalone_adds_per_s": round(lanes / t_add1, 1),
                "mxu": os.environ.get("ZKCP_MXU", "0"),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
