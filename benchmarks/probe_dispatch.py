"""Measure per-dispatch overhead through the axon relay on the real chip.

Round-4 postmortem (VERDICT.md weak#1): reduce_windows 709.9s +
heavy_peel 418.6s dominate the flagship prove, and both phases are
dispatch-count-heavy with tiny per-dispatch compute.  This probe
separates relay/dispatch latency from compute so round 5's restructuring
targets the right constant.

Run: PYTHONPATH=/root/repo python -u benchmarks/probe_dispatch.py
"""

import json
import os
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


def bench(fn, args, reps=10, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {
        "median_ms": round(1e3 * ts[len(ts) // 2], 2),
        "min_ms": round(1e3 * ts[0], 2),
        "max_ms": round(1e3 * ts[-1], 2),
    }


def main():
    print(json.dumps({"backend": jax.default_backend()}))

    # 1. trivial program: pure dispatch+transfer latency
    f_triv = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.uint32)
    print(json.dumps({"probe": "trivial_dispatch", **bench(f_triv, (x,))}))

    # 2. device-resident arg, no host result fetch (donate nothing, tiny out)
    f_sum = jax.jit(lambda x: jnp.sum(x))
    big = jnp.zeros((1 << 20, 128), jnp.uint32)
    big = jax.block_until_ready(big)
    print(json.dumps({"probe": "sum_512MB_resident", **bench(f_sum, (big,))}))

    # 3. batched EC add at bucket-grid width (G1, K=16 x nb=2^15 lanes)
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    ctx = curve_ctx("bls12_381")
    gd = ctx.g1_dev
    K, nb = 16, 1 << 15
    pts = gd.identity((K, nb))
    pts = {k: v + jnp.zeros_like(v) for k, v in pts.items()}
    f_add = jax.jit(gd.add)
    r = bench(f_add, (pts, pts), reps=5, warmup=1)
    print(json.dumps({"probe": "ec_add_16x32768", **r}))

    # 5. the production staged pipeline at flagship geometry, phase by
    #    phase: G1 signed c=16 (policy at n=2^20), random scalars.
    from contangle_zkcp_tpu.ops.msm import MSM
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.utils import metrics

    n = 1 << 20
    eng = MSM(gd, scalar_bits=ctx.r.bit_length(), c=16, signed=True)
    rng = np.random.RandomState(3)
    sc = [int.from_bytes(rng.bytes(31), "little") for _ in range(n)]
    L = -(-eng.scalar_bits // 16)
    limbs = jnp.asarray(ints_to_limbs(sc, L))
    # random-ish points: tile the generator (value correctness not probed)
    g = gd.encode_points([ctx.g1.generator])
    pts = {k: jnp.tile(v, (n,) + (1,) * (v.ndim - 1)) for k, v in g.items()}
    pts = jax.block_until_ready(pts)

    metrics.registry().reset()
    t0 = time.perf_counter()
    res = eng.run(pts, limbs)
    t_cold = time.perf_counter() - t0
    metrics_cold = dict(metrics.registry().snapshot()["timers"])
    metrics.registry().reset()
    t0 = time.perf_counter()
    res = eng.run(pts, limbs)
    t_warm = time.perf_counter() - t0
    metrics_warm = dict(metrics.registry().snapshot()["timers"])
    print(json.dumps({
        "probe": "msm_run_2^20_g1_signed_c16",
        "cold_s": round(t_cold, 2),
        "warm_s": round(t_warm, 2),
        "cold_timers": {k: round(v["total_sec"], 2) for k, v in metrics_cold.items()},
        "warm_timers": {k: round(v["total_sec"], 2) for k, v in metrics_warm.items()},
    }))


if __name__ == "__main__":
    main()


if __name__ == "__main__":
    main()
