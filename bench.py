"""Benchmark driver: Pippenger MSM + NTT throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (the
headline MSM figure) plus extra keys ("ntt_*") capturing the NTT rate —
BASELINE.md names both "MSM points/sec AND NTT elems/sec at 2^20-2^24".
The reference publishes no measured numbers (BASELINE.md), so
`vs_baseline` is reported against the north-star single-chip
speed-of-light estimate for the same op (fraction of SOL, where 1.0
means the >=90% target is exceeded by 10/9).

Points are COLD: n distinct group elements materialized on device
(fixed-base seeds x one batched offset add), not a small tiled working
set, so the bucket loop's gathers pay real HBM traffic.

Env knobs: BENCH_MSM_LOG2 (default 22), BENCH_MSM_C (default 16),
BENCH_NTT_LOG2 (default 22), BENCH_SKIP_NTT=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
    )


def msm_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice
    from contangle_zkcp_tpu.ops.msm import MSM
    from contangle_zkcp_tpu.ops.msm_balanced import BalancedMSM
    from contangle_zkcp_tpu.utils import metrics

    log2n = int(os.environ.get("BENCH_MSM_LOG2", "22"))
    c = int(os.environ.get("BENCH_MSM_C", "16"))
    signed = os.environ.get("BENCH_MSM_SIGNED", "1") == "1"
    engine = os.environ.get("BENCH_MSM_ENGINE", "balanced")
    dist = os.environ.get("BENCH_MSM_DIST", "uniform")
    reps = int(os.environ.get("BENCH_MSM_REPS", "3"))
    n = 1 << log2n

    Fq = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(Fq, C)
    if engine == "balanced":
        msm = BalancedMSM(dev, scalar_bits=255, c=c, signed=signed)
    else:
        msm = MSM(dev, scalar_bits=255, c=c, signed=signed)

    # cold distinct points: 2^16 fixed-base seeds (distinct 30-bit
    # scalars) crossed with up to 64 distinct offsets via ONE batched
    # complete add -> n distinct rows in HBM.
    rng = np.random.RandomState(42)
    n_seed = min(n, 1 << 16)
    if n_seed == n and n >= 4:
        # always take the crossed-offsets path (reps >= 2) so the tiny
        # smoke-tier invocation exercises the same code as the real run
        # (the round-3 bench crash lived only in the reps>1 branch).
        n_seed = n // 2
    seeds_k = [int(x) | 1 for x in rng.randint(1, 1 << 30, size=n_seed)]
    # bits=40: offsets below are drawn in [2^30, 2^40) — the table must
    # cover the widest scalar fed to it (a 30-bit table raised
    # ints_to_limbs OverflowError; a 30-bit *digit* count would silently
    # truncate).
    fb = FixedBaseDevice(dev, C.generator, bits=40, c=6, chunk=1 << 14)
    seeds = fb.mul_ints(seeds_k)
    nreps = n // n_seed
    if nreps > 1:
        offs_k = [int(x) | 1 for x in rng.randint(1 << 30, 1 << 40, size=nreps)]
        offs = fb.mul_ints(offs_k)
        crossed = dev.add(
            {k: v[:, None] for k, v in seeds.items()},
            {k: v[None, :nreps] for k, v in offs.items()},
        )
        points = {
            k: v.reshape((n,) + v.shape[2:]) for k, v in crossed.items()
        }
    else:
        points = {k: v[:n] for k, v in seeds.items()}
    if dist == "witness":
        # Groth16 witness-like skew: 0/1 bits, bytes, and wide tails
        u = rng.rand(n)
        raw = np.zeros((n, 16), dtype=np.uint32)
        raw[u < 0.4, 0] = 1
        mask = (u >= 0.4) & (u < 0.6)
        raw[mask, 0] = rng.randint(0, 256, size=int(mask.sum()))
        mask = (u >= 0.6) & (u < 0.8)
        raw[mask, 0] = rng.randint(0, 1 << 16, size=int(mask.sum()))
        mask = u >= 0.8
        wide = rng.randint(0, 1 << 16, size=(int(mask.sum()), 16))
        wide[:, -1] &= 0x7FFF
        raw[mask] = wide
    else:
        raw = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
        raw[:, -1] &= 0x7FFF
    scal_np = raw.astype(np.uint32)

    if engine == "tree":
        # opt-in comparison engine (measured slower in round 4): staged
        # device pipeline, timed as before.
        from contangle_zkcp_tpu.ops.msm_tree import TreeMSM

        tmsm = TreeMSM(dev, scalar_bits=255, c=c, signed=signed)
        chunk = min(n, tmsm._chunk_rows(points))
        parts = []
        for lo in range(0, n, chunk):
            pc = {k: v[lo : lo + chunk] for k, v in points.items()}
            if signed:
                order, start, cnt, sgn = tmsm.host_schedule_signed(
                    scal_np[lo : lo + chunk]
                )
            else:
                order, start, cnt = tmsm.host_schedule(scal_np[lo : lo + chunk])
                sgn = None
            parts.append((pc, tmsm._layout_for_chunk(order, start, cnt, sgn)))

        def tree_iter():
            grid = None
            for pc, layout in parts:
                g = tmsm._device_grid(pc, layout)
                grid = g if grid is None else tmsm._grid_add_jit(grid, g)
            win = tmsm._staged_windows(grid)
            jax.device_get(win["x"][0, 0] if win["x"].ndim > 1 else win["x"][0])
            return win

        tree_iter()  # compile + warm
        t0 = time.time()
        tree_iter()
        dt = time.time() - t0
        return log2n, n / dt, {}

    # ---- production end-to-end timing: MSM.run (schedule -> combine),
    # >= 3 repeats, median reported (VERDICT r4 weak#1/#3: the bench
    # must time the production MSM, with a repeat methodology).
    times = []
    phase_meds = {}
    result = None
    msm.run(points, scal_np)  # cold run: compiles (excluded from reps)
    for _ in range(reps):
        metrics.registry().reset()
        t0 = time.time()
        result = msm.run(points, scal_np)
        times.append(time.time() - t0)
        snap = metrics.registry().snapshot()["timers"]
        for k, v in snap.items():
            phase_meds.setdefault(k, []).append(v["total_sec"])
    times_sorted = sorted(times)
    dt = times_sorted[len(times_sorted) // 2]
    extras = {
        "msm_repeat_secs": [round(t, 2) for t in times],
        "msm_spread": round(
            (times_sorted[-1] - times_sorted[0]) / dt, 3
        ),
        "msm_phases_median_sec": {
            k.replace("msm.", ""): round(sorted(v)[len(v) // 2], 2)
            for k, v in phase_meds.items()
        },
        "msm_dist": dist,
        "msm_engine": engine,
    }
    bp = phase_meds.get("msm.bucket_phase")
    if bp:
        extras["msm_bucket_phase_points_per_sec"] = round(
            n / sorted(bp)[len(bp) // 2], 1
        )

    if os.environ.get("BENCH_SELFCHECK", "1") == "1":
        # host-math self-check of the EXACT benched engine on a small
        # prefix (after timing, so the pad floor makes it reuse the very
        # programs that produced the figure): the round-2 bench once
        # produced a wrong-flattering number — a bench that prints a
        # figure must first prove the engine computes the right group
        # element on this data.
        m = min(n, 256)
        pre = {k: v[:m] for k, v in points.items()}
        got = msm.run(pre, scal_np[:m])
        exp = None
        for P, row in zip(dev.decode_points(pre), scal_np[:m]):
            k_int = sum(int(x) << (16 * j) for j, x in enumerate(row))
            exp = C.add(exp, C.mul(k_int, P))
        if got != exp:
            print(
                json.dumps(
                    {
                        "metric": "bench_selfcheck_failed",
                        "value": 0,
                        "unit": "bool",
                        "vs_baseline": 0,
                        "error": f"MSM {m}-point prefix mismatch vs host math",
                    }
                )
            )
            sys.exit(1)
    return log2n, n / dt, extras


def ntt_bench():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.ntt import NTT

    log2n = int(os.environ.get("BENCH_NTT_LOG2", "22"))
    iters = int(os.environ.get("BENCH_NTT_ITERS", "4"))
    n = 1 << log2n
    F = fi.bls12_381_fr()
    eng = NTT(F, n)
    rng = np.random.RandomState(3)
    a = rng.randint(0, 1 << 16, size=(n, F.L)).astype(np.uint32)
    a[:, -1] = 0
    a_d = jnp.asarray(a)

    def chained(a, iters):
        for _ in range(iters):
            a = eng.forward(a)
        return a

    _ = jax.device_get(chained(a_d, iters)[0, 0])  # compile + warm
    t0 = time.time()
    _ = jax.device_get(chained(a_d, iters)[0, 0])
    dt = (time.time() - t0) / iters
    return log2n, n / dt


def main():
    _enable_compile_cache()
    msm_log2, msm_rate, extras = msm_bench()

    # SOL estimate for this chip (documented in benchmarks/SOL.md):
    # bucket phase ~= 1 complete EC add per point = 12 field muls; one
    # 255-bit Fq mul via the f32-matmul path = ~3*2*L^2*(2^16-splits) ~
    # 6.9e3 MXU f32 FLOPs (L=24); v5e ~197e12 f32 FLOP/s (bf16x6 ~1/6)
    # => ~3.3e12 effective / (12 * 6.9e3) ~ 40e6 points/s ceiling.
    sol_pts_per_sec = 40e6
    eng_tag = (
        "_tree" if os.environ.get("BENCH_MSM_ENGINE") == "tree" else ""
    )
    out = {
        "metric": f"bls12_381_g1_msm{eng_tag}_2^{msm_log2}_points_per_sec",
        "value": round(msm_rate, 1),
        "unit": "points/s",
        "vs_baseline": round(msm_rate / sol_pts_per_sec, 4),
    }
    out.update(extras)
    if os.environ.get("BENCH_SKIP_NTT") != "1":
        try:
            ntt_log2, ntt_rate = ntt_bench()
            out[f"ntt_2^{ntt_log2}_elems_per_sec"] = round(ntt_rate, 1)
        except Exception as e:  # NTT failure must not hide the MSM figure
            out["ntt_error"] = str(e)[:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
