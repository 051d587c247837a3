"""Benchmark driver: Pippenger MSM throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no measured numbers (BASELINE.md), so
`vs_baseline` is reported against the north-star single-chip
speed-of-light estimate for the same op (fraction of SOL, where 1.0 means
the >=90% target is exceeded by 10/9).

Env knobs: BENCH_MSM_LOG2 (default 16), BENCH_MSM_C (window bits, default 10).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM, digits_from_limbs

    # defaults: the headline config (alias-spread schedule keeps the
    # bucket loop's trip count ~N/2^c regardless of the top window, and
    # the compiled program for this shape is in the persistent cache)
    log2n = int(os.environ.get("BENCH_MSM_LOG2", "22"))
    c = int(os.environ.get("BENCH_MSM_C", "16"))
    signed = os.environ.get("BENCH_MSM_SIGNED", "1") == "1"
    n = 1 << log2n

    Fq = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(Fq, C)
    msm = MSM(dev, scalar_bits=255, c=c, signed=signed)

    # synthetic points: random multiples of G materialized cheaply on device
    # (one batched scalar-mul), random 255-bit scalars
    rng = np.random.RandomState(42)
    seed_scalars = [int.from_bytes(rng.bytes(31), "little") | 1 for _ in range(256)]
    seeds = dev.scalar_mul_ints(
        dev.encode_points([C.generator] * 256), seed_scalars, 255
    )
    # tile the 256 distinct points to n (duplicates exercise the same math)
    reps = n // 256
    points = {k: jnp.tile(v, (reps,) + (1,) * (v.ndim - 1)) for k, v in seeds.items()}
    scalars = np.zeros((n, 16), dtype=np.uint32)
    raw = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    raw[:, -1] &= 0x7FFF
    scalars = jnp.asarray(raw)

    # split into the same power-of-two chunks MSM.run uses, so the timed
    # program is the production one AND the packed gather source stays
    # under MAX_GATHER_BYTES (2^22 G1 rows = 2^31 bytes unchunked, past
    # the bound where the bucket gather goes wrong; ops/msm.py note).
    chunk = min(n, msm._chunk_rows(points))
    scal_np = np.asarray(scalars)
    parts = []
    for lo in range(0, n, chunk):
        pc = {k: v[lo : lo + chunk] for k, v in points.items()}
        if signed:
            order, start, cnt, sgn = msm.host_schedule_signed(
                scal_np[lo : lo + chunk]
            )
            sgn_d = jnp.asarray(sgn)
        else:
            order, start, cnt = msm.host_schedule(scal_np[lo : lo + chunk])
            sgn_d = None
        parts.append(
            (pc, jnp.asarray(order), jnp.asarray(start), jnp.asarray(cnt), sgn_d)
        )

    def chained(parts, iters):
        # serialize iterations through a REAL device-side data dependency
        # (a runtime-opaque zero from the previous output added to the
        # counts) so XLA cannot CSE the iterations into one, and a single
        # host fetch at the end forces the whole chain (the remote relay
        # does not honor block_until_ready reliably).
        dep = jnp.int32(0)
        for _ in range(iters):
            for pc, order, start, cnt, sgn_d in parts:
                if sgn_d is None:
                    out = msm._bucket_scheduled_impl(
                        pc, order, start, cnt + dep
                    )
                else:
                    out = msm._bucket_scheduled_signed_impl(
                        pc, order, start, cnt + dep, sgn_d
                    )
                dep = (out["x"].reshape(-1)[0] & jnp.uint32(0)).astype(
                    jnp.int32
                )
        return out

    iters = int(os.environ.get("BENCH_MSM_ITERS", "2"))
    run = jax.jit(chained, static_argnums=1)
    _ = jax.device_get(run(parts, iters)["x"][0, 0])
    t0 = time.time()
    _ = jax.device_get(run(parts, iters)["x"][0, 0])
    dt = (time.time() - t0) / iters
    # amortized over `iters` device-chained MSMs with a single host fetch:
    # the relay's dispatch/fetch overhead shrinks to 1/iters of the figure.
    pts_per_sec = n / dt

    # SOL estimate for this chip (documented in benchmarks/SOL.md):
    # bucket phase ~= 1 complete EC add per point = 12 field muls; one
    # 255-bit Fq mul via the f32-matmul path = ~3*2*L^2*(2^16-splits) ~
    # 6.9e3 MXU f32 FLOPs (L=24); v5e ~197e12 f32 FLOP/s (bf16x6 ~1/6)
    # => ~3.3e12 effective / (12 * 6.9e3) ~ 40e6 points/s ceiling.
    sol_pts_per_sec = 40e6
    print(
        json.dumps(
            {
                "metric": f"bls12_381_g1_msm_2^{log2n}_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_sec / sol_pts_per_sec, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
