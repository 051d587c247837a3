"""Per-kernel compiler cost tables + SOL occupancy (SURVEY §5.1).

Lowers the exact programs the headline benchmarks run (same shapes, so
the remote compiles are persistent-cache hits), pulls XLA's own cost
analysis (flops / bytes accessed) via utils.profiling.cost_table, and
combines with the measured walls to report achieved SOL fractions.
Output feeds the occupancy table in benchmarks/SOL.md.

Pallas (Mosaic) kernels appear to XLA as custom calls with zero flops —
their arithmetic is accounted by the hand cost model in SOL.md instead;
this table covers the XLA-scheduled programs (MSM bucket loop, NTT).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/profile_kernels.py
Env: PROF_MSM_LOG2 (default 22), PROF_NTT_LOG2 (default 22),
     PROF_MSM_WALL_S / PROF_NTT_WALL_S to supply measured walls.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.msm import MSM
    from contangle_zkcp_tpu.ops.ntt import NTT
    from contangle_zkcp_tpu.utils.profiling import cost_table

    out = {}

    # ---- MSM bucket phase, same construction as bench.py
    log2n = int(os.environ.get("PROF_MSM_LOG2", "22"))
    n = 1 << log2n
    Fq = fi.bls12_381_fq()
    dev = SWDevice(Fq, ci.BLS12_381_G1)
    msm = MSM(dev, scalar_bits=255, c=12)
    rng = np.random.RandomState(42)
    seed_scalars = [int.from_bytes(rng.bytes(31), "little") | 1 for _ in range(256)]
    seeds = dev.scalar_mul_ints(
        dev.encode_points([ci.BLS12_381_G1.generator] * 256), seed_scalars, 255
    )
    reps = n // 256
    points = {k: jnp.tile(v, (reps,) + (1,) * (v.ndim - 1)) for k, v in seeds.items()}
    raw = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    raw[:, -1] &= 0x7FFF
    scalars = jnp.asarray(raw)
    order, start, cnt = msm.host_schedule(np.asarray(scalars))
    fn = jax.jit(msm._bucket_scheduled_impl)
    lowered = fn.lower(points, jnp.asarray(order), jnp.asarray(start), jnp.asarray(cnt))
    compiled = lowered.compile()
    wall = float(os.environ.get("PROF_MSM_WALL_S", "0") or 0) or None
    out[f"msm_bucket_2^{log2n}_c12"] = cost_table(compiled, wall)

    # ---- NTT forward, same construction as bench_ntt.py
    log2d = int(os.environ.get("PROF_NTT_LOG2", "22"))
    d = 1 << log2d
    Fr = fi.bls12_381_fr()
    eng = NTT(Fr, d)
    a = rng.randint(0, 1 << 16, size=(d, Fr.L)).astype(np.uint32)
    a[:, -1] = 0
    lowered = eng._fwd_jit.lower(jnp.asarray(a), tuple(eng._tw_fwd), eng._brev)
    compiled = lowered.compile()
    wall = float(os.environ.get("PROF_NTT_WALL_S", "0") or 0) or None
    out[f"ntt_forward_2^{log2d}"] = cost_table(compiled, wall)

    for k, v in out.items():
        print(json.dumps({"kernel": k, **v}))


if __name__ == "__main__":
    main()
