"""Multi-device scaling efficiency on the virtual CPU mesh.

Real multi-chip hardware is not reachable from this container (one
TPU chip over the axon relay), so the scaling story is validated the
way SURVEY.md §4(d) prescribes: N virtual host devices
(--xla_force_host_platform_device_count) and the same shard_map
programs the TPU mesh would run.  This bench measures weak-ish scaling
of the two structured-communication kernels:

  * FourStepNTT (Bailey four-step, jax.lax.all_to_all transposes)
    vs the single-device NTT engine at the same size;
  * ShardedMSM (per-device bucket phases + XOR-butterfly ppermute
    all-reduce of window partials) vs the single-device MSM engine.

Caveat recorded with the numbers: virtual devices share the host's
physical cores (THIS CONTAINER HAS 4) AND XLA:CPU already multithreads
single-device ops, so the single-device baseline is not serial — the
efficiency figure below is a LOWER bound on what distinct chips
(private VMEM/HBM, ICI collectives) would show, and device counts
beyond the physical core count mostly measure oversubscription.

Run: BENCH_SCALING_DEVICES=4 python -u benchmarks/bench_scaling.py
"""

import json
import os
import random
import sys
import time

NDEV = int(os.environ.get("BENCH_SCALING_DEVICES", "4"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={NDEV}"
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice
    from contangle_zkcp_tpu.ops.msm import MSM
    from contangle_zkcp_tpu.ops.ntt import NTT
    from contangle_zkcp_tpu.parallel import ShardedMSM, make_mesh
    from contangle_zkcp_tpu.parallel.ntt_sharded import FourStepNTT

    assert jax.device_count() >= NDEV, jax.devices()
    rng = random.Random(0)
    Fr = fi.bls12_381_fr()
    Fq = fi.bls12_381_fq()
    mesh = make_mesh(NDEV)
    ax = mesh.axis_names[0]

    # ---------------- NTT: single-device engine vs four-step on N devices
    d = 1 << int(os.environ.get("BENCH_SCALING_NTT_LOG2", "18"))
    single = NTT(Fr, d)
    four = FourStepNTT(Fr, d, mesh, axis=ax)
    a = jnp.asarray(Fr.encode([rng.randrange(Fr.p) for _ in range(d)]))
    t1, ev1 = timed(single.forward, a)
    tn, evn = timed(four.forward, a)
    assert Fr.decode(evn) == Fr.decode(ev1), "four-step mismatch"
    ntt_speedup = t1 / tn
    print(
        json.dumps(
            {
                "kernel": f"ntt_2^{d.bit_length()-1}",
                "t_1dev_s": round(t1, 3),
                f"t_{NDEV}dev_s": round(tn, 3),
                "speedup": round(ntt_speedup, 2),
                "efficiency": round(ntt_speedup / NDEV, 2),
            }
        )
    )

    # ---------------- MSM: single-device engine vs sharded on N devices
    if os.environ.get("BENCH_SCALING_SKIP_MSM") == "1":
        return
    n_pts = 1 << int(os.environ.get("BENCH_SCALING_MSM_LOG2", "14"))
    dev = SWDevice(Fq, ci.BLS12_381_G1)
    fb = FixedBaseDevice(dev, ci.BLS12_381_G1.generator, bits=255, c=8)
    pts = fb.mul_ints([rng.randrange(1, ci.BLS12_381_G1.order) for _ in range(n_pts)])
    scal = jnp.asarray(
        ints_to_limbs([rng.randrange(ci.BLS12_381_G1.order) for _ in range(n_pts)], 16)
    )
    msm = MSM(dev, scalar_bits=255, c=8)
    smsm = ShardedMSM(msm, mesh)

    t1, want = timed(lambda: msm.run(pts, scal))
    tn, got = timed(lambda: smsm.run(pts, scal))
    assert got == want, "sharded MSM mismatch"
    msm_speedup = t1 / tn
    print(
        json.dumps(
            {
                "kernel": f"msm_2^{n_pts.bit_length()-1}",
                "t_1dev_s": round(t1, 3),
                f"t_{NDEV}dev_s": round(tn, 3),
                "speedup": round(msm_speedup, 2),
                "efficiency": round(msm_speedup / NDEV, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
