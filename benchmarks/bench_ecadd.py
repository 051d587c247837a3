"""Fused RCB point-add kernel throughput on the real chip (BLS12-381 G1).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/bench_ecadd.py
Env: EC_LOG2 (default 15), EC_ITERS (default 8), EC_FIELD (fq|fr)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops import pallas_curve

    Fq = fi.bls12_381_fq()
    C = ci.BLS12_381_G1
    dev = SWDevice(Fq, C)
    n = 1 << int(os.environ.get("EC_LOG2", "15"))
    iters = int(os.environ.get("EC_ITERS", "8"))
    print(f"fused RCB add n=2^{n.bit_length()-1} iters={iters}")

    # distinct points from a cheap seed batch
    seeds = dev.encode_points([C.mul(k + 1, C.generator) for k in range(64)])
    reps = n // 64
    P = {k: jnp.tile(v, (reps, 1)) for k, v in seeds.items()}

    def chained(P, iters):
        Q = P
        for _ in range(iters):
            Q = dev._add_impl(Q, P)
        return Q

    run = jax.jit(chained, static_argnums=1)
    out = run(P, iters)
    _ = jax.device_get(out["x"][0, 0])
    t0 = time.time()
    out = run(P, iters)
    _ = jax.device_get(out["x"][0, 0])
    dt = (time.time() - t0) / iters
    print(f"add batch {n}: {dt*1e3:.2f} ms  {n/dt/1e6:.2f} M adds/s  "
          f"(~{12*n/dt/1e6:.0f} M field muls/s equivalent)")

    # exactness: 1 chained add vs host on a few lanes
    got = dev.decode_points({k: v[:4] for k, v in out.items()})
    want = []
    for k in range(4):
        base = C.mul(k + 1, C.generator)
        acc = base
        for _ in range(iters):
            acc = C.add(acc, base)
        want.append(acc)
    print("exact:", got == want)


if __name__ == "__main__":
    main()
