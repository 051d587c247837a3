"""NTT throughput on the real chip (BLS12-381 Fr).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/bench_ntt.py
Env: NTT_LOG2 (default 20), NTT_ITERS (default 4).

Timing uses a device-side dependency chain (forward o inverse applied
iteratively) with one final host fetch — the axon relay does not honor
block_until_ready reliably (memory/axon-tpu-environment).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.ops.ntt import NTT

    log2n = int(os.environ.get("NTT_LOG2", "20"))
    iters = int(os.environ.get("NTT_ITERS", "4"))
    n = 1 << log2n
    F = fi.bls12_381_fr()
    eng = NTT(F, n)
    print(f"ntt n=2^{log2n} iters={iters} backend={jax.default_backend()}")

    rng = np.random.RandomState(3)
    a = rng.randint(0, 1 << 16, size=(n, F.L)).astype(np.uint32)
    a[:, -1] = 0
    a_d = jnp.asarray(a)

    # eng.forward passes twiddles/permutation as runtime args (baked
    # constants exceed the remote-compile size limit at 2^22); chain
    # forward calls — each output feeds the next, one final host fetch
    def chained(a, iters):
        for _ in range(iters):
            a = eng.forward(a)
        return a

    out = chained(a_d, iters)
    _ = jax.device_get(out[0, 0])  # compile + warm
    t0 = time.time()
    out = chained(a_d, iters)
    _ = jax.device_get(out[0, 0])
    dt = (time.time() - t0) / iters
    print(
        f"forward 2^{log2n}: {dt*1e3:.1f} ms  {n/dt/1e6:.1f} M elems/s"
    )

    # exactness spot-check at small n (forward o inverse == id) on-device;
    # 2^12 >= 4096 exercises the fused-butterfly lane pipeline on-chip
    small = NTT(F, 1 << 12)
    b = jnp.asarray(a[: 1 << 12])
    rt = small.inverse(small.forward(b))
    ok = bool((np.asarray(jax.device_get(rt)) == a[: 1 << 12]).all())
    print("roundtrip exact (2^12, lane pipeline):", ok)
    assert ok


if __name__ == "__main__":
    main()
