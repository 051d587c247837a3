"""Field-multiply throughput: Pallas kernel vs XLA matmul formulation.

Run on the TPU:  python benchmarks/bench_fieldmul.py
Env: FM_LOG2 (batch, default 18), FM_FIELD (fr|fq), FM_ITERS (default 8).
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
    from contangle_zkcp_tpu.ops import pallas_field

    F = fi.bls12_381_fr() if os.environ.get("FM_FIELD", "fr") == "fr" else fi.bls12_381_fq()
    n = 1 << int(os.environ.get("FM_LOG2", "18"))
    iters = int(os.environ.get("FM_ITERS", "8"))
    print(f"field={F.name} L={F.L} n={n} iters={iters} devices={jax.devices()}")

    rng = np.random.RandomState(0)
    a = rng.randint(0, 1 << 16, size=(n, F.L)).astype(np.uint32)
    a[:, -1] = 0  # keep < p
    b = rng.randint(0, 1 << 16, size=(n, F.L)).astype(np.uint32)
    b[:, -1] = 0
    a_d, b_d = jnp.asarray(a), jnp.asarray(b)

    ops = pallas_field.make(F, tile=512)

    def chain(mul, a, b, iters):
        x = a
        for _ in range(iters):
            x = mul(x, b)
        return x

    from contangle_zkcp_tpu.ops import pallas_mont

    tile = int(os.environ.get("FM_TILE", "2048"))
    lanes = pallas_mont.MontMulLanes(F, lane_tile=tile)
    lanes_mxu = pallas_mont.MontMulLanes(F, lane_tile=tile, mxu=True)

    def lanes_t(at, bt):
        return lanes.mul_t(at, bt)

    # transposed variant: measures the kernel itself, no layout conversion
    at, bt = a_d.T, b_d.T

    for name, mul in (
        ("xla", F._mul_xla),
        ("pallas_r1", ops.mul),
        ("lanes", lanes.mul),
        ("lanes_mxu", lanes_mxu.mul),
        ("lanes_t", None),
        ("lanes_mxu_t", None),
    ):
        if name.endswith("_t"):
            eng_t = lanes_mxu if name == "lanes_mxu_t" else lanes
            try:
                run = jax.jit(
                    lambda a, b, e=eng_t: chain(lambda x, y: e.mul_t(x, y), a, b, iters)
                )
                out = run(at, bt)
                _ = jax.device_get(out[0, 0])
                t0 = time.time()
                out = run(at, bt)
                _ = jax.device_get(out[0, 0])
                dt = (time.time() - t0) / iters
                print(f"{name}: {dt*1e3:.2f} ms/mul-batch  {n/dt/1e6:.1f} M muls/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name}: FAILED {type(e).__name__}: {e}")
            continue
        try:
            run = jax.jit(lambda a, b: chain(mul, a, b, iters))
            out = run(a_d, b_d)
            first = jax.device_get(out[0, 0])  # force
            t0 = time.time()
            out = run(a_d, b_d)
            _ = jax.device_get(out[0, 0])
            dt = (time.time() - t0) / iters
            print(f"{name}: {dt*1e3:.2f} ms/mul-batch  {n/dt/1e6:.1f} M muls/s")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}")

    # exactness spot check between both paths on device
    import numpy as _np

    x1 = _np.asarray(jax.device_get(jax.jit(F._mul_xla)(a_d, b_d)))
    x2 = _np.asarray(jax.device_get(ops.mul(a_d, b_d)))
    print("pallas_r1 == xla:", bool((x1 == x2).all()))
    x3 = _np.asarray(jax.device_get(lanes.mul(a_d, b_d)))
    print("lanes == xla:", bool((x1 == x3).all()))
    try:
        x4 = _np.asarray(jax.device_get(lanes_mxu.mul(a_d, b_d)))
        print("lanes_mxu == xla:", bool((x1 == x4).all()))
    except Exception as e:  # noqa: BLE001
        print(f"lanes_mxu exactness: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
