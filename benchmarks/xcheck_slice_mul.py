"""Minimal repro hunt: axis-1 slices of a 5-D (22,64,32,2,24) array
feeding field ops miscompile on TPU (the u_lo tree of the MSM weighted
reduction), while axis-2 slices are exact.

Loads the real folded bucket grid, slices it like tree_sum's first
u_lo level, and checks three variants elementwise against host ints:

  add :  Fq limb add of the two slice halves       (no pallas, no mul)
  xla :  Fq._mul_xla Montgomery product             (XLA mul path)
  pal :  pallas MontMulLanes product                (TPU kernel path)
  muld:  Fq.mul dispatch (what production runs)

Run on TPU; each variant prints PASS/FAIL + first wrong indices.
"""

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

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fold_stage_data")


def limbs_to_int_np(arr):
    """(..., L) uint32 16-bit limbs -> object ndarray of python ints."""
    out = np.zeros(arr.shape[:-1], dtype=object)
    for i in range(arr.shape[-1]):
        out = out + (arr[..., i].astype(object) << (16 * i))
    return out


def main():
    from contangle_zkcp_tpu.fields import instances as fi

    Fq = fi.bls12_381_fq()
    p = Fq.p
    rinv = pow(1 << (16 * Fq.L), -1, p)

    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    K, nb = 22, 2048
    G, Hf = 64, 32
    # x-coordinate c0 plane, regridded exactly like _weighted_reduce
    v = folded["x"].reshape(K, G, Hf, 2, Fq.L)
    vd = jnp.asarray(v)

    def slice_pair(t):
        lo = jax.lax.slice_in_dim(t, 0, G // 2, axis=1)
        hi = jax.lax.slice_in_dim(t, G // 2, G, axis=1)
        return lo[..., 0, :], hi[..., 0, :]  # c0 planes, (22,32,32,24)

    lo_np = v[:, : G // 2, :, 0, :]
    hi_np = v[:, G // 2 :, :, 0, :]
    a_int = limbs_to_int_np(lo_np)
    b_int = limbs_to_int_np(hi_np)

    def check(tag, fn, want_fn):
        f = jax.jit(fn)
        t0 = time.time()
        got = np.asarray(jax.device_get(f(vd)))
        got_int = limbs_to_int_np(got)
        want = want_fn(a_int, b_int)
        bad = np.argwhere(got_int != want)
        print(
            f"{tag}: {'PASS' if bad.size == 0 else f'FAIL {len(bad)} wrong'}"
            f" ({time.time()-t0:.1f}s)"
            + (f" first {bad[:4].tolist()}" if bad.size else ""),
            flush=True,
        )

    from contangle_zkcp_tpu.ops import pallas_mont

    eng = pallas_mont.get_engine(Fq)

    check(
        "add",
        lambda t: Fq._add_impl(*slice_pair(t)),
        lambda a, b: (a + b) % p,
    )
    check(
        "xla",
        lambda t: Fq._mul_xla(*slice_pair(t)),
        lambda a, b: (a * b * rinv) % p,
    )
    check(
        "pal",
        lambda t: eng.mul(*slice_pair(t)),
        lambda a, b: (a * b * rinv) % p,
    )
    check(
        "mul_dispatch",
        lambda t: Fq._mul_impl(*slice_pair(t)),
        lambda a, b: (a * b * rinv) % p,
    )


if __name__ == "__main__":
    main()
