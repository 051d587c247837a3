"""Standalone repro of the u_lo tree's FINAL level (G=2 -> 1), the
first depth at which the compiled TPU program diverges
(xcheck_ulo_levels.log: depth5 PASS, depth6 FAIL, barrier no help).

Feeds the depth-5 output as a FRESH device buffer and runs one RCB add
level in several formulations, each checked against exact host ints:

  slice   : lo/hi = slice_in_dim(v, ..., axis=1)    (production tree_sum)
  index   : lo/hi = v[:, 0], v[:, 1] (squeezed, no degenerate axis)
  reshape : pairwise reshape (K, 1, 2, Hf, ...) add of v[:, :, 0]+[:, :, 1]

Env: XFL_PALLAS=0 disables the pallas dispatch process-wide.
"""

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

from xcheck_level1 import DATA, host_rcb_add_mont, limbs_to_int_np  # noqa: E402


def main():
    if os.environ.get("XFL_PALLAS") == "0":
        from contangle_zkcp_tpu.fields import fp as fp_mod

        fp_mod.PALLAS_ENABLED = False
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev
    Fq = gd.ops.F
    p = Fq.p
    rinv = pow(1 << (16 * Fq.L), -1, p)
    K, G, Hf, L = 22, 64, 32, Fq.L

    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    grid = {k: v.reshape(K, G, Hf, 2, L) for k, v in folded.items()}
    grid_d = {k: jnp.asarray(v) for k, v in grid.items()}

    def tree_levels(pts, levels):
        t = G
        for _ in range(levels):
            half = t // 2
            lo = {k: jax.lax.slice_in_dim(v, 0, half, axis=1) for k, v in pts.items()}
            hi = {k: jax.lax.slice_in_dim(v, half, t, axis=1) for k, v in pts.items()}
            pts = gd._add_impl(lo, hi)
            t = half
        return pts

    # depth-5 output as a fresh host->device buffer (verified exact)
    d5 = jax.jit(lambda g: tree_levels(g, 5))(grid_d)
    d5 = {k: np.asarray(jax.device_get(v)) for k, v in d5.items()}
    print("depth5 materialized", flush=True)
    d5_d = {k: jnp.asarray(v) for k, v in d5.items()}  # (K, 2, Hf, 2, L)

    lo_h = {k: limbs_to_int_np(v[:, :1]) for k, v in d5.items()}
    hi_h = {k: limbs_to_int_np(v[:, 1:]) for k, v in d5.items()}
    b3_host = limbs_to_int_np(np.asarray(gd._b3))
    want = host_rcb_add_mont(lo_h, hi_h, p, rinv, b3_host)
    want_sq = {k: v[:, 0] for k, v in want.items()}

    def check(tag, fn, want_):
        f = jax.jit(fn)
        t0 = time.time()
        got = {k: np.asarray(jax.device_get(v)) for k, v in f(d5_d).items()}
        dt = time.time() - t0
        bad = 0
        first = None
        for k in ("x", "y", "z"):
            neq = limbs_to_int_np(got[k]) != want_[k]
            bad += int(neq.sum())
            if first is None and neq.any():
                first = (k, np.argwhere(neq)[:3].tolist())
        print(
            f"{tag}: {'PASS' if bad == 0 else f'FAIL {bad} coords'} ({dt:.1f}s)"
            + (f" first {first}" if first else ""),
            flush=True,
        )

    def via_slice(v):
        lo = {k: jax.lax.slice_in_dim(x, 0, 1, axis=1) for k, x in v.items()}
        hi = {k: jax.lax.slice_in_dim(x, 1, 2, axis=1) for k, x in v.items()}
        return gd._add_impl(lo, hi)

    def via_index(v):
        lo = {k: x[:, 0] for k, x in v.items()}
        hi = {k: x[:, 1] for k, x in v.items()}
        return gd._add_impl(lo, hi)

    check("slice", via_slice, want)
    check("index", via_index, want_sq)


if __name__ == "__main__":
    main()
