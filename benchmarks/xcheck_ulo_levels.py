"""Bisect the u_lo tree by depth: run k fused levels (k = 1..6) of the
axis-1 tree reduction on TPU and compare each against an exact host-int
replay of the same straight-line chain.  Finds the first depth at which
the compiled program diverges, then tests the barrier-between-levels
formulation as a fix candidate.

Env: XUL_DEPTHS "1,2,3,4,5,6", XUL_BARRIER=1 adds the barrier variant
at full depth.
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

from xcheck_level1 import DATA, host_rcb_add_mont, limbs_to_int_np  # noqa: E402


def main():
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev
    Fq = gd.ops.F
    p = Fq.p
    rinv = pow(1 << (16 * Fq.L), -1, p)
    K, G, Hf, L = 22, 64, 32, Fq.L
    depths = [int(x) for x in os.environ.get("XUL_DEPTHS", "2,3,4,5,6").split(",")]

    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    grid = {k: v.reshape(K, G, Hf, 2, L) for k, v in folded.items()}
    grid_d = {k: jnp.asarray(v) for k, v in grid.items()}
    b3_host = limbs_to_int_np(np.asarray(gd._b3))

    def tree_levels(pts, levels, barrier=False):
        t = G
        for _ in range(levels):
            half = t // 2
            lo = {k: jax.lax.slice_in_dim(v, 0, half, axis=1) for k, v in pts.items()}
            hi = {k: jax.lax.slice_in_dim(v, half, t, axis=1) for k, v in pts.items()}
            pts = gd._add_impl(lo, hi)
            if barrier:
                pts = jax.lax.optimization_barrier(pts)
            t = half
        return pts

    # host replay once to full depth, keeping every level
    host_levels = []
    cur = {k: limbs_to_int_np(v) for k, v in grid.items()}
    t = G
    t0 = time.time()
    for _ in range(max(depths)):
        half = t // 2
        lo = {k: v[:, :half] for k, v in cur.items()}
        hi = {k: v[:, half:t] for k, v in cur.items()}
        cur = host_rcb_add_mont(lo, hi, p, rinv, b3_host)
        host_levels.append(cur)
        t = half
    print(f"host replay to depth {max(depths)}: {time.time()-t0:.1f}s", flush=True)

    def check(tag, fn, want):
        f = jax.jit(fn)
        t0 = time.time()
        got = {k: np.asarray(jax.device_get(v)) for k, v in f(grid_d).items()}
        dt = time.time() - t0
        bad = 0
        first = None
        for k in ("x", "y", "z"):
            neq = limbs_to_int_np(got[k]) != want[k]
            bad += int(neq.sum())
            if first is None and neq.any():
                first = (k, np.argwhere(neq)[:3].tolist())
        print(
            f"{tag}: {'PASS' if bad == 0 else f'FAIL {bad} coords'} ({dt:.1f}s)"
            + (f" first {first}" if first else ""),
            flush=True,
        )
        return bad == 0

    first_bad = None
    for d in depths:
        ok = check(f"depth{d}", lambda g, d=d: tree_levels(g, d), host_levels[d - 1])
        if not ok and first_bad is None:
            first_bad = d
    if os.environ.get("XUL_BARRIER", "1") == "1":
        dmax = max(depths)
        check(
            f"barrier depth{dmax}",
            lambda g: tree_levels(g, dmax, barrier=True),
            host_levels[dmax - 1],
        )


if __name__ == "__main__":
    main()
