"""Minimal repro, level 2: ONE u_lo tree level — the complete RCB add
of axis-1 slice halves of the real 5-D folded grid — checked against
an exact host-int replay of the same straight-line formula.

Single muls on the same slices are exact (xcheck_slice_mul.py: add/xla/
pallas all PASS), so the defect needs the full add structure: stacked
_mul_many batches of 6 Fq2 products built from strided slices.

Variants:
  base : dev.add(lo, hi) exactly as tree_sum runs it
  barr : same with jax.lax.optimization_barrier on the slices first

Env: XL1_VARIANTS "base,barr"; XL1_PALLAS=0 disables the pallas mul
dispatch for the WHOLE process (inner jits cache per-aval, so toggling
mid-process would silently reuse the pallas trace).
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
    out = np.zeros(arr.shape[:-1], dtype=object)
    for i in range(arr.shape[-1]):
        out = out + (arr[..., i].astype(object) << (16 * i))
    return out


def host_rcb_add_mont(P, Q, p, rinv, b3):
    """Exact host replay of SWDevice._add_impl over Fq2 in Montgomery
    form.  P/Q: dicts of (..., 2) object arrays (c0, c1 stacked on the
    last axis).  Returns same-shape dict — the identical projective
    representative the device must produce."""

    def m(a, b):  # Montgomery Fq2 mul on object arrays (..., 2)
        a0, a1 = a[..., 0], a[..., 1]
        b0, b1 = b[..., 0], b[..., 1]
        v0 = a0 * b0 % p * rinv % p
        v1 = a1 * b1 % p * rinv % p
        c0 = (v0 - v1) % p
        t = (a0 + a1) % p * ((b0 + b1) % p) % p * rinv % p
        c1 = (t - v0 - v1) % p
        return np.stack([c0, c1], axis=-1)

    def add(a, b):
        return (a + b) % p

    def sub(a, b):
        return (a - b) % p

    X1, Y1, Z1 = P["x"], P["y"], P["z"]
    X2, Y2, Z2 = Q["x"], Q["y"], Q["z"]
    t0 = m(X1, X2)
    t1 = m(Y1, Y2)
    t2 = m(Z1, Z2)
    u1 = m(add(X1, Y1), add(X2, Y2))
    u2 = m(add(Y1, Z1), add(Y2, Z2))
    u3 = m(add(X1, Z1), add(X2, Z2))
    t3 = sub(u1, add(t0, t1))
    t4 = sub(u2, add(t1, t2))
    y3p = sub(u3, add(t0, t2))
    t2b = m(b3, t2)
    y3b = m(b3, y3p)
    Z3p = add(t1, t2b)
    t1p = sub(t1, t2b)
    t0p = add(add(t0, t0), t0)
    m1 = m(t4, y3b)
    m2 = m(t3, t1p)
    m3 = m(y3b, t0p)
    m4 = m(t1p, Z3p)
    m5 = m(t0p, t3)
    m6 = m(Z3p, t4)
    return {
        "x": sub(m2, m1),
        "y": add(m4, m3),
        "z": add(m6, m5),
    }


def main():
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx

    variants = os.environ.get("XL1_VARIANTS", "base,barr").split(",")
    if os.environ.get("XL1_PALLAS") == "0":
        from contangle_zkcp_tpu.fields import fp as fp_mod

        fp_mod.PALLAS_ENABLED = False
    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev
    Fq = gd.ops.F
    p = Fq.p
    rinv = pow(1 << (16 * Fq.L), -1, p)
    K, G, Hf, L = 22, 64, 32, Fq.L

    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    grid = {k: v.reshape(K, G, Hf, 2, L) for k, v in folded.items()}
    grid_d = {k: jnp.asarray(v) for k, v in grid.items()}

    # host expectation
    lo_h = {k: limbs_to_int_np(v[:, : G // 2]) for k, v in grid.items()}
    hi_h = {k: limbs_to_int_np(v[:, G // 2 :]) for k, v in grid.items()}
    b3_host = limbs_to_int_np(np.asarray(gd._b3))
    want = host_rcb_add_mont(lo_h, hi_h, p, rinv, b3_host)

    def split(g, barrier=False):
        lo = {k: jax.lax.slice_in_dim(v, 0, G // 2, axis=1) for k, v in g.items()}
        hi = {k: jax.lax.slice_in_dim(v, G // 2, G, axis=1) for k, v in g.items()}
        if barrier:
            lo, hi = jax.lax.optimization_barrier((lo, hi))
        return lo, hi

    def run(tag, fn):
        f = jax.jit(fn)
        t0 = time.time()
        got = {k: np.asarray(jax.device_get(v)) for k, v in f(grid_d).items()}
        dt = time.time() - t0
        bad_total = 0
        first = None
        for k in ("x", "y", "z"):
            gi = limbs_to_int_np(got[k])
            neq = gi != want[k]
            bad_total += int(neq.sum())
            if first is None and neq.any():
                first = (k, np.argwhere(neq)[:3].tolist())
        print(
            f"{tag}: {'PASS' if bad_total == 0 else f'FAIL {bad_total} coords'}"
            f" ({dt:.1f}s)" + (f" first {first}" if first else ""),
            flush=True,
        )

    if "base" in variants:
        run("base", lambda g: gd._add_impl(*split(g)))
    if "barr" in variants:
        run("barr", lambda g: gd._add_impl(*split(g, barrier=True)))


if __name__ == "__main__":
    main()
