"""Standing regression check of the two known XLA:TPU miscompile
boundaries the MSM engine works around (ops/msm.py):

  1. MAX_GATHER_BYTES = 2^29: packed-row gathers from a >= 2^30-byte
     source return wrong rows (round-2 bisection, xcheck_gather.py).
  2. Staged reduce dispatch: >= 6 chained tree-reduction levels of the
     wide-G2 window grid in ONE compiled program return wrong limbs
     while every prefix depth <= 5 is exact (round-3 bisection,
     xcheck_ulo_levels.log: depth5 PASS, depth6 FAIL, barrier FAIL).

Both workarounds carry empirically-bisected thresholds around
silent-wrong-answer compiler bugs, so each round's toolchain must be
re-checked: a silent shift in either boundary is exactly how the
round-2 scale proof died.  Run this on the real chip once per round and
commit the log (benchmarks/check_tpu_boundaries_r{N}.log).

Semantics of the verdict line:
  * "guard" checks (2^29/2^30 gather; depth-5 fused reduce) MUST pass —
    a failure means the safe side of the boundary moved and the
    workaround bounds are WRONG: stop and re-bisect (exit 1).
  * "canary" checks (2^31 gather headroom; depth-6 fused reduce) are expected
    to fail; a PASS is not an error but is loudly reported — the
    toolchain changed and the workaround may be loosened after a
    fresh bisection (exit 0, "canary_healed": true).

Run: PYTHONPATH=/root/repo python -u benchmarks/check_tpu_boundaries.py
Env: BOUND_SKIP_GATHER=1 / BOUND_SKIP_REDUCE=1 to run one half.
"""

import functools
import json
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

MULT = np.uint32(2654435761)


# ------------------------------------------------------------- gather check
@functools.partial(jax.jit, static_argnames=("n_rows", "lanes"))
def _gather_mismatches(idx, n_rows, lanes):
    """Device-side gather self-check: row-identifying pattern, gather by
    idx, recompute expected rows, count mismatching u32 lanes on device
    (only the count crosses the tunnel)."""
    base = (jnp.arange(n_rows, dtype=jnp.uint32) * MULT)[:, None]
    j = jnp.arange(lanes, dtype=jnp.uint32)[None, :]
    src = base + j
    got = jnp.take(src, idx, axis=0)
    want = (idx.astype(jnp.uint32) * MULT)[:, None] + j
    return jnp.sum((got != want).astype(jnp.int64))


def check_gather(log2_rows: int, lanes: int):
    n_rows = 1 << log2_rows
    rng = np.random.RandomState(7)
    idx = jnp.asarray(rng.randint(0, n_rows, size=1 << 16).astype(np.int32))
    t0 = time.time()
    bad = int(jax.device_get(_gather_mismatches(idx, n_rows, lanes)))
    return {
        "check": f"gather_2^{log2_rows}x{lanes}lanes",
        "source_bytes": n_rows * lanes * 4,
        "bad_lanes": bad,
        "ok": bad == 0,
        "sec": round(time.time() - t0, 1),
    }


# ------------------------------------------------- chained tree-reduce check
def check_reduce(depth: int):
    """Fused `depth`-level G2 tree reduce vs per-level staged dispatch.

    Reproduces the failing geometry of the n=196,608 proof's G2 window
    grid — (K=22, G=64, Hf=32) wide-window u_lo reduction — with
    deterministic fixed-base points standing in for bucket sums.  The
    staged (one dispatch per level) chain is the known-good oracle; the
    fused program compiles all `depth` levels into one executable.
    """
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev
    K, G, Hf = 22, 64, 32
    n = K * G * Hf
    t0 = time.time()
    fb = FixedBaseDevice(gd, ctx.g2_gen, bits=17, c=6, chunk=1 << 13)
    flat = fb.mul_ints(list(range(1, n + 1)))
    grid = {k: v.reshape(K, G, Hf, *v.shape[1:]) for k, v in flat.items()}

    def level(pts, t):
        half = t // 2
        lo = {k: jax.lax.slice_in_dim(v, 0, half, axis=1) for k, v in pts.items()}
        hi = {k: jax.lax.slice_in_dim(v, half, t, axis=1) for k, v in pts.items()}
        return gd._add_impl(lo, hi)

    def fused(pts):
        t = G
        for _ in range(depth):
            pts = level(pts, t)
            t //= 2
        return pts

    # staged oracle: one compiled program per level
    staged = grid
    t = G
    lvl_jit = jax.jit(level, static_argnames="t")
    for _ in range(depth):
        staged = lvl_jit(staged, t=t)
        staged = {k: v.block_until_ready() for k, v in staged.items()}
        t //= 2
    got = jax.jit(fused)(grid)
    bad = 0
    for k in ("x", "y", "z"):
        bad += int(
            jax.device_get(
                jnp.sum((got[k] != staged[k]).astype(jnp.int64))
            )
        )
    return {
        "check": f"g2_tree_reduce_depth{depth}",
        "grid": [K, G, Hf],
        "bad_lanes": bad,
        "ok": bad == 0,
        "sec": round(time.time() - t0, 1),
    }


def check_reduce_axis2(depth: int, via_view: bool):
    """Axis-2 (lo-axis) chained tree reduce at the G2 window geometry.

    Round-5 regression: axis-2 chains return wrong limbs at ANY tested
    depth on this toolchain while axis-1 chains stay exact
    (xcheck_g2_staged_probe.log) — this broke both MSM engines' G2 path
    until the staged reduction switched to an axis-1 chain over a
    (K*G, Hf) reshaped view (ops/msm.py _staged_windows).  via_view=True
    checks the WORKAROUND formulation (guard: must pass); False checks
    the raw axis-2 chain (canary: known bad).
    """
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev
    K, G, Hf = 22, 64, 32
    n = K * G * Hf
    t0 = time.time()
    fb = FixedBaseDevice(gd, ctx.g2_gen, bits=17, c=6, chunk=1 << 13)
    flat = fb.mul_ints(list(range(1, n + 1)))
    grid = {k: v.reshape(K, G, Hf, *v.shape[1:]) for k, v in flat.items()}

    def level(pts, t, axis):
        half = t // 2
        lo = {k: jax.lax.slice_in_dim(v, 0, half, axis=axis) for k, v in pts.items()}
        hi = {k: jax.lax.slice_in_dim(v, half, t, axis=axis) for k, v in pts.items()}
        return gd._add_impl(lo, hi)

    if via_view:
        def fused(pts):
            pts = {k: v.reshape((K * G, Hf) + v.shape[3:]) for k, v in pts.items()}
            t = Hf
            for _ in range(depth):
                pts = level(pts, t, 1)
                t //= 2
            return {k: v.reshape((K, G, t) + v.shape[2:]) for k, v in pts.items()}
    else:
        def fused(pts):
            t = Hf
            for _ in range(depth):
                pts = level(pts, t, 2)
                t //= 2
            return pts

    # staged oracle: one compiled program per level, axis 2 (each single
    # level is exact on every toolchain tested)
    staged = grid
    t = Hf
    lvl_jit = jax.jit(level, static_argnames=("t", "axis"))
    for _ in range(depth):
        staged = lvl_jit(staged, t=t, axis=2)
        staged = {k: v.block_until_ready() for k, v in staged.items()}
        t //= 2
    got = jax.jit(fused)(grid)
    bad = 0
    for k in ("x", "y", "z"):
        want = staged[k]
        have = got[k].reshape(want.shape)
        bad += int(
            jax.device_get(jnp.sum((have != want).astype(jnp.int64)))
        )
    return {
        "check": f"g2_axis2_reduce_depth{depth}_{'view' if via_view else 'raw'}",
        "grid": [K, G, Hf],
        "bad_lanes": bad,
        "ok": bad == 0,
        "sec": round(time.time() - t0, 1),
    }


def main():
    results = []
    if os.environ.get("BOUND_SKIP_GATHER") != "1":
        # round 4: the 2^30 gather miscompile healed and a 2^31 probe was
        # exact (check_tpu_boundaries_r4.log + xcheck probe), so
        # MAX_GATHER_BYTES was loosened to 2^30 — BOTH sizes are now
        # guards (the operating bound and one notch above); there is no
        # known-bad gather size left on this toolchain.
        results.append(("guard", check_gather(20, 128)))   # 2^29 B
        results.append(("guard", check_gather(21, 128)))   # 2^30 B: the bound
        results.append(("canary", check_gather(22, 128)))  # 2^31 B headroom
    if os.environ.get("BOUND_SKIP_REDUCE") != "1":
        results.append(("guard", check_reduce(5)))   # must pass
        results.append(("canary", check_reduce(6)))  # known bad
    if os.environ.get("BOUND_SKIP_AXIS2") != "1":
        # round-5 regression (see check_reduce_axis2 docstring)
        results.append(("guard", check_reduce_axis2(5, via_view=True)))
        results.append(("canary", check_reduce_axis2(5, via_view=False)))
    guard_fail = False
    canary_healed = False
    for kind, r in results:
        r["kind"] = kind
        print(json.dumps(r), flush=True)
        if kind == "guard" and not r["ok"]:
            guard_fail = True
        if kind == "canary" and r["ok"]:
            canary_healed = True
    print(
        json.dumps(
            {
                "verdict": "GUARD_FAIL: boundary moved into the safe "
                "side — re-bisect ops/msm.py bounds before trusting "
                "any MSM result"
                if guard_fail
                else "ok",
                "canary_healed": canary_healed,
                "note": "canary PASS means the toolchain no longer "
                "exhibits the known-bad case; workarounds may be "
                "loosened after a fresh bisection"
                if canary_healed
                else "",
            }
        ),
        flush=True,
    )
    sys.exit(1 if guard_fail else 0)


if __name__ == "__main__":
    main()
