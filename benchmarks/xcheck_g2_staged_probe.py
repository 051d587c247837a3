"""Probe each staged-reduction sub-step at the G2 c=12 geometry.

Round-5 regression: BOTH MSM engines return wrong G2 c=12 windows on
the current toolchain (xcheck_balanced_g2_bisect.log, parent engine
repro), while the standing boundary check still passes depth-5 axis-1
chains (check_tpu_boundaries_r5.log).  This probe isolates which
sub-program is wrong: axis-2 tree chains, axis-1 tree chains, the
weighted fori recurrence, or the final combine — each decoded and
checked against exact host math on a deterministic fixed-base grid.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u benchmarks/xcheck_g2_staged_probe.py
Env: PROBE_GROUP=g2|g1, PROBE_LV (default 5).
"""

import json
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

from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice
from contangle_zkcp_tpu.ops.msm_balanced import BalancedMSM


def main():
    group = os.environ.get("PROBE_GROUP", "g2")
    lv = int(os.environ.get("PROBE_LV", "5"))
    ctx = curve_ctx("bls12_381")
    gd = ctx.g1_dev if group == "g1" else ctx.g2_dev
    gen = ctx.g1.generator if group == "g1" else ctx.g2_gen
    K, G, Hf = 22, 64, 32  # the c=12 signed geometry
    n = K * G * Hf

    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=22, c=6, chunk=1 << 13)
    flat = fb.mul_ints(list(range(1, n + 1)))
    grid = {k: v.reshape(K, G, Hf, *v.shape[1:]) for k, v in flat.items()}
    print(json.dumps({"grid_built_sec": round(time.time() - t0, 1)}), flush=True)

    eng = BalancedMSM(gd, scalar_bits=ctx.r.bit_length(), c=12, signed=True,
                      overflow_lanes=256)

    def host_expect_sum(axis):
        # multiplier of cell (k, g, h) is k*G*Hf + g*Hf + h + 1
        out = []
        for k in range(K):
            row = []
            if axis == 2:
                for g in range(G):
                    s = sum(k * G * Hf + g * Hf + h + 1 for h in range(Hf))
                    row.append(s)
            else:
                for h in range(Hf):
                    s = sum(k * G * Hf + g * Hf + h + 1 for g in range(G))
                    row.append(s)
            out.append(row)
        return out

    # ---- axis-2 chain: (K, G, Hf) -> (K, G, 1) in lv-level dispatches
    t0 = time.time()
    T_hi = grid
    while T_hi["x"].shape[2] > 1:
        step = min(lv, T_hi["x"].shape[2].bit_length() - 1)
        T_hi = eng._tree_levels_st(T_hi, axis=2, levels=step)
    T_hi = {k: jnp.squeeze(v, axis=2) for k, v in T_hi.items()}
    got = gd.decode_points({k: v.reshape((K * G,) + v.shape[2:]) for k, v in T_hi.items()})
    exp = host_expect_sum(axis=2)
    bad = sum(
        1
        for k in range(K)
        for g in range(G)
        if got[k * G + g] != gd.host_mul(exp[k][g], gen)
    )
    print(json.dumps({"step": "axis2_chain", "lv": lv, "bad": bad,
                      "sec": round(time.time() - t0, 1)}), flush=True)

    # ---- axis-1 chain: (K, G, Hf) -> (K, 1, Hf)
    t0 = time.time()
    U_lo = grid
    while U_lo["x"].shape[1] > 1:
        step = min(lv, U_lo["x"].shape[1].bit_length() - 1)
        U_lo = eng._tree_levels_st(U_lo, axis=1, levels=step)
    U_lo = {k: jnp.squeeze(v, axis=1) for k, v in U_lo.items()}
    got = gd.decode_points({k: v.reshape((K * Hf,) + v.shape[2:]) for k, v in U_lo.items()})
    exp = host_expect_sum(axis=1)
    bad = sum(
        1
        for k in range(K)
        for h in range(Hf)
        if got[k * Hf + h] != gd.host_mul(exp[k][h], gen)
    )
    print(json.dumps({"step": "axis1_chain", "lv": lv, "bad": bad,
                      "sec": round(time.time() - t0, 1)}), flush=True)

    # ---- weighted fori on the axis-1 result (K, Hf): sum (h+1)*S_h
    t0 = time.time()
    s_lo = eng._weighted_st(U_lo, offset=1)
    got = gd.decode_points(s_lo)
    bad = 0
    for k in range(K):
        e = sum((h + 1) * exp[k][h] for h in range(Hf))
        if got[k] != gd.host_mul(e, gen):
            bad += 1
    print(json.dumps({"step": "weighted_fori", "bad": bad,
                      "sec": round(time.time() - t0, 1)}), flush=True)

    # ---- final combine on T_hi-reduced + weighted (full window check)
    t0 = time.time()
    s_hi = eng._weighted_st(T_hi, offset=0)
    fin = eng._final_st(s_hi, s_lo, 5)
    got = gd.decode_points(fin)
    exp2 = host_expect_sum(axis=2)
    bad = 0
    for k in range(K):
        e_hi = sum(g * exp2[k][g] for g in range(G))
        e_lo = sum((h + 1) * exp[k][h] for h in range(Hf))
        if got[k] != gd.host_mul((e_hi << 5) + e_lo, gen):
            bad += 1
    print(json.dumps({"step": "final", "bad": bad,
                      "sec": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
