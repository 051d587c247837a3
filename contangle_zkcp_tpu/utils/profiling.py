"""Profiling helpers: XLA trace capture + compiled-program cost tables.

SURVEY §5.1: the reference has no profiling at all; here every drive can
(a) capture an XLA profiler trace (`trace` context) and (b) report the
compiler's own cost model for each jitted program — FLOPs, bytes
accessed, and the implied arithmetic intensity and SOL fractions — which
is what benchmarks/SOL.md's occupancy table is derived from.
"""

from __future__ import annotations

import contextlib
import json
import os

# v5e single-chip peaks used for SOL fractions
PEAK_F32_FLOPS = 33e12  # exact-integer f32 matmul path
PEAK_HBM_BYTES = 819e9


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/contangle_trace"):
    """Capture an XLA profiler trace around the body (view in XProf)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_table(compiled, wall_sec: float | None = None) -> dict:
    """Compiler cost analysis of one lowered+compiled program."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    out = {
        "flops": flops,
        "bytes_accessed": bytes_acc,
        "arith_intensity": flops / bytes_acc if bytes_acc else None,
    }
    if wall_sec:
        out["achieved_flops_per_sec"] = flops / wall_sec
        out["flops_sol_fraction"] = flops / wall_sec / PEAK_F32_FLOPS
        out["hbm_sol_fraction"] = bytes_acc / wall_sec / PEAK_HBM_BYTES
    return out


def report(fn_jitted, args, wall_sec: float | None = None) -> str:
    """One-line JSON cost report for a jitted callable + example args."""
    compiled = fn_jitted.lower(*args).compile()
    return json.dumps(cost_table(compiled, wall_sec))
