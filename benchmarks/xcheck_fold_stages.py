"""Stage-level bisect of the G2 c=12 MSM's fold/weighted-reduce defect.

The bucket grid is EXACT on TPU (xcheck_msm_grid_tpu.log) while the end
result is wrong, and the whole pipeline is exact eagerly on CPU — so one
of the compiled fold / weighted-reduce stages miscompiles on TPU.  The
stages are deterministic integer programs: given the same input grid,
CPU-eager and TPU-compiled must produce bit-identical uint32 limb
arrays.  This script runs both and diffs raw arrays, no EC decode.

Mode A (XFS_MODE=tpu, run on the chip): rebuild the N=2^14 seed-0
schedule, run _bucket_acc_s -> grid.npz, _fold_dbg -> folded.npz,
_reduce_dbg -> windows.npz under benchmarks/fold_stage_data/.

Mode B (XFS_MODE=cpu): load grid.npz, recompute fold and reduce eagerly
on CPU, diff against the TPU outputs; print the lane/limb pattern of
any mismatch.

Env: XFS_N (16384), XFS_C (12), XFS_SIGNED (1), XFS_GROUP (g2).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("XFS_MODE", "tpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache"),
)

import jax.numpy as jnp
import numpy as np

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fold_stage_data")


def build_msm_and_sched():
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.groth16.groth16 import curve_ctx
    from contangle_zkcp_tpu.ops.msm import MSM

    N = int(os.environ.get("XFS_N", "16384"))
    c = int(os.environ.get("XFS_C", "12"))
    signed = os.environ.get("XFS_SIGNED", "1") == "1"
    group = os.environ.get("XFS_GROUP", "g2")
    ctx = curve_ctx("bls12_381")
    gd = ctx.g2_dev if group == "g2" else ctx.g1_dev
    gen = ctx.g2_gen if group == "g2" else ctx.g1.generator
    rng = random.Random(0)
    ks = [rng.randrange(1, 1 << 20) for _ in range(N)]
    ss = [rng.randrange(ctx.r) for _ in range(N)]
    msm = MSM(gd, scalar_bits=ctx.r.bit_length(), c=c, signed=signed)
    limbs = np.asarray(ints_to_limbs(ss, 16))
    sched = (
        msm.host_schedule_signed(limbs)
        if signed
        else msm.host_schedule(limbs)
    )
    return msm, gd, gen, ks, sched


def mode_tpu():
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    os.makedirs(DATA, exist_ok=True)
    msm, gd, gen, ks, sched = build_msm_and_sched()
    t0 = time.time()
    fb = FixedBaseDevice(gd, gen, bits=20, c=5, chunk=1 << 14)
    pts = fb.mul_ints(ks)
    print(f"fixed-base: {time.time()-t0:.1f}s", flush=True)
    if len(sched) == 4:
        order, start, cnt, sgn = sched
        grid = msm._bucket_acc_s(
            pts, jnp.asarray(order), jnp.asarray(start),
            jnp.asarray(cnt), jnp.asarray(sgn),
        )
    else:
        order, start, cnt = sched
        grid = msm._bucket_acc(
            pts, jnp.asarray(order), jnp.asarray(start), jnp.asarray(cnt)
        )
    grid = {k: np.asarray(jax.device_get(v)) for k, v in grid.items()}
    np.savez(os.path.join(DATA, "grid.npz"), **grid)
    print("grid saved", flush=True)

    t0 = time.time()
    folded = msm._fold_dbg({k: jnp.asarray(v) for k, v in grid.items()})
    folded = {k: np.asarray(jax.device_get(v)) for k, v in folded.items()}
    np.savez(os.path.join(DATA, "folded.npz"), **folded)
    print(f"fold ran: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    wins = msm._reduce_dbg({k: jnp.asarray(v) for k, v in folded.items()})
    wins = {k: np.asarray(jax.device_get(v)) for k, v in wins.items()}
    np.savez(os.path.join(DATA, "windows.npz"), **wins)
    print(f"reduce ran: {time.time()-t0:.1f}s", flush=True)


def _diff(tag, got, want):
    ok = all(np.array_equal(got[k], want[k]) for k in ("x", "y", "z"))
    if ok:
        print(f"{tag}: MATCH", flush=True)
        return True
    for k in ("x", "y", "z"):
        neq = got[k] != want[k]
        if not neq.any():
            continue
        lanes = np.argwhere(neq.any(axis=tuple(range(2, neq.ndim))) if neq.ndim > 2 else neq)
        print(
            f"{tag}: {k} differs at {neq.sum()} limbs; "
            f"first (window, lane) hits: {lanes[:12].tolist()}",
            flush=True,
        )
        ws = sorted(set(int(w) for w, *_ in lanes))
        ls = sorted(set(int(l) for _, l, *_ in lanes)) if lanes.shape[1] > 1 else []
        print(f"{tag}: windows {ws[:30]}; lanes min/max "
              f"{(min(ls), max(ls)) if ls else 'n/a'}", flush=True)
    return False


def mode_cpu():
    msm, gd, gen, ks, sched = build_msm_and_sched()
    grid_np = dict(np.load(os.path.join(DATA, "grid.npz")))
    tpu_folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    tpu_wins = dict(np.load(os.path.join(DATA, "windows.npz")))
    with jax.disable_jit():
        t0 = time.time()
        folded = msm._fold_aliases(
            {k: jnp.asarray(v) for k, v in grid_np.items()}
        )
        folded = {k: np.asarray(v) for k, v in folded.items()}
        print(f"cpu fold: {time.time()-t0:.1f}s", flush=True)
        fold_ok = _diff("fold", tpu_folded, folded)
        # reduce runs from the TPU's folded output so the stages bisect
        # independently even if fold already differs
        t0 = time.time()
        wins = msm._weighted_reduce(
            {k: jnp.asarray(v) for k, v in tpu_folded.items()},
            jnp.uint32(0),
            signed=msm.signed,
        )
        wins = {k: np.asarray(v) for k, v in wins.items()}
        print(f"cpu reduce: {time.time()-t0:.1f}s", flush=True)
        _diff("reduce", tpu_wins, wins)


def _reduce_pieces(msm):
    """Jittable sub-stages of _weighted_reduce for the stage-2 bisect."""
    dev, K, nb = msm.dev, msm.K, msm.nb
    nbits = nb.bit_length() - 1
    cl = nbits // 2
    ch = nbits - cl
    G, Hf = 1 << ch, 1 << cl

    def regrid(acc):
        return {
            k: v.reshape((K, G, Hf) + v.shape[2:]) for k, v in acc.items()
        }

    def tree_sum(pts, axis_len, merge_axis):
        t = axis_len
        while t > 1:
            half = t // 2
            lo_ = {
                k: jax.lax.slice_in_dim(v, 0, half, axis=merge_axis)
                for k, v in pts.items()
            }
            hi_ = {
                k: jax.lax.slice_in_dim(v, half, t, axis=merge_axis)
                for k, v in pts.items()
            }
            pts = dev.add(lo_, hi_)
            t = half
        return {k: jnp.squeeze(v, axis=merge_axis) for k, v in pts.items()}

    def weighted(S, nb_, offset=0):
        running = dev.identity((K,))
        total = dev.identity((K,))

        def rbody(i, carry):
            running, total = carry
            b = nb_ - 1 - i
            Sb = {
                k: jax.lax.dynamic_index_in_dim(
                    S[k], b, axis=1, keepdims=False
                )
                for k in S
            }
            running = dev.add(running, Sb)
            total = dev.add(total, running)
            return (running, total)

        _, total = jax.lax.fori_loop(
            0, nb_ - 1 + offset, rbody, (running, total)
        )
        return total

    def final(sh, sl):
        for _ in range(cl):
            sh = dev.add(sh, sh)
        return dev.add(sh, sl)

    off = 1 if msm.signed else 0
    return {
        "t_hi": jax.jit(lambda a: tree_sum(regrid(a), Hf, 2)),
        "u_lo": jax.jit(lambda a: tree_sum(regrid(a), G, 1)),
        "s_hi": jax.jit(lambda t: weighted(t, G)),
        "s_lo": jax.jit(lambda u: weighted(u, Hf, offset=off)),
        "final": jax.jit(final),
    }


def mode_tpu2():
    msm, gd, gen, ks, sched = build_msm_and_sched()
    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    pieces = _reduce_pieces(msm)
    fd = {k: jnp.asarray(v) for k, v in folded.items()}
    outs = {}
    t0 = time.time()
    outs["t_hi"] = pieces["t_hi"](fd)
    outs["u_lo"] = pieces["u_lo"](fd)
    outs["s_hi"] = pieces["s_hi"](outs["t_hi"])
    outs["s_lo"] = pieces["s_lo"](outs["u_lo"])
    outs["final"] = pieces["final"](outs["s_hi"], outs["s_lo"])
    for name, v in outs.items():
        arr = {k: np.asarray(jax.device_get(x)) for k, x in v.items()}
        np.savez(os.path.join(DATA, f"r2_{name}.npz"), **arr)
        print(f"{name} saved ({time.time()-t0:.1f}s)", flush=True)


def mode_cpu2():
    msm, gd, gen, ks, sched = build_msm_and_sched()
    folded = dict(np.load(os.path.join(DATA, "folded.npz")))
    pieces = _reduce_pieces(msm)
    tpu = {
        name: dict(np.load(os.path.join(DATA, f"r2_{name}.npz")))
        for name in ("t_hi", "u_lo", "s_hi", "s_lo", "final")
    }
    with jax.disable_jit():
        fd = {k: jnp.asarray(v) for k, v in folded.items()}
        t0 = time.time()
        got = {}
        got["t_hi"] = pieces["t_hi"](fd)
        got["u_lo"] = pieces["u_lo"](fd)
        # each downstream piece replays from the TPU's output, so every
        # sub-stage bisects independently
        got["s_hi"] = pieces["s_hi"](
            {k: jnp.asarray(v) for k, v in tpu["t_hi"].items()}
        )
        got["s_lo"] = pieces["s_lo"](
            {k: jnp.asarray(v) for k, v in tpu["u_lo"].items()}
        )
        got["final"] = pieces["final"](
            {k: jnp.asarray(v) for k, v in tpu["s_hi"].items()},
            {k: jnp.asarray(v) for k, v in tpu["s_lo"].items()},
        )
        print(f"cpu pieces: {time.time()-t0:.1f}s", flush=True)
    for name in ("t_hi", "u_lo", "s_hi", "s_lo", "final"):
        _diff(name, tpu[name], {k: np.asarray(v) for k, v in got[name].items()})


if __name__ == "__main__":
    mode = os.environ.get("XFS_MODE", "tpu")
    if mode == "cpu":
        mode_cpu()
    elif mode == "tpu2":
        mode_tpu2()
    elif mode == "cpu2":
        mode_cpu2()
    else:
        mode_tpu()
