"""Multi-scalar multiplication (Pippenger) on TPU.

The Groth16 prover's dominant cost: 4 large MSMs per proof (A/B/H/L
queries — SURVEY.md §3.4; the reference gets these from ark-ec's rayon
Pippenger, /root/reference/circuits-ark/Cargo.toml:39-42).

TPU-native formulation (no scatter, no data-dependent shapes):
  1. window-decompose scalars into c-bit digits (pure limb bit ops);
  2. per window, `argsort` points by digit — the TPU-friendly substitute
     for scatter/atomic bucket accumulation;
  3. CSR-style bucket accumulation: one `while_loop` whose body performs a
     single batched EC add across all (window, bucket) lanes in lockstep,
     gathering each bucket's next point from the sorted order.  Expected
     trip count is N/2^c + Poisson tail, so total work is ~N adds per
     window — the Pippenger optimum — while exposing K*2^c-way lane
     parallelism to the VPU;
  4. bucket-weighted reduction sum_b b*S_b via a Hillis-Steele suffix scan
     (c steps) + tree reduce (c steps), all batched EC adds;
  5. tiny host-side Horner combine over the K window results.

Multi-chip sharding (points sharded, bucket sums psum-reduced over ICI)
lives in `parallel/msm_sharded.py`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bigint import LIMB_BITS
from ..curves.weierstrass import SWDevice
from ..utils import metrics

# Max chained halving tree-reduction levels fused into one compiled
# program: the XLA:TPU whole-program miscompile needs >= 6 chained
# levels (round-3 bisection, xcheck_ulo_levels.log; depth-5 guard
# re-validated on every round's toolchain by
# benchmarks/check_tpu_boundaries.py).
MAX_FUSED_REDUCE_LEVELS = 5


def _backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


def digits_from_limbs(scalars, c: int, num_windows: int):
    """(N, L) canonical (non-Montgomery) limbs -> (K, N) c-bit digits.

    c must be <= 16 so a digit spans at most two 16-bit limbs.
    """
    assert c <= LIMB_BITS
    L = scalars.shape[-1]
    padded = jnp.concatenate(
        [scalars, jnp.zeros(scalars.shape[:-1] + (1,), scalars.dtype)], axis=-1
    )
    outs = []
    for k in range(num_windows):
        bit = k * c
        li, off = bit // LIMB_BITS, bit % LIMB_BITS
        d = padded[..., li] >> off
        if off:
            d = d | (padded[..., li + 1] << (LIMB_BITS - off))
        outs.append(d & ((1 << c) - 1))
    return jnp.stack(outs)  # (K, N)


class MSM:
    """Pippenger engine bound to one SW group (G1 or G2 via SWDevice)."""

    def __init__(
        self,
        dev: SWDevice,
        scalar_bits: int,
        c: int = 8,
        signed: bool = False,
        packed: bool | None = None,
    ):
        self.dev = dev
        self.c = c
        self.scalar_bits = scalar_bits
        self.signed = signed
        # packed-row gathers (None = packed on TPU, per-coordinate on
        # CPU; see the use_packed note in _bucket_loop)
        self.packed = packed
        if signed:
            # Signed-digit windows: recode each c-bit digit into
            # [-2^(c-1), 2^(c-1)-1] with a +1 carry, gather-negating the
            # point for negative digits (negation is one field neg of y).
            # Buckets hold |digit| in [1, 2^(c-1)] laid out on lane
            # |d|-1 — exactly 2^(c-1) lanes, half the unsigned grid, and
            # ceil((bits+1)/c) windows instead of ceil(bits/c): at c=16
            # that is K=16 windows vs 22 at the unsigned c=12 optimum —
            # 27% fewer bucket adds for the same trip structure.
            self.K = -(-(scalar_bits + 1) // c)
            self.nb = 1 << (c - 1)
            leftover = scalar_bits - (self.K - 1) * c
            m_top = 1 << leftover if leftover > 0 else 1
            self.window_m = [self.nb] * (self.K - 1) + [min(m_top, self.nb)]
        else:
            self.K = -(-scalar_bits // c)
            self.nb = 1 << c
            # distinct digit values per window: the top window only spans
            # the leftover scalar bits.  Its buckets would concentrate
            # N/m_top points each and blow up the lockstep loop's trip
            # count, so the host schedule ALIASES each real bucket b
            # across the window's unused lane space (positions j*m + b),
            # and the device folds the aliases back with masked halving
            # adds before the weighted reduction (static structure — m_k
            # depends only on bits/c).
            self.window_m = [
                1 << min(c, scalar_bits - k * c) for k in range(self.K)
            ]
        self._bucket_phase = jax.jit(self._bucket_phase_impl)
        self._bucket_sched = jax.jit(self._bucket_scheduled_impl)
        self._bucket_sched_s = jax.jit(self._bucket_scheduled_signed_impl)
        # debug entries: raw bucket grid, no fold/reduction
        self._bucket_acc = jax.jit(
            lambda p, o, s, ct: self._bucket_accumulate(
                p, o, s, ct, o.shape[1]
            )
        )
        self._bucket_acc_s = jax.jit(
            lambda p, o, s, ct, g: self._bucket_accumulate(
                p, o, s, ct, o.shape[1], sgn=g
            )
        )
        self._tree_rows = jax.jit(self._tree_rows_impl)
        self._tree_rows_s = jax.jit(self._tree_rows_signed_impl)
        # debug entries: fold / weighted-reduce alone (scale debugging
        # bisects the compiled pipeline stage by stage)
        self._fold_dbg = jax.jit(self._fold_aliases)
        self._reduce_dbg = jax.jit(
            lambda a: self._weighted_reduce(
                a, jnp.uint32(0), signed=self.signed
            )
        )
        # staged single-chip pipeline (see run(): TPU dispatches the
        # fold/reduce phases as SEPARATE programs)
        self._tree_level_st = jax.jit(
            self._tree_level, static_argnames=("axis",)
        )
        self._tree_levels_st = jax.jit(
            self._tree_levels, static_argnames=("axis", "levels")
        )
        self._weighted_st = jax.jit(
            self._weighted_run, static_argnames=("offset",)
        )
        self._final_st = jax.jit(self._final_combine, static_argnames=("cl",))

    # ---------------------------------------------------------- scheduling
    def host_schedule(self, scalars_limbs):
        """Numpy bucket schedule: (order, start, cnt) host arrays.

        The device argsort of (K, N) digit rows was both slow (bitonic
        sort ~N log^2 N) and crash-prone at 2^20; when the scalars are
        host-known — every MSM except the in-flight H query — the
        schedule is a cheap numpy radix sort."""
        arr = np.asarray(scalars_limbs)
        K, c = self.K, self.c
        N = arr.shape[0]
        nb = 1 << c
        order = np.empty((K, N), dtype=np.int32)
        start = np.empty((K, nb), dtype=np.int32)
        cnt = np.empty((K, nb), dtype=np.int32)
        padded = np.concatenate(
            [arr, np.zeros((N, 1), dtype=arr.dtype)], axis=1
        )
        for k in range(K):
            bit = k * c
            li, off = bit // LIMB_BITS, bit % LIMB_BITS
            d = padded[:, li] >> off
            if off:
                d = d | (padded[:, li + 1] << (LIMB_BITS - off))
            d = (d & (nb - 1)).astype(np.uint32)
            order[k] = np.argsort(d, kind="stable")
            counts = np.bincount(d, minlength=nb).astype(np.int32)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(
                np.int32
            )
            m = self.window_m[k]
            A = nb // m  # alias slots per real bucket
            if A == 1:
                cnt[k] = counts
                start[k] = starts
            else:
                # spread bucket b's run over lanes j*m + b, j < A
                for b in range(m):
                    tot = int(counts[b])
                    chunk = -(-tot // A) if tot else 0
                    pos = int(starts[b])
                    left = tot
                    for j in range(A):
                        take = min(chunk, left)
                        lane = j * m + b
                        start[k, lane] = pos
                        cnt[k, lane] = take
                        pos += take
                        left -= take
        cnt[:, 0] = 0  # digit 0 contributes nothing
        # alias lanes of bucket 0 contribute nothing either
        for k in range(K):
            m = self.window_m[k]
            if m < nb:
                cnt[k, m::m] = 0
        return order, start, cnt

    def host_schedule_signed(self, scalars_limbs):
        """Signed-digit schedule: (order, start, cnt, sgn) host arrays.

        Digits recode to [-2^(c-1), 2^(c-1)-1] with carry (the top window
        keeps its positive carry-extended value; leftover <= c-1 bits by
        the K = ceil((bits+1)/c) choice, so it fits the lane grid).
        Bucket lane = |d|-1 — every lane carries weight lane+1, there is
        no dead zero lane, and the grid is exactly 2^(c-1) wide.  `sgn`
        aligns with `order`: sgn[k, j] is 1 iff the j-th scheduled point
        of window k enters its bucket negated."""
        arr = np.asarray(scalars_limbs)
        K, c, nb = self.K, self.c, self.nb
        N = arr.shape[0]
        half = 1 << (c - 1)
        padded = np.concatenate(
            [arr.astype(np.int64), np.zeros((N, 2), dtype=np.int64)], axis=1
        )
        carry = np.zeros(N, dtype=np.int64)
        lane = np.empty((K, N), dtype=np.int64)
        sign = np.empty((K, N), dtype=bool)
        for k in range(K):
            bit = k * c
            li, off = bit // LIMB_BITS, bit % LIMB_BITS
            d = padded[:, li] >> off
            if off:
                d |= padded[:, li + 1] << (LIMB_BITS - off)
            d = (d & ((1 << c) - 1)) + carry
            if k < K - 1:
                hi = d >= half
                d = np.where(hi, d - (1 << c), d)
                carry = hi.astype(np.int64)
            sign[k] = d < 0
            mag = np.abs(d)
            lane[k] = np.where(mag > 0, mag - 1, nb)  # nb = dead sentinel
        order = np.empty((K, N), dtype=np.int32)
        start = np.zeros((K, nb), dtype=np.int32)
        cnt = np.zeros((K, nb), dtype=np.int32)
        sgn = np.empty((K, N), dtype=np.int8)
        for k in range(K):
            o = np.argsort(lane[k], kind="stable").astype(np.int32)
            order[k] = o
            sgn[k] = sign[k][o]
            counts = np.bincount(lane[k], minlength=nb + 1)[:nb].astype(
                np.int32
            )
            starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(
                np.int32
            )
            m = self.window_m[k]
            A = nb // m
            if A <= 1:
                cnt[k], start[k] = counts, starts
            else:
                for b in range(m):
                    tot = int(counts[b])
                    chunk = -(-tot // A) if tot else 0
                    pos = int(starts[b])
                    left = tot
                    for j in range(A):
                        take = min(chunk, left)
                        al = j * m + b
                        start[k, al] = pos
                        cnt[k, al] = take
                        pos += take
                        left -= take
        return order, start, cnt, sgn

    # -------------------------------------------------------------- device
    def _bucket_phase_impl(self, points, digits):
        """points: {x,y,z} with leading N axis; digits: (K, N) uint32.

        Returns window sums: point batch with leading K axis.  Device
        argsort scheduling — used by the sharded path where digits live
        on-device; the single-chip `run` uses `host_schedule`."""
        assert not self.signed, "device scheduling is unsigned-digit only"
        dev, c, K = self.dev, self.c, self.K
        nb = 1 << c
        N = digits.shape[1]

        order = jnp.argsort(digits, axis=1)  # (K, N)
        dsort = jnp.take_along_axis(digits, order, axis=1)
        queries = jnp.arange(nb, dtype=digits.dtype)
        start = jax.vmap(lambda d: jnp.searchsorted(d, queries, side="left"))(dsort)
        end = jax.vmap(lambda d: jnp.searchsorted(d, queries, side="right"))(dsort)
        cnt = end - start  # (K, nb)
        # exclude bucket 0 from any work (digit 0 contributes nothing)
        cnt = cnt.at[:, 0].set(0)
        return self._bucket_loop(points, order, start, cnt, N)

    def _bucket_scheduled_impl(self, points, order, start, cnt):
        return self._bucket_loop(points, order, start, cnt, order.shape[1])

    def _bucket_scheduled_signed_impl(self, points, order, start, cnt, sgn):
        return self._bucket_loop(
            points, order, start, cnt, order.shape[1], sgn=sgn
        )

    def _bucket_accumulate(self, points, order, start, cnt, N, sgn=None):
        """The O(N) phase alone: returns the raw (K, nb) bucket grid
        after the lockstep gather/add loop, BEFORE alias folding and the
        weighted reduction.  Split out so scale debugging can check
        every bucket sum against host math (each bucket's expected value
        is just the sum of its points)."""
        dev, c, K = self.dev, self.c, self.K
        nb = self.nb
        max_cnt = jnp.max(cnt)

        # data-derived zero keeps loop carries "varying" under shard_map
        # (a replicated init vs varying body output is a type error).
        # Must derive from `points`: argsort indices (`order`) do NOT
        # carry the varying axis, which regressed the multi-chip dryrun
        # in round 2 — the body gathers from points, so its output is
        # varying and the init must be too.
        vzero = (points["x"].reshape(-1)[0] * 0).astype(jnp.uint32)
        acc = dev.identity((K, nb))
        acc = {k: v + vzero for k, v in acc.items()}

        # Pack all coordinate limbs of a point into ONE row padded to a
        # multiple of 128 lanes: the bucket loop's gathers then fetch
        # whole 512B-aligned register rows instead of 96B limb rows —
        # the gather (not the EC math) dominates the loop otherwise.
        # TPU only: XLA:CPU segfaults compiling the packed formulation
        # (observed crashes in backend_compile_and_load / serialize on
        # the bucket program; tests/conftest.py note), so CPU keeps the
        # plain per-coordinate gathers.
        use_packed = (
            self.packed if self.packed is not None else _backend() == "tpu"
        )
        if use_packed:
            coord_shapes = {k: points[k].shape[1:] for k in ("x", "y", "z")}
            flat_parts = [points[k].reshape(N, -1) for k in ("x", "y", "z")]
            widths = [p.shape[1] for p in flat_parts]
            total_w = sum(widths)
            pad_w = (-total_w) % 128
            if pad_w:
                flat_parts.append(
                    jnp.zeros((N, pad_w), dtype=flat_parts[0].dtype)
                )
            packed = jnp.concatenate(flat_parts, axis=1)  # (N, 128k)

        def gather_points(flat_idx):
            if not use_packed:
                return {
                    k: jnp.take(points[k], flat_idx, axis=0)
                    for k in ("x", "y", "z")
                }
            rows = jnp.take(packed, flat_idx, axis=0)
            out = {}
            off = 0
            for k, wdt in zip(("x", "y", "z"), widths):
                out[k] = rows[:, off : off + wdt].reshape(
                    (rows.shape[0],) + coord_shapes[k]
                )
                off += wdt
            return out

        def body(carry):
            s, acc = carry
            pos = jnp.minimum(start + s, N - 1)  # (K, nb)
            pidx = jnp.take_along_axis(order, pos, axis=1)  # (K, nb)
            pts = gather_points(pidx.reshape(-1))
            pts = jax.tree.map(
                lambda a: a.reshape((K, nb) + a.shape[1:]), pts
            )
            if sgn is not None:
                neg = jnp.take_along_axis(sgn, pos, axis=1) != 0  # (K, nb)
                pts["y"] = dev.ops.select(
                    neg, dev.ops.neg(pts["y"]), pts["y"]
                )
            mask = s < cnt
            new = dev.add(acc, pts)
            acc = dev.select(mask, new, acc)
            return (s + 1, acc)

        def cond(carry):
            s, _ = carry
            return s < max_cnt

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))
        return acc

    def _bucket_loop(self, points, order, start, cnt, N, sgn=None):
        acc = self._bucket_accumulate(points, order, start, cnt, N, sgn)
        # data-derived zero for varying-axis init under shard_map (see
        # _bucket_accumulate)
        vzero = (points["x"].reshape(-1)[0] * 0).astype(jnp.uint32)
        acc = self._fold_aliases(acc)
        return self._weighted_reduce(acc, vzero, signed=sgn is not None)

    def _fold_aliases(self, acc):
        """Fold alias lanes (j*m + b -> b) with masked halving adds; lanes
        >= m_k are reset to the identity so the weighted reduction sees
        zero contribution from them."""
        dev, K, nb = self.dev, self.K, self.nb
        min_m = min(self.window_m)
        w = nb
        while w // 2 >= min_m and w > 1:
            half = w // 2
            mask = jnp.asarray(
                np.array(
                    [[m <= half] for m in self.window_m], dtype=bool
                )
            )  # (K, 1): window still has aliases beyond `half`
            lo = {k2: v[:, :half] for k2, v in acc.items()}
            hi = {k2: v[:, half:w] for k2, v in acc.items()}
            ident = dev.identity((K, half))
            folded_lo = dev.select(mask, dev.add(lo, hi), lo)
            folded_hi = dev.select(mask, ident, hi)
            acc = {
                k2: jnp.concatenate(
                    [folded_lo[k2], folded_hi[k2], acc[k2][:, w:]], axis=1
                )
                for k2 in acc
            }
            w = half
        return acc

    def _weighted_reduce(self, acc, vzero, signed: bool):
        dev, K, nb = self.dev, self.K, self.nb
        # weighted bucket reduction sum_b b*S_b, two-level: write the
        # digit b = hi*H + lo (H = 2^(c/2)), so
        #   sum_b b*S_b = H * sum_hi hi*T_hi + sum_lo lo*U_lo,
        #   T_hi = sum_lo S_(hi,lo)  (log-depth tree over the lo axis),
        #   U_lo = sum_hi S_(hi,lo)  (tree over the hi axis),
        # and each small weighted sum runs the classic running-sum
        # recurrence at sqrt(nb) sequential trips instead of nb — 30x
        # fewer sequential EC adds at c=12, and c=16 stays tractable.
        # For signed mode lanes carry weight lane+1 (no dead zero lane):
        #   sum (hi*H + lo + 1) S = H * sum hi*T_hi + sum (lo+1)*U_lo,
        # i.e. the lo-axis recurrence runs one extra trip (offset=1).
        nbits = nb.bit_length() - 1
        cl = nbits // 2
        ch = nbits - cl
        G, Hf = 1 << ch, 1 << cl
        grid = {k: v.reshape((K, G, Hf) + v.shape[2:]) for k, v in acc.items()}

        def tree_sum(pts, axis_len, merge_axis):
            # merge_axis=2 is flattened to an axis-1 chain on a
            # (K*G, Hf) view — raw axis-2 chains miscompile on the
            # round-5 TPU toolchain (xcheck_g2_staged_probe.log).
            if merge_axis == 2:
                lead = pts["x"].shape[0] * pts["x"].shape[1]
                pts = {
                    k: v.reshape((lead, axis_len) + v.shape[3:])
                    for k, v in pts.items()
                }
                out = tree_sum(pts, axis_len, 1)
                return {
                    k: v.reshape((K, lead // K) + v.shape[1:])
                    for k, v in out.items()
                }
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
            return {
                k: jnp.squeeze(v, axis=merge_axis) for k, v in pts.items()
            }

        T_hi = tree_sum(grid, Hf, 2)  # (K, G): sum over lo
        U_lo = tree_sum(grid, G, 1)  # (K, Hf): sum over hi

        def weighted(S, nb_, offset=0):
            """Running-sum recurrence: sum_b (b + offset) * S_b over
            lanes b = nb_-1 .. offset^1 (nb_-1+offset trips)."""
            running = {
                k: v + vzero for k, v in dev.identity((K,)).items()
            }
            total = {k: v + vzero for k, v in dev.identity((K,)).items()}

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

        s_hi = weighted(T_hi, G)
        s_lo = weighted(U_lo, Hf, offset=1 if signed else 0)
        for _ in range(cl):  # s_hi *= H
            s_hi = dev.add(s_hi, s_hi)
        return dev.add(s_hi, s_lo)  # leading axis K

    # ------------------------------------------------- staged TPU pipeline
    # XLA:TPU miscompiles the composed fold/reduce program at wide G2
    # geometries: the bucket grid, the alias fold, and every SINGLE tree
    # level are bit-exact standalone, but >= 6 chained tree-reduction
    # levels in ONE compiled program return wrong limbs — and
    # optimization_barrier between levels does not help, pointing at a
    # whole-program (buffer assignment) defect rather than fusion
    # (benchmarks/xcheck_ulo_levels.log: depth5 PASS, depth6 FAIL,
    # barrier FAIL; xcheck_final_level.log: the same final level from a
    # fresh buffer PASSES).  The single-chip TPU path therefore runs the
    # cheap reduce phases as SEPARATE dispatches (~14 small programs,
    # negligible next to the bucket loop) while CPU and the shard_map
    # path keep the fused formulation.
    def _tree_level(self, pts, axis: int):
        """One halving tree-reduction level along `axis`."""
        dev = self.dev
        t = pts["x"].shape[axis]
        half = t // 2
        lo = {
            k: jax.lax.slice_in_dim(v, 0, half, axis=axis)
            for k, v in pts.items()
        }
        hi = {
            k: jax.lax.slice_in_dim(v, half, t, axis=axis)
            for k, v in pts.items()
        }
        return dev.add(lo, hi)

    def _tree_levels(self, pts, axis: int, levels: int):
        """Up to MAX_FUSED_REDUCE_LEVELS chained halving levels in ONE
        program.  The XLA:TPU miscompile needs >= 6 chained levels
        (depth 5 is the guarded-green side of the bisection, re-checked
        every round by benchmarks/check_tpu_boundaries.py), so grouping
        levels <= 5 per dispatch is inside the validated envelope while
        cutting the staged pipeline's dispatch count ~2-3x — each
        dispatch through the axon relay costs seconds, which round 4
        measured as the dominant prove cost (reduce_windows 946 s vs 86 s
        of actual bucket compute, benchmarks/scale_196608_r4b.log)."""
        for _ in range(levels):
            pts = self._tree_level(pts, axis)
        return pts

    def _weighted_run(self, S, offset: int = 0):
        """sum_b (b + offset) * S_b over the (K, nb_) grid S."""
        dev, K = self.dev, self.K
        nb_ = S["x"].shape[1]
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

    def _final_combine(self, s_hi, s_lo, cl: int):
        dev = self.dev
        for _ in range(cl):  # s_hi *= 2^cl
            s_hi = dev.add(s_hi, s_hi)
        return dev.add(s_hi, s_lo)

    def _staged_windows(self, acc):
        """Host-orchestrated fold + weighted reduction: each phase its
        own compiled program (TPU single-chip path)."""
        K, nb = self.K, self.nb
        acc = self._fold_dbg(acc)
        nbits = nb.bit_length() - 1
        cl = nbits // 2
        ch = nbits - cl
        G, Hf = 1 << ch, 1 << cl
        grid = {
            k: v.reshape((K, G, Hf) + v.shape[2:]) for k, v in acc.items()
        }
        # The lo-axis (axis-2) reduction runs as an axis-1 chain on a
        # (K*G, Hf) view: axis-2 chained tree levels MISCOMPILE on the
        # round-5 toolchain (xcheck_g2_staged_probe.log: axis2 chain
        # 1408/1408 wrong G2 cells, axis1 chain exact — a regression
        # that broke both MSM engines' G2 path while the axis-1-only
        # boundary guard stayed green).
        T_hi = {
            k: v.reshape((K * G, Hf) + v.shape[3:]) for k, v in grid.items()
        }
        while T_hi["x"].shape[1] > 1:
            lv = min(
                MAX_FUSED_REDUCE_LEVELS,
                T_hi["x"].shape[1].bit_length() - 1,
            )
            T_hi = self._tree_levels_st(T_hi, axis=1, levels=lv)
        T_hi = {
            k: v.reshape((K, G) + v.shape[2:]) for k, v in T_hi.items()
        }
        U_lo = grid
        while U_lo["x"].shape[1] > 1:
            lv = min(
                MAX_FUSED_REDUCE_LEVELS,
                U_lo["x"].shape[1].bit_length() - 1,
            )
            U_lo = self._tree_levels_st(U_lo, axis=1, levels=lv)
        U_lo = {k: jnp.squeeze(v, axis=1) for k, v in U_lo.items()}
        s_hi = self._weighted_st(T_hi, offset=0)
        s_lo = self._weighted_st(U_lo, offset=1 if self.signed else 0)
        return self._final_st(s_hi, s_lo, cl)

    # ------------------------------------------------------ heavy buckets
    # Real witness vectors are nothing like uniform: R1CS assignments are
    # dominated by 0/1 bits and small bytes, so a handful of low-window
    # buckets (e.g. digit 1 of window 0) can hold ~half of all points.
    # The lockstep loop's trip count equals the max bucket occupancy —
    # ~100k sequential trips at n=49152, which blows the relay's dispatch
    # watchdog.  A bucket's contribution is just a SUM of its points, so
    # over-occupied buckets are peeled out of the schedule host-side and
    # tree-reduced on device in log depth; their sums re-enter the window
    # totals before the Horner combine.
    HEAVY_CNT = 512  # floor for the peel threshold
    HEAVY_FACTOR = 2  # peel buckets beyond FACTOR * mean occupancy
    TREE_CHUNK = 8192  # points per tree row (13 add levels)
    TREE_ROWS = 8  # rows batched per dispatch

    def _heavy_thresh(self, n_points: int) -> int:
        """Peel threshold: scales with the mean bucket occupancy so a
        uniform-scalar MSM (max ~= mean + 3 sigma < 2*mean) never peels,
        while witness-skewed buckets (~n/2 points in one bucket) always
        do.  The floor keeps tiny MSMs on the pure lockstep path."""
        mean = -(-n_points // self.nb)
        return max(self.HEAVY_CNT, self.HEAVY_FACTOR * mean)

    def _tree_rows_impl(self, points, idx, valid):
        """idx, valid: (R, T) -> (R,) per-row point sums (projective)."""
        dev = self.dev
        R, T = idx.shape
        pts = {
            k: jnp.take(points[k], idx.reshape(-1), axis=0)
            for k in ("x", "y", "z")
        }
        pts = dev.select(valid.reshape(-1), pts, dev.identity((R * T,)))
        pts = jax.tree.map(lambda a: a.reshape((R, T) + a.shape[1:]), pts)
        t = T
        while t > 1:
            half = t // 2
            lo = jax.tree.map(
                lambda a: a[:, :half].reshape((R * half,) + a.shape[2:]), pts
            )
            hi = jax.tree.map(
                lambda a: a[:, half:t].reshape((R * half,) + a.shape[2:]), pts
            )
            s = dev.add(lo, hi)
            pts = jax.tree.map(lambda a: a.reshape((R, half) + a.shape[1:]), s)
            t = half
        return jax.tree.map(lambda a: a[:, 0], pts)

    def _tree_rows_signed_impl(self, points, idx, valid, neg):
        """Signed variant: negate gathered y where `neg` before summing."""
        dev = self.dev
        R, T = idx.shape
        pts = {
            k: jnp.take(points[k], idx.reshape(-1), axis=0)
            for k in ("x", "y", "z")
        }
        pts["y"] = dev.ops.select(
            neg.reshape(-1), dev.ops.neg(pts["y"]), pts["y"]
        )
        pts = dev.select(valid.reshape(-1), pts, dev.identity((R * T,)))
        pts = jax.tree.map(lambda a: a.reshape((R, T) + a.shape[1:]), pts)
        t = T
        while t > 1:
            half = t // 2
            lo = jax.tree.map(
                lambda a: a[:, :half].reshape((R * half,) + a.shape[2:]), pts
            )
            hi = jax.tree.map(
                lambda a: a[:, half:t].reshape((R * half,) + a.shape[2:]), pts
            )
            s = dev.add(lo, hi)
            pts = jax.tree.map(lambda a: a.reshape((R, half) + a.shape[1:]), s)
            t = half
        return jax.tree.map(lambda a: a[:, 0], pts)

    def _extract_heavy(self, points, order, start, cnt, sgn=None):
        """Peel buckets with cnt > HEAVY_CNT: tree-sum their points on
        device, zero them in the schedule, return [(window, bucket_weight,
        host_point)] corrections.  Mutates cnt in place.  In signed mode
        `sgn` (aligned with order) negates peeled points before summing
        and the correction weight is (folded lane)+1."""
        heavy = np.argwhere(cnt > self._heavy_thresh(order.shape[1]))
        if not len(heavy):
            return []
        T, R = self.TREE_CHUNK, self.TREE_ROWS
        rows = []
        for k, lane in heavy:
            s0, n0 = int(start[k, lane]), int(cnt[k, lane])
            idxs = order[k, s0 : s0 + n0]
            sg = sgn[k, s0 : s0 + n0] if sgn is not None else None
            for lo in range(0, n0, T):
                rows.append(
                    (
                        int(k),
                        int(lane),
                        idxs[lo : lo + T],
                        sg[lo : lo + T] if sg is not None else None,
                    )
                )
            cnt[k, lane] = 0
        sums = {}
        for lo in range(0, len(rows), R):
            batch = rows[lo : lo + R]
            idx = np.zeros((R, T), dtype=np.int32)
            valid = np.zeros((R, T), dtype=bool)
            neg = np.zeros((R, T), dtype=bool)
            for i, (_, _, ids, sg) in enumerate(batch):
                idx[i, : len(ids)] = ids
                valid[i, : len(ids)] = True
                if sg is not None:
                    neg[i, : len(ids)] = sg != 0
            if sgn is None:
                out = self._tree_rows(
                    points, jnp.asarray(idx), jnp.asarray(valid)
                )
            else:
                out = self._tree_rows_s(
                    points,
                    jnp.asarray(idx),
                    jnp.asarray(valid),
                    jnp.asarray(neg),
                )
            host_pts = self.dev.decode_points(out)
            for i, (k, lane, _, _) in enumerate(batch):
                sums[(k, lane)] = self.dev.host_add(
                    sums.get((k, lane)), host_pts[i]
                )
        off = 1 if sgn is not None else 0
        return [
            (k, (lane % self.window_m[k]) + off, pt)
            for (k, lane), pt in sums.items()
            if pt is not None
        ]

    def _host_mul_small(self, w: int, P):
        add = self.dev.host_add
        acc = None
        for bit in reversed(range(w.bit_length())):
            acc = add(acc, acc)
            if (w >> bit) & 1:
                acc = add(acc, P)
        return acc

    # bound on the packed gather SOURCE buffer (bytes).  In round 2, at
    # 2^30 bytes the bucket loop's gather went wrong on TPU: G2 at
    # N=2^20 (1KB packed rows = exactly 2^30) returned wrong window
    # sums while the identical program at 2^18 and G1 at 2^20 (2^29)
    # were exact — consistent with int32 byte-offset arithmetic inside
    # the lowered gather.  Round 4: the miscompile HEALED on the current
    # toolchain — the standing boundary check passes the old bad case
    # (benchmarks/check_tpu_boundaries_r4.log, canary_healed) and a
    # 2^31-byte probe is exact too — so the bound is loosened one notch
    # to 2^30 (halving chunk count); check_tpu_boundaries.py re-checks
    # both sizes every round and a regression shows up as a guard
    # failure there before it can corrupt a proof.  MSMs whose source
    # would exceed this are split into power-of-two chunks that share
    # one compiled program; partial results host-add.
    MAX_GATHER_BYTES = 1 << 30

    def _chunk_rows(self, points) -> int:
        """Largest power-of-two row count whose packed source stays under
        MAX_GATHER_BYTES."""
        row = sum(
            int(np.prod(points[k].shape[1:])) for k in ("x", "y", "z")
        )
        row_bytes = (-(-row // 128) * 128) * 4  # padded to 128 lanes, u32
        limit = max(1, self.MAX_GATHER_BYTES // row_bytes)
        return 1 << (limit.bit_length() - 1)

    # ---------------------------------------------------------------- host
    def run(self, points, scalars, pad_pow2: bool = True):
        """points: device batch (leading N) or list of affine tuples;
        scalars: (N, L) device limbs (canonical) or list of host ints.
        Returns the MSM result as a host affine point (or None).

        pad_pow2 pads N up to a power of two with zero scalars (digit 0
        contributes no bucket work) so different query sizes share ONE
        compiled bucket-phase program — compiles through the axon relay
        cost minutes each, real at proving scale.
        """
        dev = self.dev
        if isinstance(points, (list, tuple)):
            points = dev.encode_points(list(points))
        if isinstance(scalars, (list, tuple)):
            from ..fields.bigint import ints_to_limbs

            L = -(-self.scalar_bits // LIMB_BITS)
            scalars = jnp.asarray(ints_to_limbs(scalars, L))
        n = scalars.shape[0]
        chunk = self._chunk_rows(points)
        if n > chunk:
            res = None
            for lo in range(0, n, chunk):
                part = self.run(
                    {k: v[lo : lo + chunk] for k, v in points.items()},
                    scalars[lo : lo + chunk],
                    pad_pow2=True,
                )
                res = dev.host_add(res, part)
            return res
        if pad_pow2 and n & (n - 1):
            npad = 1 << n.bit_length()
            scalars = jnp.pad(scalars, ((0, npad - n), (0, 0)))
            points = {
                k: jnp.pad(
                    v, ((0, npad - n),) + ((0, 0),) * (v.ndim - 1)
                )
                for k, v in points.items()
            }
        with metrics.timer("msm.host_schedule"):
            limbs_host = np.asarray(jax.device_get(scalars))
            if self.signed:
                order, start, cnt, sgn = self.host_schedule_signed(limbs_host)
            else:
                order, start, cnt = self.host_schedule(limbs_host)
        with metrics.timer("msm.heavy_peel"):
            heavy = self._extract_heavy(
                points, order, start, cnt, sgn if self.signed else None
            )
        metrics.count("msm.points", n)
        metrics.gauge("msm.heavy_buckets", len(heavy))
        # staged dispatches on every backend: they dodge the TPU
        # composed-program miscompile (see _staged_windows) AND keep each
        # XLA:CPU compile small — the fused program's unrolled fold+reduce
        # HLO took 14+ min and multi-GB of compiler memory on CPU.  The
        # fused entries remain for the shard_map path (_bucket_phase).
        with metrics.timer("msm.bucket_phase"):
            order_d, start_d, cnt_d = (
                jnp.asarray(order),
                jnp.asarray(start),
                jnp.asarray(cnt),
            )
            if self.signed:
                acc = self._bucket_acc_s(
                    points, order_d, start_d, cnt_d, jnp.asarray(sgn)
                )
            else:
                acc = self._bucket_acc(points, order_d, start_d, cnt_d)
            acc["x"].block_until_ready()
        with metrics.timer("msm.reduce_windows"):
            windows = self._staged_windows(acc)
            wpts = dev.decode_points(windows)
        with metrics.timer("msm.host_combine"):
            res = self._combine_host(wpts)
            for k, b, pt in heavy:
                res = dev.host_add(
                    res, self._host_mul_small(b << (k * self.c), pt)
                )
        return res

    def _combine_host(self, wpts):
        """Horner combine of the K window sums: sum_k 2^(kc) W_k."""
        add = self.dev.host_add
        acc = None
        for w in reversed(wpts):
            for _ in range(self.c):
                acc = add(acc, acc)
            acc = add(acc, w)
        return acc


def msm_host(curve, points, scalars):
    """Exact host Pippenger-free reference (tests only)."""
    acc = None
    for P, s in zip(points, scalars):
        acc = curve.add(acc, curve.mul(s, P))
    return acc
