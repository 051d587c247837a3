"""Balanced-lane Pippenger MSM: skew-proof bucket accumulation on TPU.

Round-4 postmortem (benchmarks/scale_196608_r4.log, probe_dispatch_r5.log):
the lockstep bucket loop's trip count equals the MAX bucket occupancy,
but real Groth16 witness vectors are dominated by 0/1 bits and small
bytes, so a handful of buckets hold ~half of all points — the loop
either runs ~100k wasted lockstep trips or peels heavy buckets into a
separate host-driven tree pass (418s of the 1409s flagship prove).

This engine makes the trip count independent of skew:

  * the (K, nb) bucket grid keeps ONE lane per bucket, processing at
    most T points of that bucket's sorted run;
  * buckets with more than T points get extra lanes from a static
    overflow pool of E lanes, buddy-allocated in power-of-two aligned
    segments, each lane processing at most T points;
  * ONE lockstep while_loop covers grid + overflow lanes together
    (T+1 trips total, T = ceil-balanced so everything fits);
  * overflow segments fold to their head lane with log2(max segment)
    masked partner adds (host-precomputed index/mask planes, a single
    while_loop program over stacked levels);
  * folded overflow heads merge into the grid with one gather + add;
  * the existing staged window reduction (fold-free: no top-window
    aliasing — overflow subsumes it) and host Horner combine finish.

Total device work ~= active point adds + E + K*nb, vs. the lockstep
engine's trips * K * nb (~94% waste on witness data).  The reference
gets its MSMs from ark-ec's rayon Pippenger (SURVEY.md §2.2, §3.4);
this is the TPU-native replacement for proving-scale MSMs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bigint import LIMB_BITS
from ..utils import metrics
from .msm import MSM


class BalancedMSM(MSM):
    """Skew-balanced Pippenger engine (large MSMs; policy-selected).

    Shares window geometry, the staged window reduction, chunking
    bounds, and the host Horner combine with `MSM`; replaces the
    scheduling + bucket accumulation.
    """

    # overflow lane pool (per chunk).  Demand is ~active_points / T;
    # the scheduler picks the smallest T whose demand fits, so E only
    # bounds how small T can get.  Rows are 512B (G1) / 1KB (G2)
    # packed, so 2^16 lanes = 32/64 MB.
    OVERFLOW_LANES = 1 << 16

    def __init__(self, dev, scalar_bits: int, c: int = 16, signed: bool = True,
                 overflow_lanes: int | None = None):
        super().__init__(dev, scalar_bits, c, signed=signed, packed=None)
        # overflow subsumes top-window aliasing: lanes map 1:1 to digit
        # values, empty high lanes of the top window just stay identity.
        self.window_m = [self.nb] * self.K
        self.E = overflow_lanes or self.OVERFLOW_LANES
        self.LMAX = self.E.bit_length() - 1
        # pad floor: remember the largest padded size this engine has
        # compiled for and pad smaller runs up to it, so e.g. the
        # verifier's 2^18 public-input MSM reuses the prover's 2^20
        # programs instead of paying a fresh ~60s relay compile set
        # (benchmarks/probe_dispatch_r5.log; VERDICT.md weak#6).
        self._pad_floor = 0
        self._lane_loop = jax.jit(self._lane_loop_impl)
        self._fold_merge = jax.jit(self._fold_merge_impl)
        self._combine_dev = jax.jit(self._combine_dev_impl)

    # ---------------------------------------------------------- scheduling
    def _digits_all(self, arr: np.ndarray):
        """(N, L) canonical limbs -> per-window bucket lane + sign.

        Returns (lane, sign): lane[k] in [0, nb) or nb (= dead: digit 0)
        and sign[k] (bool, signed mode only; False otherwise).
        """
        K, c, nb = self.K, self.c, self.nb
        N = arr.shape[0]
        padded = np.concatenate(
            [arr.astype(np.int64), np.zeros((N, 2), dtype=np.int64)], axis=1
        )
        lane = np.empty((K, N), dtype=np.int64)
        sign = np.zeros((K, N), dtype=bool)
        if self.signed:
            half = 1 << (c - 1)
            carry = np.zeros(N, dtype=np.int64)
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
                lane[k] = np.where(mag > 0, mag - 1, nb)
        else:
            for k in range(K):
                bit = k * c
                li, off = bit // LIMB_BITS, bit % LIMB_BITS
                d = padded[:, li] >> off
                if off:
                    d |= padded[:, li + 1] << (LIMB_BITS - off)
                d = d & (nb - 1)
                # unsigned: digit d lands on lane d (weight = lane
                # index, matching the parent's weighted reduction);
                # digit 0 is dead (weight 0)
                lane[k] = np.where(d > 0, d, nb)
        return lane, sign

    def schedule(self, scalars_limbs):
        """Host schedule -> dict of device-ready numpy arrays.

        Produces, for P = K*nb + E lanes:
          base  (P,) int32 : lane's start offset into the flat sorted
                             order array (k*N + position)
          lcnt  (P,) int32 : points this lane processes
          order (K*N,) int32 : per-window stable sort of point indices
          sgn   (K*N,) int8  : negate flag aligned with order
          fold_idx (LMAX, E) int32, fold_mask (LMAX, E) bool
          merge_idx (K*nb,) int32, merge_mask (K*nb,) bool
          trips int : lockstep trip count (= T)
        """
        arr = np.asarray(scalars_limbs)
        K, c, nb, E = self.K, self.c, self.nb, self.E
        N = arr.shape[0]

        from . import msm_sched_native

        nat = msm_sched_native.schedule(arr, K, c, self.signed)
        if nat is not None:
            order, sgn, counts = nat
            starts = np.zeros((K, nb), dtype=np.int64)
            starts[:, 1:] = np.cumsum(counts, axis=1)[:, :-1]
        else:
            lane, sign = self._digits_all(arr)
            order = np.empty((K, N), dtype=np.int32)
            sgn = np.zeros((K, N), dtype=np.int8)
            counts = np.zeros((K, nb), dtype=np.int64)
            starts = np.zeros((K, nb), dtype=np.int64)
            for k in range(K):
                o = np.argsort(lane[k], kind="stable").astype(np.int32)
                if self.signed:
                    sgn[k] = sign[k][o]
                order[k] = o
                cc = np.bincount(
                    np.minimum(lane[k], nb), minlength=nb + 1
                )[:nb]
                counts[k] = cc
                starts[k] = np.concatenate(([0], np.cumsum(cc)[:-1]))

        active = counts.sum()
        # ---- pick T: smallest trip count whose overflow demand fits E.
        # demand(T) = sum over buckets of next_pow2(ceil(cnt/T) - 1)
        flat_cnt = counts.reshape(-1)
        nz = flat_cnt[flat_cnt > 0]

        def demand(T):
            extra = -(-nz // T) - 1  # lanes beyond the grid lane
            extra = extra[extra > 0]
            if not len(extra):
                return 0
            # round up to power of two for aligned buddy placement
            p2 = 1 << np.ceil(np.log2(extra)).astype(np.int64)
            return int(p2.sum())

        max_cnt = int(nz.max()) if len(nz) else 1
        lo_T = max(1, int(-(-active // (K * nb + E))))
        T = max_cnt
        lo, hi = lo_T, max_cnt
        while lo < hi:
            mid = (lo + hi) // 2
            if demand(mid) <= E:
                hi = mid
            else:
                lo = mid + 1
        T = max(1, lo)

        # ---- lane assignment
        P = K * nb + E
        base = np.zeros(P, dtype=np.int64)
        lcnt = np.zeros(P, dtype=np.int64)
        # grid lanes: first min(cnt, T) points of each bucket
        flat_start = (starts + (np.arange(K) * N)[:, None]).reshape(-1)
        base[: K * nb] = flat_start
        lcnt[: K * nb] = np.minimum(flat_cnt, T)

        # overflow segments: buckets with cnt > T, largest first
        seg_size = np.zeros(E, dtype=np.int64)  # pow2 segment size per lane
        merge_idx = np.zeros(K * nb, dtype=np.int32)
        merge_mask = np.zeros(K * nb, dtype=bool)
        ovf = np.nonzero(flat_cnt > T)[0]
        if len(ovf):
            extra = -(-flat_cnt[ovf] // T) - 1
            p2 = (1 << np.ceil(np.log2(extra)).astype(np.int64))
            ordr = np.argsort(-p2, kind="stable")
            pos = 0
            for j in ordr:
                b, L = int(ovf[j]), int(p2[j])
                assert pos % L == 0 and pos + L <= E, "overflow pool overflow"
                cnt_b = int(flat_cnt[b])
                rem = cnt_b - T  # points beyond the grid lane
                nlanes = int(extra[j])
                per = -(-rem // nlanes)
                off = int(flat_start[b]) + T
                for i in range(nlanes):
                    take = min(per, rem)
                    base[K * nb + pos + i] = off
                    lcnt[K * nb + pos + i] = take
                    off += take
                    rem -= take
                seg_size[pos : pos + L] = L
                merge_idx[b] = pos
                merge_mask[b] = True
                pos += L

        # ---- fold planes: level j partners lane i with i + 2^j when the
        # segment is larger than 2^j and bit j of the in-segment offset
        # is clear (aligned pow2 segments make the partner in-segment).
        i_arr = np.arange(E, dtype=np.int64)
        fold_idx = np.empty((self.LMAX, E), dtype=np.int32)
        fold_mask = np.zeros((self.LMAX, E), dtype=bool)
        nlev = 0
        if len(ovf):
            nlev = int(np.max(seg_size)).bit_length() - 1
        for j in range(self.LMAX):
            m = (seg_size > (1 << j)) & (((i_arr >> j) & 1) == 0)
            fold_idx[j] = np.where(m, i_arr + (1 << j), i_arr).astype(np.int32)
            fold_mask[j] = m

        trips = int(max(lcnt.max(), 1))
        metrics.gauge("msm.balanced_trips", trips)
        metrics.gauge("msm.balanced_overflow_lanes", float(seg_size.sum()))
        return {
            "base": base.astype(np.int32),
            "lcnt": lcnt.astype(np.int32),
            "order": order.reshape(-1),
            "sgn": sgn.reshape(-1),
            "fold_idx": fold_idx,
            "fold_mask": fold_mask,
            "merge_idx": merge_idx,
            "merge_mask": merge_mask,
            "nlev": nlev,
            "trips": trips,
        }

    # -------------------------------------------------------------- device
    def _lane_loop_impl(self, points, base, lcnt, order, sgn):
        """Lockstep accumulation over all P = K*nb + E lanes.

        points: {x,y,z} leading-N batch; base/lcnt: (P,); order/sgn:
        (K*N,).  Returns (P,)-batch of lane partial sums.
        """
        dev = self.dev
        P = base.shape[0]
        total = order.shape[0]

        # pack coordinates into 128-lane-aligned rows (same trick as
        # MSM._bucket_accumulate; gathers fetch whole aligned rows).
        # TPU only: XLA:CPU segfaults compiling the packed formulation
        # (see MSM._bucket_accumulate), so CPU keeps plain gathers.
        from .msm import _backend

        use_packed = self.packed if self.packed is not None else _backend() == "tpu"
        N = points["x"].shape[0]
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
            packed = jnp.concatenate(flat_parts, axis=1)

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

        vzero = (points["x"].reshape(-1)[0] * 0).astype(jnp.uint32)
        acc = dev.identity((P,))
        acc = {k: v + vzero for k, v in acc.items()}
        max_cnt = jnp.max(lcnt)

        def body(carry):
            s, acc = carry
            pos = jnp.minimum(base + s, total - 1)  # (P,)
            pidx = jnp.take(order, pos)
            pts = gather_points(pidx)
            neg = jnp.take(sgn, pos) != 0
            pts["y"] = dev.ops.select(neg, dev.ops.neg(pts["y"]), pts["y"])
            mask = s < lcnt
            acc = dev.select(mask, dev.add(acc, pts), acc)
            return (s + 1, acc)

        _, acc = jax.lax.while_loop(
            lambda c: c[0] < max_cnt, body, (jnp.int32(0), acc)
        )
        return acc

    def _fold_merge_impl(self, lanes, fold_idx, fold_mask, nlev, merge_idx,
                         merge_mask):
        """Fold overflow segments and merge heads into the bucket grid.

        lanes: (P,) partial sums from _lane_loop.  Returns the (K, nb)
        bucket grid ready for the staged window reduction.
        """
        dev, K, nb, E = self.dev, self.K, self.nb, self.E
        grid = {k: v[: K * nb] for k, v in lanes.items()}
        ovf = {k: v[K * nb :] for k, v in lanes.items()}

        def body(carry):
            j, ovf = carry
            idx = jax.lax.dynamic_index_in_dim(fold_idx, j, keepdims=False)
            msk = jax.lax.dynamic_index_in_dim(fold_mask, j, keepdims=False)
            partner = {k: jnp.take(v, idx, axis=0) for k, v in ovf.items()}
            ovf = dev.select(msk, dev.add(ovf, partner), ovf)
            return (j + 1, ovf)

        _, ovf = jax.lax.while_loop(
            lambda c: c[0] < nlev, body, (jnp.int32(0), ovf)
        )
        heads = {k: jnp.take(v, merge_idx, axis=0) for k, v in ovf.items()}
        grid = dev.select(merge_mask, dev.add(grid, heads), grid)
        return {k: v.reshape((K, nb) + v.shape[1:]) for k, v in grid.items()}

    def _combine_dev_impl(self, windows):
        """Device Horner combine of the K window sums: sum_k 2^(kc) W_k.

        Replaces the host bigint Horner (~2.5s/call at K=16, c=16 —
        probe_dispatch_r5.log host_combine) with one small program of
        K*(c+1) chained batch-1 adds.
        """
        dev, K, c = self.dev, self.K, self.c

        def body(i, acc):
            for _ in range(c):
                acc = dev.add(acc, acc)
            Wi = {
                k: jax.lax.dynamic_index_in_dim(
                    windows[k], K - 1 - i, axis=0, keepdims=True
                )
                for k in windows
            }
            return dev.add(acc, Wi)

        acc = dev.identity((1,))
        vzero = (windows["x"].reshape(-1)[0] * 0).astype(jnp.uint32)
        acc = {k: v + vzero for k, v in acc.items()}
        return jax.lax.fori_loop(0, K, body, acc)

    # ---------------------------------------------------------------- host
    def run(self, points, scalars, pad_pow2: bool = True):
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
        if pad_pow2:
            npad = 1 << (n - 1).bit_length() if n > 1 else 1
            npad = min(chunk, max(npad, self._pad_floor))
            self._pad_floor = npad
            if npad > n:
                scalars = jnp.pad(scalars, ((0, npad - n), (0, 0)))
                points = {
                    k: jnp.pad(v, ((0, npad - n),) + ((0, 0),) * (v.ndim - 1))
                    for k, v in points.items()
                }
        with metrics.timer("msm.host_schedule"):
            limbs_host = np.asarray(jax.device_get(scalars))
            sch = self.schedule(limbs_host)
        metrics.count("msm.points", n)
        with metrics.timer("msm.bucket_phase"):
            lanes = self._lane_loop(
                points,
                jnp.asarray(sch["base"]),
                jnp.asarray(sch["lcnt"]),
                jnp.asarray(sch["order"]),
                jnp.asarray(sch["sgn"]),
            )
            lanes["x"].block_until_ready()
        with metrics.timer("msm.reduce_windows"):
            grid = self._fold_merge(
                lanes,
                jnp.asarray(sch["fold_idx"]),
                jnp.asarray(sch["fold_mask"]),
                jnp.int32(sch["nlev"]),
                jnp.asarray(sch["merge_idx"]),
                jnp.asarray(sch["merge_mask"]),
            )
            windows = self._staged_windows_nofold(grid)
        with metrics.timer("msm.host_combine"):
            res = self._combine_dev(windows)
            return dev.decode_points(res)[0]

    def _staged_windows_nofold(self, grid):
        """Staged weighted reduction, skipping the alias fold (overflow
        segments already merged; empty top-window lanes are identity)."""
        K, nb = self.K, self.nb
        nbits = nb.bit_length() - 1
        cl = nbits // 2
        ch = nbits - cl
        G, Hf = 1 << ch, 1 << cl
        g = {k: v.reshape((K, G, Hf) + v.shape[2:]) for k, v in grid.items()}
        from .msm import MAX_FUSED_REDUCE_LEVELS

        # lo-axis reduction as an axis-1 chain on a (K*G, Hf) view:
        # axis-2 chains miscompile on the round-5 toolchain (see
        # MSM._staged_windows and xcheck_g2_staged_probe.log).
        T_hi = {
            k: v.reshape((K * G, Hf) + v.shape[3:]) for k, v in g.items()
        }
        while T_hi["x"].shape[1] > 1:
            lv = min(MAX_FUSED_REDUCE_LEVELS, T_hi["x"].shape[1].bit_length() - 1)
            T_hi = self._tree_levels_st(T_hi, axis=1, levels=lv)
        T_hi = {
            k: v.reshape((K, G) + v.shape[2:]) for k, v in T_hi.items()
        }
        U_lo = g
        while U_lo["x"].shape[1] > 1:
            lv = min(MAX_FUSED_REDUCE_LEVELS, U_lo["x"].shape[1].bit_length() - 1)
            U_lo = self._tree_levels_st(U_lo, axis=1, levels=lv)
        U_lo = {k: jnp.squeeze(v, axis=1) for k, v in U_lo.items()}
        s_hi = self._weighted_st(T_hi, offset=0)
        s_lo = self._weighted_st(U_lo, offset=1 if self.signed else 0)
        return self._final_st(s_hi, s_lo, cl)
