"""Batch-affine tree-reduction MSM — the round-4 bucket-phase engine.

The round-2/3 engine (`ops/msm.py`) accumulates buckets with a lockstep
while_loop of complete projective (RCB, 12-mul) additions: trip count =
max bucket occupancy, so the Poisson tail wastes ~40-70% of lanes and a
witness-skewed bucket had to be peeled out host-side.  This engine
replaces the whole accumulation with the formulation a TPU actually
wants (TPU-native counterpart of the bucket phase the reference gets
from ark-ec's rayon Pippenger, /root/reference/circuits-ark/Cargo.toml:39-42):

  * every bucket's points reduce through a balanced pairwise tree in
    AFFINE coordinates (7 field muls per add vs 12, and 2 coordinate
    planes of traffic vs 3);
  * every tree level is one batched step over ALL buckets of ALL
    windows at once, so the one field inversion an affine add needs is
    amortized by `Fp.batch_inv`'s product tree: one ~380-multiply
    Fermat chain PER LEVEL (~log2 occupancy per chunk), not per trip;
  * bucket segments are padded to a power of two and packed in
    descending size order, which makes every level a pure
    `A.reshape(H, 2, W)` pairing — after the single level-0 point
    gather there are NO gathers, NO index arrays and NO scatter in the
    whole phase, and skewed buckets cost log-depth instead of a peel
    pass (heavy-bucket peeling is structurally unnecessary here);
  * level widths are rounded up to a quarter-octave menu
    {4,5,6,7}*2^k so data-dependent schedules reuse a fixed, small set
    of compiled programs (compiles through the axon relay cost
    minutes; see ops/msm.py `run`);
  * the slot array executes in FIXED-SIZE TILES (TILE slots per
    compiled program): on XLA:TPU the compile cost of the
    gather+case-select+pack graphs grows superlinearly with array
    width — a 2^20-slot gather0 took 366 s to compile and ~2^23 slots
    SIGKILLed the compile helper outright
    (benchmarks/xcheck_tree_gather.log), while <= 2^18-wide programs
    compile in tens of seconds.  Tiling bounds every compiled shape:
    one gather0 program, one pair-two-tiles program, and a small menu
    of tail programs, all reused across tiles, levels, chunks and
    runs (jax compilation cache).  Pair structure is tile-local
    because pairs combine adjacent slots and TILE is a power of two.

Completeness is by case flags, not formula: each slot carries a
validity lane; pair addition selects between add / double (equal
points) / cancellation (P + -P -> invalid) / pass-through (one side
invalid), so duplicated CRS points, zero scalars, identity inputs and
adversarial cancellations are all exact.  The window reduction reuses
the staged fold/weighted-reduce dispatches of `MSM` (including the TPU
staged-dispatch workaround, ops/msm.py:492).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import metrics
from .msm import MSM

_U32 = jnp.uint32


def _next_pow2(x: np.ndarray) -> np.ndarray:
    """Elementwise next power of two (0 -> 0, exact powers unchanged)."""
    x = np.asarray(x, dtype=np.int64)
    out = np.zeros_like(x)
    nz = x > 0
    # values are < 2^31; float64 frexp is exact there
    m, e = np.frexp(x[nz].astype(np.float64))
    exact = m == 0.5
    out[nz] = np.where(exact, x[nz], np.left_shift(1, e))
    return out


def _menu_round(x: int) -> int:
    """Round up to {4,5,6,7} * 2^k (quarter-octave menu), min 256 —
    bounds the set of level-step program shapes ever compiled while
    wasting at most 25% of lanes on data-dependent level widths."""
    if x <= 256:
        return 256
    k = (x - 1).bit_length() - 3  # so 2^k * 8 >= x > 2^k * 4 roughly
    for mult in (4, 5, 6, 7, 8):
        cand = mult << k
        if cand >= x:
            return cand
    return 8 << k  # unreachable


class TreeMSM(MSM):
    """Pippenger engine with batch-affine tree bucket accumulation.

    Drop-in for `MSM.run` (same host schedule, same staged window
    reduction, same Horner combine).  `a0_budget_bytes` caps the
    level-0 slot array (K * ~1.5N rows of W u32 lanes) and therefore
    the point chunk size.
    """

    A0_BUDGET_BYTES = 1 << 31
    # slots per compiled device program (see module docstring: larger
    # widths explode XLA:TPU compile time/memory)
    TILE = 1 << 18

    def __init__(self, dev, scalar_bits: int, c: int = 16, signed: bool = True):
        super().__init__(dev, scalar_bits, c=c, signed=signed)
        o = dev.ops
        self._is_fq2 = hasattr(o, "F")
        L = o.F.L if self._is_fq2 else o.L
        self._cw = 2 * L if self._is_fq2 else L  # u32 lanes per coordinate
        w = 2 * self._cw + 1  # x, y, valid flag
        self._W = -(-w // 64) * 64
        self._coord_shape = (2, L) if self._is_fq2 else (L,)
        # shape-keyed jit caches (one compiled program per shape; the
        # tiled path pins shapes to TILE)
        self._pair_jit = jax.jit(self._pair_level_impl)
        self._pair2_jit = jax.jit(self._pair_two_tiles_impl)
        self._gather0_jit = jax.jit(self._gather0_impl)
        self._pack_affine_jit = jax.jit(self._pack_affine_impl)
        self._harvest_jit = jax.jit(self._harvest_impl)
        self._grid_add_jit = jax.jit(self._grid_add_impl)

    # ------------------------------------------------------------ packing
    def _unpack(self, rows):
        """(..., W) u32 -> (x, y, valid) with coord shape appended."""
        cw = self._cw
        x = rows[..., :cw].reshape(rows.shape[:-1] + self._coord_shape)
        y = rows[..., cw : 2 * cw].reshape(rows.shape[:-1] + self._coord_shape)
        v = rows[..., 2 * cw] != 0
        return x, y, v

    def _pack(self, x, y, v):
        batch = v.shape
        parts = [
            x.reshape(batch + (self._cw,)),
            y.reshape(batch + (self._cw,)),
            v.astype(_U32)[..., None],
        ]
        pad = self._W - 2 * self._cw - 1
        if pad:
            parts.append(jnp.zeros(batch + (pad,), _U32))
        return jnp.concatenate(parts, axis=-1)

    def _pack_affine_impl(self, points):
        """Projective {x,y,z} batch -> packed affine rows (N, W).

        One batched inversion of z (5 muls/point, once per chunk);
        z == 0 (identity) rows become invalid slots."""
        o = self.dev.ops
        zinv = o.batch_inv(points["z"])  # zero-preserving
        ax = o.mul(points["x"], zinv)
        ay = o.mul(points["y"], zinv)
        v = ~o.is_zero(points["z"])
        return self._pack(ax, ay, v)

    # ------------------------------------------------------- device steps
    def _gather0_impl(self, packed, idx0, v0, sgn0):
        """Level-0 slot array: gather point rows into tree layout,
        apply per-slot sign (y negation) and slot validity."""
        rows = jnp.take(packed, idx0, axis=0)  # (P0, W)
        x, y, v = self._unpack(rows)
        o = self.dev.ops
        y = o.select(sgn0 != 0, o.neg(y), y)
        v = v & v0
        return self._pack(x, y, v)

    def _pair_core(self, a_rows, b_rows, real):
        """Complete affine pairwise add of row batches under `real`
        mask: add / double / cancellation / pass-through by case flags,
        ONE batched inversion for the whole batch."""
        ax, ay, av = self._unpack(a_rows)
        bx, by, bv = self._unpack(b_rows)
        o = self.dev.ops
        both = av & bv & real
        dx = o.sub(bx, ax)
        dy = o.sub(by, ay)
        zx = o.is_zero(dx)
        zy = o.is_zero(dy)
        dbl = both & zx & zy
        cancel = both & zx & ~zy
        sq = o.square(ax)
        num = o.select(dbl, o.add(o.add(sq, sq), sq), dy)  # 3x^2 | dy
        den = o.select(dbl, o.add(ay, ay), dx)  # 2y | dx
        active = both & ~cancel
        den = o.select(active, den, o.one_mont(av.shape))
        inv = o.batch_inv(den)
        lam = o.mul(num, inv)
        x3 = o.sub(o.sub(o.square(lam), ax), bx)
        y3 = o.sub(o.mul(lam, o.sub(ax, x3)), ay)
        ox = o.select(active, x3, o.select(av, ax, bx))
        oy = o.select(active, y3, o.select(av, ay, by))
        ov = active | ((av ^ bv) & real)
        return self._pack(ox, oy, ov)

    def _pair_level_impl(self, A, n_real):
        """One tree level: pair adjacent slots of A[:2H] (H = len//2).

        n_real (device scalar): pairs beyond it are schedule garbage —
        masked inactive so they cannot mix distinct buckets."""
        H = A.shape[0] // 2
        pairs = A[: 2 * H].reshape(H, 2, A.shape[1])
        real = jnp.arange(H, dtype=jnp.int32) < n_real
        return self._pair_core(pairs[:, 0], pairs[:, 1], real)

    def _pair_two_tiles_impl(self, Ta, Tb, base, n_real):
        """Tiled level step: pair the 2*TILE slots of (Ta | Tb) into one
        TILE-slot output covering global pairs [base, base + TILE).

        Pairing combines adjacent slots, so with power-of-two tiles the
        pair structure never crosses a tile boundary and the whole level
        is tile-pair-local — ONE compiled shape regardless of level
        width (the compile-cost bound; see module docstring)."""
        A = jnp.concatenate([Ta, Tb], axis=0)
        H = A.shape[0] // 2
        pairs = A.reshape(H, 2, A.shape[1])
        real = (base + jnp.arange(H, dtype=jnp.int32)) < n_real
        return self._pair_core(pairs[:, 0], pairs[:, 1], real)

    def _harvest_impl(self, rows_cat, perm):
        """Concatenated finished-bucket rows -> projective (K, nb) grid."""
        K, nb = self.K, self.nb
        grid_rows = jnp.take(rows_cat, perm, axis=0)  # (K*nb, W)
        x, y, v = self._unpack(grid_rows)
        o = self.dev.ops
        one = o.one_mont(v.shape)
        zero = o.zeros(v.shape)
        P = {
            "x": o.select(v, x, zero),
            "y": o.select(v, y, one),
            "z": o.select(v, one, zero),
        }
        return {
            k: p.reshape((K, nb) + self._coord_shape) for k, p in P.items()
        }

    def _grid_add_impl(self, Pa, Pb):
        return self.dev.add(Pa, Pb)

    # ------------------------------------------------------ host schedule
    def _tree_layout(self, start, cnt, order, sgn=None):
        """Build the flat descending-pow2 segment layout + harvest maps.

        Returns (idx0, v0, sgn0, level_pairs [list of real-pair counts],
        harvest [list of (level, slots, dests)], P0m).
        """
        K, nb = self.K, self.nb
        cnt = np.asarray(cnt, dtype=np.int64)
        start = np.asarray(start, dtype=np.int64)
        seg_cnt = cnt.reshape(-1)  # (S,) window-major
        seg_start = start.reshape(-1)
        seg_k = np.repeat(np.arange(K, dtype=np.int64), nb)
        M = _next_pow2(seg_cnt)
        orderseg = np.argsort(-M, kind="stable")
        Ms = M[orderseg]
        cnts = seg_cnt[orderseg]
        starts = seg_start[orderseg]
        ks = seg_k[orderseg]
        off = np.concatenate(([0], np.cumsum(Ms)[:-1]))
        P0 = int(Ms.sum())
        T = self.TILE
        # small schedules: menu widths (single-array path); large ones:
        # whole tiles (fixed-shape tiled path)
        P0m = _menu_round(max(P0, 1)) if P0 <= T else -(-P0 // T) * T

        tot = int(cnts.sum())
        idx0 = np.zeros(P0m, dtype=np.int32)
        v0 = np.zeros(P0m, dtype=bool)
        sgn0 = np.zeros(P0m, dtype=np.int8)
        if tot:
            local = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(cnts)[:-1])), cnts
            )
            slots = np.repeat(off, cnts) + local
            sched = np.repeat(starts, cnts) + local
            kk = np.repeat(ks, cnts)
            order_np = np.asarray(order)
            idx0[slots] = order_np[kk, sched]
            v0[slots] = True
            if sgn is not None:
                sgn0[slots] = np.asarray(sgn)[kk, sched]

        # levels: level l pairs segments with M >= 2^(l+1)
        level_pairs = []
        maxM = int(Ms[0]) if len(Ms) else 0
        depth = maxM.bit_length() - 1 if maxM > 1 else 0
        for lvl in range(depth):
            alive = Ms >= (1 << (lvl + 1))
            prefix_slots = int((Ms[alive] >> lvl).sum())
            level_pairs.append(prefix_slots // 2)

        # harvest: non-empty segment finishes at level log2(M), slot off>>lvl
        # (slots SORTED per level so the tiled path's per-tile gathers
        # concatenate in a deterministic order)
        harvest = {}
        nzi = np.nonzero(cnts > 0)[0]
        fin_lvl = np.zeros(len(Ms), dtype=np.int64)
        fin_lvl[nzi] = np.array(
            [int(Ms[i]).bit_length() - 1 for i in nzi], dtype=np.int64
        )
        dest = ks * nb + (orderseg % nb)  # (K, nb) position of each segment
        for lvl in range(depth + 1):
            sel = nzi[fin_lvl[nzi] == lvl]
            if len(sel):
                slots = (off[sel] >> lvl).astype(np.int64)
                dd = dest[sel].astype(np.int64)
                so = np.argsort(slots, kind="stable")
                harvest[lvl] = (
                    slots[so].astype(np.int32),
                    dd[so].astype(np.int32),
                )
        return idx0, v0, sgn0, level_pairs, harvest, P0m

    # --------------------------------------------------------------- run
    def _chunk_rows(self, points) -> int:
        """Chunk so the level-0 slot array (~2N rows per window, K
        windows, W u32 lanes) stays under A0_BUDGET_BYTES, and the
        packed gather source under MAX_GATHER_BYTES."""
        per_point = 2 * self.K * self._W * 4
        limit = max(1, self.A0_BUDGET_BYTES // per_point)
        gather_limit = max(1, self.MAX_GATHER_BYTES // (self._W * 4))
        limit = min(limit, gather_limit)
        return 1 << (limit.bit_length() - 1)

    def _layout_for_chunk(self, order, start, cnt, sgn=None):
        """Host side of one chunk: tree layout + harvest permutation.

        Returns a dict of device-ready index arrays + the static level
        schedule, so the device phase (`_device_grid`) is replayable —
        bench.py times the device phase alone with the same
        chained-dependency methodology as the lockstep engine."""
        idx0, v0, sgn0, level_pairs, harvest, P0m = self._tree_layout(
            start, cnt, order, sgn
        )
        S = self.K * self.nb
        perm = np.full(S, -1, dtype=np.int64)
        base = 0
        slot_list = []
        for lvl in sorted(harvest):
            slots, dests = harvest[lvl]
            slot_list.append((lvl, slots))  # host np, sorted by slot
            perm[dests] = base + np.arange(len(slots))
            base += len(slots)
        perm[perm < 0] = base
        return {
            "idx0": idx0,
            "v0": v0,
            "sgn0": sgn0,
            "level_pairs": level_pairs,
            "harvest_slots": slot_list,
            "perm": jnp.asarray(perm.astype(np.int32)),
        }

    def _invalid_tile(self):
        if getattr(self, "_inv_tile", None) is None:
            self._inv_tile = jnp.zeros((self.TILE, self._W), _U32)
        return self._inv_tile

    def _device_grid(self, points, layout):
        """Device side of one chunk: pack-affine, tiled gather, tiled
        tree levels (fixed-shape pair2 programs while wide, menu-width
        single-array tail), harvest -> (K, nb) projective bucket grid."""
        packed = self._pack_affine_jit(points)
        T = self.TILE
        idx0, v0, sgn0 = layout["idx0"], layout["v0"], layout["sgn0"]
        P0m = idx0.shape[0]
        if P0m <= T:
            tiles = None
            A = self._gather0_jit(
                packed,
                jnp.asarray(idx0),
                jnp.asarray(v0),
                jnp.asarray(sgn0),
            )
        else:
            tiles = [
                self._gather0_jit(
                    packed,
                    jnp.asarray(idx0[t : t + T]),
                    jnp.asarray(v0[t : t + T]),
                    jnp.asarray(sgn0[t : t + T]),
                )
                for t in range(0, P0m, T)
            ]
            A = None
        levels = [tiles if tiles is not None else A]
        for pairs_real in layout["level_pairs"]:
            if tiles is not None and 2 * pairs_real > T:
                need_in = -(-2 * pairs_real // T)  # input tiles in play
                out = []
                for j in range(-(-need_in // 2)):
                    ta = tiles[2 * j]
                    tb = (
                        tiles[2 * j + 1]
                        if 2 * j + 1 < len(tiles)
                        else self._invalid_tile()
                    )
                    out.append(
                        self._pair2_jit(
                            ta, tb, jnp.int32(j * T), jnp.int32(pairs_real)
                        )
                    )
                tiles = out
                levels.append(tiles)
                continue
            if tiles is not None:
                # collapse to the single-array tail path
                need_in = max(1, -(-2 * pairs_real // T))
                A = (
                    tiles[0]
                    if need_in <= 1
                    else jnp.concatenate(tiles[:need_in], axis=0)
                )
                tiles = None
            Hm = min(_menu_round(max(pairs_real, 1)), A.shape[0] // 2)
            A = self._pair_jit(A[: 2 * Hm], jnp.int32(pairs_real))
            levels.append(A)
        # assemble harvest rows: per-level gathers (split per tile on
        # tiled levels — slots are sorted, so tile groups are contiguous
        # and concat order matches the perm built in the layout), then
        # one permutation gather into window-major (K*nb) order.  Dead
        # buckets point at the trailing invalid row.
        rows = []
        for lvl, slots in layout["harvest_slots"]:
            lv = levels[lvl]
            if isinstance(lv, list):
                bounds = np.searchsorted(
                    slots, np.arange(0, len(lv) + 1) * T
                )
                for g in range(len(lv)):
                    lo, hi = bounds[g], bounds[g + 1]
                    if hi > lo:
                        rows.append(
                            jnp.take(
                                lv[g],
                                jnp.asarray(slots[lo:hi] - g * T),
                                axis=0,
                            )
                        )
            else:
                rows.append(jnp.take(lv, jnp.asarray(slots), axis=0))
        rows.append(jnp.zeros((1, self._W), _U32))  # invalid sentinel
        rows_cat = jnp.concatenate(rows, axis=0) if len(rows) > 1 else rows[0]
        return self._harvest_jit(rows_cat, layout["perm"])

    def _bucket_grid_chunk(self, points, order, start, cnt, sgn=None):
        """One chunk's (K, nb) projective bucket grid."""
        layout = self._layout_for_chunk(order, start, cnt, sgn)
        return self._device_grid(points, layout)

    def run(self, points, scalars, pad_pow2: bool = True):
        dev = self.dev
        if isinstance(points, (list, tuple)):
            points = dev.encode_points(list(points))
        if isinstance(scalars, (list, tuple)):
            from ..fields.bigint import LIMB_BITS, ints_to_limbs

            L = -(-self.scalar_bits // LIMB_BITS)
            scalars = jnp.asarray(ints_to_limbs(scalars, L))
        n = scalars.shape[0]
        if n == 0:
            return None
        chunk = self._chunk_rows(points)
        grid = None
        with metrics.timer("msm.host_schedule"):
            limbs_host = np.asarray(jax.device_get(scalars))
        for lo in range(0, n, chunk):
            pc = {k: v[lo : lo + chunk] for k, v in points.items()}
            sc = limbs_host[lo : lo + chunk]
            m = sc.shape[0]
            if pad_pow2 and m & (m - 1):
                mp = 1 << m.bit_length()
                sc = np.pad(sc, ((0, mp - m), (0, 0)))
                pc = {
                    k: jnp.pad(v, ((0, mp - m),) + ((0, 0),) * (v.ndim - 1))
                    for k, v in pc.items()
                }
            with metrics.timer("msm.host_schedule"):
                if self.signed:
                    order, start, cnt, sgn = self.host_schedule_signed(sc)
                else:
                    order, start, cnt = self.host_schedule(sc)
                    sgn = None
            metrics.count("msm.points", m)
            with metrics.timer("msm.bucket_phase"):
                g = self._bucket_grid_chunk(pc, order, start, cnt, sgn)
                grid = g if grid is None else self._grid_add_jit(grid, g)
        grid["x"].block_until_ready()
        with metrics.timer("msm.reduce_windows"):
            windows = self._staged_windows(grid)
            wpts = dev.decode_points(windows)
        with metrics.timer("msm.host_combine"):
            return self._combine_host(wpts)
