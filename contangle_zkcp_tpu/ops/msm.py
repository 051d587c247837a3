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

    def __init__(self, dev: SWDevice, scalar_bits: int, c: int = 8):
        self.dev = dev
        self.c = c
        self.scalar_bits = scalar_bits
        self.K = -(-scalar_bits // c)
        self._bucket_phase = jax.jit(self._bucket_phase_impl)

    # -------------------------------------------------------------- device
    def _bucket_phase_impl(self, points, digits):
        """points: {x,y,z} with leading N axis; digits: (K, N) uint32.

        Returns window sums: point batch with leading K axis.
        """
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
        max_cnt = jnp.max(cnt)

        # data-derived zero keeps loop carries "varying" under shard_map
        # (a replicated init vs varying body output is a type error)
        vzero = (digits[0, 0] * 0).astype(jnp.uint32)
        acc = dev.identity((K, nb))
        acc = {k: v + vzero for k, v in acc.items()}

        # Pack all coordinate limbs of a point into ONE row padded to a
        # multiple of 128 lanes: the bucket loop's gathers then fetch
        # whole 512B-aligned register rows instead of 96B limb rows —
        # the gather (not the EC math) dominates the loop otherwise.
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
            mask = s < cnt
            new = dev.add(acc, pts)
            acc = dev.select(mask, new, acc)
            return (s + 1, acc)

        def cond(carry):
            s, _ = carry
            return s < max_cnt

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), acc))

        # weighted bucket reduction sum_b b*S_b via the classic running-sum
        # recurrence (fori_loop keeps the traced graph to 2 EC adds; the K
        # windows still add in parallel lanes):
        #   for b = nb-1 .. 1: running += S_b; total += running
        running = {k: v + vzero for k, v in dev.identity((K,)).items()}
        total = {k: v + vzero for k, v in dev.identity((K,)).items()}

        def rbody(i, carry):
            running, total = carry
            b = nb - 1 - i
            Sb = {k: jax.lax.dynamic_index_in_dim(acc[k], b, axis=1, keepdims=False) for k in acc}
            running = dev.add(running, Sb)
            total = dev.add(total, running)
            return (running, total)

        _, total = jax.lax.fori_loop(0, nb - 1, rbody, (running, total))
        return total  # leading axis K

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
        if pad_pow2 and n & (n - 1):
            npad = 1 << n.bit_length()
            scalars = jnp.pad(scalars, ((0, npad - n), (0, 0)))
            points = {
                k: jnp.pad(
                    v, ((0, npad - n),) + ((0, 0),) * (v.ndim - 1)
                )
                for k, v in points.items()
            }
        digits = digits_from_limbs(scalars, self.c, self.K)
        windows = self._bucket_phase(points, digits)
        wpts = dev.decode_points(windows)
        return self._combine_host(wpts)

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
