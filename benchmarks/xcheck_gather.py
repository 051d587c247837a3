"""Minimal repro for the >=2^30-byte TPU gather corruption.

Round 2 isolated the n=196,608 proof failure to the G2 Pippenger bucket
phase: identical programs were exact with a 2^29-byte packed gather
source (G1@2^20, G2@2^18) and wrong at 2^30 bytes (G2@2^20, 1024-byte
rows).  This strips away all EC math: build a row-identifying uint32
pattern ON DEVICE (no tunnel transfer), gather rows by random indices —
plain take, take inside a while_loop (the bucket loop's shape), and a
lane-split variant — and verify ON DEVICE against the recomputed
pattern; only a mismatch count and first-bad metadata come to host.

Geometries probe whether the trigger is total source bytes, row bytes,
or row count:
    (2^20, 256)  = 2^30 B, 1024 B rows   <- the failing MSM shape
    (2^21, 128)  = 2^30 B,  512 B rows
    (2^19, 512)  = 2^30 B, 2048 B rows
    (2^20, 128)  = 2^29 B,  512 B rows   <- known-good control
    (2^20, 512)  = 2^31 B, 2048 B rows

Run: PYTHONPATH=/root/repo python -u benchmarks/xcheck_gather.py
"""

import functools
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


def row_pattern(idx, lanes):
    """Expected rows for indices idx: [i*MULT + j for j in range(lanes)]."""
    base = (idx.astype(jnp.uint32) * MULT)[:, None]
    j = jnp.arange(lanes, dtype=jnp.uint32)[None, :]
    return base + j


@functools.partial(jax.jit, static_argnames=("n_rows", "lanes", "mode"))
def run_check(idx, n_rows, lanes, mode):
    src = row_pattern(jnp.arange(n_rows, dtype=jnp.uint32), lanes)
    if mode == "plain":
        got = jnp.take(src, idx, axis=0)
    elif mode == "split":
        half = lanes // 2
        a = jnp.take(src[:, :half], idx, axis=0)
        b = jnp.take(src[:, half:], idx, axis=0)
        got = jnp.concatenate([a, b], axis=1)
    else:  # loop: 8 while_loop trips of idx//8 rows (bucket-loop shape)
        n = idx.shape[0] // 8
        out = jnp.zeros((idx.shape[0], lanes), dtype=jnp.uint32)

        def body(carry):
            s, out = carry
            sl = jax.lax.dynamic_slice_in_dim(idx, s * n, n)
            rows = jnp.take(src, sl, axis=0)
            out = jax.lax.dynamic_update_slice_in_dim(out, rows, s * n, 0)
            return s + 1, out

        _, got = jax.lax.while_loop(
            lambda c: c[0] < 8, body, (jnp.int32(0), out)
        )
    want = row_pattern(idx, lanes)
    bad_rows = (got != want).any(axis=1)
    n_bad = jnp.sum(bad_rows.astype(jnp.int32))
    first_bad = jnp.argmax(bad_rows)  # 0 if none
    return n_bad, first_bad, got[first_bad], want[first_bad]


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    n_idx = 1 << 16
    geoms = [
        (1 << 20, 256),  # 2^30 B, failing MSM shape
        (1 << 21, 128),  # 2^30 B, short rows
        (1 << 19, 512),  # 2^30 B, long rows
        (1 << 20, 128),  # 2^29 B control
        (1 << 20, 512),  # 2^31 B
    ]
    for n_rows, lanes in geoms:
        gib = n_rows * lanes * 4 / (1 << 30)
        print(f"geometry ({n_rows}, {lanes}) = {gib:.1f} GiB:", flush=True)
        idx_np = rng.randint(0, n_rows, size=n_idx).astype(np.int32)
        idx = jnp.asarray(idx_np)
        modes = ["plain", "loop"] + (["split"] if lanes >= 256 else [])
        for mode in modes:
            t0 = time.time()
            n_bad, fb, got_row, want_row = jax.device_get(
                run_check(idx, n_rows, lanes, mode)
            )
            dt = time.time() - t0
            if n_bad:
                print(
                    f"  {mode:6s}: FAIL rows={int(n_bad)}/{n_idx} "
                    f"first_bad_slot={int(fb)} idx={int(idx_np[int(fb)])} "
                    f"got[:4]={got_row[:4].tolist()} "
                    f"want[:4]={want_row[:4].tolist()}",
                    flush=True,
                )
            else:
                print(f"  {mode:6s}: PASS ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
