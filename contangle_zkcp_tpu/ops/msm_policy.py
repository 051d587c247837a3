"""MSM engine selection policy: (group, n, backend) -> window config.

Replaces the round-2 env-var knobs (ZKCP_MSM_SIGNED / _SIGNED_C /
_SIGNED_C_G2 read deep inside groth16) with one tested, sized function.
The choices encode measured constraints:

* signed-digit windows (ops/msm.py host_schedule_signed) halve the
  bucket grid and cut windows from ceil(bits/c) to ceil((bits+1)/c) —
  always preferred at scale; unsigned c=8 is kept for small/test MSMs
  because its programs are far cheaper to compile (matters through the
  axon relay, where a compile costs minutes).
* the bucket accumulator grid is K * nb lanes of projective points held
  in HBM during the loop; for G2 (Fq2, 3 coords x 2 x L limbs) a c=16
  grid is GB-scale and crashed the TPU worker at the n=196,608 proof's
  792,330-point B query (benchmarks/scale_196608_r2.log).  The policy
  caps the grid by BUCKET_GRID_BYTES_CAP and asserts the cap holds.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MSMConfig:
    c: int
    signed: bool
    # bucket-accumulation engine: "lockstep" = ops/msm.py projective
    # while_loop; "balanced" = ops/msm_balanced.py skew-balanced lane
    # schedule (overflow segments replace the heavy-bucket peel; the
    # round-5 default at proving scale); "tree" = ops/msm_tree.py
    # batch-affine pairwise tree (opt-in, measured slower in round 4).
    engine: str = "lockstep"


# Hard cap on the bucket accumulator grid (K * nb rows of packed
# projective points).  2^28 bytes leaves room for the packed point
# source plus XLA temporaries on a 16 GB chip; the round-2 crash was a
# c=16 G2 grid at ~1.6 GB.
BUCKET_GRID_BYTES_CAP = 1 << 28

# bytes per projective point, padded the way the bucket loop packs rows
# (ops/msm.py: 3 coords, limb planes, padded to 128 u32 lanes)
_ROW_BYTES = {"g1": 512, "g2": 1024}

SMALL_N = 1 << 16  # below this, compile cost dominates: plain c=8


def grid_bytes(group: str, c: int, signed: bool, scalar_bits: int = 255) -> int:
    """Size of the bucket accumulator grid for a window config."""
    if signed:
        K = -(-(scalar_bits + 1) // c)
        nb = 1 << (c - 1)
    else:
        K = -(-scalar_bits // c)
        nb = 1 << c
    return K * nb * _ROW_BYTES[group]


def msm_config(group: str, n: int, scalar_bits: int = 255) -> MSMConfig:
    """Window config for an n-point MSM over `group` ("g1"|"g2")."""
    assert group in ("g1", "g2"), group
    if n < SMALL_N:
        cfg = MSMConfig(c=8, signed=False)
    elif group == "g1":
        cfg = MSMConfig(c=16, signed=True, engine="balanced")
    else:
        cfg = MSMConfig(c=12, signed=True, engine="balanced")
    assert (
        grid_bytes(group, cfg.c, cfg.signed, scalar_bits)
        <= BUCKET_GRID_BYTES_CAP
    ), f"bucket grid for {group} c={cfg.c} exceeds cap"
    return cfg
