"""MSM engine selection policy (ops/msm_policy.py)."""

import pytest

from contangle_zkcp_tpu.ops.msm_policy import (
    BUCKET_GRID_BYTES_CAP,
    MSMConfig,
    grid_bytes,
    msm_config,
)


def test_small_msms_use_plain_c8():
    for group in ("g1", "g2"):
        for n in (1, 100, (1 << 16) - 1):
            assert msm_config(group, n) == MSMConfig(c=8, signed=False)


def test_large_g1_uses_signed_c16_balanced():
    assert msm_config("g1", 1 << 16) == MSMConfig(
        c=16, signed=True, engine="balanced"
    )
    assert msm_config("g1", 792330) == MSMConfig(
        c=16, signed=True, engine="balanced"
    )


def test_large_g2_capped_at_c12():
    # G2 rows are 4x G1 bytes; c=16 would put the bucket grid at
    # ~GB-scale (the round-2 TPU worker crash) — policy caps at c=12.
    cfg = msm_config("g2", 792330)
    assert cfg == MSMConfig(c=12, signed=True, engine="balanced")
    assert grid_bytes("g2", cfg.c, cfg.signed) <= BUCKET_GRID_BYTES_CAP
    assert grid_bytes("g2", 16, True) > BUCKET_GRID_BYTES_CAP


def test_all_policy_outputs_respect_grid_cap():
    for group in ("g1", "g2"):
        for n in (1, 1 << 10, 1 << 16, 1 << 20, 1 << 24):
            cfg = msm_config(group, n)
            assert (
                grid_bytes(group, cfg.c, cfg.signed)
                <= BUCKET_GRID_BYTES_CAP
            )


def test_unknown_group_rejected():
    with pytest.raises(AssertionError):
        msm_config("gt", 100)


def test_grid_bytes_formula():
    # unsigned c=8, 255-bit scalars: K=32 windows, 256 lanes, 512 B G1
    # rows -> 4 MiB
    assert grid_bytes("g1", 8, False) == 32 * 256 * 512
    # signed c=12: K=ceil(256/12)=22, 2^11 lanes, 1024 B G2 rows
    assert grid_bytes("g2", 12, True) == 22 * 2048 * 1024
