"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import random

import jax
import pytest

from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.curves.weierstrass import SWDevice
from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.msm import MSM, msm_host
from contangle_zkcp_tpu.ops.ntt import NTT
from contangle_zkcp_tpu.parallel import ShardedMSM, ShardedNTT, make_mesh


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_ntt_matches_single_chip():
    F = fi.bls12_381_fr()
    n = 64
    eng = NTT(F, n)
    mesh = make_mesh(8)
    sh = ShardedNTT(eng, mesh)
    rng = random.Random(71)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    a = F.encode(coeffs)
    ev_single = F.decode(eng.forward(a))
    ev_sharded = F.decode(sh.forward(sh.shard(a)))
    assert ev_single == ev_sharded
    back = F.decode(sh.inverse(sh.shard(F.encode(ev_sharded))))
    assert back == coeffs


def test_sharded_msm_matches_host():
    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(72)
    n = 64  # 8 per device
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    msm = MSM(dev, scalar_bits=255, c=4)
    mesh = make_mesh(8)
    smsm = ShardedMSM(msm, mesh)
    got = smsm.run(pts, scalars)
    assert got == msm_host(C, pts, scalars)


@pytest.mark.slow
def test_sharded_msm_dryrun_config():
    """Pins the EXACT dryrun_multichip MSM configuration (c=8, device
    argsort scheduling inside shard_map, 2^14 points, 8-device mesh) so
    a regression in the sharded bucket loop fails here before it fails
    in the driver's dryrun.  Oracle is exact host math: points are
    k_i*G, so the MSM equals (sum k_i*s_i mod r)*G — one host mul.
    (Round 2 regressed exactly this path: argsort indices don't carry
    the shard_map varying axis, so a loop carry seeded from them was
    replicated while the body output was varying.)"""
    from contangle_zkcp_tpu.fields.bigint import ints_to_limbs
    from contangle_zkcp_tpu.ops.fixed_base import FixedBaseDevice

    C = ci.BLS12_381_G1
    F = fi.bls12_381_fq()
    dev = SWDevice(F, C)
    rng = random.Random(74)
    n = 1 << 14
    fb = FixedBaseDevice(dev, C.generator, bits=255, c=8)
    pt_scalars = [rng.randrange(1, C.order) for _ in range(n)]
    pts = fb.mul_ints(pt_scalars)
    scalars = [rng.randrange(C.order) for _ in range(n)]
    scal = jax.numpy.asarray(ints_to_limbs(scalars, 16))
    msm = MSM(dev, scalar_bits=255, c=8)
    mesh = make_mesh(8)
    smsm = ShardedMSM(msm, mesh)
    got = smsm.run(pts, scal)
    total = sum(a * b for a, b in zip(pt_scalars, scalars)) % C.order
    assert got == C.mul(total, C.generator)


def test_four_step_ntt_matches_single_chip():
    """Explicit Bailey four-step with all_to_all exchanges vs the
    single-chip pipeline, 8-device mesh, n=2^10 (n1=n2=32)."""
    from contangle_zkcp_tpu.parallel.ntt_sharded import FourStepNTT

    F = fi.bls12_381_fr()
    n = 1 << 10
    eng = NTT(F, n)
    mesh = make_mesh(8)
    four = FourStepNTT(F, n, mesh, axis=mesh.axis_names[0])
    rng = random.Random(73)
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    a = F.encode(coeffs)
    want = F.decode(eng.forward(a))
    got = F.decode(four.forward(jax.numpy.asarray(a)))
    assert got == want


@pytest.mark.parametrize("signed", [False, True])
def test_sharded_msm_host_scheduled(signed):
    """run_scheduled: host counting-sort per shard + one shard_map
    bucket/reduce program (the round-5 path that drops the per-device
    bitonic argsort).  Exact vs host math, signed and unsigned."""
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.curves.weierstrass import SWDevice

    C = ci.BLS12_381_G1
    dev = SWDevice(fi.bls12_381_fq(), C)
    rng = random.Random(37)
    n = 64
    pts = [C.mul(rng.randrange(1, C.order), C.generator) for _ in range(n)]
    scalars = [rng.randrange(C.order) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    msm = MSM(dev, scalar_bits=255, c=4, signed=signed)
    mesh = make_mesh(8)
    smsm = ShardedMSM(msm, mesh)
    got = smsm.run_scheduled(pts, scalars)
    assert got == msm_host(C, pts, scalars)
