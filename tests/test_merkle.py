"""Poseidon Merkle tree: host vs device-batched construction + paths."""

import random

from contangle_zkcp_tpu.fields import instances as fi
from contangle_zkcp_tpu.ops.merkle import MerkleTree, build_tree_device, build_tree_host
from contangle_zkcp_tpu.ops.poseidon import PoseidonDevice, PoseidonHost


def test_device_tree_matches_host():
    F = fi.bls12_381_fr()
    host = PoseidonHost(F.p)
    dev = PoseidonDevice(F)
    rng = random.Random(131)
    leaves = [rng.randrange(F.p) for _ in range(16)]
    t_h = build_tree_host(host, leaves)
    t_d = build_tree_device(F, dev, leaves)
    assert t_h.root == t_d.root
    assert t_h.levels == t_d.levels


def test_path_verification():
    F = fi.bls12_381_fr()
    host = PoseidonHost(F.p)
    rng = random.Random(132)
    leaves = [rng.randrange(F.p) for _ in range(8)]
    tree = build_tree_host(host, leaves)
    for idx in (0, 3, 7):
        sib = tree.path(idx)
        assert MerkleTree.verify_host(host, tree.root, idx, leaves[idx], sib)
        # wrong leaf fails
        assert not MerkleTree.verify_host(
            host, tree.root, idx, (leaves[idx] + 1) % F.p, sib
        )


def test_large_tree_device_path_in_service(tmp_path):
    # prepare_public_inputs switches to the device tree for n >= 512
    from contangle_zkcp_tpu.circuits import elgamal
    from contangle_zkcp_tpu.curves import instances as ci
    from contangle_zkcp_tpu.zkcp.sample_entries import ZkSampleEntries
    from contangle_zkcp_tpu.zkcp.zk_encryption import ciphertext_to_bytes

    n = 512
    se = ZkSampleEntries(tmp_path, n, backend="mock")
    params = elgamal.ElGamalParams(curve=ci.JUBJUB, n=n)
    rng = random.Random(133)
    sk, pk = elgamal.keygen(params, rng)
    msg = [rng.randrange(256) for _ in range(n)]
    cipher = elgamal.encrypt(params, pk, msg, elgamal.random_scalar(params, rng))
    [root] = se.prepare_public_inputs(ciphertext_to_bytes(cipher, params))
    from contangle_zkcp_tpu.ops.merkle import build_tree_host
    from contangle_zkcp_tpu.ops.poseidon import PoseidonHost

    exp = build_tree_host(PoseidonHost(params.curve.p), cipher[1]).root
    assert root == exp
