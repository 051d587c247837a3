"""Full ZKCP protocol end-to-end: compile -> sell -> buy over real HTTP,
with the mock snark backend (fast, satisfiability-checked) and MockChain.

The real-Groth16 end-to-end runs via the TPU drive scripts / bench (too
slow for CPU unit tests); the prover itself is covered by test_groth16.
"""

import asyncio
import random

import pytest

from contangle_zkcp_tpu.circuits import elgamal
from contangle_zkcp_tpu.curves import instances as ci
from contangle_zkcp_tpu.zkcp import (
    Buyer,
    BuyerConfig,
    CircomParams,
    LocalWallet,
    Seller,
    SellerConfig,
    ZkConfig,
    ZkSampleEntries,
    ZkVerifiableEncryption,
)
from contangle_zkcp_tpu.zkcp.cipher_host import EphemeralHost, LocalHost
from contangle_zkcp_tpu.zkcp.client import SellerClient
from contangle_zkcp_tpu.zkcp.ethereum import MockChain
from contangle_zkcp_tpu.zkcp.server import SellerServer
from contangle_zkcp_tpu.zkcp.zk_encryption import ZkEncryption

N = 16
PRICE = 0.25


def _mk_cfg(tmp_path, backend="mock"):
    cfg = ZkConfig(
        prop_verifier_dir=str(tmp_path / "prop"),
        data_encryption_dir=str(tmp_path / "data_enc"),
        data_encryption_limit=N,
        key_encryption_dir=str(tmp_path / "key_enc"),
        circom_params=CircomParams(),
        backend=backend,
    )
    # compile artifacts
    ve = ZkVerifiableEncryption(
        cfg.data_encryption_dir,
        ZkSampleEntries(cfg.prop_verifier_dir, N, backend=backend),
        elgamal.ElGamalParams(curve=ci.JUBJUB, n=N),
        backend=backend,
    )
    ve.compile()
    ZkEncryption(cfg.key_encryption_dir, backend=backend).compile()
    return cfg


def test_verifiable_encryption_roundtrip(tmp_path):
    cfg = _mk_cfg(tmp_path)
    verifier = ZkSampleEntries(cfg.prop_verifier_dir, N, backend="mock")
    ve_svc = ZkVerifiableEncryption(
        cfg.data_encryption_dir,
        verifier,
        elgamal.ElGamalParams(curve=ci.JUBJUB, n=N),
        backend="mock",
    )
    sk, pk = ve_svc.keygen(random.Random(61))
    data = bytes([1, 2, 3, 4, 5])
    ve = ve_svc.assess_property_and_encrypt(data, sk, pk, random.Random(62))
    assert ve_svc.verify_proof(ve)
    # decrypt round-trips the data bytes
    from contangle_zkcp_tpu.utils import serialize as ser

    sk_bytes = ser.fp_to_bytes(sk, ci.JUBJUB.order)
    assert ve_svc.decrypt(sk_bytes, ve.ciphertext) == data
    # tampered ciphertext fails verification
    bad = type(ve)(
        ciphertext=ve.ciphertext[:-1] + bytes([ve.ciphertext[-1] ^ 1]),
        proof_of_encryption=ve.proof_of_encryption,
        proofs_of_property=ve.proofs_of_property,
    )
    try:
        ok = ve_svc.verify_proof(bad)
    except Exception:
        ok = False
    assert not ok


def test_zkcp_protocol_end_to_end(tmp_path):
    cfg = _mk_cfg(tmp_path)
    chain = MockChain()
    # must fit in n=16 blocks (1 byte/block, direct chunking truncates
    # beyond data_encryption_limit — reference behavior)
    data = b"secret dataset!!"

    seller_wallet = LocalWallet.new(random.Random(63))
    buyer_wallet = LocalWallet.new(random.Random(64))

    host = LocalHost(tmp_path / "hosted")
    seller = Seller(
        SellerConfig(price=PRICE, cache_dir=str(tmp_path / "cache"), zk=cfg),
        chain,
        host,
        ZkSampleEntries(cfg.prop_verifier_dir, N, backend="mock"),
        seller_wallet,
    )
    seller.step0_setup(data)
    # restart resilience: key cached to disk
    assert (tmp_path / "cache" / "decryption_key").exists()

    async def scenario():
        server = SellerServer(seller, PRICE, port=0)
        await server.start()
        actor = asyncio.create_task(seller.run())
        loop = asyncio.get_event_loop()

        def buyer_flow():
            client = SellerClient(f"http://127.0.0.1:{server.port}")
            assert client.price() == PRICE
            buyer = Buyer(
                BuyerConfig(zk=cfg),
                chain,
                ZkSampleEntries.new_verifier(cfg.prop_verifier_dir, N, backend="mock"),
                buyer_wallet,
            )
            ve = client.download()
            assert buyer.step0_verify(ve)
            step1 = client.step1(chain.address_from_pk(buyer_wallet.pub_key()))
            enc_sig = buyer.step2(
                step1.ciphertext,
                step1.proof_of_encryption,
                step1.data_pk,
                step1.seller_address,
                PRICE,
            )
            tx_hash = client.step3(buyer_wallet.pub_key(), enc_sig)
            return buyer, ve, tx_hash

        buyer, ve, tx_hash = await loop.run_in_executor(None, buyer_flow)
        plaintext = await buyer.step4(tx_hash, ve.ciphertext)
        server.close()
        actor.cancel()
        return plaintext

    plaintext = asyncio.run(scenario())
    assert plaintext == data
    # seller got paid
    seller_addr = chain.address_from_pk(seller_wallet.pub_key())
    assert chain.balances.get(seller_addr) == int(PRICE * 10**18)


def test_step3_rejects_bad_adaptor_sig(tmp_path):
    cfg = _mk_cfg(tmp_path)
    chain = MockChain()
    seller_wallet = LocalWallet.new(random.Random(65))
    buyer_wallet = LocalWallet.new(random.Random(66))
    host = EphemeralHost()
    seller = Seller(
        SellerConfig(price=PRICE, cache_dir=str(tmp_path / "cache"), zk=cfg),
        chain,
        host,
        ZkSampleEntries(cfg.prop_verifier_dir, N, backend="mock"),
        seller_wallet,
    )
    seller.step0_setup(b"data")
    step1 = seller.handle_step1(chain.address_from_pk(buyer_wallet.pub_key()))
    # sign the WRONG message (different amount) -> seller must reject
    from contangle_zkcp_tpu.zkcp import secp

    _, wrong_hash = chain.compose_tx(
        chain.address_from_pk(buyer_wallet.pub_key()),
        chain.address_from_pk(seller_wallet.pub_key()),
        PRICE * 2,
    )
    bad_sig = secp.encrypted_sign(buyer_wallet.sec_key(), step1.data_pk, wrong_hash)
    with pytest.raises(Exception):
        seller.handle_step3(buyer_wallet.pub_key(), bad_sig)
