from . import secp, keccak, rlp, ethereum, wallet, config, cipher_host
from .config import ZkConfig, CircomParams
from .verifiable_encryption import (
    ProofOfProperty,
    VerifiableEncryption,
    ZkVerifiableEncryption,
)
from .zk_encryption import ZkEncryption
from .sample_entries import ZkSampleEntries
from .seller import Seller, SellerConfig, Step1Msg
from .buyer import Buyer, BuyerConfig
from .wallet import LocalWallet
