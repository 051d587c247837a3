from . import elgamal
from .encrypt_circuit import EncryptCircuit
