from .groth16 import Groth16, Proof, ProvingKey, VerifyingKey, QAP, curve_ctx
