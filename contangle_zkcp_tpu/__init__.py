"""contangle_zkcp_tpu — a TPU-native zero-knowledge proving framework.

A ground-up JAX/XLA/Pallas implementation of the capabilities of the
Contangle ZKCP stack (reference: nulltea/contangle-zkcp): Zero-Knowledge
Contingent Payments built on proof-of-encryption SNARKs (Groth16 over
BLS12-381, PLONKish/Halo2 over Pasta), ElGamal-with-Poseidon-KDF encryption,
ECDSA adaptor signatures and an Ethereum settlement layer.

Layering (TPU-first, not a port of the reference's Rust layering):

  fields/    limb-decomposed prime-field arithmetic (uint32 limbs, Montgomery
             form) vectorized for the TPU VPU/MXU, plus host bigint helpers.
  curves/    batched elliptic-curve groups: twisted Edwards (Jubjub),
             short Weierstrass (BLS12-381 G1/G2, BN254, Pasta) and the
             host-side pairing engine.
  ops/       the hot kernels: Pippenger MSM, radix-2 NTT, Poseidon sponge.
  parallel/  jax.sharding Mesh layouts + shard_map'd multi-chip MSM/NTT.
  r1cs/      host-side circuit builder emitting sparse A/B/C matrices and
             vectorized witness generation; gadget library.
  groth16/   Groth16 setup/prove/verify orchestrated over the mesh, with
             arkworks-0.3-compatible serialization.
  plonkish/  Halo2-equivalent backend over the Pasta curves.
  circomx/   .r1cs parser + witness calculation for circom circuits.
  zkcp/      the ZKCP protocol: ZK service layer, seller/buyer actors,
             adaptor signatures, Ethereum provider, HTTP server/client, CLI.
"""

__version__ = "0.1.0"
