"""Bit-exactness conformance layer vs the reference Rust stack.

Reimplements the deterministic plumbing the reference's tests rely on —
`ark_std::test_rng()` (rand 0.8 StdRng = ChaCha12, fixed seed), arkworks
0.3 `UniformRand` field/scalar sampling, `from_random_bytes` — so the
reference's RNG transcripts replay byte-for-byte and golden vectors can
be pinned (tests/conformance/).
"""
