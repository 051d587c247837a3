from . import poseidon
