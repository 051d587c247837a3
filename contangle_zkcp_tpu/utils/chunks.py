"""byte <-> field-element plaintext chunking.

Mirror of /root/reference/circuits-ark/src/utils.rs:24-95, including the
documented quirks (SURVEY.md §7 faithfulness notes):
  * `bytes_to_chunks`: 32-byte chunks via from_random_bytes (fails if a
    chunk overflows the field);
  * `bytes_to_chunks_direct`: 1 byte -> 1 field element, zero-padded to n;
  * `chunks_to_bytes`: strips trailing zero bytes per chunk — lossy on
    plaintexts with trailing zeros (preserved deliberately).
"""

from __future__ import annotations

from .errors import SerializationError
from .serialize import field_byte_len, fp_from_random_bytes


def bytes_to_chunks(data: bytes, p: int):
    out = []
    for off in range(0, len(data), 32):
        chunk = bytes(data[off : off + 32]).ljust(32, b"\0")
        v = fp_from_random_bytes(chunk, p)
        if v is None:
            raise SerializationError("failed to cast bytes to scalars")
        out.append(v)
    return out


def bytes_to_chunks_fixed_size(data: bytes, p: int, size: int):
    chunks = bytes_to_chunks(data, p)
    return [(chunks[i] if i < len(chunks) else 0) for i in range(size)]


def bytes_to_chunks_direct(data: bytes, p: int, size: int):
    vals = list(data)
    return [(vals[i] if i < len(vals) else 0) for i in range(size)]


def chunks_to_bytes(chunks, p: int) -> bytes:
    out = bytearray()
    n = field_byte_len(p)
    for c in chunks:
        b = int(c % p).to_bytes(n, "little")
        out += b.rstrip(b"\0")
    return bytes(out)
