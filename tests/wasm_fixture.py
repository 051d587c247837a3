"""Hand-assembled circom-style witness-generator wasm module.

There is no circom compiler (or any wasm toolchain) in this image, so the
end-to-end fixture for the wasm witness path is assembled directly from
bytes: a module exporting the standard circom 2.x witness-calculator ABI
for the circuit

    signal input  something;      // wire 2
    signal input  other;          // wire 3
    signal         mid;           // wire 4  (nonlinear intermediate)
    signal output challenge;      // wire 1
    mid       <== something * other;
    challenge <== mid * something;

with a nonlinear intermediate wire the generator computes out-of-band —
the job the reference delegates to its wasm runtime
(/root/reference/circuits-ark/src/circom_wrapper.rs:153-225).

The module does real work: shared-rw-memory protocol, FNV-keyed input
dispatch, witness computed with i64 multiplies, a loop with br_if for the
limb copies, and the runtime.exceptionHandler import for unknown signals.
Field values are stored as 8 little-endian u32 limbs (n32=8, BN254 r);
the test drives it with small inputs so products stay below 2^31 and no
modular reduction is needed — witness validity over the full field is
checked by the r1cs layer, not the fixture.
"""

import struct

BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617


def uleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if (n == 0 and not b & 0x40) or (n == -1 and b & 0x40):
            out.append(b)
            return bytes(out)
        out.append(b | 0x80)


def sec(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + uleb(len(payload)) + payload


def vec(items) -> bytes:
    return uleb(len(items)) + b"".join(items)


I32, I64 = 0x7F, 0x7E


def functype(params, results) -> bytes:
    return b"\x60" + vec([bytes([p]) for p in params]) + vec(
        [bytes([r]) for r in results]
    )


# -- instruction helpers ------------------------------------------------
def i32c(v: int) -> bytes:
    return b"\x41" + sleb(v)


def i64c(v: int) -> bytes:
    return b"\x42" + sleb(v)


def lget(i: int) -> bytes:
    return b"\x20" + uleb(i)


def lset(i: int) -> bytes:
    return b"\x21" + uleb(i)


def load32(offset: int = 0) -> bytes:
    return b"\x28\x02" + uleb(offset)  # align 4


def store32(offset: int = 0) -> bytes:
    return b"\x36\x02" + uleb(offset)


END = b"\x0b"

# memory map
SHARED = 0  # 32-byte shared rw buffer
WIT = 64  # 5 witness slots x 32 bytes
PRIME_AT = 1024

N32 = 8
N_WIT = 5
W_CHALLENGE, W_SOMETHING, W_OTHER, W_MID = 1, 2, 3, 4


def _copy_words(src_base: int, dst_base: int, n: int) -> bytes:
    """Unrolled n-word copy between constant addresses."""
    out = b""
    for k in range(n):
        # push dst base, push src base, load (src), store (dst)
        out += i32c(0) + i32c(0) + load32(src_base + 4 * k) + store32(
            dst_base + 4 * k
        )
    return out


def _func(locals_types, body: bytes) -> bytes:
    groups = []
    for t in locals_types:
        groups.append(uleb(1) + bytes([t]))
    payload = vec(groups) + body + END
    return uleb(len(payload)) + payload


def fnv1a_64(name: str) -> int:
    h = 0xCBF29CE484222325
    for b in name.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def build_module() -> bytes:
    types = [
        functype([], [I32]),  # 0: () -> i32
        functype([I32], [I32]),  # 1
        functype([I32, I32], []),  # 2
        functype([I32], []),  # 3
        functype([I32, I32, I32], []),  # 4
        functype([], []),  # 5
        functype([I32, I32], [I32]),  # 6
    ]

    # import: runtime.exceptionHandler (i32) -> ()   => func index 0
    imports = [
        uleb(7) + b"runtime" + uleb(16) + b"exceptionHandler" + b"\x00" + uleb(3)
    ]

    # defined funcs (indices 1..9) and their types
    func_types = [0, 5, 1, 2, 3, 4, 0, 3, 6]

    bodies = []

    # 1: getFieldNumLen32
    bodies.append(_func([], i32c(N32)))

    # 2: getRawPrime — copy 8 words PRIME_AT -> SHARED
    body = b""
    for k in range(N32):
        body += i32c(0) + i32c(0) + load32(PRIME_AT + 4 * k) + store32(
            SHARED + 4 * k
        )
    bodies.append(_func([], body))

    # 3: readSharedRWMemory(i) -> i32.load(SHARED + 4*i)
    bodies.append(
        _func([], lget(0) + i32c(4) + b"\x6c" + load32(SHARED))
    )

    # 4: writeSharedRWMemory(i, v)
    bodies.append(
        _func([], lget(0) + i32c(4) + b"\x6c" + lget(1) + store32(SHARED))
    )

    # 5: init(sanity) — zero witness area (memory.fill), set w0 limb0 = 1
    body = (
        i32c(WIT)
        + i32c(0)
        + i32c(N_WIT * 32)
        + b"\xfc\x0b\x00"  # memory.fill
        + i32c(0)
        + i32c(1)
        + store32(WIT)
    )
    bodies.append(_func([], body))

    # 6: setInputSignal(hmsb, hlsb, pos)
    def sig_branch(name: str, slot: int) -> bytes:
        h = fnv1a_64(name)
        msb, lsb = (h >> 32) & 0xFFFFFFFF, h & 0xFFFFFFFF
        cond = (
            lget(0)
            + i32c(struct.unpack("<i", struct.pack("<I", msb))[0])
            + b"\x46"  # i32.eq
            + lget(1)
            + i32c(struct.unpack("<i", struct.pack("<I", lsb))[0])
            + b"\x46"
            + b"\x71"  # i32.and
        )
        copy = _copy_words(SHARED, WIT + slot * 32, N32)
        # if cond then { copy; return }
        return cond + b"\x04\x40" + copy + b"\x0f" + END

    body = (
        sig_branch("something", W_SOMETHING)
        + sig_branch("other", W_OTHER)
        + i32c(1)
        + b"\x10\x00"  # call exceptionHandler(1)
    )
    bodies.append(_func([], body))

    # 7: getWitnessSize
    bodies.append(_func([], i32c(N_WIT)))

    # 8: getWitness(i) — compute mid/challenge with i64 muls, then copy
    # slot i's 8 limbs to shared memory with a br_if loop.
    # locals: 0=i(param), 1=a, 2=m(i64... keep i32), 3=base, 4=k
    a, m, base, k = 1, 2, 3, 4
    compute = (
        # a = w[something].limb0
        i32c(0)
        + load32(WIT + W_SOMETHING * 32)
        + lset(a)
        # m = wrap(i64(a) * i64(w[other].limb0))
        + lget(a)
        + b"\xad"  # i64.extend_i32_u
        + i32c(0)
        + load32(WIT + W_OTHER * 32)
        + b"\xad"
        + b"\x7e"  # i64.mul
        + b"\xa7"  # i32.wrap_i64
        + lset(m)
        # w[mid].limb0 = m
        + i32c(0)
        + lget(m)
        + store32(WIT + W_MID * 32)
        # w[challenge].limb0 = m * a
        + i32c(0)
        + lget(m)
        + lget(a)
        + b"\x6c"  # i32.mul
        + store32(WIT + W_CHALLENGE * 32)
    )
    copy_loop = (
        # base = WIT + i*32
        lget(0)
        + i32c(32)
        + b"\x6c"
        + i32c(WIT)
        + b"\x6a"  # i32.add
        + lset(base)
        + i32c(0)
        + lset(k)
        # loop: shared[k] = mem[base + 4k]
        + b"\x03\x40"  # loop (empty)
        + lget(k)
        + i32c(4)
        + b"\x6c"
        + lget(base)
        + lget(k)
        + i32c(4)
        + b"\x6c"
        + b"\x6a"
        + load32(0)
        + store32(SHARED)
        # k += 1; br_if k < 8
        + lget(k)
        + i32c(1)
        + b"\x6a"
        + lset(k)
        + lget(k)
        + i32c(N32)
        + b"\x48"  # i32.lt_s
        + b"\x0d\x00"  # br_if 0 (loop)
        + END
    )
    bodies.append(_func([I32, I32, I32, I32], compute + copy_loop))

    # 9: getInputSignalSize(hmsb, hlsb) -> 1
    bodies.append(_func([], i32c(1)))

    exports = [
        (b"getFieldNumLen32", 1),
        (b"getRawPrime", 2),
        (b"readSharedRWMemory", 3),
        (b"writeSharedRWMemory", 4),
        (b"init", 5),
        (b"setInputSignal", 6),
        (b"getWitnessSize", 7),
        (b"getWitness", 8),
        (b"getInputSignalSize", 9),
    ]
    export_items = [
        uleb(len(nm)) + nm + b"\x00" + uleb(idx) for nm, idx in exports
    ]

    prime_bytes = BN254_R.to_bytes(32, "little")

    module = (
        b"\x00asm\x01\x00\x00\x00"
        + sec(1, vec(types))
        + sec(2, vec(imports))
        + sec(3, vec([uleb(t) for t in func_types]))
        + sec(5, vec([b"\x00" + uleb(1)]))  # memory: min 1 page
        + sec(7, vec(export_items))
        + sec(10, vec(bodies))
        + sec(
            11,
            vec([uleb(0) + i32c(PRIME_AT) + END + uleb(32) + prime_bytes]),
        )
    )
    return module


def fixture_r1cs():
    """The matching r1cs: wires [1, challenge, something, other, mid];
    constraints something*other = mid; mid*something = challenge."""
    from contangle_zkcp_tpu.circomx.r1cs_format import R1csFile

    return R1csFile(
        prime=BN254_R,
        n_wires=5,
        n_pub_out=1,
        n_pub_in=0,
        n_prv_in=2,
        n_labels=5,
        constraints=[
            ({2: 1}, {3: 1}, {4: 1}),
            ({4: 1}, {2: 1}, {1: 1}),
        ],
    )
