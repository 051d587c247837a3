"""wasm interpreter + circom witness-calculator ABI (SURVEY §2.2 circom
toolchain; the reference runs witness generators through wasmer inside
its patched ark-circom fork — /root/reference/circuits-ark/src/circom_wrapper.rs:153-225)."""

import random

import pytest

from contangle_zkcp_tpu.circomx.wasm import Instance, WasmTrap, parse_module
from contangle_zkcp_tpu.circomx.witness_calc import WitnessCalculator, fnv1a_64
from wasm_fixture import (
    END,
    I32,
    I64,
    build_module,
    fixture_r1cs,
    functype,
    i32c,
    i64c,
    lget,
    lset,
    load32,
    sec,
    sleb,
    store32,
    uleb,
    vec,
)


def simple_module(funcs, table=None, n_pages=1):
    """funcs: [(name, type_params, type_results, local_types, body_bytes)].
    All functions exported under their name; optional table of func
    indices for call_indirect."""
    types = [functype(p, r) for _, p, r, _, _ in funcs]
    bodies = []
    for i, (_, _, _, locs, body) in enumerate(funcs):
        groups = [uleb(1) + bytes([t]) for t in locs]
        payload = vec(groups) + body + END
        bodies.append(uleb(len(payload)) + payload)
    exports = [
        uleb(len(nm.encode())) + nm.encode() + b"\x00" + uleb(i)
        for i, (nm, _, _, _, _) in enumerate(funcs)
    ]
    out = b"\x00asm\x01\x00\x00\x00" + sec(1, vec(types)) + sec(
        3, vec([uleb(i) for i in range(len(funcs))])
    )
    if table is not None:
        out += sec(4, vec([b"\x70\x00" + uleb(len(table))]))
    out += sec(5, vec([b"\x00" + uleb(n_pages)]))
    out += sec(7, vec(exports))
    if table is not None:
        out += sec(
            9,
            vec(
                [
                    uleb(0)
                    + i32c(0)
                    + END
                    + vec([uleb(f) for f in table])
                ]
            ),
        )
    out += sec(10, vec(bodies))
    return out


def test_i32_arithmetic_and_compares():
    cases = [
        ("add", b"\x6a", lambda a, b: (a + b) & 0xFFFFFFFF),
        ("sub", b"\x6b", lambda a, b: (a - b) & 0xFFFFFFFF),
        ("mul", b"\x6c", lambda a, b: (a * b) & 0xFFFFFFFF),
        ("and", b"\x71", lambda a, b: a & b),
        ("xor", b"\x73", lambda a, b: a ^ b),
        ("shl", b"\x74", lambda a, b: (a << (b & 31)) & 0xFFFFFFFF),
        ("shru", b"\x76", lambda a, b: a >> (b & 31)),
    ]
    funcs = [
        (nm, [I32, I32], [I32], [], lget(0) + lget(1) + op)
        for nm, op, _ in cases
    ]
    inst = Instance(parse_module(simple_module(funcs)))
    rng = random.Random(1)
    for _ in range(20):
        a, b = rng.randrange(1 << 32), rng.randrange(1 << 32)
        for nm, _, ref in cases:
            assert inst.invoke(nm, a, b) == ref(a, b), nm


def test_i32_signed_division_and_shift():
    funcs = [
        ("divs", [I32, I32], [I32], [], lget(0) + lget(1) + b"\x6d"),
        ("rems", [I32, I32], [I32], [], lget(0) + lget(1) + b"\x6f"),
        ("shrs", [I32, I32], [I32], [], lget(0) + lget(1) + b"\x75"),
    ]
    inst = Instance(parse_module(simple_module(funcs)))
    # wasm div_s truncates toward zero (unlike Python floor division)
    assert inst.invoke("divs", (-7) & 0xFFFFFFFF, 2) == (-3) & 0xFFFFFFFF
    assert inst.invoke("rems", (-7) & 0xFFFFFFFF, 2) == (-1) & 0xFFFFFFFF
    assert inst.invoke("shrs", (-8) & 0xFFFFFFFF, 1) == (-4) & 0xFFFFFFFF
    with pytest.raises(WasmTrap):
        inst.invoke("divs", 5, 0)


def test_i64_ops_and_conversions():
    funcs = [
        (
            "mul64",
            [I64, I64],
            [I64],
            [],
            lget(0) + lget(1) + b"\x7e",
        ),
        (
            "mulwide",
            [I32, I32],
            [I64],
            [],
            lget(0) + b"\xad" + lget(1) + b"\xad" + b"\x7e",
        ),
        ("wrap", [I64], [I32], [], lget(0) + b"\xa7"),
        ("ext8s", [I32], [I32], [], lget(0) + b"\xc0"),
    ]
    inst = Instance(parse_module(simple_module(funcs)))
    a, b = 0xDEADBEEFCAFEBABE, 0x123456789ABCDEF1
    assert inst.invoke("mul64", a, b) == (a * b) & ((1 << 64) - 1)
    assert inst.invoke("mulwide", 0xFFFFFFFF, 0xFFFFFFFF) == 0xFFFFFFFF * 0xFFFFFFFF
    assert inst.invoke("wrap", 0x1_0000_0005) == 5
    assert inst.invoke("ext8s", 0x80) == 0xFFFFFF80


def test_control_flow_factorial_loop():
    # fact(n): acc=1; loop { acc*=n; n-=1; br_if n>0 }
    body = (
        i32c(1)
        + lset(1)
        + b"\x03\x40"  # loop
        + lget(1)
        + lget(0)
        + b"\x6c"
        + lset(1)
        + lget(0)
        + i32c(1)
        + b"\x6b"
        + lset(0)
        + lget(0)
        + i32c(0)
        + b"\x4a"  # gt_s
        + b"\x0d\x00"
        + END
        + lget(1)
    )
    inst = Instance(
        parse_module(simple_module([("fact", [I32], [I32], [I32], body)]))
    )
    assert inst.invoke("fact", 5) == 120
    assert inst.invoke("fact", 10) == 3628800


def test_control_flow_if_else_and_br_table():
    # sign(x): if x>0 -> 1 elif x<0 -> -1 else 0 (if/else with result)
    body = (
        lget(0)
        + i32c(0)
        + b"\x4a"
        + b"\x04\x7f"  # if (result i32)
        + i32c(1)
        + b"\x05"  # else
        + lget(0)
        + i32c(0)
        + b"\x48"
        + b"\x04\x7f"
        + i32c(-1)
        + b"\x05"
        + i32c(0)
        + END
        + END
    )
    # pick(i): br_table -> 10, 20, default 99
    pick = (
        b"\x02\x7f"  # outer block (result i32)
        + b"\x02\x40"  # b1 (default target)
        + b"\x02\x40"  # b2 (case 1)
        + b"\x02\x40"  # b3 (case 0)
        + lget(0)
        + b"\x0e" + uleb(2) + uleb(0) + uleb(1) + uleb(2)  # br_table
        + END  # b3
        + i32c(10)
        + b"\x0c" + uleb(2)  # br outer
        + END  # b2
        + i32c(20)
        + b"\x0c" + uleb(1)  # br outer
        + END  # b1
        + i32c(99)
        + END  # outer
    )
    inst = Instance(
        parse_module(
            simple_module(
                [
                    ("sign", [I32], [I32], [], body),
                    ("pick", [I32], [I32], [], pick),
                ]
            )
        )
    )
    assert inst.invoke("sign", 7) == 1
    assert inst.invoke("sign", (-3) & 0xFFFFFFFF) == 0xFFFFFFFF
    assert inst.invoke("sign", 0) == 0
    assert inst.invoke("pick", 0) == 10
    assert inst.invoke("pick", 1) == 20
    assert inst.invoke("pick", 5) == 99


def test_call_indirect():
    dbl = lget(0) + i32c(2) + b"\x6c"
    sqr = lget(0) + lget(0) + b"\x6c"
    # apply(sel, x): call_indirect type0 (table[sel])(x)
    apply_ = lget(1) + lget(0) + b"\x11" + uleb(0) + uleb(0)
    mod = simple_module(
        [
            ("dbl", [I32], [I32], [], dbl),
            ("sqr", [I32], [I32], [], sqr),
            ("apply", [I32, I32], [I32], [], apply_),
        ],
        table=[0, 1],
    )
    inst = Instance(parse_module(mod))
    assert inst.invoke("apply", 0, 21) == 42
    assert inst.invoke("apply", 1, 12) == 144
    with pytest.raises(WasmTrap):
        inst.invoke("apply", 7, 1)


def test_memory_roundtrip_and_grow():
    store = lget(0) + lget(1) + store32(0)
    load = lget(0) + load32(0)
    load8s = lget(0) + b"\x2c\x00" + uleb(0)
    grow = lget(0) + b"\x40\x00"
    size = b"\x3f\x00"
    inst = Instance(
        parse_module(
            simple_module(
                [
                    ("store", [I32, I32], [], [], store),
                    ("load", [I32], [I32], [], load),
                    ("load8s", [I32], [I32], [], load8s),
                    ("grow", [I32], [I32], [], grow),
                    ("size", [], [I32], [], size),
                ]
            )
        )
    )
    inst.invoke("store", 100, 0xDEADBEEF)
    assert inst.invoke("load", 100) == 0xDEADBEEF
    assert inst.invoke("load8s", 103) == 0xFFFFFFDE  # sign-extended 0xDE
    assert inst.invoke("size") == 1
    assert inst.invoke("grow", 2) == 1
    assert inst.invoke("size") == 3
    inst.invoke("store", 2 * 65536, 7)
    assert inst.invoke("load", 2 * 65536) == 7


def test_unreachable_traps():
    inst = Instance(
        parse_module(simple_module([("boom", [], [], [], b"\x00")]))
    )
    with pytest.raises(WasmTrap):
        inst.invoke("boom")


def test_branch_to_function_label_returns():
    """br/br_if with depth == len(labels) targets the implicit
    function-body label — a function return in MVP wasm (real
    circom-emitted modules branch at function level)."""
    # f(x) -> i32:  i32.const 42; block {{ local.get 0; br_if 1 }};
    #               drop; i32.const 7
    body = (
        i32c(42)
        + b"\x02\x40"  # block (void)
        + lget(0)
        + b"\x0d\x01"  # br_if 1  (function label)
        + b"\x0b"  # end
        + b"\x1a"  # drop
        + i32c(7)
    )
    inst = Instance(
        parse_module(simple_module([("f", [I32], [I32], [], body)]))
    )
    assert inst.invoke("f", 1) == 42  # taken: early return
    assert inst.invoke("f", 0) == 7  # not taken: fall through
    # unconditional br at function depth, no enclosing block at all
    body2 = i32c(9) + b"\x0c\x00" + i32c(5)  # br 0 == return
    inst2 = Instance(
        parse_module(simple_module([("g", [], [I32], [], body2)]))
    )
    assert inst2.invoke("g") == 9


def test_out_of_bounds_memory_traps():
    """Multi-byte loads/stores straddling the end of memory must trap,
    not return truncated values / silently extend the bytearray."""
    # 1 page = 65536 bytes; i32 access at 65534 straddles the boundary
    ld = i32c(65534) + load32() + b"\x1a"
    st = i32c(65534) + i32c(7) + store32()
    inst = Instance(
        parse_module(
            simple_module(
                [("ld", [], [], [], ld), ("st", [], [], [], st)]
            )
        )
    )
    with pytest.raises(WasmTrap, match="out-of-bounds"):
        inst.invoke("ld")
    with pytest.raises(WasmTrap, match="out-of-bounds"):
        inst.invoke("st")
    assert len(inst.mem) == 65536  # store must not have extended memory
    # in-bounds accesses at the last valid word still work
    ok = i32c(65532) + i32c(123) + store32() + i32c(65532) + load32()
    inst2 = Instance(
        parse_module(simple_module([("ok", [], [I32], [], ok)]))
    )
    assert inst2.invoke("ok") == 123


# ---------------------------------------------------------------- circom ABI
def test_witness_calculator_fixture():
    calc = WitnessCalculator(build_module())
    assert calc.n32 == 8
    assert calc.prime == fixture_r1cs().prime
    w = calc.calculate_witness({"something": 7, "other": 11})
    assert w == [1, 7 * 11 * 7, 7, 11, 7 * 11]
    # repeat with different inputs: init() must reset state
    w2 = calc.calculate_witness({"something": 3, "other": 5})
    assert w2 == [1, 45, 3, 5, 15]


def test_witness_calculator_unknown_signal():
    calc = WitnessCalculator(build_module())
    with pytest.raises(Exception, match="signal"):
        calc.calculate_witness({"nonsense": 1})


def test_fnv_hash_matches_reference_keying():
    # FNV-1a 64 as circom/snarkjs key input signals ("main.x"-style
    # hashing happens before codegen; generated modules key on the
    # bare name hash)
    assert fnv1a_64("") == 0xCBF29CE484222325
    assert fnv1a_64("a") == ((0xCBF29CE484222325 ^ 0x61) * 0x100000001B3) % (
        1 << 64
    )


def test_builder_wasm_witness_end_to_end():
    from contangle_zkcp_tpu.circomx import (
        CircomBuilder,
        CircomCircuit,
        CircomConfig,
    )
    from contangle_zkcp_tpu.fields import instances as fi
    from contangle_zkcp_tpu.groth16 import Groth16
    from contangle_zkcp_tpu.r1cs.builder import ConstraintSystem

    r1 = fixture_r1cs()
    cfg = CircomConfig(
        r1cs=r1,
        signal_map={"something": 2, "other": 3, "challenge": 1},
        sanity_check=True,
        wasm=build_module(),
    )
    b = CircomBuilder(cfg)
    b.push_input("something", 9)
    b.push_input("other", 13)
    w = b.solve_witness()
    assert w == [1, 9 * 13 * 9, 9, 13, 9 * 13]
    circ = CircomCircuit(cfg, w)
    cs = ConstraintSystem(p=r1.prime)
    var = circ.allocate(cs)
    circ.enforce(cs, var)
    assert cs.is_satisfied()
    eng = Groth16("bn254")
    rng = random.Random(7)
    pk, vk = eng.setup(cs, rng)
    proof = eng.prove(pk, cs, rng)
    assert eng.verify(vk, cs.public_inputs(), proof)
    bad = list(cs.public_inputs())
    bad[0] = (bad[0] + 1) % r1.prime
    assert not eng.verify(vk, bad, proof)


def test_builder_wasm_disagreement_detected():
    from contangle_zkcp_tpu.circomx import CircomBuilder, CircomConfig
    from contangle_zkcp_tpu.utils.errors import ProofError

    r1 = fixture_r1cs()
    cfg = CircomConfig(
        r1cs=r1,
        signal_map={"something": 2, "other": 3, "challenge": 1},
        wasm=build_module(),
    )
    b = CircomBuilder(cfg)
    b.push_input("something", 9)
    b.push_input("other", 13)
    # a direct wire assignment that contradicts the generator's output
    # (the fork's push_variable witness-sharing path) must be flagged
    b.assignments[1] = 5
    with pytest.raises(ProofError, match="disagrees"):
        b.solve_witness()