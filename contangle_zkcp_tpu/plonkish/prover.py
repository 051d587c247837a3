"""PLONKish prover/verifier with IPA commitments over the Pasta curves.

The real proving backend for the halo2 pipeline (BASELINE config #3 —
the reference itself never invokes a real halo2 prover in-repo, only
MockProver; this completes the path): standard PLONK vanishing argument
over a radix-2 domain, halo2-style permutation argument for the copy
constraints (single grand product; the extension factor is sized to the
permutation width), quotient split into degree-n chunks, Fiat-Shamir
challenges, and a 2-point IPA multiopen (x and w*x).

Work placement: the domain transforms (iNTT of columns, coset evaluation
on the extended domain, quotient interpolation) run on the device NTT
engine; commitment MSMs ride the TPU Pippenger engine through `ipa.IPA`;
the per-row quotient assembly is exact host arithmetic.

v1 scope notes (documented, not silent):
  * no zero-knowledge blinding rows yet (proofs are succinct and sound
    but leak polynomial evaluations; halo2 blinds with random tail rows);
  * no lookup argument (the mirrored circuit subset uses none).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..fields import instances as fi
from ..ops.ntt import NTT
from .circuit import Assignment, CircuitMeta
from .ipa import IPA, CURVE, IpaProof

P = fi.PASTA_P
GEN = 5  # multiplicative generator of F_p (coset shift + coset deltas)


# ----------------------------------------------------------- poly helpers
_NTTS = {}


def _ntt(n: int) -> NTT:
    if n not in _NTTS:
        _NTTS[n] = NTT(fi.pasta_fp(), n)
    return _NTTS[n]


def _coeffs_from_evals(evals):
    n = len(evals)
    F = fi.pasta_fp()
    return F.decode(_ntt(n).inverse(F.encode(list(evals))))


def _evals_on_coset(coeffs, size: int):
    F = fi.pasta_fp()
    padded = list(coeffs) + [0] * (size - len(coeffs))
    return F.decode(_ntt(size).coset_forward(F.encode(padded), GEN))


def _coeffs_from_coset(evals):
    F = fi.pasta_fp()
    return F.decode(_ntt(len(evals)).coset_inverse(F.encode(list(evals)), GEN))


def _eval_at(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def _fs(transcript: bytes) -> int:
    return int.from_bytes(hashlib.sha256(transcript).digest(), "big") % P


def _pt(Pt) -> bytes:
    if Pt is None:
        return b"\x00" * 33
    return bytes([2 + (Pt[1] & 1)]) + Pt[0].to_bytes(32, "big")


# ------------------------------------------------------------------ keys
@dataclass
class PlonkVK:
    n: int
    ext: int
    fixed_comms: list
    sigma_comms: list
    perm_cols: list  # [(kind, index)]
    deltas: list


@dataclass
class PlonkPK:
    vk: PlonkVK
    fixed_polys: list
    sigma_polys: list
    sigma_evals: list  # on the base domain, row-major per column


@dataclass
class PlonkProof:
    advice_comms: list
    z_comm: tuple
    t_comms: list
    evals: dict  # name -> value(s)
    open_x: IpaProof
    open_wx: IpaProof


class PlonkSystem:
    def __init__(self, meta: CircuitMeta, n: int, structural: Assignment):
        """`structural`: any synthesized assignment — its fixed columns,
        copies and instance bindings define the circuit structure."""
        assert n & (n - 1) == 0
        self.meta = meta
        self.n = n
        gate_deg = max(
            (poly.max_degree() for g in meta.gates for poly in g.polys), default=1
        )
        # permutation spans advice + instance columns
        self.perm_cols = [("advice", i) for i in range(meta.n_advice)] + [
            ("instance", i) for i in range(meta.n_instance)
        ]
        need = max(gate_deg, len(self.perm_cols) + 2)
        ext = 2
        while ext < need:
            ext *= 2
        self.ext = ext
        self.ipa = IPA(n)
        self.domain_w = fi.root_of_unity(P, n)
        self._build_keys(structural)

    # ------------------------------------------------------------- setup
    def _build_keys(self, asg: Assignment):
        n = self.n
        m = len(self.perm_cols)
        deltas = [pow(GEN, j, P) for j in range(m)]
        # sigma as cell permutation from copy cycles
        pos = {(k, i): [(k, i, r) for r in range(n)] for k, i in self.perm_cols}
        cell_map = {
            (k, i, r): (k, i, r) for k, i in self.perm_cols for r in range(n)
        }
        pairs = list(asg.copies) + [
            (cell, ("instance", icol, irow))
            for cell, icol, irow in asg.instance_cells
        ]
        # union into cycles via successor-swapping (standard plonk trick)
        for a, b in pairs:
            ca, cb = cell_map[a], cell_map[b]
            cell_map[a], cell_map[b] = cb, ca
        w = self.domain_w
        ws = [pow(w, r, P) for r in range(n)]
        sigma_evals = []
        for k, i in self.perm_cols:
            col = []
            for r in range(n):
                tk, ti, tr = cell_map[(k, i, r)]
                j = self.perm_cols.index((tk, ti))
                col.append(deltas[j] * ws[tr] % P)
            sigma_evals.append(col)
        sigma_polys = [_coeffs_from_evals(c) for c in sigma_evals]
        fixed_polys = [_coeffs_from_evals(list(c)) for c in asg.fixed]
        vk = PlonkVK(
            n=n,
            ext=self.ext,
            fixed_comms=[self.ipa.commit(c) for c in fixed_polys],
            sigma_comms=[self.ipa.commit(c) for c in sigma_polys],
            perm_cols=self.perm_cols,
            deltas=deltas,
        )
        self.pk = PlonkPK(
            vk=vk,
            fixed_polys=fixed_polys,
            sigma_polys=sigma_polys,
            sigma_evals=sigma_evals,
        )

    # ------------------------------------------------------------- prove
    def prove(self, asg: Assignment, instances) -> PlonkProof:
        n, ext, meta = self.n, self.ext, self.meta
        pk = self.pk
        size = ext * n
        inst_cols = [
            list(col) + [0] * (n - len(col)) for col in instances
        ]
        advice_polys = [_coeffs_from_evals(list(c)) for c in asg.advice]
        inst_polys = [_coeffs_from_evals(c) for c in inst_cols]
        advice_comms = [self.ipa.commit(c) for c in advice_polys]
        transcript = b"plonk" + b"".join(_pt(c) for c in advice_comms)
        beta = _fs(transcript + b"beta")
        gamma = _fs(transcript + b"gamma")

        # ---- permutation grand product on the base domain
        w = self.domain_w
        ws = [pow(w, r, P) for r in range(n)]
        cols_v = []
        for k, i in self.perm_cols:
            if k == "advice":
                cols_v.append(list(asg.advice[i]))
            else:
                cols_v.append(inst_cols[i])
        m = len(self.perm_cols)
        z = [1]
        for r in range(n - 1):
            num = den = 1
            for j in range(m):
                v = cols_v[j][r]
                num = num * ((v + beta * pk.vk.deltas[j] * ws[r] + gamma) % P) % P
                den = den * ((v + beta * pk.sigma_evals[j][r] + gamma) % P) % P
            z.append(z[-1] * num % P * pow(den, -1, P) % P)
        z_poly = _coeffs_from_evals(z)
        z_comm = self.ipa.commit(z_poly)
        transcript = hashlib.sha256(transcript + _pt(z_comm)).digest()
        alpha = _fs(transcript + b"alpha")

        # ---- quotient on the extended coset
        tables_ext = {
            "advice": [_evals_on_coset(c, size) for c in advice_polys],
            "fixed": [_evals_on_coset(c, size) for c in pk.fixed_polys],
            "instance": [_evals_on_coset(c, size) for c in inst_polys],
        }
        sigma_ext = [_evals_on_coset(c, size) for c in pk.sigma_polys]
        z_ext = _evals_on_coset(z_poly, size)
        # vanishing and L_0 on the coset
        gnp = pow(GEN, n, P)
        w_ext = fi.root_of_unity(P, size)
        zh = [(gnp * pow(w_ext, (i * n) % size, P) - 1) % P for i in range(size)]
        zh_inv = [pow(v, -1, P) for v in zh]
        ninv = pow(n, -1, P)
        l0 = []
        for i in range(size):
            xi = GEN * pow(w_ext, i, P) % P
            l0.append(zh[i] * ninv % P * pow((xi - 1) % P, -1, P) % P)

        quotient = [0] * size
        a_pow = 1
        for gate in meta.gates:
            for poly in gate.polys:
                vals = poly.eval_vec(tables_ext, P, size, rot_scale=ext)
                for i in range(size):
                    quotient[i] = (quotient[i] + a_pow * vals[i]) % P
                a_pow = a_pow * alpha % P
        # permutation transition: Z(wX)*prod(den) - Z(X)*prod(num)
        for i in range(size):
            xi = GEN * pow(w_ext, i, P) % P
            num = den = 1
            for j in range(m):
                v = tables_ext[self.perm_cols[j][0]][self.perm_cols[j][1]][i]
                num = num * ((v + beta * pk.vk.deltas[j] % P * xi + gamma) % P) % P
                den = den * ((v + beta * sigma_ext[j][i] + gamma) % P) % P
            zi = z_ext[i]
            zw = z_ext[(i + ext) % size]
            term = (zw * den - zi * num) % P
            quotient[i] = (quotient[i] + a_pow * term) % P
        a_pow2 = a_pow * alpha % P
        for i in range(size):
            quotient[i] = (quotient[i] + a_pow2 * (l0[i] * ((z_ext[i] - 1) % P))) % P
        t_evals = [quotient[i] * zh_inv[i] % P for i in range(size)]
        t_coeffs = _coeffs_from_coset(t_evals)
        # split into ext chunks of degree < n
        t_chunks = [t_coeffs[c * n : (c + 1) * n] for c in range(ext)]
        t_comms = [self.ipa.commit(c) for c in t_chunks]
        transcript = hashlib.sha256(
            transcript + b"".join(_pt(c) for c in t_comms)
        ).digest()
        x = _fs(transcript + b"x")
        wx = x * w % P

        evals = {
            "advice_x": [_eval_at(c, x) for c in advice_polys],
            "advice_wx": [_eval_at(c, wx) for c in advice_polys],
            "fixed_x": [_eval_at(c, x) for c in pk.fixed_polys],
            "sigma_x": [_eval_at(c, x) for c in pk.sigma_polys],
            "z_x": _eval_at(z_poly, x),
            "z_wx": _eval_at(z_poly, wx),
            "t_x": [_eval_at(c, x) for c in t_chunks],
        }
        transcript = hashlib.sha256(
            transcript
            + b"".join(
                int(v).to_bytes(32, "big")
                for v in (
                    evals["advice_x"]
                    + evals["advice_wx"]
                    + evals["fixed_x"]
                    + evals["sigma_x"]
                    + [evals["z_x"], evals["z_wx"]]
                    + evals["t_x"]
                )
            )
        ).digest()
        nu = _fs(transcript + b"nu")

        # ---- multiopen: combined poly at x, combined at wx
        def combine(polys):
            out = [0] * n
            s = 1
            for c in polys:
                cc = list(c) + [0] * (n - len(c))
                for i in range(n):
                    out[i] = (out[i] + s * cc[i]) % P
                s = s * nu % P
            return out

        at_x_polys = advice_polys + pk.fixed_polys + pk.sigma_polys + [z_poly] + t_chunks
        at_wx_polys = advice_polys + [z_poly]
        open_x = self.ipa.open(combine(at_x_polys), x)
        open_wx = self.ipa.open(combine(at_wx_polys), wx)
        return PlonkProof(
            advice_comms=advice_comms,
            z_comm=z_comm,
            t_comms=t_comms,
            evals=evals,
            open_x=open_x,
            open_wx=open_wx,
        )

    # ------------------------------------------------------------ verify
    def verify(self, proof: PlonkProof, instances) -> bool:
        n, ext, meta = self.n, self.ext, self.meta
        vk = self.pk.vk
        m = len(self.perm_cols)
        inst_cols = [list(col) + [0] * (n - len(col)) for col in instances]
        inst_polys = [_coeffs_from_evals(c) for c in inst_cols]

        transcript = b"plonk" + b"".join(_pt(c) for c in proof.advice_comms)
        beta = _fs(transcript + b"beta")
        gamma = _fs(transcript + b"gamma")
        transcript = hashlib.sha256(transcript + _pt(proof.z_comm)).digest()
        alpha = _fs(transcript + b"alpha")
        transcript = hashlib.sha256(
            transcript + b"".join(_pt(c) for c in proof.t_comms)
        ).digest()
        x = _fs(transcript + b"x")
        w = self.domain_w
        wx = x * w % P
        ev = proof.evals
        transcript = hashlib.sha256(
            transcript
            + b"".join(
                int(v).to_bytes(32, "big")
                for v in (
                    ev["advice_x"]
                    + ev["advice_wx"]
                    + ev["fixed_x"]
                    + ev["sigma_x"]
                    + [ev["z_x"], ev["z_wx"]]
                    + ev["t_x"]
                )
            )
        ).digest()
        nu = _fs(transcript + b"nu")

        # ---- recompute the identity at x
        inst_x = [_eval_at(c, x) for c in inst_polys]
        # single-row tables: col value at rotation 0 -> *_x; rotation 1 -> *_wx
        class _RowTables(dict):
            pass

        def col_val(kind, idx, rot):
            if kind == "advice":
                return ev["advice_x"][idx] if rot == 0 else ev["advice_wx"][idx]
            if kind == "fixed":
                assert rot == 0, "fixed rotations beyond 0 unsupported"
                return ev["fixed_x"][idx]
            if kind == "instance":
                assert rot == 0
                return inst_x[idx]
            raise ValueError(kind)

        def eval_expr(e):
            k = e.node[0]
            if k == "col":
                c = e.node[1]
                return col_val(c.kind, c.index, c.rotation)
            if k == "const":
                return e.node[1] % P
            if k == "add":
                return (eval_expr(e.node[1]) + eval_expr(e.node[2])) % P
            if k == "mul":
                return (eval_expr(e.node[1]) * eval_expr(e.node[2])) % P
            if k == "neg":
                return (-eval_expr(e.node[1])) % P
            raise ValueError(k)

        total = 0
        a_pow = 1
        for gate in meta.gates:
            for poly in gate.polys:
                total = (total + a_pow * eval_expr(poly)) % P
                a_pow = a_pow * alpha % P
        num = den = 1
        for j in range(m):
            kind, idx = self.perm_cols[j]
            v = ev["advice_x"][idx] if kind == "advice" else inst_x[idx]
            num = num * ((v + beta * vk.deltas[j] % P * x + gamma) % P) % P
            den = den * ((v + beta * ev["sigma_x"][j] + gamma) % P) % P
        total = (total + a_pow * ((ev["z_wx"] * den - ev["z_x"] * num) % P)) % P
        a_pow2 = a_pow * alpha % P
        zh_x = (pow(x, n, P) - 1) % P
        l0_x = zh_x * pow(n, -1, P) % P * pow((x - 1) % P, -1, P) % P
        total = (total + a_pow2 * (l0_x * ((ev["z_x"] - 1) % P) % P)) % P
        t_x = 0
        xn = pow(x, n, P)
        s = 1
        for tv in ev["t_x"]:
            t_x = (t_x + s * tv) % P
            s = s * xn % P
        if total != t_x * zh_x % P:
            return False

        # ---- multiopen checks
        def combine_comms(comms):
            acc = None
            s = 1
            for c in comms:
                acc = CURVE.add(acc, CURVE.mul(s, c))
                s = s * nu % P
            return acc

        def combine_vals(vals):
            acc = 0
            s = 1
            for v in vals:
                acc = (acc + s * v) % P
                s = s * nu % P
            return acc

        at_x_comms = (
            proof.advice_comms + vk.fixed_comms + vk.sigma_comms + [proof.z_comm] + proof.t_comms
        )
        at_x_vals = (
            ev["advice_x"] + ev["fixed_x"] + ev["sigma_x"] + [ev["z_x"]] + ev["t_x"]
        )
        if not self.ipa.verify(
            combine_comms(at_x_comms), x, combine_vals(at_x_vals), proof.open_x
        ):
            return False
        at_wx_comms = proof.advice_comms + [proof.z_comm]
        at_wx_vals = ev["advice_wx"] + [ev["z_wx"]]
        return self.ipa.verify(
            combine_comms(at_wx_comms), wx, combine_vals(at_wx_vals), proof.open_wx
        )
