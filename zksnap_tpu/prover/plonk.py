"""PLONK prover/verifier over KZG (the halo2_proofs `create_proof` /
`verify_proof` equivalent -- SURVEY.md section 3.2 hot path).

Protocol (one phase, vertical flex gate, logUp lookups, single grand
product for copies, GWC multiopen):

  commit advice + lookup columns + logUp multiplicities
  -> challenges beta_lk, beta, gamma
  -> compute + commit logUp helper h and permutation grand product Z
  -> challenge y; quotient t on the extended coset domain (device NTTs);
     commit t chunks
  -> challenge x; batched barycentric evals of every queried poly
  -> challenges v, u; GWC opening witnesses W_p for p in {x, wx, w2x, w3x}
     computed pointwise on the domain (no synthetic division), committed
     via Lagrange-basis MSM
  -> verifier replays the transcript, checks the combined identity at x
     and one pairing.

Deviation notes vs halo2 (capability-equivalent, TPU-motivated):
  * lookup argument is logUp (log-derivative) instead of halo2's
    permuted-column lookup -- fewer committed polys, no sorting;
  * single permutation grand product (degree grows with column count;
    extended domain factor covers it) instead of chunked Z's;
  * zero-knowledge blinding rows are reserved (ZK_ROWS) but blinding
    randomness is not yet sampled -- proofs are succinct arguments, not
    yet zero-knowledge.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jacobian import JacPoint, bn254_ops
from ..curves.native import AffinePoint, BN254_G1
from ..fields.field import bn254_fr
from ..trace.context import Context
from . import pairing as pr
from .keygen import Layout, layout_circuit, ZK_ROWS
from .poly_device import (
    batch_eval,
    commit_evals,
    coset_extended_evals,
    coset_interpolate,
    mont_to_canonical,
    opening_witness_evals,
    to_device_poly,
)
from .srs import SRS, gen_srs
from .transcript import Transcript

FR = bn254_fr()
P = FR.p


def _batch_inv(xs: list[int]) -> list[int]:
    """Host Montgomery-trick batch inversion (zeros forbidden)."""
    pref = [1]
    for x in xs:
        pref.append(pref[-1] * x % P)
    inv_total = pow(pref[-1], -1, P)
    out = [0] * len(xs)
    for i in range(len(xs) - 1, -1, -1):
        out[i] = pref[i] * inv_total % P
        inv_total = inv_total * xs[i] % P
    return out


@dataclass
class VerifyingKey:
    k: int
    ext_log: int
    n_advice: int
    n_lookup: int
    lookup_bits: int
    n_perm: int
    deltas: list[int]
    num_instance: int
    commitments: dict  # name -> AffinePoint (fixed/sigma columns)
    omega: int


@dataclass
class ProvingKey:
    vk: VerifyingKey
    layout: Layout
    srs: SRS
    fixed_dev: dict  # name -> [n,16] device Montgomery evals


def _sigma_values(layout: Layout) -> list[list[int]]:
    """sigma_j(w^i) = delta_{j'} * w^{i'} as field values."""
    from ..poly.domain import domain

    dom = domain(layout.k)
    n = layout.n
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * dom.omega % P
    out = []
    for j in range(len(layout.perm_columns)):
        col = [
            layout.deltas[layout.sigma[j, i, 0]] * omega_pows[layout.sigma[j, i, 1]] % P
            for i in range(n)
        ]
        out.append(col)
    return out


def keygen(ctx: Context, k: int, srs: SRS | None = None) -> ProvingKey:
    layout = layout_circuit(ctx, k)
    srs = srs or gen_srs(k)
    n_perm = len(layout.perm_columns)
    # extended factor must cover max constraint degree:
    max_deg = max(3, layout.n_lookup + 2, n_perm + 1)
    ext_log = max(2, (max_deg - 1).bit_length())
    assert (1 << ext_log) >= max_deg

    sigmas = _sigma_values(layout)
    fixed_host = {}
    for i, q in enumerate(layout.q_cols):
        fixed_host[f"q_{i}"] = q
    fixed_host["const"] = layout.const_col
    fixed_host["table"] = layout.table_col
    for j, s in enumerate(sigmas):
        fixed_host[f"sigma_{j}"] = s

    fixed_dev = {name: to_device_poly(v) for name, v in fixed_host.items()}
    commitments = {}
    ops = bn254_ops()
    for name, dev in fixed_dev.items():
        c = commit_evals(srs.g1_lagrange, mont_to_canonical(dev))
        commitments[name] = ops.to_affine_host(c)[0]

    from ..poly.domain import domain

    vk = VerifyingKey(
        k=k, ext_log=ext_log, n_advice=layout.n_advice,
        n_lookup=layout.n_lookup, lookup_bits=layout.lookup_bits,
        n_perm=n_perm, deltas=layout.deltas,
        num_instance=len(layout.instance_col),
        commitments=commitments, omega=domain(k).omega,
    )
    return ProvingKey(vk=vk, layout=layout, srs=srs, fixed_dev=fixed_dev)


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def prove(pk: ProvingKey, instances: list[int]) -> list:
    layout = pk.layout
    n, k = layout.n, layout.k
    ops = bn254_ops()
    from ..poly.domain import domain

    dom = domain(k)
    omega = dom.omega

    tr = Transcript()
    for v in instances:
        tr.write_scalar(v)  # also binds instances into Fiat-Shamir

    # -- round 1: commit witness columns ------------------------------------
    advice_dev = [to_device_poly(c) for c in layout.advice_cols]
    lookup_dev = [to_device_poly(c) for c in layout.lookup_cols]
    m_dev = to_device_poly(layout.multiplicity)
    inst_dev = to_device_poly(layout.instance_col)

    def commit(dev):
        return ops.to_affine_host(
            commit_evals(pk.srs.g1_lagrange, mont_to_canonical(dev)))[0]

    for dev in advice_dev:
        tr.write_point(commit(dev))
    for dev in lookup_dev:
        tr.write_point(commit(dev))
    tr.write_point(commit(m_dev))

    beta_lk = tr.challenge()
    beta = tr.challenge()
    gamma = tr.challenge()

    # -- round 2: logUp helper h + permutation grand product Z (host) -------
    h_vals, z_vals = _compute_h_z(layout, beta_lk, beta, gamma, omega)
    h_dev = to_device_poly(h_vals)
    z_dev = to_device_poly(z_vals)
    tr.write_point(commit(h_dev))
    tr.write_point(commit(z_dev))

    y = tr.challenge()

    # -- round 3: quotient ----------------------------------------------------
    polys_dev = {
        **{f"advice_{i}": d for i, d in enumerate(advice_dev)},
        **{f"lookup_{i}": d for i, d in enumerate(lookup_dev)},
        "m": m_dev, "h": h_dev, "z": z_dev, "instance": inst_dev,
        **pk.fixed_dev,
    }
    t_chunks_dev = _quotient(pk, polys_dev, beta_lk, beta, gamma, y)
    for tc in t_chunks_dev:
        tr.write_point(commit(tc))

    x = tr.challenge()
    assert pow(x, n, P) != 1, "challenge landed in the domain (negligible)"

    # -- round 4: evaluations -------------------------------------------------
    eval_points = {"x": x, "wx": x * omega % P,
                   "w2x": x * omega * omega % P,
                   "w3x": x * pow(omega, 3, P) % P}
    queries = _query_plan(pk.vk, len(t_chunks_dev))

    all_polys = dict(polys_dev)
    for i, tc in enumerate(t_chunks_dev):
        all_polys[f"t_{i}"] = tc

    stacked_names = sorted(all_polys.keys())
    stacked = jnp.stack([all_polys[nm] for nm in stacked_names])

    evals = {}
    for pt_name, pt_val in eval_points.items():
        needed = [nm for nm in stacked_names
                  if (nm, pt_name) in queries or pt_name == "x"]
        vals = batch_eval(stacked, pt_val, k)
        for nm, v in zip(stacked_names, vals):
            evals[(nm, pt_name)] = v

    # write only the queried evals, in canonical order (skip instance: the
    # verifier computes instance evals itself)
    for nm, pt in sorted(queries):
        if nm == "instance":
            continue
        tr.write_scalar(evals[(nm, pt)])

    v_ch = tr.challenge()
    u_ch = tr.challenge()

    # -- round 5: GWC opening witnesses --------------------------------------
    by_point: dict[str, list[str]] = {}
    for nm, pt in sorted(queries):
        by_point.setdefault(pt, []).append(nm)

    for pt_name in ("x", "wx", "w2x", "w3x"):
        names = by_point.get(pt_name, [])
        if not names:
            continue
        # combined = sum v^i f_i ; combined_eval = sum v^i f_i(p)
        coef = 1
        comb = None
        comb_eval = 0
        from .poly_device import rlc

        coefs = []
        for nm in names:
            coefs.append(coef)
            comb_eval = (comb_eval + coef * evals[(nm, pt_name)]) % P
            coef = coef * v_ch % P
        sub = jnp.stack([all_polys[nm] for nm in names])
        comb = rlc(sub, coefs, k)
        w_dev = opening_witness_evals(comb, comb_eval, eval_points[pt_name], k)
        tr.write_point(commit(w_dev))

    return tr.proof()


def _query_plan(vk: VerifyingKey, n_t_chunks: int):
    """Set of (poly_name, point_name) opened in the proof."""
    q = set()
    for i in range(vk.n_advice):
        for pt in ("x", "wx", "w2x", "w3x"):
            q.add((f"advice_{i}", pt))
        q.add((f"q_{i}", "x"))
    for i in range(vk.n_lookup):
        q.add((f"lookup_{i}", "x"))
    q.add(("const", "x"))
    q.add(("table", "x"))
    q.add(("m", "x"))
    q.add(("h", "x"))
    q.add(("h", "wx"))
    q.add(("z", "x"))
    q.add(("z", "wx"))
    for j in range(vk.n_perm):
        q.add((f"sigma_{j}", "x"))
    for i in range(n_t_chunks):
        q.add((f"t_{i}", "x"))
    q.add(("instance", "x"))  # computed by verifier, not written
    return q


def _compute_h_z(layout: Layout, beta_lk: int, beta: int, gamma: int,
                 omega: int):
    """Host-exact computation of the logUp helper and the grand product."""
    n = layout.n
    # logUp: h[i+1] = h[i] + sum_j 1/(b+L_j[i]) - m[i]/(b+T[i])
    denoms = []
    for col in layout.lookup_cols:
        denoms.extend((beta_lk + v) % P for v in col)
    denoms.extend((beta_lk + t) % P for t in layout.table_col)
    invs = _batch_inv(denoms)
    pos = 0
    l_invs = []
    for _ in layout.lookup_cols:
        l_invs.append(invs[pos : pos + n])
        pos += n
    t_invs = invs[pos : pos + n]
    h = [0] * n
    for i in range(n - 1):
        step = sum(li[i] for li in l_invs) - layout.multiplicity[i] * t_invs[i]
        h[i + 1] = (h[i] + step) % P
    # telescoping must close
    last = (h[n - 1] + sum(li[n - 1] for li in l_invs)
            - layout.multiplicity[n - 1] * t_invs[n - 1]) % P
    assert last == h[0] == 0, "logUp multiplicity mismatch"

    # permutation grand product
    cols = _perm_value_columns(layout)
    sigmas = _sigma_values(layout)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % P
    nums = [1] * n
    dens = [1] * n
    for j, col in enumerate(cols):
        dj = layout.deltas[j]
        for i in range(n):
            nums[i] = nums[i] * ((col[i] + beta * dj * omega_pows[i] + gamma) % P) % P
            dens[i] = dens[i] * ((col[i] + beta * sigmas[j][i] + gamma) % P) % P
    den_invs = _batch_inv(dens)
    z = [1] * n
    for i in range(n - 1):
        z[i + 1] = z[i] * nums[i] % P * den_invs[i] % P
    assert z[n - 1] * nums[n - 1] % P * den_invs[n - 1] % P == 1, \
        "permutation product does not close"
    return h, z


def _perm_value_columns(layout: Layout) -> list[list[int]]:
    out = []
    for kind, c in layout.perm_columns:
        if kind == "advice":
            out.append(layout.advice_cols[c])
        elif kind == "lookup":
            out.append(layout.lookup_cols[c])
        elif kind == "const":
            out.append(layout.const_col)
        else:
            out.append(layout.instance_col)
    return out


# ---------------------------------------------------------------------------
# Quotient on the extended coset domain
# ---------------------------------------------------------------------------

def _quotient(pk: ProvingKey, polys_dev: dict, beta_lk, beta, gamma, y):
    layout, vk = pk.layout, pk.vk
    k, n = layout.k, layout.n
    e_log = vk.ext_log
    E = 1 << e_log
    ne = n * E

    ext = {nm: coset_extended_evals(d, k, e_log) for nm, d in polys_dev.items()}

    # host-precomputed ext-domain structure vectors
    from ..poly.domain import domain
    from ..fields.common import ints_to_limbs

    dome = domain(k + e_log)
    g = FR.generator
    # X values on coset: g * w_e^i  -> only needed times beta*delta_j; and
    # Z_H(X) = g^n w_e^{ni} - 1 (period E), l_0(X) = (X^n-1)/(n(X-1))
    x_vals = [g * pow(dome.omega, i, P) % P for i in range(ne)]
    zh = [(pow(g, n, P) * pow(dome.omega, (n * i) % ne, P) - 1) % P
          for i in range(E)]
    zh_full = [zh[i % E] for i in range(ne)]
    zh_inv = _batch_inv(zh)
    zh_inv_full = [zh_inv[i % E] for i in range(ne)]
    l0 = [zh_full[i] * pow(n * (x_vals[i] - 1) % P, -1, P) % P for i in range(ne)]

    def md(vals):
        return jnp.asarray(ints_to_limbs([v % P * FR.R % P for v in vals]))

    x_dev, l0_dev, zhinv_dev = md(x_vals), md(l0), md(zh_inv_full)

    names = sorted(ext.keys())
    stacked = jnp.stack([ext[nm] for nm in names])
    idx = {nm: i for i, nm in enumerate(names)}

    consts = {
        "beta_lk": beta_lk, "beta": beta, "gamma": gamma, "y": y,
    }

    fn = _quotient_kernel(k, e_log, vk.n_advice, vk.n_lookup, vk.n_perm,
                          tuple(vk.deltas), tuple(sorted(ext.keys())))
    t_ext = fn(stacked, x_dev, l0_dev, zhinv_dev,
               *[jnp.asarray(FR.const(consts[c]))
                 for c in ("beta_lk", "beta", "gamma", "y")])

    coeffs = coset_interpolate(t_ext, k, e_log)
    # split into E chunks of n coefficients, return each in EVALUATION form
    # on H so chunks commit/evaluate/open uniformly with every other poly
    from .poly_device import coeffs_to_evals

    return [coeffs_to_evals(coeffs[i * n : (i + 1) * n], k) for i in range(E)]


@functools.lru_cache(maxsize=16)
def _quotient_kernel(k, e_log, n_advice, n_lookup, n_perm, deltas, names):
    idx = {nm: i for i, nm in enumerate(names)}
    E = 1 << e_log
    one_np = np.asarray(FR.one)

    # perm column order must match keygen.perm_columns
    perm_names = ([f"advice_{c}" for c in range(n_advice)]
                  + [f"lookup_{c}" for c in range(n_lookup)]
                  + ["const", "instance"])

    def rot(a, r):
        return jnp.roll(a, -E * r, axis=0)

    def f(stacked, x_dev, l0_dev, zhinv_dev, blk, beta, gamma, y):
        def get(nm):
            return stacked[idx[nm]]

        total = None

        def acc(term):
            nonlocal total
            total = term if total is None else FR.add(FR.mul(total, y), term)

        # gates
        for c in range(n_advice):
            a = get(f"advice_{c}")
            expr = FR.sub(FR.add(a, FR.mul(rot(a, 1), rot(a, 2))), rot(a, 3))
            acc(FR.mul(get(f"q_{c}"), expr))

        # logUp: (h(w) - h)*prod_j(b+L_j)*(b+T) - sum_j prod_{j'!=j}(b+L_j')*(b+T)
        #        + m*prod_j(b+L_j)
        if n_lookup > 0:
            T = FR.add(get("table"), blk[None, :])
            Ls = [FR.add(get(f"lookup_{c}"), blk[None, :]) for c in range(n_lookup)]
            prod_all = Ls[0]
            for l in Ls[1:]:
                prod_all = FR.mul(prod_all, l)
            dh = FR.sub(rot(get("h"), 1), get("h"))
            term = FR.mul(FR.mul(dh, prod_all), T)
            for j in range(n_lookup):
                others = None
                for j2 in range(n_lookup):
                    if j2 == j:
                        continue
                    others = Ls[j2] if others is None else FR.mul(others, Ls[j2])
                part = T if others is None else FR.mul(others, T)
                term = FR.sub(term, part)
            term = FR.add(term, FR.mul(get("m"), prod_all))
            acc(term)

        # permutation
        znum = rot(get("z"), 1)
        zden = get("z")
        num = None
        den = None
        for j, nm in enumerate(perm_names):
            vj = get(nm)
            dj = jnp.asarray(FR.const_np(deltas[j]))
            lhs = FR.add(FR.add(vj, FR.mul(FR.mul(beta[None, :], dj[None, :]), x_dev)), gamma[None, :])
            rhs = FR.add(FR.add(vj, FR.mul(beta[None, :], get(f"sigma_{j}"))), gamma[None, :])
            num = lhs if num is None else FR.mul(num, lhs)
            den = rhs if den is None else FR.mul(den, rhs)
        acc(FR.sub(FR.mul(znum, den), FR.mul(zden, num)))

        # l_0 * (z - 1)
        one = jnp.asarray(one_np)
        acc(FR.mul(l0_dev, FR.sub(get("z"), jnp.broadcast_to(one, get("z").shape))))

        return FR.mul(total, zhinv_dev)

    return jax.jit(f)


# ---------------------------------------------------------------------------
# Verifier (host)
# ---------------------------------------------------------------------------

def verify(vk: VerifyingKey, srs_g2, srs_tau_g2, instances: list[int],
           proof: list) -> bool:
    n = 1 << vk.k
    omega = vk.omega
    stream = iter(proof)
    tr = Transcript()
    for v in instances:
        tr.write_scalar(v)
        kind, s = next(stream)
        assert kind == "scalar" and s == v % P, "instance mismatch in proof"

    comm = dict(vk.commitments)  # fixed/sigma columns from the vk
    for i in range(vk.n_advice):
        comm[f"advice_{i}"] = tr.read_point(stream)
    for i in range(vk.n_lookup):
        comm[f"lookup_{i}"] = tr.read_point(stream)
    comm["m"] = tr.read_point(stream)
    beta_lk = tr.challenge()
    beta = tr.challenge()
    gamma = tr.challenge()
    comm["h"] = tr.read_point(stream)
    comm["z"] = tr.read_point(stream)
    y = tr.challenge()
    E = 1 << vk.ext_log
    for i in range(E):
        comm[f"t_{i}"] = tr.read_point(stream)
    x = tr.challenge()

    queries = _query_plan(vk, E)
    evals = {}
    for nm, pt in sorted(queries):
        if nm == "instance":
            continue
        evals[(nm, pt)] = tr.read_scalar(stream)

    # instance eval at x (barycentric over its nonzero prefix)
    evals[("instance", "x")] = _eval_instance(instances, x, vk.k, omega)

    v_ch = tr.challenge()
    u_ch = tr.challenge()

    # -- identity check at x -------------------------------------------------
    perm_names = ([f"advice_{c}" for c in range(vk.n_advice)]
                  + [f"lookup_{c}" for c in range(vk.n_lookup)]
                  + ["const", "instance"])
    total = 0
    for c in range(vk.n_advice):
        a = evals[(f"advice_{c}", "x")]
        a1 = evals[(f"advice_{c}", "wx")]
        a2 = evals[(f"advice_{c}", "w2x")]
        a3 = evals[(f"advice_{c}", "w3x")]
        expr = (a + a1 * a2 - a3) % P
        total = (total * y + evals[(f"q_{c}", "x")] * expr) % P
    if vk.n_lookup:
        T = (evals[("table", "x")] + beta_lk) % P
        Ls = [(evals[(f"lookup_{c}", "x")] + beta_lk) % P
              for c in range(vk.n_lookup)]
        prod_all = 1
        for l in Ls:
            prod_all = prod_all * l % P
        dh = (evals[("h", "wx")] - evals[("h", "x")]) % P
        term = dh * prod_all % P * T % P
        for j in range(vk.n_lookup):
            others = 1
            for j2 in range(vk.n_lookup):
                if j2 != j:
                    others = others * Ls[j2] % P
            term = (term - others * T) % P
        term = (term + evals[("m", "x")] * prod_all) % P
        total = (total * y + term) % P
    num = 1
    den = 1
    for j, nm in enumerate(perm_names):
        vj = evals[(nm, "x")]
        num = num * ((vj + beta * vk.deltas[j] % P * x + gamma) % P) % P
        den = den * ((vj + beta * evals[(f"sigma_{j}", "x")] + gamma) % P) % P
    total = (total * y + evals[("z", "wx")] * den - evals[("z", "x")] * num) % P
    zh_x = (pow(x, n, P) - 1) % P
    l0_x = zh_x * pow(n * (x - 1) % P, -1, P) % P
    total = (total * y + l0_x * ((evals[("z", "x")] - 1) % P)) % P

    t_at_x = 0
    xn = pow(x, n, P)
    for i in range(E - 1, -1, -1):
        t_at_x = (t_at_x * xn + evals[(f"t_{i}", "x")]) % P
    if total != t_at_x * zh_x % P:
        return False

    # -- GWC pairing check ---------------------------------------------------
    eval_points = {"x": x, "wx": x * omega % P,
                   "w2x": x * omega % P * omega % P,
                   "w3x": x * pow(omega, 3, P) % P}
    by_point: dict[str, list[str]] = {}
    for nm, pt in sorted(queries):
        by_point.setdefault(pt, []).append(nm)

    w_comms = {}
    for pt_name in ("x", "wx", "w2x", "w3x"):
        if by_point.get(pt_name):
            w_comms[pt_name] = tr.read_point(stream)

    # aggregate: sum_p u^p [ F_p + p*W_p - [e_p]G ] vs sum_p u^p W_p
    # where F_p = sum_i v^i C_i, e_p = sum_i v^i f_i(p)
    lhs_acc = AffinePoint.identity(BN254_G1)
    rhs_acc = AffinePoint.identity(BN254_G1)
    gen = AffinePoint.generator(BN254_G1)
    u_pow = 1
    for pt_name in ("x", "wx", "w2x", "w3x"):
        names = by_point.get(pt_name)
        if not names:
            continue
        coef = 1
        f_acc = AffinePoint.identity(BN254_G1)
        e_acc = 0
        for nm in names:
            c_pt = comm[nm] if nm != "instance" else None
            if nm == "instance":
                # instance commitment: verifier recomputes it? -- instead
                # fold the known eval only; commitment must be supplied.
                c_pt = _instance_commitment(vk, instances)
            f_acc = f_acc + coef * c_pt
            e_acc = (e_acc + coef * evals[(nm, pt_name)]) % P
            coef = coef * v_ch % P
        w = w_comms[pt_name]
        term = f_acc + eval_points[pt_name] * w - e_acc * gen
        lhs_acc = lhs_acc + u_pow * term
        rhs_acc = rhs_acc + u_pow * w
        u_pow = u_pow * u_ch % P

    # e(lhs, G2) * e(-rhs, tau G2)... pairing identity:
    # W*(tau - p) = f - e  =>  e(W, [tau]G2) = e(F + pW - eG, G2)
    return pr.pairing_check([
        (lhs_acc, srs_g2),
        (-rhs_acc, srs_tau_g2),
    ])


@functools.lru_cache(maxsize=None)
def _instance_commitment_cache():
    return {}


def _instance_commitment(vk: VerifyingKey, instances):
    """Commitment to the instance column -- verifier-side MSM over the
    Lagrange SRS prefix (small: only len(instances) points)."""
    key = (vk.k, tuple(v % P for v in instances))
    cache = _instance_commitment_cache()
    if key not in cache:
        srs = gen_srs(vk.k)
        ops = bn254_ops()
        pts = ops.to_affine_host(JacPoint(
            srs.g1_lagrange.x[: len(instances)],
            srs.g1_lagrange.y[: len(instances)],
            srs.g1_lagrange.z[: len(instances)],
        )) if instances else []
        acc = AffinePoint.identity(BN254_G1)
        for v, pt in zip(instances, pts):
            acc = acc + (v % P) * pt
        cache[key] = acc
    return cache[key]


def _eval_instance(instances, x, k, omega):
    """Barycentric eval of the instance column at x (zeros elsewhere)."""
    n = 1 << k
    zn = (pow(x, n, P) - 1) % P
    n_inv = pow(n, -1, P)
    acc = 0
    w = 1
    for i, v in enumerate(instances):
        if v % P:
            acc = (acc + v * w % P * pow((x - w) % P, -1, P)) % P
        w = w * omega % P
    return acc * zn % P * n_inv % P
