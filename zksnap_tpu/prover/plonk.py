"""PLONK prover/verifier over KZG (the halo2_proofs `create_proof` /
`verify_proof` equivalent -- SURVEY.md section 3.2 hot path).

Protocol (one phase, vertical flex gate, logUp lookups, halo2-style
chunked permutation grand products, GWC multiopen):

  commit advice + lookup columns + logUp multiplicities
  -> challenges beta_lk, beta, gamma
  -> compute + commit logUp helper h and permutation grand products Z_c
     (chunks of PERM_CHUNK=2 columns, chained halo2-style through an
     omega^usable rotation so every constraint stays degree <= 4 and the
     extended domain is only 4x)
  -> challenge y; quotient t on the extended coset domain (device NTTs);
     commit t chunks
  -> challenge x; batched barycentric evals of every queried poly
  -> challenges v, u; GWC opening witnesses W_p for p in
     {x, wx, w2x, w3x, wux} computed pointwise on the domain (no synthetic
     division), committed via Lagrange-basis MSM
  -> verifier replays the transcript, checks the combined identity at x
     and one pairing.

Deviation notes vs halo2 (capability-equivalent, TPU-motivated):
  * lookup argument is logUp (log-derivative) instead of halo2's
    permuted-column lookup -- fewer committed polys, no sorting;
  * zero-knowledge blinding: the ZK_ROWS tail rows of every
    witness-carrying committed polynomial are filled with fresh
    randomness in `_prove_impl` (see `prove` docstring for the logUp
    caveat it shares with halo2's lookup argument).
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
from .keygen import Layout, layout_circuit, PERM_CHUNK, ZK_ROWS
from .poly_device import (
    coeffs_to_evals,
    commit_coeffs,
    commit_evals,
    eval_coeffs_list,
    evals_to_coeffs,
    mont_to_canonical,
    opening_witness_evals,
    rlc_list,
    to_device_poly,
)
from .srs import SRS, gen_srs
from .transcript import Transcript

FR = bn254_fr()
P = FR.p
POINT_NAMES = ("x", "wx", "w2x", "w3x", "wux")


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
    n_z: int
    usable: int
    deltas: list[int]
    num_instance: int
    commitments: dict  # name -> AffinePoint (fixed/sigma/active columns)
    omega: int


@dataclass
class ProvingKey:
    vk: VerifyingKey
    layout: Layout
    srs: SRS
    fixed_coeffs: dict  # name -> [n,16] device Montgomery COEFFICIENTS
    # (coefficient form is the prover's at-rest representation: the
    # streamed per-coset quotient consumes coefficients, and rounds 2/4/5
    # derive the few evaluation-form columns they need by forward NTT --
    # keeping both forms resident would double HBM at wrapper scale)


def _sigma_values(layout: Layout) -> list[list[int]]:
    """sigma_j(w^i) = delta_{j'} * w^{i'} as field values (host oracle;
    the prover uses `_sigma_values_dev`)."""
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


def _sigma_values_dev(layout: Layout):
    """Yields device sigma columns [n,16] Montgomery one at a time: a
    gather of delta^{j'} * omega^{i'} from two device power tables (the
    host version is O(n_perm * n) python bigint muls -- minutes at k=21;
    the former all-at-once [n_perm, n, 16] stack was 7.4GB of HBM at
    wrapper width, so columns now stream through keygen's ingest)."""
    from ..fields.common import ints_to_limbs
    from ..poly.domain import domain
    from .poly_device import pow_series

    n = layout.n
    omega_pows = pow_series(domain(layout.k).omega, n)
    delta_mont = jnp.asarray(
        ints_to_limbs([d * FR.R % P for d in layout.deltas]))
    fn = jax.jit(lambda dm, op, s: FR.mul(
        jnp.broadcast_to(dm[s[:, 0]], (n, 16)), op[s[:, 1]]))
    for j in range(len(layout.perm_columns)):
        sig_j = jnp.asarray(layout.sigma[j])  # [n, 2] int32
        yield fn(delta_mont, omega_pows, sig_j)


class LazyFixedCoeffs:
    """Dict-like provider computing fixed-column COEFFICIENT tensors on
    demand instead of keeping them resident.

    At wrapper width the materialized fixed polys (q_i per advice column,
    sigma_j per permutation column, const/table/active) are the largest
    at-rest HBM term (~6-9GB even uint16-packed).  Their SOURCES are
    tiny: q is an (n,) uint8 selector bitmap, sigma an [n_perm, n, 2]
    int32 permutation array (gathered against cached power tables), the
    rest host columns -- so each poly is rebuilt in 1-2 device NTTs at
    its point of use (the streamed quotient already pulls coefficients
    one name at a time).  `evals(name)` serves evaluation form directly
    (skips the iNTT for round-2 consumers)."""

    def __init__(self, layout: "Layout", k: int):
        import numpy as np

        self.k = k
        self.n = layout.n
        self.q_cols = [np.asarray(q) for q in layout.q_cols]
        self.const_col = np.asarray(layout.const_col)
        self.table_col = list(layout.table_col)
        self.active_col = list(layout.active_col)
        self.sigma = np.asarray(layout.sigma)      # host [n_perm, n, 2] int32
        self.deltas = list(layout.deltas)
        self._sigma_dev = None
        self._names = ([f"q_{i}" for i in range(len(self.q_cols))]
                       + ["const", "table", "active"]
                       + [f"sigma_{j}" for j in range(len(self.deltas))])

    def keys(self):
        return list(self._names)

    def __iter__(self):
        return iter(self._names)

    def __contains__(self, nm):
        return nm in self._names

    def _sigma_gather(self, j: int):
        from ..fields.common import ints_to_limbs
        from ..poly.domain import domain
        from .poly_device import pow_series

        if self._sigma_dev is None:
            self._sigma_dev = jnp.asarray(self.sigma)
        omega_pows = pow_series(domain(self.k).omega, self.n)
        delta_mont = jnp.asarray(
            ints_to_limbs([d * FR.R % P for d in self.deltas]))
        fn = _sigma_gather_fn(self.k)
        return fn(delta_mont, omega_pows, self._sigma_dev[j])

    def evals(self, nm: str):
        """Evaluation-form [n,16] Montgomery of a fixed column."""
        if nm.startswith("sigma_"):
            return self._sigma_gather(int(nm[6:]))
        if nm.startswith("q_"):
            return to_device_poly(self.q_cols[int(nm[2:])])
        if nm == "const":
            return to_device_poly(self.const_col)
        if nm == "table":
            return to_device_poly(self.table_col)
        if nm == "active":
            return to_device_poly(self.active_col)
        raise KeyError(nm)

    def __getitem__(self, nm: str):
        return evals_to_coeffs(self.evals(nm), self.k)

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_sigma_dev"] = None
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)


@functools.lru_cache(maxsize=8)
def _sigma_gather_fn(k: int):
    n = 1 << k
    return jax.jit(lambda dm, op, s: FR.mul(
        jnp.broadcast_to(dm[s[:, 0]], (n, 16)), op[s[:, 1]]))


def _fixed_evals(pk: "ProvingKey", nm: str):
    """Evaluation form of a fixed column (provider shortcut or NTT)."""
    if isinstance(pk.fixed_coeffs, LazyFixedCoeffs):
        return pk.fixed_coeffs.evals(nm)
    return coeffs_to_evals(pk.fixed_coeffs[nm], pk.layout.k)


class _ChainCoeffs:
    """Two-level name->tensor lookup (witness dict over fixed provider);
    writes go to the first map.  Keeps lazy fixed entries lazy."""

    def __init__(self, first: dict, second):
        self.first = first
        self.second = second

    def __getitem__(self, nm):
        if nm in self.first:
            return self.first[nm]
        return self.second[nm]

    def __setitem__(self, nm, v):
        self.first[nm] = v

    def __contains__(self, nm):
        return nm in self.first or nm in self.second

    def keys(self):
        return list(self.first.keys()) + [k_ for k_ in self.second.keys()
                                          if k_ not in self.first]


# threshold above which keygen keeps fixed columns lazy: materialized
# uint16 coeffs for n_fixed polys cost n_fixed * n * 32 bytes of HBM
LAZY_FIXED_BYTES = 2 << 30


def keygen(ctx: Context, k: int, srs: SRS | None = None,
           mesh=None, mesh_axis: str = "x") -> ProvingKey:
    """Layout + pk/vk generation; `mesh` runs the commitment MSMs and NTTs
    mesh-sharded (see `prove`)."""
    if mesh is not None:
        from .poly_device import prover_mesh

        with prover_mesh(mesh, mesh_axis):
            return _keygen_impl(ctx, k, srs)
    return _keygen_impl(ctx, k, srs)


def _keygen_impl(ctx: Context, k: int, srs: SRS | None = None) -> ProvingKey:
    layout = layout_circuit(ctx, k)
    srs = srs or gen_srs(k)
    n_perm = len(layout.perm_columns)
    n_z = -(-n_perm // PERM_CHUNK)
    # logUp folds all lookup columns into one argument of degree
    # n_lookup + 2 (6-column budget); see keygen.quotient_ext_log
    from .keygen import quotient_ext_log

    ext_log = quotient_ext_log(layout.n_lookup)

    fixed_host = {}
    for i, q in enumerate(layout.q_cols):
        fixed_host[f"q_{i}"] = q
    fixed_host["const"] = layout.const_col
    fixed_host["table"] = layout.table_col
    fixed_host["active"] = layout.active_col

    # evals are transient here (commit + iNTT); the pk keeps coefficients
    commitments = {}
    fixed_coeffs = {}
    ops = bn254_ops()

    from .poly_device import pack_poly

    n_fixed = len(fixed_host) + n_perm
    lazy = n_fixed * layout.n * 32 > LAZY_FIXED_BYTES

    def ingest(name, dev_evals):
        c = commit_evals(srs.g1_lagrange, mont_to_canonical(dev_evals))
        commitments[name] = ops.to_affine_host(c)[0]
        if not lazy:
            # uint16 at-rest form: halves pk HBM (poly_device.pack_poly)
            fixed_coeffs[name] = pack_poly(evals_to_coeffs(dev_evals, k))

    for name, v in fixed_host.items():
        ingest(name, to_device_poly(v))
    for j, s in enumerate(_sigma_values_dev(layout)):
        ingest(f"sigma_{j}", s)
    if lazy:
        fixed_coeffs = LazyFixedCoeffs(layout, k)

    from ..poly.domain import domain

    vk = VerifyingKey(
        k=k, ext_log=ext_log, n_advice=layout.n_advice,
        n_lookup=layout.n_lookup, lookup_bits=layout.lookup_bits,
        n_perm=n_perm, n_z=n_z, usable=layout.usable,
        deltas=layout.deltas,
        num_instance=len(ctx.instance),
        commitments=commitments, omega=domain(k).omega,
    )
    return ProvingKey(vk=vk, layout=layout, srs=srs,
                      fixed_coeffs=fixed_coeffs)


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

def rebind_witness(pk: ProvingKey, ctx: Context) -> ProvingKey:
    """Reuse a proving key with a fresh witness (same circuit structure).

    The reference's keygen is witness-independent; ours snapshots the
    synthesis, so a new Context (same circuit, new inputs) is rebound by
    replacing the witness-dependent columns.  Structure (gates, copies,
    constants, lookups) must match the keygen synthesis exactly.
    """
    import copy

    old = pk.layout
    assert len(ctx.advice) == old.cell_map.shape[0], "witness shape mismatch"
    assert len(ctx.gate_offsets) == sum(
        int(q.sum()) for q in old.q_cols), "gate structure mismatch"
    assert len(ctx.lookups) == len(old.lookup_idx), "lookup structure mismatch"
    layout = copy.copy(old)
    n = old.n
    layout.advice_limbs = ctx.advice.limbs()
    layout.lookup_idx = ctx.lookups.array()
    from .keygen import _multiplicity_counts

    layout.multiplicity = _multiplicity_counts(
        layout.advice_limbs, layout.lookup_idx, old.n_lookup, n)
    layout.instance_col = ([c.value for c in ctx.instance]
                           + [0] * (n - len(ctx.instance)))
    return ProvingKey(vk=pk.vk, layout=layout, srs=pk.srs,
                      fixed_coeffs=pk.fixed_coeffs)


def prove(pk: ProvingKey, instances: list[int],
          mesh=None, mesh_axis: str = "x") -> bytes:
    """Prove; ZK blinding fills the reserved tail rows (see _blind_*).

    `mesh`: a jax.sharding.Mesh -- every commitment MSM runs
    tensor-parallel (local Pippenger + one all_gather) and every NTT runs
    as the all_to_all four-step transform over `mesh_axis`
    (poly_device.prover_mesh); elementwise kernels inherit shardings via
    GSPMD.  `mesh=None` (default) is the single-chip path.

    Blinding (halo2 create_proof parity, wrapper.rs:129-137): every
    witness-carrying committed polynomial gets random values in the
    ZK_ROWS tail rows (more rows than any poly's opening count), so the
    commitments are hiding and the opened evaluations do not determine
    the witness.  Lookup columns are blinded with random TABLE entries
    (the logUp identity spans all rows), which randomizes the
    multiplicity column as a side effect; the logUp helper h remains a
    deterministic function of the blinded inputs -- same residual-ZK
    caveat as halo2's own lookup argument carries for its product
    column inputs.
    """
    if mesh is not None:
        from .poly_device import prover_mesh

        with prover_mesh(mesh, mesh_axis):
            return _prove_impl(pk, instances)
    return _prove_impl(pk, instances)


def _prove_impl(pk: ProvingKey, instances: list[int]) -> bytes:
    import secrets

    layout = pk.layout
    n, k = layout.n, layout.k
    usable = layout.usable
    ops = bn254_ops()
    from ..poly.domain import domain

    omega = domain(k).omega

    tr = Transcript()
    for v in instances:
        tr.absorb_scalar(v)  # binds instances into Fiat-Shamir (not written)

    # -- round 1: blind + commit witness columns ----------------------------
    from ..fields.common import ints_to_limbs_fast

    def _blind_tail(col16):
        """Replace the ZK_ROWS tail of an (n,16) limb column with fresh
        randomness (fresh array each call; accessors return copies)."""
        tail = [secrets.randbelow(P) for _ in range(n - usable)]
        col16[usable:] = ints_to_limbs_fast(tail).astype(np.uint16)
        return col16, tail

    def commit(dev):
        return ops.to_affine_host(
            commit_evals(pk.srs.g1_lagrange, mont_to_canonical(dev)))[0]

    from .poly_device import pack_poly

    # Advice evals are TRANSIENT: blind, upload, commit, iNTT to packed
    # coefficients, free -- never more than one advice eval buffer lives
    # at a time (47 resident eval columns were ~6GB at wrapper width).
    coeffs = {}
    for c in range(layout.n_advice):
        col, _ = _blind_tail(layout.advice_col(c))
        d = to_device_poly(col)
        tr.write_point(commit(d))
        coeffs[f"advice_{c}"] = pack_poly(evals_to_coeffs(d, k))
        del d

    if layout.n_lookup:
        tb = 1 << layout.lookup_bits
        mult = list(layout.multiplicity)
        lookup_cols = []
        for c in range(layout.n_lookup):
            col = layout.lookup_col(c)
            tail = [secrets.randbelow(tb) for _ in range(n - usable)]
            for v in tail:
                mult[v] += 1
            mult[0] -= n - usable  # the zero padding rows tail replaces
            col[usable:] = ints_to_limbs_fast(tail).astype(np.uint16)
            lookup_cols.append(col)
    else:
        mult = layout.multiplicity
        lookup_cols = []

    # lookup evals stay resident through rounds 1-2 (h + the permutation
    # needs them; n_lookup <= 6 bounds this at ~0.8GB)
    lookup_dev = [to_device_poly(c) for c in lookup_cols]
    m_dev = to_device_poly(mult)
    inst_dev = to_device_poly(layout.instance_col)

    for dev in lookup_dev:
        tr.write_point(commit(dev))
    tr.write_point(commit(m_dev))

    beta_lk = tr.challenge()
    beta = tr.challenge()
    gamma = tr.challenge()

    # -- round 2: logUp helper h + chunked grand products (device) ----------
    from .device_rounds import compute_h_dev, compute_z_dev

    # fixed columns live as coefficients in the pk; round 2 needs a few
    # of them in evaluation form (transient forward NTTs)
    table_ev = _fixed_evals(pk, "table")
    const_ev = _fixed_evals(pk, "const")

    if layout.n_lookup:
        h_dev, h_closure = compute_h_dev(
            k, lookup_dev, table_ev, m_dev, beta_lk)
    else:
        h_dev = jnp.zeros((n, 16), jnp.uint32)
        h_closure = None
    del table_ev

    def col_loader(j):
        """Evaluation form of permutation column j, regenerated on demand
        (advice evals were freed after round 1; one forward NTT each)."""
        kind, c = layout.perm_columns[j]
        if kind == "advice":
            return coeffs_to_evals(coeffs[f"advice_{c}"], k)
        if kind == "lookup":
            return lookup_dev[c]
        if kind == "const":
            return const_ev
        return inst_dev

    z_devs, z_closure = compute_z_dev(
        layout, col_loader, lambda j: _fixed_evals(pk, f"sigma_{j}"),
        beta, gamma)
    # blind Z: rows (usable, n) are unconstrained (the permutation terms
    # are active-masked; l_0/l_u pin rows 0 and usable only)
    from ..fields.common import ints_to_limbs

    z_tail = n - usable - 1
    if z_tail > 0:
        for c in range(len(z_devs)):
            rand_rows = jnp.asarray(ints_to_limbs(
                [secrets.randbelow(P) for _ in range(z_tail)]))
            z_devs[c] = z_devs[c].at[usable + 1:].set(rand_rows)
    # one small readback checks both closure identities
    if h_closure is not None:
        assert not np.asarray(jax.device_get(h_closure)).any(), \
            "logUp multiplicity mismatch"
    assert np.array_equal(np.asarray(jax.device_get(z_closure)),
                          np.asarray(FR.one)), \
        "chained permutation product does not close"
    tr.write_point(commit(h_dev))
    # commit each z and immediately convert to packed coefficients
    for c in range(len(z_devs)):
        tr.write_point(commit(z_devs[c]))
        coeffs[f"z_{c}"] = pack_poly(evals_to_coeffs(z_devs[c], k))
        z_devs[c] = None
    del z_devs, const_ev

    y = tr.challenge()

    # -- convert the remaining witness columns to coefficient form ------------
    for i, d in enumerate(lookup_dev):
        coeffs[f"lookup_{i}"] = pack_poly(evals_to_coeffs(d, k))
    del lookup_dev
    coeffs["m"] = pack_poly(evals_to_coeffs(m_dev, k))
    coeffs["h"] = pack_poly(evals_to_coeffs(h_dev, k))
    coeffs["instance"] = pack_poly(evals_to_coeffs(inst_dev, k))
    del m_dev, h_dev, inst_dev
    # fixed columns join through a chain view: with a LazyFixedCoeffs
    # provider they are rebuilt at each point of use instead of residing
    coeffs = _ChainCoeffs(coeffs, pk.fixed_coeffs)

    # -- round 3: quotient (streamed per extension coset) ---------------------
    t_chunk_coeffs = _quotient(pk, coeffs, beta_lk, beta, gamma, y)
    for tc in t_chunk_coeffs:
        tr.write_point(ops.to_affine_host(
            commit_coeffs(pk.srs.g1, tc))[0])

    x = tr.challenge()
    assert pow(x, n, P) != 1, "challenge landed in the domain (negligible)"

    # -- round 4: evaluations (from coefficients) -----------------------------
    eval_points = _eval_points(x, omega, pk.vk.usable)
    queries = _query_plan(pk.vk, len(t_chunk_coeffs))

    all_coeffs = coeffs  # chain view; "t" lands in the witness dict
    # combined quotient: t = sum_i xn^i t_i (the only t poly opened; its
    # eval is derived by the verifier, see _query_plan)
    xn = pow(x, n, P)
    from .poly_device import pack_poly as _pp

    # packed like every other at-rest poly (uniform dtype signatures for
    # the round-4/5 list kernels)
    all_coeffs["t"] = _pp(rlc_list(
        t_chunk_coeffs,
        [pow(xn, i, P) for i in range(len(t_chunk_coeffs))], k))
    del t_chunk_coeffs

    stacked_names = sorted(all_coeffs.keys())
    pts_active = [ptn for ptn in POINT_NAMES
                  if any(pt == ptn for _, pt in queries)]

    # chunked: 16 polys at a time (never the whole ~140-poly set -- with
    # a lazy fixed provider each batch is rebuilt once and evaluated at
    # every active point before being freed)
    evals = {}
    EV_CHUNK = 16
    for i0 in range(0, len(stacked_names), EV_CHUNK):
        batch = stacked_names[i0 : i0 + EV_CHUNK]
        polys = [all_coeffs[nm] for nm in batch]
        for pt_name in pts_active:
            vals = eval_coeffs_list(polys, eval_points[pt_name], k)
            for nm, v in zip(batch, vals):
                evals[(nm, pt_name)] = v
        del polys

    for nm, pt in sorted(queries):
        if nm in ("instance", "t"):
            continue  # verifier-derived evals are never written
        tr.write_scalar(evals[(nm, pt)])

    v_ch = tr.challenge()
    u_ch = tr.challenge()

    # -- round 5: GWC opening witnesses --------------------------------------
    by_point: dict[str, list[str]] = {}
    for nm, pt in sorted(queries):
        by_point.setdefault(pt, []).append(nm)

    for pt_name in POINT_NAMES:
        names = by_point.get(pt_name, [])
        if not names:
            continue
        coef = 1
        coefs = []
        comb_eval = 0
        for nm in names:
            coefs.append(coef)
            comb_eval = (comb_eval + coef * evals[(nm, pt_name)]) % P
            coef = coef * v_ch % P
        comb_coeffs = None
        for i0 in range(0, len(names), EV_CHUNK):
            part = rlc_list([all_coeffs[nm] for nm in names[i0:i0+EV_CHUNK]],
                            coefs[i0 : i0 + EV_CHUNK], k)
            comb_coeffs = (part if comb_coeffs is None
                           else _add_polys_fn()(comb_coeffs, part))
        comb = coeffs_to_evals(comb_coeffs, k)
        w_dev = opening_witness_evals(comb, comb_eval, eval_points[pt_name], k)
        tr.write_point(commit(w_dev))

    return tr.proof()


@functools.cache
def _add_polys_fn():
    return jax.jit(FR.add, donate_argnums=(0,))


def _eval_points(x: int, omega: int, usable: int) -> dict:
    return {
        "x": x,
        "wx": x * omega % P,
        "w2x": x * pow(omega, 2, P) % P,
        "w3x": x * pow(omega, 3, P) % P,
        "wux": x * pow(omega, usable, P) % P,
    }


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
    q.add(("active", "x"))
    q.add(("m", "x"))
    q.add(("h", "x"))
    q.add(("h", "wx"))
    for c in range(vk.n_z):
        q.add((f"z_{c}", "x"))
        q.add((f"z_{c}", "wx"))
        if c < vk.n_z - 1:
            q.add((f"z_{c}", "wux"))
    for j in range(vk.n_perm):
        q.add((f"sigma_{j}", "x"))
    # the combined quotient t = sum_i X^{n*i} t_i is opened at x, but its
    # claimed evaluation is DERIVED by the verifier from the constraint
    # identity (total / zh(x)) rather than read from the stream -- halo2 /
    # snark-verifier semantics: a false identity surfaces as an invalid
    # KZG opening claim, i.e. the final pairing fails.  This is what lets
    # the wrapper circuit run succinct verification on round-0 dummy
    # snarks (wrapper.rs:361-385 select_accumulator) without unsatisfiable
    # hard constraints.
    q.add(("t", "x"))
    q.add(("instance", "x"))  # computed by verifier, not written
    return q


def _col_ints(col) -> list[int]:
    """Host-oracle column accessor: (n,16) uint16 limb rows or a plain
    int list -> list of python ints (tiny-k test oracles only)."""
    import numpy as np

    if isinstance(col, np.ndarray) and col.ndim == 2:
        from ..trace.context import u16_rows_to_ints

        return u16_rows_to_ints(col)
    return [int(v) for v in col]


def _compute_h(layout: Layout, beta_lk: int) -> list[int]:
    """logUp helper: h[i+1] = h[i] + sum_j 1/(b+L_j[i]) - m[i]/(b+T[i])."""
    n = layout.n
    denoms = []
    for c in range(layout.n_lookup):
        denoms.extend((beta_lk + v) % P
                      for v in _col_ints(layout.lookup_col(c)))
    denoms.extend((beta_lk + t) % P for t in layout.table_col)
    invs = _batch_inv(denoms)
    pos = 0
    l_invs = []
    for _ in range(layout.n_lookup):
        l_invs.append(invs[pos : pos + n])
        pos += n
    t_invs = invs[pos : pos + n]
    h = [0] * n
    for i in range(n - 1):
        step = sum(li[i] for li in l_invs) - layout.multiplicity[i] * t_invs[i]
        h[i + 1] = (h[i] + step) % P
    last = (h[n - 1] + sum(li[n - 1] for li in l_invs)
            - layout.multiplicity[n - 1] * t_invs[n - 1]) % P
    assert last == h[0] == 0, "logUp multiplicity mismatch"
    return h


def _perm_chunks(n_perm: int) -> list[list[int]]:
    return [list(range(c, min(c + PERM_CHUNK, n_perm)))
            for c in range(0, n_perm, PERM_CHUNK)]


def _compute_z_chunks(layout: Layout, beta: int, gamma: int,
                      omega: int) -> list[list[int]]:
    """Chained grand products, one per PERM_CHUNK columns, rows < usable."""
    n, u = layout.n, layout.usable
    cols = _perm_value_columns(layout)
    sigmas = _sigma_values(layout)
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % P

    chunks = _perm_chunks(len(layout.perm_columns))
    z_list = []
    carry = 1
    all_dens = []
    for chunk in chunks:
        for i in range(u):
            d = 1
            for j in chunk:
                d = d * ((cols[j][i] + beta * sigmas[j][i] + gamma) % P) % P
            all_dens.append(d)
    den_invs = _batch_inv(all_dens)
    pos = 0
    for chunk in chunks:
        z = [0] * n
        z[0] = carry
        for i in range(u):
            num = 1
            for j in chunk:
                num = num * ((cols[j][i]
                              + beta * layout.deltas[j] % P * omega_pows[i]
                              + gamma) % P) % P
            z[i + 1] = z[i] * num % P * den_invs[pos] % P
            pos += 1
        for i in range(u + 1, n):
            z[i] = z[u]
        carry = z[u]
        z_list.append(z)
    assert carry == 1, "chained permutation product does not close"
    return z_list


def _perm_value_columns(layout: Layout) -> list[list[int]]:
    out = []
    for kind, c in layout.perm_columns:
        if kind == "advice":
            out.append(_col_ints(layout.advice_col(c)))
        elif kind == "lookup":
            out.append(_col_ints(layout.lookup_col(c)))
        elif kind == "const":
            out.append(_col_ints(layout.const_col))
        else:
            out.append(layout.instance_col)
    return out


# ---------------------------------------------------------------------------
# Quotient on the extended coset domain
# ---------------------------------------------------------------------------

def _coset_scalars(k: int, e_log: int, j: int, usable: int):
    """Host-side per-coset scalars for the quotient kernel: the coset
    shift s_j = g*w_e^j, zh(s_j) = s_j^n - 1 (constant on a coset), its
    inverse, and w^usable -- each as a Montgomery [16] numpy vector.

    The [n,16] tables derived from these (x_i = s*w^i, l0_i, lu_i) are
    computed INSIDE `_quotient_kernel` from the shared omega power table:
    caching them per coset held 3 * E * n * 64B of HBM (3.2GB at k=21,
    the root cause of the round-3 warm-prove OOM -- VERDICT r3 item 3)
    for ~1% of prove time recomputing."""
    from ..poly.domain import domain

    n = 1 << k
    dome = domain(k + e_log)
    s = FR.generator * pow(dome.omega, j, P) % P
    zh = (pow(s, n, P) - 1) % P
    wu = pow(domain(k).omega, usable, P)
    return (FR.const(s), FR.const(zh), FR.const(pow(zh, -1, P)),
            FR.const(wu))


def _quotient(pk: ProvingKey, coeffs: dict, beta_lk, beta, gamma, y):
    """Quotient t = (constraint combination) / zh on the extended coset
    domain, STREAMED one coset at a time AND one constraint term at a
    time (halo2's coeff_to_extended evaluates all E cosets of all polys
    at once; even one coset's full eval set is ~19GB at wrapper width,
    so each term kernel re-derives just the coset evals it consumes and
    Horner-accumulates into a single donated [n,16] buffer).  The term
    ORDER is exactly the old monolithic kernel's (gates, logUp,
    permutation chunks, boundary terms), so proofs are byte-identical
    and the frozen protocol vectors still verify.  Takes/returns
    COEFFICIENT form: coeffs dict in, list of E t-chunk tensors out."""
    from ..poly.domain import domain
    from .poly_device import coset_evals, pow_series, pow_series_uncached

    layout, vk = pk.layout, pk.vk
    k, n = layout.k, layout.n
    e_log = vk.ext_log
    E = 1 << e_log
    dome = domain(k + e_log)
    g = FR.generator
    chunks = _perm_chunks(vk.n_perm)
    n_z = len(chunks)
    perm_names = ([f"advice_{c}" for c in range(vk.n_advice)]
                  + [f"lookup_{c}" for c in range(vk.n_lookup)]
                  + ["const", "instance"])

    from ..fields.common import ints_to_limbs

    blk_c, beta_c, gamma_c, y_c = (
        jnp.asarray(FR.const(v)) for v in (beta_lk, beta, gamma, y))

    omega_pows = pow_series(domain(k).omega, n)
    t_cosets = []
    for j in range(E):
        s = g * pow(dome.omega, j, P) % P
        s_pows = pow_series_uncached(s, n)  # freed after this coset
        s_m, zh_m, zhinv_m, wu_m = (
            jnp.asarray(v) for v in _coset_scalars(k, e_log, j, vk.usable))
        x_dev, l0_dev, lu_dev = _coset_tables_fn(k)(omega_pows, s_m, zh_m,
                                                    wu_m)

        def ev(nm):
            return coset_evals(coeffs[nm], s_pows, k)

        total = jnp.zeros((n, 16), jnp.uint32)
        # gates: q_c * (a + rot1(a)*rot2(a) - rot3(a))
        for c in range(vk.n_advice):
            total = _gate_term_fn(k)(total, ev(f"advice_{c}"),
                                     ev(f"q_{c}"), y_c)
        # logUp
        if vk.n_lookup:
            total = _logup_term_fn(k, vk.n_lookup)(
                total, ev("h"), ev("m"), ev("table"),
                [ev(f"lookup_{c}") for c in range(vk.n_lookup)], blk_c, y_c)
        # permutation chunks: active * (z_c(wX) prod den - z_c(X) prod num)
        active_ev = ev("active")
        for c, chunk in enumerate(chunks):
            djs = jnp.asarray(ints_to_limbs(
                [vk.deltas[jj] * FR.R % P for jj in chunk]))
            total = _perm_term_fn(k, len(chunk))(
                total, ev(f"z_{c}"), x_dev, active_ev,
                [ev(perm_names[jj]) for jj in chunk],
                [ev(f"sigma_{jj}") for jj in chunk], djs, beta_c, gamma_c,
                y_c)
        del active_ev
        # boundary terms: l_0*(z_0 - 1), chaining, l_u*(z_last - 1)
        prev_z = ev("z_0")
        total = _lagrange_z_term_fn(k, 0)(total, prev_z, l0_dev, y_c)
        for c in range(1, n_z):
            cur_z = ev(f"z_{c}")
            total = _chain_term_fn(k, vk.usable)(total, cur_z, prev_z,
                                                 l0_dev, y_c)
            prev_z = cur_z
        total = _lagrange_z_term_fn(k, 1)(total, prev_z, lu_dev, y_c)
        t_cosets.append(_zhinv_scale_fn(k)(total, zhinv_m))

    # Per-coset interpolation (replaces the former 2^(k+e_log) full-domain
    # iNTT): with s_j = g*w_ke^j and zeta = w_ke^n (a primitive E-th
    # root),  iNTT_n(evals_j)[r] * s_j^{-r} = sum_b (c_{bn+r} g^{nb})
    # zeta^{jb},  so the e-th coefficient CHUNKS come from E small iNTTs
    # plus an ExE constant-matrix combine -- no 2^(k+e) twiddle tables
    # (2+GB of HBM at k=22) and no n*E transient.
    vs = []
    for j in range(E):
        s = g * pow(dome.omega, j, P) % P
        u = evals_to_coeffs(t_cosets[j], k)
        vs.append(_mul_rows_fn(k)(u, pow_series_uncached(pow(s, -1, P), n)))
    del t_cosets
    return _chunk_combine_fn(k, e_log)(vs)


@functools.cache
def _mul_rows_fn(k: int):
    return jax.jit(FR.mul, donate_argnums=(0,))


@functools.cache
def _chunk_combine_fn(k: int, e_log: int):
    """vs (list of E [n,16]) -> coefficient chunks c_b = sum_j m_bj v_j,
    m_bj = zeta^{-jb} E^{-1} g^{-nb} (all host constants)."""
    from ..poly.domain import domain

    n = 1 << k
    E = 1 << e_log
    dome = domain(k + e_log)
    zeta_inv = pow(dome.omega, -n, P)
    E_inv = pow(E, -1, P)
    g_n_inv = pow(FR.generator, -n, P)
    m = [[pow(zeta_inv, j * b, P) * E_inv % P * pow(g_n_inv, b, P) % P
          for j in range(E)] for b in range(E)]
    m_np = [[FR.const_np(m[b][j]) for j in range(E)] for b in range(E)]

    def f(vs):
        out = []
        for b in range(E):
            acc = None
            for j in range(E):
                term = FR.mul(vs[j], jnp.asarray(m_np[b][j])[None, :])
                acc = term if acc is None else FR.add(acc, term)
            out.append(acc)
        return out

    return jax.jit(f, donate_argnums=(0,))


# Streamed quotient term kernels.  Each takes the running Horner
# accumulator `total` (donated: updated in place) and returns
# total*y + term; a rotation by r base-domain rows is a roll by r within
# a coset (full-domain index i = m*E + j: +E*r keeps j, advances m by r).

def _rot(a, r):
    return jnp.roll(a, -r, axis=0)


@functools.cache
def _coset_tables_fn(k: int):
    """(omega_pows, s, zh, wu) -> (x, l0, lu) tables for one coset."""
    n = 1 << k
    one_np = np.asarray(FR.one)
    n_mont_np = FR.const_np(n)

    def f(omega_pows, s, zh, wu):
        x_dev = FR.mul(omega_pows, s[None, :])
        one_t = jnp.broadcast_to(jnp.asarray(one_np), (n, 16))
        n_mont = jnp.asarray(n_mont_np)[None, :]
        den = jnp.concatenate([
            FR.mul(n_mont, FR.sub(x_dev, one_t)),
            FR.mul(n_mont, FR.sub(x_dev, jnp.broadcast_to(wu, (n, 16)))),
        ])
        inv = FR.batch_inv(den)
        l0_dev = FR.mul(zh[None, :], inv[:n])
        lu_dev = FR.mul(FR.mul(zh[None, :], inv[n:]), wu[None, :])
        return x_dev, l0_dev, lu_dev

    return jax.jit(f)


@functools.cache
def _gate_term_fn(k: int):
    def f(total, a, q, y):
        expr = FR.sub(FR.add(a, FR.mul(_rot(a, 1), _rot(a, 2))), _rot(a, 3))
        return FR.add(FR.mul(total, y[None, :]), FR.mul(q, expr))

    return jax.jit(f, donate_argnums=(0,))


@functools.cache
def _logup_term_fn(k: int, n_lookup: int):
    def f(total, h, m, table, Ls, blk, y):
        T = FR.add(table, blk[None, :])
        Ls = [FR.add(l, blk[None, :]) for l in Ls]
        prod_all = Ls[0]
        for l in Ls[1:]:
            prod_all = FR.mul(prod_all, l)
        dh = FR.sub(_rot(h, 1), h)
        term = FR.mul(FR.mul(dh, prod_all), T)
        for j in range(n_lookup):
            others = None
            for j2 in range(n_lookup):
                if j2 == j:
                    continue
                others = Ls[j2] if others is None else FR.mul(others, Ls[j2])
            part = T if others is None else FR.mul(others, T)
            term = FR.sub(term, part)
        term = FR.add(term, FR.mul(m, prod_all))
        return FR.add(FR.mul(total, y[None, :]), term)

    return jax.jit(f, donate_argnums=(0,))


@functools.cache
def _perm_term_fn(k: int, csize: int):
    def f(total, z, x_dev, active, vjs, sgs, djs, beta, gamma, y):
        znum = _rot(z, 1)
        num = None
        den = None
        for i in range(csize):
            vj = vjs[i]
            lhs = FR.add(
                FR.add(vj, FR.mul(FR.mul(beta[None, :], djs[i][None, :]),
                                  x_dev)),
                gamma[None, :])
            rhs = FR.add(FR.add(vj, FR.mul(beta[None, :], sgs[i])),
                         gamma[None, :])
            num = lhs if num is None else FR.mul(num, lhs)
            den = rhs if den is None else FR.mul(den, rhs)
        term = FR.mul(active,
                      FR.sub(FR.mul(znum, den), FR.mul(z, num)))
        return FR.add(FR.mul(total, y[None, :]), term)

    return jax.jit(f, donate_argnums=(0,))


@functools.cache
def _lagrange_z_term_fn(k: int, _variant: int):
    """l * (z - 1): variant 0 = l_0 on z_0, variant 1 = l_u on z_last
    (same math; the variant tag keeps two donated-buffer programs)."""
    one_np = np.asarray(FR.one)

    def f(total, z, l_dev, y):
        one = jnp.asarray(one_np)
        term = FR.mul(l_dev, FR.sub(z, jnp.broadcast_to(one, z.shape)))
        return FR.add(FR.mul(total, y[None, :]), term)

    return jax.jit(f, donate_argnums=(0,))


@functools.cache
def _chain_term_fn(k: int, usable: int):
    def f(total, z_cur, z_prev, l0_dev, y):
        term = FR.mul(l0_dev, FR.sub(z_cur, _rot(z_prev, usable)))
        return FR.add(FR.mul(total, y[None, :]), term)

    return jax.jit(f, donate_argnums=(0,))


@functools.cache
def _zhinv_scale_fn(k: int):
    def f(total, zhinv):
        return FR.mul(total, jnp.broadcast_to(zhinv, total.shape))

    return jax.jit(f, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Verifier (host)
# ---------------------------------------------------------------------------

def verify(vk: VerifyingKey, srs_g2, srs_tau_g2, instances: list[int],
           proof: bytes) -> bool:
    """Full verification: succinct check + pairing decision."""
    res = verify_succinct(vk, instances, proof)
    if res is None:
        return False
    lhs_acc, rhs_acc = res
    return pr.pairing_check([
        (lhs_acc, srs_g2),
        (-rhs_acc, srs_tau_g2),
    ])


def verify_succinct(vk: VerifyingKey, instances: list[int], proof: bytes):
    """Everything except the pairing: transcript replay + identity check +
    GWC aggregation.  Returns (lhs, rhs) G1 points such that the proof is
    valid iff e(rhs, [tau]G2) == e(lhs, G2) -- i.e. a KZG accumulator
    (snark-verifier `PlonkSuccinctVerifier::verify` equivalent,
    wrapper.rs:445-471).  None if the proof is malformed or the algebraic
    identity fails."""
    try:
        return _verify_succinct(vk, instances, proof)
    except ValueError:
        return None  # malformed stream (truncated, bad point/scalar encoding)


def _verify_succinct(vk: VerifyingKey, instances: list[int], proof: bytes):
    from .transcript import ByteReader

    n = 1 << vk.k
    omega = vk.omega
    stream = ByteReader(proof)
    tr = Transcript()
    for v in instances:
        tr.absorb_scalar(v)

    comm = dict(vk.commitments)
    for i in range(vk.n_advice):
        comm[f"advice_{i}"] = tr.read_point(stream)
    for i in range(vk.n_lookup):
        comm[f"lookup_{i}"] = tr.read_point(stream)
    comm["m"] = tr.read_point(stream)
    beta_lk = tr.challenge()
    beta = tr.challenge()
    gamma = tr.challenge()
    comm["h"] = tr.read_point(stream)
    for c in range(vk.n_z):
        comm[f"z_{c}"] = tr.read_point(stream)
    y = tr.challenge()
    E = 1 << vk.ext_log
    for i in range(E):
        comm[f"t_{i}"] = tr.read_point(stream)
    x = tr.challenge()

    queries = _query_plan(vk, E)
    evals = {}
    for nm, pt in sorted(queries):
        if nm in ("instance", "t"):
            continue  # derived below, never part of the stream
        evals[(nm, pt)] = tr.read_scalar(stream)
    evals[("instance", "x")] = _eval_instance(instances, x, vk.k, omega)

    v_ch = tr.challenge()
    u_ch = tr.challenge()

    # -- identity at x (same y-combination order as the prover kernel) -------
    perm_names = ([f"advice_{c}" for c in range(vk.n_advice)]
                  + [f"lookup_{c}" for c in range(vk.n_lookup)]
                  + ["const", "instance"])
    chunks = _perm_chunks(vk.n_perm)
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
    for c, chunk in enumerate(chunks):
        num = 1
        den = 1
        for j in chunk:
            vj = evals[(perm_names[j], "x")]
            num = num * ((vj + beta * vk.deltas[j] % P * x + gamma) % P) % P
            den = den * ((vj + beta * evals[(f"sigma_{j}", "x")] + gamma) % P) % P
        term = (evals[(f"z_{c}", "wx")] * den - evals[(f"z_{c}", "x")] * num) % P
        total = (total * y + evals[("active", "x")] * term) % P

    zh_x = (pow(x, n, P) - 1) % P
    l0_x = zh_x * pow(n * (x - 1) % P, -1, P) % P
    wu = pow(omega, vk.usable, P)
    lu_x = wu * zh_x % P * pow(n * (x - wu) % P, -1, P) % P

    total = (total * y + l0_x * ((evals[("z_0", "x")] - 1) % P)) % P
    for c in range(1, vk.n_z):
        chain = (evals[(f"z_{c}", "x")] - evals[(f"z_{c-1}", "wux")]) % P
        total = (total * y + l0_x * chain) % P
    total = (total * y
             + lu_x * ((evals[(f"z_{vk.n_z-1}", "x")] - 1) % P)) % P

    # derived quotient opening claim: t(x) := total / zh(x); the combined
    # commitment sum_i xn^i [t_i].  A proof whose constraints do not hold
    # makes this claim false, so the final pairing rejects (halo2 /
    # snark-verifier semantics -- no hard identity check here).
    xn = pow(x, n, P)
    evals[("t", "x")] = total * pow(zh_x, -1, P) % P
    t_comb = AffinePoint.identity(BN254_G1)
    xpow = 1
    for i in range(E):
        t_comb = t_comb + xpow * comm[f"t_{i}"]
        xpow = xpow * xn % P
    comm["t"] = t_comb

    # -- GWC pairing check ---------------------------------------------------
    eval_points = _eval_points(x, omega, vk.usable)
    by_point: dict[str, list[str]] = {}
    for nm, pt in sorted(queries):
        by_point.setdefault(pt, []).append(nm)

    w_comms = {}
    for pt_name in POINT_NAMES:
        if by_point.get(pt_name):
            w_comms[pt_name] = tr.read_point(stream)

    lhs_acc = AffinePoint.identity(BN254_G1)
    rhs_acc = AffinePoint.identity(BN254_G1)
    gen = AffinePoint.generator(BN254_G1)
    u_pow = 1
    for pt_name in POINT_NAMES:
        names = by_point.get(pt_name)
        if not names:
            continue
        coef = 1
        f_acc = AffinePoint.identity(BN254_G1)
        e_acc = 0
        for nm in names:
            c_pt = comm[nm] if nm != "instance" else _instance_commitment(
                vk, instances)
            f_acc = f_acc + coef * c_pt
            e_acc = (e_acc + coef * evals[(nm, pt_name)]) % P
            coef = coef * v_ch % P
        w = w_comms[pt_name]
        term = f_acc + eval_points[pt_name] * w - e_acc * gen
        lhs_acc = lhs_acc + u_pow * term
        rhs_acc = rhs_acc + u_pow * w
        u_pow = u_pow * u_ch % P

    if not stream.done():
        return None  # trailing bytes -> not a valid proof of this shape

    # W*(tau - p) = f - e  =>  e(W, [tau]G2) = e(F + pW - eG, G2)
    return lhs_acc, rhs_acc


@functools.lru_cache(maxsize=None)
def _instance_commitment_cache():
    return {}


def _instance_commitment(vk: VerifyingKey, instances):
    """Commitment to the instance column -- host MSM over the Lagrange SRS
    prefix (small: only len(instances) points)."""
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
