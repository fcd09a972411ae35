"""Device-side polynomial engine for the PLONK prover.

All bulk math of the proving pipeline (SURVEY.md section 3.2 hot path:
commit -> quotient cosets -> evals -> open) expressed as jitted batched
limb-tensor ops:

  * `commit_lagrange` / `commit_monomial` -- KZG commitments via Pippenger
    MSM over the Lagrange/monomial SRS (no iNTT needed for evaluation-form
    polynomials);
  * `coset_extended_evals` -- iNTT + coset-scale + forward NTT onto the
    extended domain (the reference's `coeff_to_extended`);
  * `batch_eval_barycentric` -- all committed polynomials evaluated at a
    challenge point in one batched kernel;
  * `opening_witness_evals` -- (f - f(p)) / (X - p) computed pointwise on
    the domain with a batched inverse (degree drops by one, so the result
    stays evaluation-form committable).
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jacobian import JacPoint, bn254_ops
from ..fields.common import N_LIMBS, ints_to_limbs
from ..fields.field import bn254_fr
from ..msm.pippenger import msm_impl
from ..poly.domain import domain
from ..poly.ntt import _ntt_impl, _bitrev_perm

FR = bn254_fr()


# -- mesh context -------------------------------------------------------------
#
# `prover_mesh` makes every commitment MSM and every NTT issued inside the
# context run mesh-sharded (SURVEY.md section 2.3: tensor-parallel MSM via
# psum-style gather, sequence-parallel NTT via all_to_all).  Elementwise
# kernels need no explicit treatment -- they inherit input shardings through
# GSPMD propagation.  With no active context everything stays single-device.

import threading as _threading

_MESH_TLS = _threading.local()  # per-thread stack of (mesh, axis): the
# warm-up pool (prover/warmup.py) traces programs concurrently, so a
# shared stack would let one thread pop another's context


def _mesh_stack() -> list:
    st = getattr(_MESH_TLS, "stack", None)
    if st is None:
        st = _MESH_TLS.stack = []
    return st


@contextlib.contextmanager
def prover_mesh(mesh, axis: str = "x"):
    """Run prover kernels mesh-sharded inside this context."""
    st = _mesh_stack()
    st.append((mesh, axis))
    try:
        yield
    finally:
        st.pop()


def _mesh_for(n: int):
    """(mesh, axis) if a mesh is active and a length-n axis splits evenly
    into >= ndev^2 elements (the four-step layout needs n2 % n1 == 0)."""
    st = _mesh_stack()
    if not st:
        return None
    mesh, axis = st[-1]
    ndev = mesh.shape[axis]
    if ndev <= 1 or n % ndev or n < ndev * ndev:
        return None
    return mesh, axis


def pow_series_uncached(base_int: int, n: int):
    """Device [n,16] Montgomery table of base^i via log-depth doubling.

    Replaces O(n) host `pow(base, i, p)` loops (each a ~k-squaring modexp
    plus an int->limb conversion) with ~log2(n) full-width device muls --
    the difference between hours and milliseconds at wrapper scale.

    UNCACHED: use for per-coset tables whose lifetime is one quotient
    coset (the cached variant would pin 16 x n x 64B of HBM across the
    8 cosets' s / s^-1 tables -- 4.3GB at k=22).
    """
    size = max(1, 1 << (n - 1).bit_length())
    arr = jnp.asarray(FR.one)[None, :]
    length = 1
    while length < size:
        step = jnp.asarray(FR.const(pow(base_int, length, FR.p)))
        arr = jnp.concatenate([arr, FR.mul(arr, step[None, :])])
        length *= 2
    return arr[:n]


@functools.cache
def pow_series(base_int: int, n: int):
    """Cached `pow_series_uncached` -- for long-lived tables (omega
    powers, generator powers) reused across every proof."""
    return pow_series_uncached(base_int, n)


# -- uint16 at-rest packing ---------------------------------------------------
#
# Montgomery limb tensors are 16 limbs of 16-bit values carried in uint32
# lanes; every field op carry-propagates to canonical limbs, so the at-rest
# form can drop to uint16 losslessly.  At wrapper scale (k=21, ~140 resident
# polynomials) this halves pk+witness HBM from ~19GB to ~9.5GB -- the
# difference between fitting one v5e chip and not.  `_u32` at jitted-fn
# entries re-widens (XLA fuses the convert into the first consumer).

@functools.cache
def _pack_fn():
    return jax.jit(lambda x: x.astype(jnp.uint16))


def pack_poly(x):
    """[n,16] uint32 Montgomery -> uint16 at-rest form (lossless)."""
    return _pack_fn()(x) if x.dtype != jnp.uint16 else x


def _u32(x):
    """Widen an at-rest (possibly uint16) limb tensor for compute."""
    return x.astype(jnp.uint32) if x.dtype == jnp.uint16 else x


@functools.lru_cache(maxsize=8)
def _to_mont_fn(n: int):
    r2 = FR.const_np(FR.R)  # R^2 in "Montgomery form of R" = R*R mod p

    def f(canon):
        return FR.mul(canon, jnp.asarray(r2)[None, :])

    return jax.jit(f)


def to_device_poly(values):
    """Host evaluations -> device Montgomery limb tensor [n, 16].

    Accepts a list of python ints (one `to_bytes` blit each), an
    (n, 16) uint16 canonical limb-row array (the trace builder / layout
    representation -- zero-copy widen), or a 1-D array of small
    non-negative ints (< 2^64: selectors, multiplicities, tables).
    A single device mul by R^2 does the Montgomery lift.
    """
    import numpy as np

    from ..fields.common import ints_to_limbs_fast

    if isinstance(values, np.ndarray):
        if values.ndim == 2:
            assert values.shape[1] == 16
            canon = values.astype(np.uint32)
        else:
            v = values.astype(np.int64)
            canon = np.zeros((len(v), 16), dtype=np.uint32)
            for limb in range(4):
                canon[:, limb] = (v >> (16 * limb)) & 0xFFFF
    else:
        canon = ints_to_limbs_fast(values, FR.p)
    return _to_mont_fn(canon.shape[0])(jnp.asarray(canon))


# -- KZG commitments ---------------------------------------------------------

# Fixed-base commit tables (msm/fixed_base.py): the SRS bases never
# change per k, so shifted-point tables kill the doubling ladder and the
# per-window bucket sets.  Bounded cache (a k=20 table is ~2GB of HBM);
# auto-enabled up to `max_n` points -- the wrapper-width (2^21, ~140
# resident polys) prover needs its HBM, so larger sizes opt in via
# configure_fixed_base.
_FB_STATE = {"enabled": True, "max_n": 1 << 20, "min_n": 1 << 12,
             "c": 16, "tables": {}, "cap": 3}


def configure_fixed_base(enabled: bool | None = None, max_n: int | None = None,
                         c: int | None = None):
    """Tune the fixed-base commit path (e.g. enable at 2^21 for the voter
    prover, disable under tight HBM)."""
    if enabled is not None:
        _FB_STATE["enabled"] = enabled
    if max_n is not None:
        _FB_STATE["max_n"] = max_n
    if c is not None:
        _FB_STATE["c"] = c
        _FB_STATE["tables"].clear()


def _fb_table(points: JacPoint, n: int):
    from ..msm.fixed_base import build_table

    key = (id(points.x), n, _FB_STATE["c"])
    entry = _FB_STATE["tables"].get(key)
    if entry is None:
        if len(_FB_STATE["tables"]) >= _FB_STATE["cap"]:
            _FB_STATE["tables"].pop(next(iter(_FB_STATE["tables"])))
        # keep a strong ref to the source buffer: the cache key is its
        # id(), which must not be recycled by the GC for other points
        entry = (build_table(points, n, _FB_STATE["c"]), points.x)
        _FB_STATE["tables"][key] = entry
    return entry[0]


def commit_evals(srs_lagrange: JacPoint, values):
    """Commit an evaluation-form poly: MSM(values, [L_i(tau)]G).

    values: [n, 16] CANONICAL (non-Montgomery) scalar limbs.
    Runs the MSM on RCB complete projective coordinates (curves/proj.py)
    and converts the single result point back to Jacobian, so callers'
    `bn254_ops().to_affine_host` contract is unchanged.  Single-device
    commits in [min_n, max_n] take the fixed-base precomputed-table path
    (see _FB_STATE above).
    """
    n = values.shape[0]
    sh = _mesh_for(n)
    if (sh is None and _FB_STATE["enabled"]
            and _FB_STATE["min_n"] <= n <= _FB_STATE["max_n"]):
        from ..msm.fixed_base import commit_fixed

        return commit_fixed(_fb_table(srs_lagrange, n), values)
    # floor c at 8: windows = ceil(254/c), and the traced Pippenger graph
    # (digit extraction, bucket ids, reductions) scales with the window
    # count -- c=4 at tiny n meant a 64-window graph whose XLA compile
    # dominated the k=7 pipeline cold-start (multichip dryrun budget)
    c = max(8, min(16, n.bit_length() - 4))
    n_windows = -(-254 // c)
    if sh is not None:
        return _commit_sharded_jit(n, c, n_windows, sh[0], sh[1])(
            srs_lagrange.x, srs_lagrange.y, srs_lagrange.z, values)
    return _commit_jit(n, c, n_windows)(
        srs_lagrange.x, srs_lagrange.y, srs_lagrange.z, values
    )


@functools.lru_cache(maxsize=64)
def _commit_jit(n: int, c: int, n_windows: int):
    from ..curves.proj import bn254_proj_ops

    ops = bn254_proj_ops()
    Fq = ops.F

    def f(px, py, pz, scalars):
        from ..msm.pippenger import _group_windows

        r = msm_impl(ops, JacPoint(px[:n], py[:n], pz[:n]), scalars, c,
                     n_windows, window_group=_group_windows(n, n_windows),
                     signed=n_windows * c > ops.F.bits)
        # projective (X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z); identity Z=0 ok
        return JacPoint(Fq.mul(r.x, r.z), Fq.mul(r.y, Fq.square(r.z)), r.z)

    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _commit_sharded_jit(n: int, c: int, n_windows: int, mesh, axis: str):
    """Tensor-parallel commitment: each device Pippengers its point/scalar
    shard, the ndev partial sums ride ONE all_gather (3*ndev field elements
    over ICI), and every device tree-combines locally -- communication is
    O(ndev), compute scales 1/ndev (parallel/sharded.py `sharded_msm`
    wired into the prover's commit path)."""
    from jax.sharding import PartitionSpec as P

    from ..curves.proj import bn254_proj_ops

    ops = bn254_proj_ops()
    Fq = ops.F
    ndev = mesh.shape[axis]

    def local(px, py, pz, s):
        from ..msm.pippenger import _group_windows

        part = msm_impl(ops, JacPoint(px, py, pz), s, c, n_windows,
                        window_group=_group_windows(n // ndev, n_windows),
                        signed=n_windows * c > ops.F.bits)
        gx = jax.lax.all_gather(part.x, axis)  # [ndev, 16]
        gy = jax.lax.all_gather(part.y, axis)
        gz = jax.lax.all_gather(part.z, axis)
        acc = JacPoint(gx, gy, gz)
        m = ndev
        while m > 1:
            half = m // 2
            acc = ops.add(
                JacPoint(acc.x[:half], acc.y[:half], acc.z[:half]),
                JacPoint(acc.x[half:m], acc.y[half:m], acc.z[half:m]),
            )
            m = half
        return JacPoint(acc.x[0], acc.y[0], acc.z[0])

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None),) * 4,
        out_specs=JacPoint(P(None), P(None), P(None)),
        check_vma=False,
    )

    def g(px, py, pz, scalars):
        r = f(px[:n], py[:n], pz[:n], scalars)
        # projective (X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z); identity Z=0 ok
        return JacPoint(Fq.mul(r.x, r.z), Fq.mul(r.y, Fq.square(r.z)), r.z)

    jf = jax.jit(g)

    def run(px, py, pz, scalars):
        with jax.set_mesh(mesh):
            return jf(px, py, pz, scalars)

    return run


def mont_to_canonical(values):
    """[n,16] Montgomery -> canonical (for MSM scalars)."""
    return _mont_to_canon_jit(values.shape)(values)


@functools.lru_cache(maxsize=64)
def _mont_to_canon_jit(shape):
    return jax.jit(lambda x: FR.mont_reduce_narrow(_u32(x)))


# -- coset extended evaluation ----------------------------------------------

@functools.cache
def _coset_ext_fn(k: int, ext_factor_log: int):
    """values [n,16] (Montgomery, natural order on H) ->
    evals on coset g*H_ext [En, 16]."""
    n = 1 << k
    ke = k + ext_factor_log
    dom = domain(k)
    dome = domain(ke)
    n_inv = FR.const_np(pow(n, -1, FR.p))

    def f(values, tw_inv, tw_ext, gp):
        coeffs = _ntt_impl(values, tw_inv, k, FR)
        coeffs = FR.mul(coeffs, jnp.asarray(n_inv)[None, :])
        coeffs = FR.mul(coeffs, gp)
        padded = jnp.concatenate(
            [coeffs, jnp.zeros(((1 << ke) - n, N_LIMBS), jnp.uint32)]
        )
        return _ntt_impl(padded, tw_ext, ke, FR)

    jf = jax.jit(f)
    # device-built tables passed as args (not closed-over constants: those
    # would be fetched host-side during MLIR lowering on remote backends)
    return lambda values: jf(values, dom.twiddles_inv, dome.twiddles,
                             pow_series(FR.generator, n))


def coset_extended_evals(values, k: int, ext_factor_log: int):
    return _coset_ext_fn(k, ext_factor_log)(values)


@functools.cache
def _coset_interp_fn(k: int, ext_factor_log: int):
    """Inverse of coset_extended_evals: ext coset evals -> coefficients [En]."""
    ke = k + ext_factor_log
    ne = 1 << ke
    dome = domain(ke)
    g_inv = pow(FR.generator, -1, FR.p)
    n_inv = FR.const_np(pow(ne, -1, FR.p))

    def f(evals, tw_inv, gp_inv):
        coeffs = _ntt_impl(evals, tw_inv, ke, FR)
        coeffs = FR.mul(coeffs, jnp.asarray(n_inv)[None, :])
        return FR.mul(coeffs, gp_inv)

    jf = jax.jit(f)
    return lambda evals: jf(evals, dome.twiddles_inv, pow_series(g_inv, ne))


def coset_interpolate(evals, k: int, ext_factor_log: int):
    ke = k + ext_factor_log
    sh = _mesh_for(1 << ke)
    if sh is not None:
        c = _four_step_natural(evals, ke, sh, True)
        return _coset_interp_scale_fn(k, ext_factor_log)(c)
    return _coset_interp_fn(k, ext_factor_log)(evals)


@functools.cache
def _coset_interp_scale_fn(k: int, ext_factor_log: int):
    """The iNTT post-scale of `_coset_interp_fn` (n^-1 then g^-i) for the
    sharded path, where the transform itself runs in `four_step_ntt`."""
    ke = k + ext_factor_log
    ne = 1 << ke
    g_inv = pow(FR.generator, -1, FR.p)
    n_inv = FR.const_np(pow(ne, -1, FR.p))

    def f(coeffs, gp_inv):
        return FR.mul(FR.mul(coeffs, jnp.asarray(n_inv)[None, :]), gp_inv)

    jf = jax.jit(f)
    return lambda coeffs: jf(coeffs, pow_series(g_inv, ne))


@functools.cache
def _fwd_ntt_fn(k: int):
    dom = domain(k)

    def f(coeffs, tw):
        return _ntt_impl(_u32(coeffs), tw, k, FR)

    jf = jax.jit(f)
    return lambda coeffs: jf(coeffs, dom.twiddles)


@functools.cache
def _inv_ntt_fn(k: int):
    dom = domain(k)
    n_inv = FR.const_np(pow(1 << k, -1, FR.p))

    def f(evals, tw_inv):
        c = _ntt_impl(_u32(evals), tw_inv, k, FR)
        return FR.mul(c, jnp.asarray(n_inv)[None, :])

    jf = jax.jit(f)
    return lambda evals: jf(evals, dom.twiddles_inv)


def evals_to_coeffs(evals, k: int):
    """[n,16] evaluations on H (natural order) -> coefficient form."""
    sh = _mesh_for(1 << k)
    if sh is not None:
        return _scale_n_inv_fn(k)(_four_step_natural(evals, k, sh, True))
    return _inv_ntt_fn(k)(evals)


# -- mesh-sharded NTT plumbing ------------------------------------------------

@functools.lru_cache(maxsize=32)
def _four_step_perms(k: int, ndev: int):
    from ..poly.ntt import four_step_input_perm, four_step_output_perm

    return (jnp.asarray(four_step_input_perm(k, ndev)),
            jnp.asarray(four_step_output_perm(k, ndev)))


def _four_step_natural(x, k: int, sh, inverse: bool):
    """natural-order in -> natural-order out via the all_to_all four-step
    NTT (poly/ntt.py): input/output layout permutations are device gathers."""
    from ..poly.ntt import four_step_ntt

    mesh, axis = sh
    inp, outp = _four_step_perms(k, mesh.shape[axis])
    y = four_step_ntt(_u32(x)[inp], k, mesh, axis, inverse=inverse)
    return y[outp]


@functools.cache
def _scale_n_inv_fn(k: int):
    n_inv = FR.const_np(pow(1 << k, -1, FR.p))
    return jax.jit(lambda x: FR.mul(x, jnp.asarray(n_inv)[None, :]))


@functools.cache
def _mul_pair_fn():
    return jax.jit(lambda a, b: FR.mul(_u32(a), _u32(b)))


@functools.cache
def _coset_evals_fn(k: int):
    """coeffs [n,16] -> evals on the coset s*H, where s (Montgomery [16])
    is a runtime argument: ONE compiled program serves every coset of the
    streamed quotient (prover/plonk.py `_quotient`)."""
    dom = domain(k)
    n = 1 << k

    def f(coeffs, s_pows, tw):
        return _ntt_impl(FR.mul(_u32(coeffs), s_pows), tw, k, FR)

    jf = jax.jit(f)
    return lambda coeffs, s_pows: jf(coeffs, s_pows, dom.twiddles)


def coset_evals(coeffs, s_pows, k: int):
    """Evaluate a coefficient-form poly on the coset {s * w^i}: scale
    coefficient j by s^j (s_pows, [n,16] Montgomery) then forward NTT."""
    sh = _mesh_for(1 << k)
    if sh is not None:
        return _four_step_natural(_mul_pair_fn()(coeffs, s_pows), k, sh,
                                  False)
    return _coset_evals_fn(k)(coeffs, s_pows)


def pow_series_traced(base_mont, n: int):
    """[n,16] powers of a TRACED base value (log-depth doubling).

    For host-known bases use `pow_series` (cheaper: the step constants
    are host-precomputed powers)."""
    size = max(1, 1 << (n - 1).bit_length())
    arr = base_mont[None, :]
    arr = jnp.concatenate([jnp.asarray(FR.one)[None, :], arr])
    length = 2
    while length < size:
        step = FR.mul(arr[-1], arr[1])
        arr = jnp.concatenate([arr, FR.mul(arr, step[None, :])])
        length *= 2
    return arr[:n]


def coeffs_to_evals(coeffs, k: int):
    """[n,16] coefficient form -> evaluations on H (natural order)."""
    sh = _mesh_for(1 << k)
    if sh is not None:
        return _four_step_natural(coeffs, k, sh, False)
    return _fwd_ntt_fn(k)(coeffs)


def commit_coeffs(srs_monomial: JacPoint, coeffs):
    """Commit a coefficient-form poly: MSM(coeffs, [tau^i]G) over the
    monomial SRS.  coeffs: [n,16] MONTGOMERY limbs (converted here)."""
    return commit_evals(srs_monomial, mont_to_canonical(coeffs))


# -- batched evaluation at a point ------------------------------------------

@functools.cache
def _eval_coeffs_list_fn(k: int, n_polys: int):
    """Evaluate coefficient-form polys at a point: dot(coeffs, pw) where
    pw[i] = p^i.  Takes a LIST of [n,16] polys.

    Small domains stack the list into one [P,n,16] tensor so the traced
    graph has ONE mul + tree-sum (P-fold smaller XLA program -- compile
    time matters for the cold-start dryrun); at wrapper scale the stacked
    copy is gigabytes, so large k keeps the per-poly list form."""
    n = 1 << k

    if k <= 14:
        def f(polys, pw):
            acc = FR.mul(jnp.stack([_u32(c) for c in polys]), pw[None])
            m = n
            while m > 1:
                acc = FR.add(acc[:, : m // 2], acc[:, m // 2 : m])
                m //= 2
            return acc[:, 0]

        return jax.jit(f)

    def f(polys, pw):
        outs = []
        for c in polys:
            acc = FR.mul(_u32(c), pw)
            m = n
            while m > 1:
                acc = FR.add(acc[: m // 2], acc[m // 2 : m])
                m //= 2
            outs.append(acc[0])
        return jnp.stack(outs)

    return jax.jit(f)


def eval_coeffs_list(polys: list, x_int: int, k: int) -> list[int]:
    """Coefficient-form polys -> values at x (host ints).

    The power table is built from the traced base (not `pow_series`,
    which functools-caches a device table per base value -- x is a fresh
    Fiat-Shamir challenge every proof and would leak)."""
    base = jnp.asarray(FR.const(x_int))
    pw = _pow_table_traced_fn(k)(base)
    out = _eval_coeffs_list_fn(k, len(polys))(list(polys), pw)
    return FR.from_mont(out)


@functools.cache
def _pow_table_traced_fn(k: int):
    return jax.jit(lambda base: pow_series_traced(base, 1 << k))


# -- legacy barycentric eval (evaluation-form polys) --------------------------

@functools.cache
def _batch_eval_fn(k: int, n_polys: int):
    """Barycentric: f(x) = (x^n - 1)/n * sum_i f_i * w^i / (x - w^i)."""
    n = 1 << k
    dom = domain(k)
    n_inv = FR.const_np(pow(n, -1, FR.p))

    def f(polys, x_mont, w):
        # polys: [P, n, 16] Montgomery; x: [16]; w: [n,16] omega powers
        diff = FR.sub(jnp.broadcast_to(x_mont, (n, N_LIMBS)), w)
        inv = FR.batch_inv(diff)               # [n,16]
        xn = FR.pow_const(x_mont, n)
        zn = FR.sub(xn, jnp.asarray(FR.one))
        scale = FR.mul(zn, jnp.asarray(n_inv))
        weights = FR.mul(FR.mul(w, inv), scale)  # [n,16]
        prods = FR.mul(polys, weights[None, :, :])  # [P,n,16]
        # tree-sum over n
        acc = prods
        m = n
        while m > 1:
            acc = FR.add(acc[:, : m // 2], acc[:, m // 2 : m])
            m //= 2
        return acc[:, 0]

    jf = jax.jit(f)
    return lambda polys, x_mont: jf(polys, x_mont,
                                    pow_series(dom.omega, n))


def batch_eval(polys, x_int: int, k: int):
    """polys: [P, n, 16] Montgomery evals on H -> [P] ints at x (host)."""
    x_mont = jnp.asarray(FR.const(x_int))
    out = _batch_eval_fn(k, polys.shape[0])(polys, x_mont)
    return FR.from_mont(out)


# -- opening witness ---------------------------------------------------------

@functools.cache
def _opening_fn(k: int):
    n = 1 << k
    dom = domain(k)

    def f(combined, combined_eval, p_mont, w):
        # W = (combined - eval) * inv(w^i - p) pointwise on H
        denom = FR.sub(w, jnp.broadcast_to(p_mont, (n, N_LIMBS)))
        inv = FR.batch_inv(denom)
        num = FR.sub(combined, jnp.broadcast_to(combined_eval, (n, N_LIMBS)))
        return FR.mul(num, inv)

    jf = jax.jit(f)
    return lambda c, e, p: jf(c, e, p, pow_series(dom.omega, n))


def opening_witness_evals(combined, eval_int: int, p_int: int, k: int):
    """Evaluation form of (f(X) - f(p)) / (X - p) on H."""
    return _opening_fn(k)(
        combined,
        jnp.asarray(FR.const(eval_int)),
        jnp.asarray(FR.const(p_int)),
    )


# -- random linear combination on device -------------------------------------

@functools.cache
def _rlc_fn(n_polys: int, k: int):
    n = 1 << k

    def f(polys, coefs):
        # polys [P,n,16], coefs [P,16] Montgomery -> [n,16]
        prods = FR.mul(polys, coefs[:, None, :])
        acc = prods[0]
        for i in range(1, polys.shape[0]):
            acc = FR.add(acc, prods[i])
        return acc

    return jax.jit(f)


def rlc(polys, coef_ints: list[int], k: int):
    coefs = jnp.asarray(
        ints_to_limbs([c % FR.p * FR.R % FR.p for c in coef_ints])
    )
    return _rlc_fn(polys.shape[0], k)(polys, coefs)


@functools.cache
def _rlc_list_fn(n_polys: int, k: int):
    if k <= 14:
        # stacked form: one mul + log-tree of adds (small traced graph)
        def f(polys, coefs):
            prods = FR.mul(jnp.stack([_u32(p_) for p_ in polys]),
                           jnp.stack(coefs)[:, None, :])
            m = len(polys)
            acc = prods
            while m > 1:
                h = m // 2
                acc = jnp.concatenate(
                    [FR.add(acc[:h], acc[m - h :]), acc[h : m - h]])
                m = m - h
            return acc[0]

        return jax.jit(f)

    def f(polys, coefs):
        acc = FR.mul(_u32(polys[0]), coefs[0][None, :])
        for i in range(1, len(polys)):
            acc = FR.add(acc, FR.mul(_u32(polys[i]), coefs[i][None, :]))
        return acc

    return jax.jit(f)


def rlc_list(polys: list, coef_ints: list[int], k: int):
    """Random linear combination over a LIST of [n,16] polys (no [P,n,16]
    stack copy -- see eval_coeffs_list)."""
    coefs = jnp.asarray(
        ints_to_limbs([c % FR.p * FR.R % FR.p for c in coef_ints])
    )
    return _rlc_list_fn(len(polys), k)(list(polys),
                                       [coefs[i] for i in range(len(polys))])
