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


@functools.lru_cache(maxsize=8)
def _to_mont_fn(n: int):
    r2 = FR.const_np(FR.R)  # R^2 in "Montgomery form of R" = R*R mod p

    def f(canon):
        return FR.mul(canon, jnp.asarray(r2)[None, :])

    return jax.jit(f)


def to_device_poly(values: list[int]):
    """Host python-int evaluations -> device Montgomery limb tensor [n, 16].

    Conversion cost: one `to_bytes` per int host-side (vectorized blit),
    then a single device mul by R^2 does the Montgomery lift.
    """
    from ..fields.common import ints_to_limbs_fast

    canon = ints_to_limbs_fast(values, FR.p)
    return _to_mont_fn(len(values))(jnp.asarray(canon))


# -- KZG commitments ---------------------------------------------------------

def commit_evals(srs_lagrange: JacPoint, values):
    """Commit an evaluation-form poly: MSM(values, [L_i(tau)]G).

    values: [n, 16] CANONICAL (non-Montgomery) scalar limbs.
    """
    ops = bn254_ops()
    n = values.shape[0]
    c = max(4, min(16, n.bit_length() - 4))
    n_windows = -(-254 // c)
    return _commit_jit(n, c, n_windows)(
        srs_lagrange.x, srs_lagrange.y, srs_lagrange.z, values
    )


@functools.lru_cache(maxsize=64)
def _commit_jit(n: int, c: int, n_windows: int):
    ops = bn254_ops()

    def f(px, py, pz, scalars):
        return msm_impl(ops, JacPoint(px[:n], py[:n], pz[:n]), scalars, c,
                        n_windows)

    return jax.jit(f)


def mont_to_canonical(values):
    """[n,16] Montgomery -> canonical (for MSM scalars)."""
    return _mont_to_canon_jit(values.shape)(values)


@functools.lru_cache(maxsize=64)
def _mont_to_canon_jit(shape):
    return jax.jit(FR.mont_reduce_narrow)


# -- coset extended evaluation ----------------------------------------------

@functools.cache
def _coset_ext_fn(k: int, ext_factor_log: int):
    """values [n,16] (Montgomery, natural order on H) ->
    evals on coset g*H_ext [En, 16]."""
    n = 1 << k
    ke = k + ext_factor_log
    dom = domain(k)
    dome = domain(ke)
    g = FR.generator

    tw_inv = np.asarray(jax.device_get(dom.twiddles_inv))
    tw_ext = np.asarray(jax.device_get(dome.twiddles))
    n_inv = FR.const_np(pow(n, -1, FR.p))
    # coset scale factors g^j for coefficient j (host table, [n,16])
    gp = np.asarray(
        ints_to_limbs([pow(g, j, FR.p) * FR.R % FR.p for j in range(n)])
    )

    def f(values):
        coeffs = _ntt_impl(values, jnp.asarray(tw_inv), k, FR)
        coeffs = FR.mul(coeffs, jnp.asarray(n_inv)[None, :])
        coeffs = FR.mul(coeffs, jnp.asarray(gp))
        padded = jnp.concatenate(
            [coeffs, jnp.zeros(((1 << ke) - n, N_LIMBS), jnp.uint32)]
        )
        return _ntt_impl(padded, jnp.asarray(tw_ext), ke, FR)

    return jax.jit(f)


def coset_extended_evals(values, k: int, ext_factor_log: int):
    return _coset_ext_fn(k, ext_factor_log)(values)


@functools.cache
def _coset_interp_fn(k: int, ext_factor_log: int):
    """Inverse of coset_extended_evals: ext coset evals -> coefficients [En]."""
    ke = k + ext_factor_log
    ne = 1 << ke
    dome = domain(ke)
    g_inv = pow(FR.generator, -1, FR.p)
    tw_inv = np.asarray(jax.device_get(dome.twiddles_inv))
    n_inv = FR.const_np(pow(ne, -1, FR.p))
    gp_inv = np.asarray(
        ints_to_limbs([pow(g_inv, j, FR.p) * FR.R % FR.p for j in range(ne)])
    )

    def f(evals):
        coeffs = _ntt_impl(evals, jnp.asarray(tw_inv), ke, FR)
        coeffs = FR.mul(coeffs, jnp.asarray(n_inv)[None, :])
        return FR.mul(coeffs, jnp.asarray(gp_inv))

    return jax.jit(f)


def coset_interpolate(evals, k: int, ext_factor_log: int):
    return _coset_interp_fn(k, ext_factor_log)(evals)


@functools.cache
def _fwd_ntt_fn(k: int):
    tw = np.asarray(jax.device_get(domain(k).twiddles))

    def f(coeffs):
        return _ntt_impl(coeffs, jnp.asarray(tw), k, FR)

    return jax.jit(f)


def coeffs_to_evals(coeffs, k: int):
    """[n,16] coefficient form -> evaluations on H (natural order)."""
    return _fwd_ntt_fn(k)(coeffs)


# -- batched evaluation at a point ------------------------------------------

@functools.cache
def _batch_eval_fn(k: int, n_polys: int):
    """Barycentric: f(x) = (x^n - 1)/n * sum_i f_i * w^i / (x - w^i)."""
    n = 1 << k
    dom = domain(k)
    omega_pows = np.asarray(jax.device_get(dom.twiddles))  # [n/2] -- need n
    # full omega power table
    full = np.asarray(
        ints_to_limbs([pow(dom.omega, i, FR.p) * FR.R % FR.p for i in range(n)])
    )
    n_inv = FR.const_np(pow(n, -1, FR.p))

    def f(polys, x_mont):
        # polys: [P, n, 16] Montgomery; x: [16]
        w = jnp.asarray(full)
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

    return jax.jit(f)


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
    full = np.asarray(
        ints_to_limbs([pow(dom.omega, i, FR.p) * FR.R % FR.p for i in range(n)])
    )

    def f(combined, combined_eval, p_mont):
        # W = (combined - eval) * inv(w^i - p) pointwise on H
        w = jnp.asarray(full)
        denom = FR.sub(w, jnp.broadcast_to(p_mont, (n, N_LIMBS)))
        inv = FR.batch_inv(denom)
        num = FR.sub(combined, jnp.broadcast_to(combined_eval, (n, N_LIMBS)))
        return FR.mul(num, inv)

    return jax.jit(f)


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
