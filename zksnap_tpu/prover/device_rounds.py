"""Device-side prover round computations (logUp helper h, permutation
grand products Z, omega power tables).

Replaces the pure-python per-row loops `_compute_h` / `_compute_z_chunks`
in prover/plonk.py (the round-1 host bottleneck flagged in VERDICT.md
"What's weak" #3) with jitted limb-tensor programs:

  * denominators inverted with the log-depth `PrimeField.batch_inv`;
  * running sums / grand products as Hillis-Steele prefix scans
    (log2(n) full-width adds/muls instead of n python-int ops);
  * the PERM_CHUNK chaining (halo2-style chained Z polys,
    prover/plonk.py docstring) handled with an unrolled exclusive
    product over the (small) chunk axis.

Reference parity: halo2_proofs lookup::prover / permutation::prover
(create_proof internals, SURVEY.md section 3.2) -- same committed
polynomials, TPU-native computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.common import N_LIMBS
from ..fields.field import bn254_fr

FR = bn254_fr()


@functools.cache
def _omega_pows_dev(k: int):
    """[n,16] Montgomery table of omega^i for the size-2^k domain.

    Computed on device from the bit decomposition of i: log2(n) full-width
    muls (omega^(2^b) factors selected per bit).
    """
    from ..poly.domain import domain

    omega = domain(k).omega
    n = 1 << k

    @jax.jit
    def build():
        acc = jnp.broadcast_to(jnp.asarray(FR.one), (n, N_LIMBS))
        idx = jnp.arange(n)
        for b in range(k):
            w2b = jnp.asarray(FR.const_np(pow(omega, 1 << b, FR.p)))
            fac = jnp.where(
                ((idx >> b) & 1)[:, None].astype(bool),
                jnp.broadcast_to(w2b, (n, N_LIMBS)),
                jnp.broadcast_to(jnp.asarray(FR.one), (n, N_LIMBS)),
            )
            acc = FR.mul(acc, fac)
        return acc

    return build()


def _prefix_op(op, x, identity, axis: int = 0):
    """Inclusive Hillis-Steele scan with `op` along `axis` (log2 rounds)."""
    n = x.shape[axis]
    idx_shape = [1] * x.ndim
    idx_shape[axis] = n
    idx = jnp.arange(n).reshape(idx_shape)
    d = 1
    while d < n:
        sh = jnp.where(idx >= d, jnp.roll(x, d, axis=axis), identity)
        x = op(x, sh)
        d <<= 1
    return x


@functools.lru_cache(maxsize=32)
def _compute_h_fn(k: int, n_lookup: int):
    n = 1 << k

    def f(lookups, table, mult, beta_lk):
        # lookups: [n_lookup, n, 16]; table/mult: [n, 16]; beta_lk: [16]
        # (all Montgomery)
        bl = jnp.broadcast_to(beta_lk, (n, N_LIMBS))
        dens = [FR.add(lookups[j], bl) for j in range(n_lookup)]
        dens.append(FR.add(table, bl))
        invs = FR.batch_inv(jnp.stack(dens).reshape(-1, N_LIMBS))
        invs = invs.reshape(n_lookup + 1, n, N_LIMBS)
        step = invs[0]
        for j in range(1, n_lookup):
            step = FR.add(step, invs[j])
        step = FR.sub(step, FR.mul(mult, invs[n_lookup]))
        zero = jnp.zeros((n, N_LIMBS), jnp.uint32)
        incl = _prefix_op(FR.add, step, zero)
        # h[0] = 0, h[i] = sum_{j<i} step[j]; closure = incl[-1] (must be 0)
        h = jnp.concatenate([zero[:1], incl[:-1]], axis=0)
        return h, incl[-1]

    return jax.jit(f)


def compute_h_dev(k: int, lookup_devs: list, table_dev, mult_dev,
                  beta_lk: int):
    """Device logUp helper column (Montgomery [n,16]) + closure residue.

    Same recurrence as the host `_compute_h` (prover/plonk.py):
    h[i+1] = h[i] + sum_j 1/(b+L_j[i]) - m[i]/(b+T[i]).
    """
    fn = _compute_h_fn(k, len(lookup_devs))
    h, last = fn(jnp.stack(lookup_devs), table_dev, mult_dev,
                 jnp.asarray(FR.const(beta_lk)))
    return h, last


@functools.lru_cache(maxsize=64)
def _z_chunk_fn(k: int, usable: int, sz: int, deltas_chunk: tuple):
    """One permutation chunk: (columns, sigmas, carry) -> (z_c, carry').

    Chunked so peak HBM is O(PERM_CHUNK * n) instead of O(n_perm * n) --
    at wrapper scale (n_perm ~ 20+, k = 21) the all-chunks-at-once
    version held >10 GB of lhs/rhs intermediates.
    """
    n = 1 << k
    u = usable

    def f(cols, sigmas, om, beta, gamma, carry):
        # cols/sigmas: [sz, n, 16] Montgomery; om: [n,16] omega powers
        # (passed in, NOT computed here: _omega_pows_dev is functools.cached
        # and calling it under this trace would cache a tracer);
        # beta/gamma/carry: [16]
        bg = jnp.broadcast_to(gamma, (n, N_LIMBS))
        num, den = None, None
        for j in range(sz):
            bd = FR.mul(beta, jnp.asarray(FR.const_np(deltas_chunk[j])))
            lhs = FR.add(FR.add(cols[j], FR.mul(
                jnp.broadcast_to(bd, (n, N_LIMBS)), om)), bg)
            rhs = FR.add(FR.add(cols[j], FR.mul(
                jnp.broadcast_to(beta, (n, N_LIMBS)), sigmas[j])), bg)
            num = lhs if num is None else FR.mul(num, lhs)
            den = rhs if den is None else FR.mul(den, rhs)
        den_inv = FR.batch_inv(den[:u])
        ratio = FR.mul(num[:u], den_inv)  # [u, 16]
        one = jnp.broadcast_to(jnp.asarray(FR.one), ratio.shape)
        incl = _prefix_op(FR.mul, ratio, one, axis=0)  # [u, 16]
        new_carry = FR.mul(carry, incl[u - 1])
        cc = jnp.broadcast_to(carry, (1, N_LIMBS))
        body = FR.mul(incl, cc)  # z_c[1..u]
        tail = jnp.broadcast_to(new_carry, (n - u - 1, N_LIMBS))
        z = jnp.concatenate([cc, body, tail], axis=0)
        return z, new_carry

    return jax.jit(f)


def compute_z_dev(layout, col_loader, sigma_loader, beta: int,
                  gamma: int):
    """Device chained permutation grand products, one chunk at a time.

    col_loader(j) / sigma_loader(j) must return the evaluation form
    ([n,16] Montgomery) of permutation column j / sigma_j on demand
    (column evals are regenerated per chunk by forward NTT from the
    packed at-rest coefficients, so no more than one chunk's columns
    are resident -- holding every perm column's evals was ~7GB at
    wrapper width; col_loader also accepts a plain list for tests).
    Returns (list of z_c [n,16], closure) where closure must equal 1 in
    Montgomery form.  The carry chains device-to-device; only the final
    closure forces a host sync (in the caller).
    """
    from .keygen import PERM_CHUNK

    if isinstance(col_loader, (list, tuple)):
        cols_list = col_loader
        col_loader = lambda j: cols_list[j]  # noqa: E731
    n_perm = len(layout.perm_columns)
    om = _omega_pows_dev(layout.k)
    beta_d = jnp.asarray(FR.const(beta))
    gamma_d = jnp.asarray(FR.const(gamma))
    carry = jnp.asarray(FR.one)
    zs = []
    for c0 in range(0, n_perm, PERM_CHUNK):
        sz = min(PERM_CHUNK, n_perm - c0)
        fn = _z_chunk_fn(layout.k, layout.usable, sz,
                         tuple(layout.deltas[c0 : c0 + sz]))
        cols = jnp.stack([col_loader(j) for j in range(c0, c0 + sz)])
        sigmas = jnp.stack([sigma_loader(j) for j in range(c0, c0 + sz)])
        z, carry = fn(cols, sigmas, om, beta_d, gamma_d, carry)
        zs.append(z)
    return zs, carry
