"""Fixed-base MSM with per-window shifted-point tables.

Every prover commitment multiplies the SAME point set (the SRS
Lagrange/monomial bases for a given k) by fresh scalars -- halo2's
`best_multiexp` treats them as variable-base every time (SURVEY.md
section 3.2), and so did `msm/pippenger.py`.  With the bases fixed we
precompute, once per (point set, window width):

    T[w*n + i] = 2^(c*w) * P_i        for every window w

which restructures Pippenger (VERDICT r4 "What's weak" #1):

  * NO Horner doubling ladder: the window shift lives in the table;
  * ONE shared signed-digit bucket space of B = 2^(c-1) buckets for ALL
    windows (vs W separate bucket sets), so the weighted reduction is
    O(B) instead of O(W*B) and the window tree-combine disappears;
  * fewer (point, digit) pairs per scalar bit: with the ladder gone the
    optimal window widens (c=16: 16 windows instead of the
    variable-base optimum ~12/13), cutting sort+scan work ~25%.

The accumulation itself reuses `_segmented_bucket_sums` (sorted-segment
lane scan) -- that part is scalar-dependent and cannot be precomputed.

Table memory: n * W affine rows = 2 * 64B * n * ceil(254/c); at n=2^21,
c=16 that is ~4.3GB of HBM, so tables default ON only up to
MAX_AUTO_TABLE_N points (the wrapper-width prover needs its HBM for the
~140 resident polynomials; enable explicitly where it fits).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jacobian import CurveOps, JacPoint
from ..fields.common import N_LIMBS
from .pippenger import (
    _segmented_bucket_sums,
    _weighted_bucket_reduce,
    signed_digits,
)


@functools.lru_cache(maxsize=8)
def _build_table_fn(ops_key, n: int, c: int, n_windows: int):
    from ..curves.proj import bn254_proj_ops

    ops = bn254_proj_ops()

    def f(px, py, pz):
        """[n] affine-or-id points -> ([W*n,16] x, [W*n,16] y) affine
        table rows (identity encoded x=y=0, matching from_affine_host).

        The (W-1)*c sequential doublings run as a lax.scan over windows
        with a fori_loop body -- an UNROLLED chain was a ~3000-field-mul
        traced graph whose far-side compile can wedge the TPU relay
        (.claude/skills/verify/SKILL.md kernel-size caveat)."""
        Fq = ops.F

        def dbl_c(t):
            def body(_, s):
                d = ops.double(JacPoint(*s))
                return (d.x, d.y, d.z)

            return jax.lax.fori_loop(0, c, body, t)

        def step(carry, _):
            nxt = dbl_c(carry)
            return nxt, carry

        _, (xs, ys, zs) = jax.lax.scan(
            step, (px, py, pz), None, length=n_windows)
        X = xs.reshape(n_windows * n, 16)
        Y = ys.reshape(n_windows * n, 16)
        Z = zs.reshape(n_windows * n, 16)
        # projective normalize: (x/z, y/z, 1), identity (z==0) -> (0,0,0)
        zero = (Z == 0).all(axis=-1, keepdims=True)
        zinv = Fq.batch_inv(jnp.where(zero, jnp.asarray(Fq.one), Z))
        ax = jnp.where(zero, 0, Fq.mul(X, zinv))
        ay = jnp.where(zero, 0, Fq.mul(Y, zinv))
        az = jnp.where(zero, 0, jnp.broadcast_to(jnp.asarray(Fq.one),
                                                 Z.shape))
        return ax, ay, az

    return jax.jit(f)


class FixedBaseTable:
    """Precomputed shifted-point table for one fixed point set."""

    def __init__(self, x, y, z, n: int, c: int, n_windows: int):
        self.x, self.y, self.z = x, y, z   # [W*n, 16] affine-or-id rows
        self.n = n
        self.c = c
        self.n_windows = n_windows


def build_table(pts: JacPoint, n: int, c: int) -> FixedBaseTable:
    """pts: affine-or-identity JacPoint rows (z in {0,1}), e.g. an SRS
    basis.  One-time cost: (W-1)*c batched point doublings + a batch
    inversion; reused for every subsequent commit over these points."""
    n_windows = -(-254 // c)
    assert n_windows * c > 254, "signed digits need top-window slack"
    fn = _build_table_fn("bn254_proj", n, c, n_windows)
    x, y, z = fn(pts.x[:n], pts.y[:n], pts.z[:n])
    return FixedBaseTable(x, y, z, n, c, n_windows)


def msm_fixed_impl(ops: CurveOps, table: FixedBaseTable, scalars,
                   lanes: int | None = None, pair_group: int | None = None):
    """MSM over a precomputed table: -> JacPoint (projective coords).

    scalars: [n, 16] canonical limbs.  All windows share one signed
    bucket space; the per-group bucket tables are group-added, then one
    weighted reduction finishes (no doubling ladder).
    """
    n, c, W = table.n, table.c, table.n_windows
    B = 1 << (c - 1)
    digits = signed_digits(scalars, c, W)            # [W, n]
    ids = jnp.where(digits == 0, B, jnp.abs(digits) - 1).reshape(-1)
    neg = (digits < 0).reshape(-1)
    neg_y = ops.F.neg(table.y)
    py = jnp.where(neg[:, None], neg_y, table.y)

    total_pairs = W * n
    gp = pair_group or (1 << 22)
    if total_pairs <= gp:
        buckets = _segmented_bucket_sums(
            ops, JacPoint(table.x, py, table.z), ids, B, lanes=lanes)
    else:
        # group windows so one sorted copy stays ~gp rows; bucket tables
        # from each group combine with B parallel adds
        wg = max(1, gp // n)
        buckets = None
        for w0 in range(0, W, wg):
            w1 = min(w0 + wg, W)
            sl = slice(w0 * n, w1 * n)
            ids_g = jnp.where(digits[w0:w1] == 0, B,
                              jnp.abs(digits[w0:w1]) - 1).reshape(-1)
            part = _segmented_bucket_sums(
                ops, JacPoint(table.x[sl], py[sl], table.z[sl]), ids_g, B,
                lanes=lanes)
            buckets = part if buckets is None else ops.add(buckets, part)

    b3 = JacPoint(buckets.x[None], buckets.y[None], buckets.z[None])
    w = _weighted_bucket_reduce(ops, b3, c - 1, plus_one=True)  # [1, 16]
    return JacPoint(w.x[0], w.y[0], w.z[0])


@functools.lru_cache(maxsize=16)
def _msm_fixed_jit(table_key: int, n: int, c: int):
    from ..curves.proj import bn254_proj_ops

    ops = bn254_proj_ops()

    def f(tx, ty, tz, scalars):
        t = FixedBaseTable(tx, ty, tz, n, c, -(-254 // c))
        r = msm_fixed_impl(ops, t, scalars)
        # projective -> Jacobian (X*Z, Y*Z^2, Z), as _commit_jit does
        Fq = ops.F
        return JacPoint(Fq.mul(r.x, r.z), Fq.mul(r.y, Fq.square(r.z)), r.z)

    return jax.jit(f)


def commit_fixed(table: FixedBaseTable, scalars) -> JacPoint:
    """KZG commit over a precomputed fixed-base table; returns Jacobian
    (same contract as poly_device.commit_evals)."""
    fn = _msm_fixed_jit(id(table.x), table.n, table.c)
    return fn(table.x, table.y, table.z, scalars)
