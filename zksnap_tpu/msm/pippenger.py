"""Pippenger multi-scalar multiplication on TPU.

Replaces halo2_proofs' `best_multiexp` (the dominant prover cost together
with the NTT; SURVEY.md section 3.2: advice/quotient commits + GWC open).

TPU-first design (no data-dependent scatter loops):
  * window digits (c bits) are extracted from canonical scalar limbs with
    static shifts;
  * per window, (bucket_id, point) pairs are SORTED by bucket
    (jax.lax.sort), bucket sums are computed with a SEGMENTED
    ASSOCIATIVE SCAN whose combiner is the branchless Jacobian add
    (log2(n) parallel rounds of point adds), and segment tails are
    scattered into the bucket table;
  * the weighted bucket reduction sum_b b*S_b is a reversed associative
    scan (suffix sums) + a log2 tree reduction;
  * windows combine Horner-style with c doublings per step.

Everything is static-shaped, so the whole MSM jit-compiles to one XLA
program.  See msm/sharded.py for the multi-chip (psum) variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jacobian import CurveOps, JacPoint
from ..fields.common import N_LIMBS


def window_digits(scalars, c: int, w: int):
    """scalars: [n, 16] canonical uint32 limbs; returns [n] int32 digits of
    window w (bits [c*w, c*w+c))."""
    assert c <= 16
    start = c * w
    l0, off = start // 16, start % 16
    padded = jnp.concatenate(
        [scalars, jnp.zeros(scalars.shape[:-1] + (1,), jnp.uint32)], axis=-1
    )
    lo = padded[..., l0] >> off
    if off > 0:  # static: digit spans the limb boundary
        lo = lo | (padded[..., l0 + 1] << (16 - off))
    val = lo & ((1 << c) - 1)
    return val.astype(jnp.int32)


def _segmented_bucket_sums(ops: CurveOps, pts: JacPoint, ids, n_buckets: int):
    """Sorted-segment bucket accumulation.

    pts/ids: [n] points and their bucket ids (unsorted).
    Returns JacPoint [n_buckets] with the group sum of each bucket.
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    ids_s = ids[order]
    px, py, pz = pts.x[order], pts.y[order], pts.z[order]

    # segment-start flags
    prev = jnp.concatenate([jnp.full((1,), -1, ids_s.dtype), ids_s[:-1]])
    flags = (ids_s != prev)

    # Segmented inclusive scan, Hillis-Steele style: log2(n) steps, each ONE
    # full-width batched Jacobian add.  (jax.lax.associative_scan would
    # inline the 1000-op combine body O(n) times -- untraceable.)
    ident = ops.identity((n,))
    sx, sy, sz, fs = px, py, pz, flags
    d = 1
    while d < n:
        shx = jnp.concatenate([ident.x[:d], sx[:-d]])
        shy = jnp.concatenate([ident.y[:d], sy[:-d]])
        shz = jnp.concatenate([ident.z[:d], sz[:-d]])
        shf = jnp.concatenate([jnp.ones((d,), bool), fs[:-d]])
        s = ops.add(JacPoint(shx, shy, shz), JacPoint(sx, sy, sz))
        keep = fs[..., None]  # segment boundary within distance d: keep own
        sx = jnp.where(keep, sx, s.x)
        sy = jnp.where(keep, sy, s.y)
        sz = jnp.where(keep, sz, s.z)
        fs = fs | shf
        d *= 2

    # tails: last element of each run
    nxt = jnp.concatenate([ids_s[1:], jnp.full((1,), -2, ids_s.dtype)])
    is_tail = ids_s != nxt
    # scatter tails into bucket table (non-tails go to a trash slot)
    target = jnp.where(is_tail, ids_s, n_buckets)
    ident = ops.identity((n_buckets + 1,))
    bx = ident.x.at[target].set(sx)
    by = ident.y.at[target].set(sy)
    bz = ident.z.at[target].set(sz)
    # drop trash slot; also zero out bucket 0 (weight 0)
    buckets = JacPoint(bx[:n_buckets], by[:n_buckets], bz[:n_buckets])
    zero_mask = jnp.arange(n_buckets) == 0
    bz0 = jnp.where(zero_mask[..., None], jnp.zeros_like(buckets.z), buckets.z)
    return JacPoint(buckets.x, buckets.y, bz0)


def _weighted_bucket_reduce(ops: CurveOps, buckets: JacPoint):
    """sum_b b * S_b via suffix sums: = sum_{b>=1} suffix_b.

    Suffix scan is a manual reversed Hillis-Steele loop (log2(B) batched
    adds) for the same trace-size reason as the segmented scan above."""
    n = buckets.x.shape[0]
    ident = ops.identity((n,))
    sx, sy, sz = buckets.x, buckets.y, buckets.z
    d = 1
    while d < n:
        shx = jnp.concatenate([sx[d:], ident.x[:d]])
        shy = jnp.concatenate([sy[d:], ident.y[:d]])
        shz = jnp.concatenate([sz[d:], ident.z[:d]])
        s = ops.add(JacPoint(sx, sy, sz), JacPoint(shx, shy, shz))
        sx, sy, sz = s.x, s.y, s.z
        d *= 2
    # total = sum of suffix[1:]; suffix[0] includes bucket 0 (identity) so
    # summing suffix[1:] is exactly sum_b b*S_b.
    acc = JacPoint(sx[1:], sy[1:], sz[1:])
    n = acc.x.shape[0]
    while n > 1:
        half = n // 2
        hi = JacPoint(acc.x[half : 2 * half], acc.y[half : 2 * half],
                      acc.z[half : 2 * half])
        lo = JacPoint(acc.x[:half], acc.y[:half], acc.z[:half])
        s = ops.add(lo, hi)
        if n % 2:  # carry the odd element
            s = JacPoint(
                jnp.concatenate([s.x, acc.x[2 * half :]]),
                jnp.concatenate([s.y, acc.y[2 * half :]]),
                jnp.concatenate([s.z, acc.z[2 * half :]]),
            )
        acc = s
        n = acc.x.shape[0]
    return JacPoint(acc.x[0], acc.y[0], acc.z[0])


def msm_impl(ops: CurveOps, pts: JacPoint, scalars, c: int, n_windows: int):
    """Full Pippenger: -> JacPoint (scalar batch shape ()).

    The per-window pipeline (sort -> segmented scan -> suffix reduce) is a
    lax.scan over windows so its graph is traced once, not n_windows times;
    the Horner double-chain is folded into the scan carry (MSB window
    first)."""
    digits_all = jnp.stack(
        [window_digits(scalars, c, w) for w in reversed(range(n_windows))]
    )  # [W, n], MSB window first

    def body(total, digits):
        buckets = _segmented_bucket_sums(ops, pts, digits, 1 << c)
        wsum = _weighted_bucket_reduce(ops, buckets)
        for _ in range(c):
            total = ops.double(total)
        return ops.add(total, wsum), None

    total, _ = jax.lax.scan(body, ops.identity(()), digits_all)
    return total


class MSM:
    """Jit-compiled Pippenger MSM for one curve."""

    def __init__(self, ops: CurveOps, c: int | None = None):
        self.ops = ops

    def _pick_c(self, n: int) -> int:
        # classic heuristic: c ~ log2(n) - 3, clamped to [4, 16]
        return max(4, min(16, n.bit_length() - 4))

    @functools.lru_cache(maxsize=32)
    def _compiled(self, n: int, c: int, n_windows: int):
        return jax.jit(
            lambda px, py, pz, s: msm_impl(
                self.ops, JacPoint(px, py, pz), s, c, n_windows
            )
        )

    def __call__(self, pts: JacPoint, scalars, c: int | None = None) -> JacPoint:
        """pts: JacPoint [n]; scalars: [n, 16] canonical limbs."""
        n = scalars.shape[0]
        c = c or self._pick_c(n)
        n_windows = -(-self.ops.F.bits // c)
        fn = self._compiled(n, c, n_windows)
        return fn(pts.x, pts.y, pts.z, scalars)


@functools.cache
def bn254_msm() -> MSM:
    from ..curves.jacobian import bn254_ops

    return MSM(bn254_ops())
