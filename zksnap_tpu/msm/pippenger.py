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
    # full-width batched Jacobian add.  Expressed as a fori_loop with a
    # dynamic roll so the (large) add body appears ONCE in the graph --
    # compile time matters as much as run time for these kernels.
    ident = ops.identity((n,))
    rows = jnp.arange(n)

    def seg_step(i, state):
        sx, sy, sz, fs = state
        d = jnp.left_shift(1, i)
        valid = rows >= d  # rows < d have no left neighbour at distance d
        shx = jnp.roll(sx, d, axis=0)
        shy = jnp.roll(sy, d, axis=0)
        shz = jnp.roll(sz, d, axis=0)
        shz = jnp.where(valid[:, None], shz, jnp.zeros_like(shz))  # -> identity
        shf = jnp.where(valid, jnp.roll(fs, d, axis=0), True)
        s = ops.add(JacPoint(shx, shy, shz), JacPoint(sx, sy, sz))
        keep = fs[:, None]  # segment boundary within distance d: keep own
        return (
            jnp.where(keep, sx, s.x),
            jnp.where(keep, sy, s.y),
            jnp.where(keep, sz, s.z),
            fs | shf,
        )

    sx, sy, sz, _ = jax.lax.fori_loop(
        0, max(n.bit_length() - 1, 1), seg_step, (px, py, pz, flags)
    )

    # tails: last element of each run
    nxt = jnp.concatenate([ids_s[1:], jnp.full((1,), -2, ids_s.dtype)])
    is_tail = ids_s != nxt
    # scatter tails into bucket table (non-tails go to a trash slot)
    target = jnp.where(is_tail, ids_s, n_buckets)
    ident = ops.identity((n_buckets + 1,))
    bx = ident.x.at[target].set(sx)
    by = ident.y.at[target].set(sy)
    bz = ident.z.at[target].set(sz)
    # drop trash slot (bucket 0 carries weight 0; the weighted reduce
    # excludes it per-window, no masking needed)
    return JacPoint(bx[:n_buckets], by[:n_buckets], bz[:n_buckets])


def _suffix_scan(ops: CurveOps, pts: JacPoint) -> JacPoint:
    """suffix[..., i] = sum_{j >= i} pts[..., j] along the second-to-last
    axis (axis -2 of the limb tensors), as a fori_loop (one add body)."""
    n = pts.x.shape[-2]
    rows = jnp.arange(n)

    def step(i, state):
        sx, sy, sz = state
        d = jnp.left_shift(1, i)
        valid = rows < n - d
        shx = jnp.roll(sx, -d, axis=-2)
        shy = jnp.roll(sy, -d, axis=-2)
        shz = jnp.roll(sz, -d, axis=-2)
        shz = jnp.where(valid[:, None], shz, jnp.zeros_like(shz))
        s = ops.add(JacPoint(sx, sy, sz), JacPoint(shx, shy, shz))
        return (s.x, s.y, s.z)

    sx, sy, sz = jax.lax.fori_loop(
        0, max(n.bit_length() - 1, 1), step, (pts.x, pts.y, pts.z)
    )
    return JacPoint(sx, sy, sz)


def _weighted_bucket_reduce(ops: CurveOps, buckets: JacPoint):
    """sum_b b * S_b = (suffix o suffix)[..., 1]: two suffix scans along
    the bucket axis (batched over any leading window axis).

    suffix1[b] = sum_{b'>=b} S_b'; sum_{b>=1} suffix1[b] = suffix2[1]."""
    s1 = _suffix_scan(ops, buckets)
    s2 = _suffix_scan(ops, s1)
    return JacPoint(s2.x[..., 1, :], s2.y[..., 1, :], s2.z[..., 1, :])


def msm_impl(ops: CurveOps, pts: JacPoint, scalars, c: int, n_windows: int):
    """Full Pippenger: -> JacPoint (scalar batch shape ()).

    ALL windows are processed in one flattened pipeline: composite bucket
    ids (window << c | digit) feed a single sort + segmented scan over
    W*n elements (maximum batch width for the Pallas field kernels), the
    per-window weighted reductions run batched over the window axis, and
    only the cheap Horner double-chain is sequential."""
    n = scalars.shape[0]
    W, B = n_windows, 1 << c
    digits = jnp.stack([window_digits(scalars, c, w) for w in range(W)])
    flat_ids = (jnp.arange(W, dtype=jnp.int32)[:, None] * B + digits).reshape(-1)
    tiled = JacPoint(
        jnp.tile(pts.x, (W, 1)), jnp.tile(pts.y, (W, 1)), jnp.tile(pts.z, (W, 1))
    )
    flat_buckets = _segmented_bucket_sums(ops, tiled, flat_ids, W * B)
    buckets = JacPoint(
        flat_buckets.x.reshape(W, B, -1),
        flat_buckets.y.reshape(W, B, -1),
        flat_buckets.z.reshape(W, B, -1),
    )
    wsums = _weighted_bucket_reduce(ops, buckets)  # [W, 16] points

    # Horner over windows, MSB first
    rev = JacPoint(wsums.x[::-1], wsums.y[::-1], wsums.z[::-1])

    def body(total, wsum):
        total = jax.lax.fori_loop(0, c, lambda i, t: ops.double(t), total)
        return ops.add(total, JacPoint(*wsum)), None

    total, _ = jax.lax.scan(body, ops.identity(()), (rev.x, rev.y, rev.z))
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
