"""Pippenger multi-scalar multiplication on TPU.

Replaces halo2_proofs' `best_multiexp` (the dominant prover cost together
with the NTT; SURVEY.md section 3.2: advice/quotient commits + GWC open).

TPU-first design (no data-dependent scatter loops):
  * window digits (c bits) are extracted from canonical scalar limbs with
    static shifts; ALL windows are processed in one flattened pipeline via
    composite bucket ids (window << c | digit);
  * bucket accumulation is WORK-EFFICIENT two-level: (bucket_id, point)
    pairs are sorted by bucket (jax.lax.sort), laid out lane-major
    [M lanes x K steps], and reduced with a SEQUENTIAL segmented scan over
    K steps (lax.scan; each step is one full-width batched Jacobian add,
    so total group-add work is O(n) instead of the O(n log n) of a
    Hillis-Steele scan).  Segments crossing lane boundaries are fixed up
    with a log2(M) associative lane-carry scan;
  * the weighted bucket reduction sum_b b*S_b splits b = hi*Blo + lo:
    two tree reductions (O(B) adds) plus two small double-suffix scans,
    instead of a full-width O(B log B) suffix scan;
  * windows combine Horner-style with c doublings per step.

Everything is static-shaped, so the whole MSM jit-compiles to one XLA
program.  See parallel/sharded.py for the multi-chip (psum) variant.
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


def signed_digits(scalars, c: int, n_windows: int):
    """[W, n] BALANCED signed digits in [-(2^(c-1)-1), 2^(c-1)]: each unsigned
    window digit > 2^(c-1) becomes d - 2^c with a carry into the next
    window.  Halves the live bucket range (bucket |d|, negate the point
    when d < 0) -- the classic signed-digit Pippenger trick, shaped here
    as a lax.scan so the whole transform stays on device.

    The top carry is statically zero when n_windows*c > scalar bits
    (the last digit is then at most 2^(c-1)); msm_impl checks this."""
    digs = jnp.stack(
        [window_digits(scalars, c, w) for w in range(n_windows)])
    half, full = 1 << (c - 1), 1 << c

    def step(carry, d):
        d = d + carry
        over = d > half
        return over.astype(jnp.int32), jnp.where(over, d - full, d)

    _, out = jax.lax.scan(step, jnp.zeros_like(digs[0]), digs)
    return out


def _take(p: JacPoint, axis: int, lo: int, hi: int) -> JacPoint:
    sl = [slice(None)] * p.x.ndim
    sl[axis] = slice(lo, hi)
    sl = tuple(sl)
    return JacPoint(p.x[sl], p.y[sl], p.z[sl])


def _segmented_bucket_sums(ops: CurveOps, pts: JacPoint, ids, n_buckets: int,
                           lanes: int | None = None):
    """Work-efficient sorted-segment bucket accumulation.

    pts/ids: [n] points and their bucket ids (unsorted).
    Returns JacPoint [n_buckets] with the group sum of each bucket.

    Two-level: sort by id, split the sorted array into M lanes of K
    consecutive elements, run a sequential segmented scan down the lanes
    (K steps of one width-M add each -- O(n) total adds), then resolve
    segments that span lane boundaries with an associative carry scan
    over the M lane summaries (log2(M) width-M adds).
    """
    n = ids.shape[0]
    order = jnp.argsort(ids)
    ids_s = ids[order]
    px, py, pz = pts.x[order], pts.y[order], pts.z[order]

    if lanes is None:
        # fused mega-kernel: M=2048 measured fastest on v5e (124ms full
        # 2^16 MSM vs 162ms at M=8192 in the same process -- the ~37MB
        # VMEM frame at 8192 lanes costs more than the saved grid steps)
        M = min(n, 2048 if ops.use_fused() else 16384)
    else:
        M = min(n, lanes)
    K = -(-n // M)
    n_pad = M * K
    pad = n_pad - n
    if pad:
        ids_s = jnp.concatenate(
            [ids_s, jnp.full((pad,), n_buckets, ids_s.dtype)])
        zpad = jnp.zeros((pad, N_LIMBS), jnp.uint32)
        px = jnp.concatenate([px, zpad])
        py = jnp.concatenate([py, zpad])
        pz = jnp.concatenate([pz, zpad])  # z=0 -> identity

    prev = jnp.concatenate([jnp.full((1,), -1, ids_s.dtype), ids_s[:-1]])
    flags = ids_s != prev  # segment-start marks

    # lane-major: lane l owns sorted positions [l*K, (l+1)*K)
    def to_km(a):
        return jnp.moveaxis(a.reshape(M, K, *a.shape[1:]), 0, 1)

    flk = to_km(flags)

    if ops.use_fused():
        # ONE pallas call for the whole K-step scan (acc in VMEM scratch)
        from ..curves.fused import bucket_scan_fused

        parts_x, parts_y, parts_z = bucket_scan_fused(
            (px, py, pz), flags, M, K, ops.F.p, int(ops.F.n0),
            b3=getattr(ops, "b3", 0))
    else:
        pxk, pyk, pzk = to_km(px), to_km(py), to_km(pz)

        def step(acc, x):
            fx, fy, fz, fl = x
            # stream points are affine (z in {0,1}): mixed add
            s = ops.madd(acc, JacPoint(fx, fy, fz))
            keep = fl[:, None]
            new = JacPoint(jnp.where(keep, fx, s.x), jnp.where(keep, fy, s.y),
                           jnp.where(keep, fz, s.z))
            return new, (new.x, new.y, new.z)

        _, parts = jax.lax.scan(
            step, ops.identity((M,)), (pxk, pyk, pzk, flk))
        parts_x, parts_y, parts_z = parts  # [K, M, 16] lane partial sums

    # ---- lane-carry scan: resolve segments spanning lane boundaries ----
    # summary of lane l: (trailing segment sum, had any segment start)
    last = JacPoint(parts_x[-1], parts_y[-1], parts_z[-1])  # [M, 16]
    has_flag = jnp.any(flk, axis=0)  # [M]
    first_flag = flk[0]              # [M]
    fid = ids_s.reshape(M, K)[:, 0]  # first id in each lane

    # exclusive scan with combiner ((s1,f1),(s2,f2)) -> (f2 ? s2 : s1+s2,
    # f1|f2): shift summaries right by one, neutral = (identity, False).
    ident1 = ops.identity((1,))
    sx = jnp.concatenate([ident1.x, last.x[:-1]])
    sy = jnp.concatenate([ident1.y, last.y[:-1]])
    sz = jnp.concatenate([ident1.z, last.z[:-1]])
    f = jnp.concatenate([jnp.zeros((1,), bool), has_flag[:-1]])
    rows = jnp.arange(M)

    one_y = jnp.asarray(ops.F.one)  # identity must be (0 : 1 : 0): the RCB
    # complete formulas are only complete for VALID projective points, so
    # masked-out lanes can't keep rolled garbage in x/y (the Jacobian add
    # tolerates it via its z==0 select; the projective one does not)

    def carry_step(i, state):
        sx, sy, sz, f = state
        d = jnp.left_shift(1, i)
        valid = rows >= d
        vc = valid[:, None]
        shx = jnp.where(vc, jnp.roll(sx, d, axis=0), 0)
        shy = jnp.where(vc, jnp.roll(sy, d, axis=0), one_y)
        shz = jnp.where(vc, jnp.roll(sz, d, axis=0), 0)
        shf = jnp.where(valid, jnp.roll(f, d, axis=0), False)
        comb = ops.add(JacPoint(shx, shy, shz), JacPoint(sx, sy, sz))
        keep = f[:, None]  # own block already had a reset: keep own sum
        return (jnp.where(keep, sx, comb.x), jnp.where(keep, sy, comb.y),
                jnp.where(keep, sz, comb.z), f | shf)

    n_rounds = max((M - 1).bit_length(), 1) if M > 1 else 0
    if n_rounds:
        sx, sy, sz, f = jax.lax.fori_loop(
            0, n_rounds, carry_step, (sx, sy, sz, f))
    carry = JacPoint(sx, sy, sz)  # carry[l] = trailing run sum of lanes < l

    # lane l's first run needs its carry added exactly when the run both
    # crosses into the lane (no flag at lane position 0) and ends inside
    # it: a later flag in this lane, OR the next lane opening a new
    # segment (run ends exactly at the lane boundary), OR l is final.
    next_first = jnp.concatenate([first_flag[1:], jnp.ones((1,), bool)])
    apply = (~first_flag) & (has_flag | next_first)
    tgt_c = jnp.where(apply, fid, n_buckets)
    ident_tab = ops.identity((n_buckets + 1,))
    cx = ident_tab.x.at[tgt_c].set(carry.x)
    cy = ident_tab.y.at[tgt_c].set(carry.y)
    cz = ident_tab.z.at[tgt_c].set(carry.z)

    # ---- tails: last element of each run carries the lane-local run sum.
    # Each bucket's tail POSITION is searchsorted(ids_s, b, 'right') - 1
    # (ids_s is sorted), so the tails are a [n_buckets]-row GATHER from
    # the scan output instead of an n_pad-row scatter into a bucket
    # table -- the scatter moved ~n_pad * 192B through HBM (a measured
    # ~25ms at 2^16); the gather moves n_buckets * 192B.
    flat_x = jnp.moveaxis(parts_x, 0, 1).reshape(n_pad, N_LIMBS)
    flat_y = jnp.moveaxis(parts_y, 0, 1).reshape(n_pad, N_LIMBS)
    flat_z = jnp.moveaxis(parts_z, 0, 1).reshape(n_pad, N_LIMBS)
    qid = jnp.arange(n_buckets, dtype=ids_s.dtype)
    pos = jnp.searchsorted(ids_s, qid, side="right") - 1
    occupied = (pos >= 0) & (ids_s[jnp.maximum(pos, 0)] == qid)
    posc = jnp.maximum(pos, 0)
    keep = occupied[:, None]
    ident_b = _take(ident_tab, 0, 0, n_buckets)
    bx = jnp.where(keep, flat_x[posc], ident_b.x)
    by = jnp.where(keep, flat_y[posc], ident_b.y)
    bz = jnp.where(keep, flat_z[posc], ident_b.z)

    tot = ops.add(JacPoint(bx, by, bz),
                  _take(JacPoint(cx, cy, cz), 0, 0, n_buckets))
    return tot


def _suffix_scan(ops: CurveOps, pts: JacPoint) -> JacPoint:
    """suffix[..., i] = sum_{j >= i} pts[..., j] along the second-to-last
    axis (axis -2 of the limb tensors), as a fori_loop (one add body)."""
    n = pts.x.shape[-2]
    rows = jnp.arange(n)
    one_y = jnp.asarray(ops.F.one)

    def step(i, state):
        sx, sy, sz = state
        d = jnp.left_shift(1, i)
        valid = (rows < n - d)[:, None]
        # out-of-range rows become a VALID identity (0:1:0), not z=0 with
        # rolled garbage -- the RCB complete add requires valid points
        shx = jnp.where(valid, jnp.roll(sx, -d, axis=-2), 0)
        shy = jnp.where(valid, jnp.roll(sy, -d, axis=-2), one_y)
        shz = jnp.where(valid, jnp.roll(sz, -d, axis=-2), 0)
        s = ops.add(JacPoint(sx, sy, sz), JacPoint(shx, shy, shz))
        return (s.x, s.y, s.z)

    sx, sy, sz = jax.lax.fori_loop(
        0, max(n.bit_length() - 1, 1), step, (pts.x, pts.y, pts.z)
    )
    return JacPoint(sx, sy, sz)


def _weighted_small(ops: CurveOps, buckets: JacPoint,
                    offset: int = 1) -> JacPoint:
    """sum_b (b + 1 - offset) * S_b over the second-to-last axis via two
    suffix scans: suffix2[o] = sum_b (b + 1 - o) * S_b (offset=1 gives
    the classic sum b*S_b; offset=0 the signed-digit sum (b+1)*S_b)."""
    s1 = _suffix_scan(ops, buckets)
    s2 = _suffix_scan(ops, s1)
    return JacPoint(s2.x[..., offset, :], s2.y[..., offset, :],
                    s2.z[..., offset, :])


def _tree_reduce(ops: CurveOps, pts: JacPoint, axis: int) -> JacPoint:
    """Plain group sum along `axis` (length a power of two).

    Small axes (<= 16) reduce with ONE masked fori_loop ladder (the
    suffix-scan body) instead of log2(n) separately-traced halving adds:
    the traced graph has a single add body, which cuts the XLA compile
    of every Pippenger instantiation (cold-start budget).  Larger axes
    keep the work-optimal halving -- the ladder's log(n)*n adds showed
    up as ~+15ms at 2^16 when the bound was 256 (the c=13 weighted
    reduction has blo = bhi = 64)."""
    n = pts.x.shape[axis]
    if 1 < n <= 16:
        ax = axis % pts.x.ndim
        m = JacPoint(jnp.moveaxis(pts.x, ax, -2), jnp.moveaxis(pts.y, ax, -2),
                     jnp.moveaxis(pts.z, ax, -2))
        s = _suffix_scan(ops, m)
        return JacPoint(s.x[..., 0, :], s.y[..., 0, :], s.z[..., 0, :])
    while n > 1:
        half = n // 2
        pts = ops.add(_take(pts, axis, 0, half), _take(pts, axis, half, n))
        n = half
    sl = [slice(None)] * pts.x.ndim
    sl[axis] = 0
    sl = tuple(sl)
    return JacPoint(pts.x[sl], pts.y[sl], pts.z[sl])


def _weighted_bucket_reduce(ops: CurveOps, buckets: JacPoint, log_b: int,
                            plus_one: bool = False):
    """sum_b w(b) * S_b for each window (batched over the leading window
    axis), with weight w(b) = b (unsigned digits) or b + 1 (signed
    digits, where bucket j holds the points with |digit| = j + 1).

    For small windows uses the double-suffix scan directly; otherwise
    splits b = hi * Blo + lo so the heavy O(B) work is two tree
    reductions and only O(sqrt(B)) rows hit the log-cost suffix scans:
      sum_b (b+o)*S_b = Blo * sum_hi hi*R1[hi] + sum_lo (lo+o)*R2[lo]
      R1[hi] = sum_lo S[hi,lo],  R2[lo] = sum_hi S[hi,lo].
    """
    off = 0 if plus_one else 1
    if log_b <= 6:
        return _weighted_small(ops, buckets, offset=off)
    W = buckets.x.shape[0]
    clo = log_b // 2
    blo, bhi = 1 << clo, 1 << (log_b - clo)
    t = JacPoint(
        buckets.x.reshape(W, bhi, blo, N_LIMBS),
        buckets.y.reshape(W, bhi, blo, N_LIMBS),
        buckets.z.reshape(W, bhi, blo, N_LIMBS),
    )
    r1 = _tree_reduce(ops, t, 2)      # [W, bhi, 16]
    r2 = _tree_reduce(ops, t, 1)      # [W, blo, 16]
    w1 = _weighted_small(ops, r1)     # [W, 16]: sum_hi hi * R1
    w2 = _weighted_small(ops, r2, offset=off)
    for _ in range(clo):              # Blo * w1
        w1 = ops.double(w1)
    return ops.add(w1, w2)


def msm_impl(ops: CurveOps, pts: JacPoint, scalars, c: int, n_windows: int,
             lanes: int | None = None, window_group: int | None = None,
             signed: bool = True):
    """Full Pippenger: -> JacPoint (scalar batch shape ()).

    `pts` MUST be affine-or-identity (z in {0, 1}): the accumulation
    scan streams them through the mixed-add kernel.  All call sites
    load points via `from_affine_host` / the SRS cache, which satisfy
    this.

    `signed` uses balanced digits in [-2^(c-1), 2^(c-1)] (bucket |d|,
    negate y when d < 0): HALF the buckets per window, so the weighted
    reduction costs 2*W*2^(c-1) adds instead of 2*W*2^c.  Requires
    n_windows*c > scalar bits (top carry statically zero); callers with
    exactly-filled windows must pass signed=False.

    Windows are processed in groups of `window_group` (default: all W at
    once) through a flattened pipeline: composite bucket ids
    (window << c | digit) feed a single sort + two-level segmented
    accumulation over G*n elements (maximum batch width for the Pallas
    field kernels), the per-window weighted reductions run batched over
    the window axis, and only the cheap Horner double-chain is sequential.
    Grouping bounds peak HBM: the tiled point stream + its sorted copy is
    ~2 * G * n * 192B, which at n=2^21, G=W=16 is 13GB -- past a v5e chip;
    G=2 keeps the same total work in ~1.6GB windows (`_group_windows`).
    """
    n = scalars.shape[0]
    W = n_windows
    B = (1 << (c - 1)) if signed else (1 << c)  # live buckets per window
    wg = min(window_group or W, W)

    if signed:
        assert W * c > ops.F.bits, "signed digits need top-window slack"
        digits = signed_digits(scalars, c, W)         # [W, n]
        neg_y = ops.F.neg(pts.y)                      # [n, 16]
    else:
        digits = jnp.stack(
            [window_digits(scalars, c, w) for w in range(W)])

    def group_ids(dig):
        """dig [g, n] -> composite ids [g*n] (+ negation mask [g*n])."""
        g = dig.shape[0]
        base = jnp.arange(g, dtype=jnp.int32)[:, None] * B
        if signed:
            ids = jnp.where(dig == 0, g * B, base + jnp.abs(dig) - 1)
            return ids.reshape(-1), (dig < 0).reshape(-1)
        return (base + dig).reshape(-1), None

    def tiled_stream(g, neg):
        py = jnp.tile(pts.y, (g, 1))
        if neg is not None:
            py = jnp.where(neg[:, None], jnp.tile(neg_y, (g, 1)), py)
        return JacPoint(jnp.tile(pts.x, (g, 1)), py, jnp.tile(pts.z, (g, 1)))

    if wg == W:
        flat_ids, neg = group_ids(digits)
        flat_buckets = _segmented_bucket_sums(
            ops, tiled_stream(W, neg), flat_ids, W * B, lanes=lanes)
    elif W % wg == 0:
        # lax.scan over window groups: ONE compiled pipeline instance, and
        # peak HBM bounded by one group's tiled streams
        G = W // wg
        dig_g = digits.reshape(G, wg, n)
        base = jnp.arange(wg, dtype=jnp.int32)[None, :, None] * B
        tx = jnp.tile(pts.x, (wg, 1))
        tz = jnp.tile(pts.z, (wg, 1))
        ty = jnp.tile(pts.y, (wg, 1))
        if signed:
            ids_g = jnp.where(dig_g == 0, wg * B,
                              base + jnp.abs(dig_g) - 1).reshape(G, wg * n)
            neg_g = (dig_g < 0).reshape(G, wg * n)
            tny = jnp.tile(neg_y, (wg, 1))

            def body(_, x):
                ids, neg = x
                p = JacPoint(tx, jnp.where(neg[:, None], tny, ty), tz)
                fb = _segmented_bucket_sums(ops, p, ids, wg * B, lanes=lanes)
                return None, (fb.x, fb.y, fb.z)

            _, (bx, by, bz) = jax.lax.scan(body, None, (ids_g, neg_g))
        else:
            ids_g = (base + dig_g).reshape(G, wg * n)

            def body(_, ids):
                fb = _segmented_bucket_sums(ops, JacPoint(tx, ty, tz), ids,
                                            wg * B, lanes=lanes)
                return None, (fb.x, fb.y, fb.z)

            _, (bx, by, bz) = jax.lax.scan(body, None, ids_g)
        flat_buckets = JacPoint(bx.reshape(W * B, N_LIMBS),
                                by.reshape(W * B, N_LIMBS),
                                bz.reshape(W * B, N_LIMBS))
    else:
        parts = []
        for g0 in range(0, W, wg):
            gw = min(wg, W - g0)
            flat_ids, neg = group_ids(digits[g0 : g0 + gw])
            parts.append(_segmented_bucket_sums(
                ops, tiled_stream(gw, neg), flat_ids, gw * B, lanes=lanes))
        flat_buckets = JacPoint(
            jnp.concatenate([p.x for p in parts]),
            jnp.concatenate([p.y for p in parts]),
            jnp.concatenate([p.z for p in parts]))
    import os as _os

    # The in-kernel weighted-suffix/ladder reduction kernels
    # (curves/fused.py) are OFF by default: same-process A/B on v5e
    # measured them at +106ms on the 2^16 MSM (230.7 vs 124.3 ms) --
    # the dynamic pltpu.roll rounds lower poorly in Mosaic.  Kept behind
    # the flag for future tuning (they ARE the right dispatch-count
    # shape; the composed jnp path pays ~45ms of launch overhead).
    b3 = getattr(ops, "b3", 0)
    if b3 and _os.environ.get("ZKSNAP_TPU_FUSED_REDUCE", "0") == "1":
        # fused post-scan pipeline: ONE double-suffix kernel (weighted
        # bucket reduction, window-local masked rolls) + ONE
        # ladder/tree kernel (Horner doublings + final sum) -- replaces
        # ~50 separate point-kernel dispatches (measured 84ms of the
        # 185ms 2^16 MSM; see curves/fused.py)
        from ..curves.fused import ladder_tree_fused, weighted_suffix_fused

        s2 = weighted_suffix_fused(
            (flat_buckets.x, flat_buckets.y, flat_buckets.z), B,
            ops.F.p, int(ops.F.n0), b3=b3)
        sel = jnp.arange(W) * B + (0 if signed else 1)
        x, y, z = ladder_tree_fused(
            (s2[0][sel], s2[1][sel], s2[2][sel]), c, W,
            ops.F.p, int(ops.F.n0), b3=b3)
        return JacPoint(x, y, z)

    buckets = JacPoint(
        flat_buckets.x.reshape(W, B, -1),
        flat_buckets.y.reshape(W, B, -1),
        flat_buckets.z.reshape(W, B, -1),
    )
    wsums = _weighted_bucket_reduce(
        ops, buckets, c - 1 if signed else c, plus_one=signed)  # [W, 16]

    # window combine: T = sum_w 2^{c*w} S_w.  A Horner chain is c*(W-1)
    # doublings of a SINGLE point -- pure launch latency on TPU.  Instead:
    # masked doubling ladder batched over the window axis (entry w keeps
    # doubling while i < c*w), then a tree reduction.
    Wp = 1 << max((W - 1).bit_length(), 0)  # pad to power of two
    idp = ops.identity((Wp - W,))
    pts = JacPoint(jnp.concatenate([wsums.x, idp.x]),
                   jnp.concatenate([wsums.y, idp.y]),
                   jnp.concatenate([wsums.z, idp.z]))
    widx = jnp.arange(Wp)

    def ladder(i, t):
        x, y, z = t
        d = ops.double(JacPoint(x, y, z))
        need = (widx * c) > i
        return (jnp.where(need[:, None], d.x, x),
                jnp.where(need[:, None], d.y, y),
                jnp.where(need[:, None], d.z, z))

    pts = JacPoint(*jax.lax.fori_loop(0, c * (W - 1), ladder,
                                      (pts.x, pts.y, pts.z)))
    return _tree_reduce(ops, pts, 0)


def _group_windows(n: int, n_windows: int) -> int:
    """Windows per bucket-accumulation pass: cap the tiled point stream at
    ~2^22 points (~1.6GB with its sorted copy)."""
    return max(1, min(n_windows, (1 << 22) // max(n, 1)))


class MSM:
    """Jit-compiled Pippenger MSM for one curve."""

    def __init__(self, ops: CurveOps, c: int | None = None,
                 signed: bool = True):
        self.ops = ops
        self.lanes = None  # bucket-accumulation lane count override
        self.signed = signed

    def _pick_c(self, n: int, signed: bool) -> int:
        # minimize modeled group-add count: W*n accumulation + ~2*W*B
        # reduction (+ lane-scan overhead, independent of c); signed
        # digits halve B, shifting the optimum one window-bit wider
        best, best_cost = 8, None
        for c in range(6, 17):
            w = -(-self.ops.F.bits // c)
            b = 1 << (c - 1 if signed else c)
            cost = w * n + 2 * w * b
            if best_cost is None or cost < best_cost:
                best, best_cost = c, cost
        return best

    @functools.lru_cache(maxsize=32)
    def _compiled(self, n: int, c: int, n_windows: int, lanes: int | None,
                  signed: bool):
        return jax.jit(
            lambda px, py, pz, s: msm_impl(
                self.ops, JacPoint(px, py, pz), s, c, n_windows, lanes=lanes,
                window_group=_group_windows(n, n_windows), signed=signed,
            )
        )

    def __call__(self, pts: JacPoint, scalars, c: int | None = None) -> JacPoint:
        """pts: JacPoint [n]; scalars: [n, 16] canonical limbs."""
        n = scalars.shape[0]
        c = c or self._pick_c(n, self.signed)
        n_windows = -(-self.ops.F.bits // c)
        # signed digits need top-window slack (see msm_impl)
        signed = self.signed and n_windows * c > self.ops.F.bits
        fn = self._compiled(n, c, n_windows, self.lanes, signed)
        return fn(pts.x, pts.y, pts.z, scalars)


@functools.cache
def bn254_msm() -> MSM:
    """Jacobian-coordinate MSM (kept for parity tests)."""
    from ..curves.jacobian import bn254_ops

    return MSM(bn254_ops())


@functools.cache
def bn254_msm_proj() -> MSM:
    """RCB complete-projective MSM -- the fast path.  NOTE: the returned
    JacPoint holds PROJECTIVE coordinates; convert with
    `bn254_proj_ops().to_affine_host` / `.normalize`."""
    from ..curves.proj import bn254_proj_ops

    return MSM(bn254_proj_ops())
