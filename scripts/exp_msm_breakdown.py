#!/usr/bin/env python
"""Stage-level MSM cost breakdown on the real TPU.

Times each pipeline stage of msm_impl separately (sort+gather, scan,
lane-carry + tails, weighted reduction, ladder+tree) so optimization
effort goes where the time is.

Usage: python scripts/exp_msm_breakdown.py [n_log=16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from zksnap_tpu.curves.proj import bn254_proj_ops
from zksnap_tpu.curves.jacobian import JacPoint
from zksnap_tpu.fields.common import N_LIMBS, ints_to_limbs
from zksnap_tpu.msm import pippenger as pp


def sync(*xs):
    # through the axon relay block_until_ready does NOT block; force a
    # tiny readback per leaf (see .claude/skills/verify/SKILL.md)
    for x in xs:
        for leaf in jax.tree_util.tree_leaves(x):
            np.asarray(jax.device_get(jnp.sum(leaf.astype(jnp.uint32))))


def bench(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters, out


def main():
    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << n_log
    ops = bn254_proj_ops()
    print(f"devices: {jax.devices()}  n=2^{n_log}", flush=True)

    # points: (i+1)*G in projective form via scalar_mul on generator
    @jax.jit
    def mk():
        g = ops.generator((n,))
        idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
        nb = max(n.bit_length(), 1)
        bits = jnp.stack([(idx >> (nb - 1 - b)) & 1 for b in range(nb)],
                         axis=-1)
        return ops.scalar_mul(g, bits)

    pts = mk()
    sync(pts.x)
    import secrets
    scalars = jnp.asarray(
        ints_to_limbs([secrets.randbelow(ops.F.p) for _ in range(n)]))

    msm = pp.MSM(ops)
    c = msm._pick_c(n, True)
    W = -(-ops.F.bits // c)
    B = 1 << (c - 1)
    print(f"c={c} W={W} B={B}", flush=True)

    # --- full MSM ---------------------------------------------------------
    fn_full = msm._compiled(n, c, W, None, True)
    t_full, _ = bench(lambda: fn_full(pts.x, pts.y, pts.z, scalars))
    print(f"full msm: {t_full*1e3:.1f} ms  ({n/t_full/1e6:.3f} Mpts/s)",
          flush=True)

    wg = pp._group_windows(n, W)
    G = W // wg if W % wg == 0 else 1
    print(f"window_group={wg} (G={G} passes)", flush=True)

    # --- stage 1: digits --------------------------------------------------
    f_dig = jax.jit(lambda s: pp.signed_digits(s, c, W))
    t_dig, digits = bench(f_dig, scalars)
    print(f"digits: {t_dig*1e3:.2f} ms", flush=True)

    # --- stage 2: ids + sort + gather (one window group) ------------------
    def ids_sort_gather(dig, px, py, pz, nx_y):
        g = dig.shape[0]
        base = jnp.arange(g, dtype=jnp.int32)[:, None] * B
        ids = jnp.where(dig == 0, g * B,
                        base + jnp.abs(dig) - 1).reshape(-1)
        neg = (dig < 0).reshape(-1)
        ty = jnp.where(neg[:, None], jnp.tile(nx_y, (g, 1)),
                       jnp.tile(py, (g, 1)))
        tx = jnp.tile(px, (g, 1))
        tz = jnp.tile(pz, (g, 1))
        order = jnp.argsort(ids)
        return ids[order], tx[order], ty[order], tz[order]

    f_sg = jax.jit(ids_sort_gather)
    neg_y = jax.jit(ops.F.neg)(pts.y)
    dg = digits[:wg]
    t_sg, (ids_s, sx, sy, sz) = bench(
        f_sg, dg, pts.x, pts.y, pts.z, neg_y)
    print(f"ids+sort+gather ({wg}w): {t_sg*1e3:.2f} ms x{G} passes "
          f"= {t_sg*G*1e3:.1f} ms", flush=True)

    # sort alone
    def sort_only(dig):
        g = dig.shape[0]
        base = jnp.arange(g, dtype=jnp.int32)[:, None] * B
        ids = jnp.where(dig == 0, g * B,
                        base + jnp.abs(dig) - 1).reshape(-1)
        return jnp.argsort(ids)

    t_so, _ = bench(jax.jit(sort_only), dg)
    print(f"  sort alone: {t_so*1e3:.2f} ms", flush=True)

    # --- stage 3: the fused scan (one group) ------------------------------
    npts = ids_s.shape[0]
    M = min(npts, 2048)
    K = -(-npts // M)

    prev = jnp.concatenate([jnp.full((1,), -1, ids_s.dtype), ids_s[:-1]])
    flags = ids_s != prev

    from zksnap_tpu.curves.fused import bucket_scan_fused

    def scan_only(px, py, pz, fl):
        return bucket_scan_fused((px, py, pz), fl, M, K, ops.F.p,
                                 int(ops.F.n0), b3=getattr(ops, "b3", 0))

    t_sc, parts = bench(jax.jit(scan_only), sx, sy, sz, flags)
    print(f"scan ({M}x{K}): {t_sc*1e3:.2f} ms x{G} passes "
          f"= {t_sc*G*1e3:.1f} ms", flush=True)

    # --- stage 4: full bucket sums (scan + carries + tails), one group ----
    f_bs = jax.jit(lambda p_x, p_y, p_z, i: pp._segmented_bucket_sums(
        ops, JacPoint(p_x, p_y, p_z), i, wg * B))
    t_bs, buckets = bench(f_bs, sx, sy, sz, ids_s)
    print(f"bucket sums total: {t_bs*1e3:.2f} ms x{G} = {t_bs*G*1e3:.1f} ms"
          f"  (carry+tails = {max(t_bs-t_sc-t_sg+t_so,0)*1e3:.2f} ms)",
          flush=True)

    # --- stage 5: weighted reduction over all W windows -------------------
    bx = jnp.tile(buckets.x[: wg * B].reshape(wg, B, N_LIMBS), (G, 1, 1))
    by = jnp.tile(buckets.y[: wg * B].reshape(wg, B, N_LIMBS), (G, 1, 1))
    bz = jnp.tile(buckets.z[: wg * B].reshape(wg, B, N_LIMBS), (G, 1, 1))
    f_wr = jax.jit(lambda x, y, z: pp._weighted_bucket_reduce(
        ops, JacPoint(x, y, z), c - 1, plus_one=True))
    t_wr, wsums = bench(f_wr, bx, by, bz)
    print(f"weighted reduce (all {W}w): {t_wr*1e3:.2f} ms", flush=True)

    # --- stage 6: ladder + tree -------------------------------------------
    def ladder_tree(wx, wy, wz):
        Wp = 1 << max((W - 1).bit_length(), 0)
        idp = ops.identity((Wp - W,))
        p = JacPoint(jnp.concatenate([wx, idp.x]),
                     jnp.concatenate([wy, idp.y]),
                     jnp.concatenate([wz, idp.z]))
        widx = jnp.arange(Wp)

        def ladder(i, t):
            x, y, z = t
            d = ops.double(JacPoint(x, y, z))
            need = (widx * c) > i
            return (jnp.where(need[:, None], d.x, x),
                    jnp.where(need[:, None], d.y, y),
                    jnp.where(need[:, None], d.z, z))

        p = JacPoint(*jax.lax.fori_loop(0, c * (W - 1), ladder,
                                        (p.x, p.y, p.z)))
        return pp._tree_reduce(ops, p, 0)

    t_lt, _ = bench(jax.jit(ladder_tree), wsums.x, wsums.y, wsums.z)
    print(f"ladder+tree: {t_lt*1e3:.2f} ms", flush=True)

    est = t_dig + G * (t_sg + t_sc) + t_wr + t_lt
    print(f"stage sum estimate: {est*1e3:.1f} ms vs full {t_full*1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
