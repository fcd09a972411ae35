"""Validate + time the fused point kernels (curves/fused.py) on TPU.

Checks jac_add / jac_madd / jac_dbl against the composed jnp path
(curves/jacobian.py with ZKSNAP_TPU_PALLAS=0), including the edge
cases (identity either side, P==Q, P==-Q), then times them.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["ZKSNAP_TPU_PALLAS"] = "0"  # composed path stays jnp-pure

import jax
import jax.numpy as jnp
import numpy as np

from zksnap_tpu.curves.fused import point_add_fused, point_dbl_fused
from zksnap_tpu.curves.jacobian import JacPoint, bn254_ops
from zksnap_tpu.curves.native import BN254_G1, AffinePoint

ops = bn254_ops()
F = ops.F


def rand_points(n, seed=0):
    """[n] random points as multiples of G (host, then device affine)."""
    rng = np.random.default_rng(seed)
    g = AffinePoint.generator(BN254_G1)
    pts = [g * int(k) for k in rng.integers(1, 1 << 62, n)]
    return ops.from_affine_host(pts)


def main():
    n = 2048
    P = rand_points(n, 0)
    Q = rand_points(n, 1)

    # edge cases: identity P, identity Q, P==Q, P==-Q at fixed slots
    ident = ops.identity((1,))
    def put(tp, i, src, j=0):
        return JacPoint(tp.x.at[i].set(src.x[j]), tp.y.at[i].set(src.y[j]),
                        tp.z.at[i].set(src.z[j]))
    P = put(P, 0, ident)
    Q = put(Q, 1, ident)
    Q = put(Q, 2, P, 2)            # P == Q
    negP = ops.neg(P)
    Q = put(Q, 3, negP, 3)         # P == -Q

    ref = ops.add(P, Q)
    refd = ops.double(P)

    p_int, n0 = F.p, int(F.n0)
    t0 = time.time()
    out = jax.block_until_ready(
        point_add_fused((P.x, P.y, P.z), (Q.x, Q.y, Q.z), p_int, n0))
    print(f"add compile: {time.time()-t0:.1f}s")
    ok = all(bool(jnp.all(a == b)) for a, b in zip(out, (ref.x, ref.y, ref.z)))
    # z-coordinates of identity differ representationally; compare affine
    if not ok:
        aff_ref = ops.to_affine_host(ref)
        aff_out = ops.to_affine_host(JacPoint(*out))
        ok = aff_ref == aff_out
    print("add == composed:", ok)

    # mixed: Q affine (z in {0,1}) -- rand_points already gives z=1
    t0 = time.time()
    outm = jax.block_until_ready(
        point_add_fused((P.x, P.y, P.z), (Q.x, Q.y, Q.z), p_int, n0,
                        mixed=True))
    print(f"madd compile: {time.time()-t0:.1f}s")
    okm = all(bool(jnp.all(a == b)) for a, b in zip(outm, (ref.x, ref.y, ref.z)))
    if not okm:
        aff_ref = ops.to_affine_host(ref)
        aff_out = ops.to_affine_host(JacPoint(*outm))
        okm = aff_ref == aff_out
    print("madd == composed:", okm)

    t0 = time.time()
    outd = jax.block_until_ready(point_dbl_fused((P.x, P.y, P.z), p_int, n0))
    print(f"dbl compile: {time.time()-t0:.1f}s")
    okd = all(bool(jnp.all(a == b)) for a, b in zip(outd, (refd.x, refd.y, refd.z)))
    print("dbl == composed:", okd)

    # timings at MSM-like width
    big = 1 << 14
    Pb = JacPoint(jnp.tile(P.x, (big // n, 1)), jnp.tile(P.y, (big // n, 1)),
                  jnp.tile(P.z, (big // n, 1)))
    Qb = JacPoint(jnp.tile(Q.x, (big // n, 1)), jnp.tile(Q.y, (big // n, 1)),
                  jnp.tile(Q.z, (big // n, 1)))
    for name, fn in [
        ("add ", lambda: point_add_fused((Pb.x, Pb.y, Pb.z),
                                         (Qb.x, Qb.y, Qb.z), p_int, n0)),
        ("madd", lambda: point_add_fused((Pb.x, Pb.y, Pb.z),
                                         (Qb.x, Qb.y, Qb.z), p_int, n0,
                                         mixed=True)),
        ("dbl ", lambda: point_dbl_fused((Pb.x, Pb.y, Pb.z), p_int, n0)),
    ]:
        jax.block_until_ready(fn())  # compile at this width
        t0 = time.time()
        iters = 50
        for _ in range(iters):
            out = jax.block_until_ready(fn())
        dt = (time.time() - t0) / iters
        print(f"{name} @2^14: {dt*1e3:.2f} ms = {big/dt/1e6:.1f} Mop/s")


if __name__ == "__main__":
    main()
