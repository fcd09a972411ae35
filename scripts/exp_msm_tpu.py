"""Validate + time the fused-MSM path on the real TPU.

1. bucket_scan_fused (the segmented mega-kernel) vs a host oracle.
2. End-to-end Pippenger MSM at 2^10 vs the python-int oracle.
3. Timing at 2^16 (the BENCH metric) with forced-readback sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import zksnap_tpu  # noqa: F401  (compile cache)
from zksnap_tpu.curves.jacobian import JacPoint, bn254_ops
from zksnap_tpu.curves.native import BN254_G1, AffinePoint
from zksnap_tpu.fields import ints_to_limbs
from zksnap_tpu.msm.pippenger import MSM


def sync(x):
    return np.asarray(jax.device_get(x))


ops = bn254_ops()
F = ops.F


def main():
    import random

    rng = random.Random(7)
    g = AffinePoint.generator(BN254_G1)

    # ---- 1. bucket scan kernel vs oracle ----
    from zksnap_tpu.curves.fused import bucket_scan_fused

    M, K = 128, 4
    n = M * K
    pts = [g * rng.randrange(1, BN254_G1.n) for _ in range(n)]
    P = ops.from_affine_host(pts)
    flags = np.zeros(n, bool)
    for i in range(0, n, 3):
        flags[i] = True
    ox, oy, oz = bucket_scan_fused((P.x, P.y, P.z), jnp.asarray(flags),
                                   M, K, F.p, int(F.n0))
    ox, oy, oz = sync(ox), sync(oy), sync(oz)
    bad = 0
    for l in range(M):
        acc = AffinePoint.identity(BN254_G1)
        for k in range(K):
            i = l * K + k
            acc = pts[i] if flags[i] else acc + pts[i]
            got = ops.to_affine_host(JacPoint(
                jnp.asarray(ox[k, l][None]), jnp.asarray(oy[k, l][None]),
                jnp.asarray(oz[k, l][None])))[0]
            if got != acc:
                bad += 1
    print(f"bucket_scan: {bad} mismatches / {n}")
    assert bad == 0

    # ---- 2. end-to-end MSM 2^10 vs oracle ----
    n = 1 << 10
    pts = [g * rng.randrange(1, BN254_G1.n) for _ in range(n)]
    ks = [rng.randrange(0, BN254_G1.n) for _ in range(n)]
    msm = MSM(ops)
    P = ops.from_affine_host(pts)
    t0 = time.time()
    out = msm(P, ints_to_limbs(ks))
    got = ops.to_affine_host(JacPoint(out.x[None], out.y[None], out.z[None]))[0]
    print(f"msm 2^10 first call: {time.time()-t0:.1f}s")
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(ks, pts):
        want = want + k * p
    print("msm 2^10 == oracle:", got == want)
    assert got == want

    # ---- 3. timing at 2^16 ----
    n = 1 << 16

    @jax.jit
    def make_points():
        gp = ops.generator((n,))
        idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
        bits = jnp.stack([(idx >> (16 - b)) & 1 for b in range(17)], axis=-1)
        return ops.normalize(ops.scalar_mul(gp, bits))

    Pb = make_points()
    sync(Pb.z[:1])
    key = jax.random.PRNGKey(0)
    scalars = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.uint32)
    scalars = scalars.at[:, 15].set(scalars[:, 15] & 0x3FFF)

    t0 = time.time()
    out = msm(Pb, scalars)
    sync(out.z)
    print(f"msm 2^16 compile+run: {time.time()-t0:.1f}s")

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = msm(Pb, scalars)
    sync(out.z)
    dt = (time.time() - t0) / iters
    print(f"msm 2^16: {dt*1e3:.1f} ms/iter = {n/dt/1e6:.3f} Mpoints/s")


if __name__ == "__main__":
    main()
