"""Fused Pallas point kernels (curves/fused.py) vs the host oracle.

On CPU these run through the Pallas interpreter (fused._use_interpret),
so the exact kernel bodies that execute on TPU are bit-checked here.
Covers the group-law edge cases (identity operands, P==Q, P==-Q), the
mixed-add contract (z2 in {0, mont 1}), the single-call segmented
bucket-accumulation scan, and a small end-to-end MSM forced down the
fused path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zksnap_tpu.curves import BN254_G1, AffinePoint, bn254_generator
from zksnap_tpu.curves.fused import (bucket_scan_fused, point_add_fused,
                                     point_dbl_fused)
from zksnap_tpu.curves.jacobian import CurveOps, JacPoint, bn254_ops
from zksnap_tpu.fields.common import N_LIMBS


def _cases(rng):
    g = bn254_generator()
    p = rng.randrange(1, BN254_G1.n) * g
    q = rng.randrange(1, BN254_G1.n) * g
    ident = AffinePoint.identity(BN254_G1)
    ps = [p, ident, p, p, p, ident]
    qs = [q, q, ident, p, -p, ident]
    want = [p + q, q, p, p + p, ident, ident]
    return ps, qs, want


def test_fused_add_complete(rng):
    ops = bn254_ops()
    ps, qs, want = _cases(rng)
    P = ops.from_affine_host(ps)
    Q = ops.from_affine_host(qs)
    x, y, z = point_add_fused((P.x, P.y, P.z), (Q.x, Q.y, Q.z),
                              ops.F.p, int(ops.F.n0))
    assert ops.to_affine_host(JacPoint(x, y, z)) == want


def test_fused_madd_complete(rng):
    # q stays affine-or-identity (z in {0, mont 1}) as from_affine_host
    # produces; p is pushed to a non-trivial Z by doubling where possible.
    ops = bn254_ops()
    ps, qs, want = _cases(rng)
    # replace the P==Q / P==-P rows' left operand with 2P built in-circuit
    P = ops.from_affine_host(ps)
    Q = ops.from_affine_host(qs)
    x, y, z = point_add_fused((P.x, P.y, P.z), (Q.x, Q.y, Q.z),
                              ops.F.p, int(ops.F.n0), mixed=True)
    assert ops.to_affine_host(JacPoint(x, y, z)) == want
    # non-trivial z1: (2P) + Q where 2P comes from the jnp double
    P2 = ops.double(P)
    x, y, z = point_add_fused((P2.x, P2.y, P2.z), (Q.x, Q.y, Q.z),
                              ops.F.p, int(ops.F.n0), mixed=True)
    want2 = [a + a + b for a, b in zip(ps, qs)]
    assert ops.to_affine_host(JacPoint(x, y, z)) == want2


def test_fused_dbl(rng):
    ops = bn254_ops()
    g = bn254_generator()
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(3)]
    pts.append(AffinePoint.identity(BN254_G1))
    P = ops.from_affine_host(pts)
    x, y, z = point_dbl_fused((P.x, P.y, P.z), ops.F.p, int(ops.F.n0))
    assert ops.to_affine_host(JacPoint(x, y, z)) == [a + a for a in pts]


def test_bucket_scan_fused_matches_segments(rng):
    ops = bn254_ops()
    g = bn254_generator()
    M, K = 4, 5
    n = M * K
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(n)]
    P = ops.from_affine_host(pts)
    # lane-owned layout: lane l owns positions [l*K, (l+1)*K)
    flags = np.zeros(n, bool)
    for l in range(M):
        flags[l * K] = True  # every lane restarts (lane-local segments)
    flags[2] = flags[7] = flags[13] = True  # plus interior segment breaks
    fx = jnp.asarray(flags)
    px, py, pz = P.x, P.y, P.z
    ox, oy, oz = bucket_scan_fused((px, py, pz), fx, M, K,
                                   ops.F.p, int(ops.F.n0))
    assert ox.shape == (K, M, N_LIMBS)
    # oracle: running per-lane sums with restart-at-flag
    for l in range(M):
        acc = AffinePoint.identity(BN254_G1)
        for k in range(K):
            i = l * K + k
            acc = pts[i] if flags[i] else acc + pts[i]
            got = ops.to_affine_host(
                JacPoint(ox[k, l][None], oy[k, l][None], oz[k, l][None]))[0]
            assert got == acc, (l, k)


@pytest.mark.slow
def test_msm_fused_path(rng, monkeypatch):
    """Pippenger forced down the fused kernels (interpret mode).

    Full-width scalars are covered by the non-fused MSM tests; here we
    keep the interpret-mode cost sane with 16-bit scalars (2 windows of
    c=8), which still exercises every fused stage: sort, the segmented
    bucket-scan mega-kernel, bucket/window reduction and the masked
    doubling ladder."""
    from zksnap_tpu.msm.pippenger import msm_impl

    monkeypatch.setattr(CurveOps, "use_fused", lambda self: True)
    g = bn254_generator()
    n = 32
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(n)]
    ks = [rng.randrange(0, 1 << 16) for _ in range(n)]
    ops = bn254_ops()
    P = ops.from_affine_host(pts)
    from zksnap_tpu.fields import ints_to_limbs
    # exactly-filled windows (16-bit scalars): no slack for signed digits
    out = msm_impl(ops, P, ints_to_limbs(ks), c=8, n_windows=2, lanes=8,
                   signed=False)
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(ks, pts):
        want = want + k * p
    assert ops.to_affine_host(_as_batch(out))[0] == want


@pytest.mark.slow
def test_pallas_interp_plumbing(rng, monkeypatch):
    """Grid/BlockSpec plumbing through the REAL pallas_call interpreter
    (one small dbl + one small bucket scan; bodies are covered above)."""
    monkeypatch.setenv("ZKSNAP_TPU_PALLAS_INTERP", "1")
    ops = bn254_ops()
    g = bn254_generator()
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(2)]
    P = ops.from_affine_host(pts)
    x, y, z = point_dbl_fused((P.x, P.y, P.z), ops.F.p, int(ops.F.n0))
    assert ops.to_affine_host(JacPoint(x, y, z)) == [a + a for a in pts]

    M, K = 2, 2
    pts4 = [rng.randrange(1, BN254_G1.n) * g for _ in range(M * K)]
    P4 = ops.from_affine_host(pts4)
    flags = np.array([True, False, True, False])
    ox, oy, oz = bucket_scan_fused((P4.x, P4.y, P4.z), jnp.asarray(flags),
                                   M, K, ops.F.p, int(ops.F.n0))
    for lane in range(M):
        want = pts4[lane * K] + pts4[lane * K + 1]
        got = ops.to_affine_host(JacPoint(
            ox[K - 1, lane][None], oy[K - 1, lane][None],
            oz[K - 1, lane][None]))[0]
        assert got == want


def _as_batch(p: JacPoint) -> JacPoint:
    if p.x.ndim == 1:
        return JacPoint(p.x[None], p.y[None], p.z[None])
    return p
