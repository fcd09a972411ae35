"""Jacobian group law + Pippenger MSM vs the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksnap_tpu.curves import BN254_G1, AffinePoint, bn254_generator
from zksnap_tpu.curves.jacobian import JacPoint, bn254_ops, secp_ops
from zksnap_tpu.fields import ints_to_limbs
from zksnap_tpu.msm import bn254_msm


def host_points(n, rng, curve_gen):
    g = curve_gen()
    return [rng.randrange(1, curve_gen().curve.n) * g for _ in range(n)]


def test_jacobian_add_double_matches_native(rng):
    ops = bn254_ops()
    g = bn254_generator()
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(8)]
    qts = [rng.randrange(1, BN254_G1.n) * g for _ in range(8)]
    P = ops.from_affine_host(pts)
    Q = ops.from_affine_host(qts)
    got_add = ops.to_affine_host(jax.jit(ops.add)(P, Q))
    assert got_add == [a + b for a, b in zip(pts, qts)]
    got_dbl = ops.to_affine_host(jax.jit(ops.double)(P))
    assert got_dbl == [a + a for a in pts]


def test_jacobian_edge_cases(rng):
    ops = bn254_ops()
    g = bn254_generator()
    p = rng.randrange(1, BN254_G1.n) * g
    ident = AffinePoint.identity(BN254_G1)
    cases_p = [p, ident, p, p]
    cases_q = [ident, p, p, -p]
    want = [p, p, p + p, ident]
    P = ops.from_affine_host(cases_p)
    Q = ops.from_affine_host(cases_q)
    got = ops.to_affine_host(jax.jit(ops.add)(P, Q))
    assert got == want


def test_scalar_mul(rng):
    ops = bn254_ops()
    g = bn254_generator()
    k = rng.randrange(1, BN254_G1.n)
    bits = [(k >> (253 - i)) & 1 for i in range(254)]
    P = ops.from_affine_host([g])
    out = jax.jit(ops.scalar_mul)(P, jnp.asarray([bits], dtype=jnp.uint32))
    assert ops.to_affine_host(out) == [k * g]


def test_secp_ops(rng):
    from zksnap_tpu.curves import SECP256K1, secp_generator
    ops = secp_ops()
    g = secp_generator()
    pts = [rng.randrange(1, SECP256K1.n) * g for _ in range(4)]
    P = ops.from_affine_host(pts)
    got = ops.to_affine_host(jax.jit(ops.double)(P))
    assert got == [a + a for a in pts]


@pytest.mark.parametrize("n,c", [(32, 4), (64, 8)])
def test_msm_matches_oracle(n, c, rng):
    ops = bn254_ops()
    g = bn254_generator()
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(n)]
    scalars = [rng.randrange(BN254_G1.n) for _ in range(n)]
    # host oracle
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(scalars, pts):
        want = want + k * p
    P = ops.from_affine_host(pts)
    out = bn254_msm()(P, jnp.asarray(ints_to_limbs(scalars)), c=c)
    assert ops.to_affine_host(out) == [want]


def test_msm_with_zero_scalars_and_duplicates(rng):
    ops = bn254_ops()
    g = bn254_generator()
    pts = [g, g, 2 * g, 3 * g]
    scalars = [0, 5, 0, 7]
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(scalars, pts):
        want = want + k * p
    P = ops.from_affine_host(pts)
    out = bn254_msm()(P, jnp.asarray(ints_to_limbs(scalars)), c=5)
    assert ops.to_affine_host(out) == [want]


@pytest.mark.slow
def test_fixed_base_commit_matches_variable_base(rng):
    """The fixed-base shifted-table commit path (msm/fixed_base.py) must
    produce the same group element as the variable-base Pippenger the
    commit API otherwise uses."""
    import jax.numpy as jnp

    from zksnap_tpu.curves.jacobian import bn254_ops
    from zksnap_tpu.curves.native import AffinePoint, BN254_G1
    from zksnap_tpu.fields.common import ints_to_limbs
    from zksnap_tpu.prover.poly_device import (
        commit_evals,
        configure_fixed_base,
    )

    n = 4096
    ops = bn254_ops()
    g = AffinePoint.generator(BN254_G1)
    pts = ops.from_affine_host(
        [rng.randrange(1, BN254_G1.n) * g for _ in range(64)] * (n // 64))
    scalars = [rng.randrange(BN254_G1.n) for _ in range(n)]
    scalars[0] = 0  # zero-digit bucket path
    sc = jnp.asarray(ints_to_limbs(scalars))
    try:
        configure_fixed_base(enabled=True)
        fb = ops.to_affine_host(commit_evals(pts, sc))[0]
        configure_fixed_base(enabled=False)
        vb = ops.to_affine_host(commit_evals(pts, sc))[0]
    finally:
        configure_fixed_base(enabled=True)
    assert fb == vb
