"""Mesh-sharded MSM on the virtual 8-device CPU mesh vs the host oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from zksnap_tpu.curves import BN254_G1, AffinePoint, bn254_generator
from zksnap_tpu.curves.jacobian import bn254_ops
from zksnap_tpu.fields import ints_to_limbs
from zksnap_tpu.parallel import sharded_msm


def test_sharded_msm_matches_oracle(rng):
    ops = bn254_ops()
    g = bn254_generator()
    n = 64
    mesh = jax.make_mesh((8,), ("x",),
                         axis_types=(jax.sharding.AxisType.Auto,))
    pts = [rng.randrange(1, BN254_G1.n) * g for _ in range(n)]
    scalars = [rng.randrange(BN254_G1.n) for _ in range(n)]
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(scalars, pts):
        want = want + k * p
    P = ops.from_affine_host(pts)
    out = sharded_msm(ops, P, jnp.asarray(ints_to_limbs(scalars)), mesh, c=6)
    assert ops.to_affine_host(out) == [want]
