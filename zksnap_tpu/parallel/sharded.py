"""Mesh-sharded variants of the proving hot kernels.

The reference is single-process (rayon threads only, SURVEY.md section
2.3); distribution is a new capability of this framework:

  * `sharded_msm` -- points+scalars split across the mesh axis; each device
    runs a full local Pippenger, partial results are all_gathered and
    tree-combined (group adds) locally.  Communication: one all_gather of
    n_dev Jacobian points per MSM (constant, tiny vs compute).
  * the four-step NTT lives in poly/ntt.py (all_to_all over the domain
    axis -- the "sequence parallel" analogue).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..curves.jacobian import CurveOps, JacPoint
from ..msm.pippenger import msm_impl


def sharded_msm(ops: CurveOps, pts: JacPoint, scalars, mesh, axis: str = "x",
                c: int = 8, scalar_bits: int | None = None):
    """MSM over a 1-d mesh: local Pippenger + all_gather + local combine.

    pts leaves and scalars must be shardable on their leading axis by the
    mesh size.  Returns a replicated JacPoint scalar.

    `scalar_bits`: a caller-known bound on the scalars' bit length; the
    window count (and with it the traced graph size) shrinks
    proportionally.  Defaults to the full field width.
    """
    n = scalars.shape[0]
    ndev = mesh.shape[axis]
    assert n % ndev == 0
    bits = scalar_bits or ops.F.bits
    n_windows = -(-bits // c)

    # signed digits need top-window slack (MSM.__call__ parity: a curve
    # whose bit-length divides c would hit the msm_impl assert otherwise)
    signed = n_windows * c > ops.F.bits

    def local(px, py, pz, s):
        part = msm_impl(ops, JacPoint(px, py, pz), s, c, n_windows,
                        signed=signed)
        # gather all partials and tree-add locally
        gx = jax.lax.all_gather(part.x, axis)  # [ndev, 16]
        gy = jax.lax.all_gather(part.y, axis)
        gz = jax.lax.all_gather(part.z, axis)
        acc = JacPoint(gx, gy, gz)
        m = ndev
        while m > 1:
            half = m // 2
            acc = ops.add(
                JacPoint(acc.x[:half], acc.y[:half], acc.z[:half]),
                JacPoint(acc.x[half:m], acc.y[half:m], acc.z[half:m]),
            )
            m = half
        return JacPoint(acc.x[0], acc.y[0], acc.z[0])

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=JacPoint(P(None), P(None), P(None)),
        check_vma=False,
    )
    with jax.set_mesh(mesh):
        return jax.jit(f)(pts.x, pts.y, pts.z, scalars)
