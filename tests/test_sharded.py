"""Mesh-sharded MSM on the virtual 8-device CPU mesh vs the host oracle."""

import jax
import pytest
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


def test_protocol_mesh_and_scaling_harness():
    """Multi-host groundwork on the virtual 8-device platform: the
    ("host", "chip") mesh builds, the chip submesh drives the sharded
    MSM, and the scaling harness returns sane efficiency numbers."""
    from zksnap_tpu.parallel import (
        chip_submesh,
        initialize,
        protocol_mesh,
        scaling_efficiency,
    )

    assert initialize() is False  # single-process: no-op, not distributed
    pm = protocol_mesh(chips_per_host=4)
    assert pm.n_hosts == 2 and pm.chips_per_host == 4
    assert pm.mesh.shape == {"host": 2, "chip": 4}

    ops = bn254_ops()
    n = 32
    g = bn254_generator()
    pts = [((i % 7) + 1) * g for i in range(n)]
    scalars = [2 * i + 1 for i in range(n)]
    want = AffinePoint.identity(BN254_G1)
    for k, p in zip(scalars, pts):
        want = want + k * p
    P = ops.from_affine_host(pts)
    s_dev = jnp.asarray(ints_to_limbs(scalars))

    import jax as _jax

    def mesh_for(nc):
        return _jax.make_mesh((nc,), ("x",),
                              axis_types=(_jax.sharding.AxisType.Auto,))

    results = []

    def work(nc, mesh):
        out = sharded_msm(ops, P, s_dev, mesh, c=6)
        out.z.block_until_ready()
        results.append(ops.to_affine_host(out)[0])

    rows = scaling_efficiency(work, [1, 2, 4], mesh_for)
    assert [r["n"] for r in rows] == [1, 2, 4]
    assert all(r["seconds"] >= 0 for r in rows)
    assert all(pt == want for pt in results)

    sub = chip_submesh(pm)
    out = sharded_msm(ops, P, s_dev, sub, c=6)
    assert ops.to_affine_host(out) == [want]


def test_four_step_inverse_matches_single(rng):
    """inverse=True four-step == single-chip iNTT (up to the n^-1 scale)."""
    from zksnap_tpu.fields import bn254_fr
    from zksnap_tpu.poly.ntt import (
        four_step_input_perm,
        four_step_ntt,
        four_step_output_perm,
        ntt,
    )

    F = bn254_fr()
    k, ndev = 9, 8
    mesh = jax.make_mesh((ndev,), ("x",),
                         axis_types=(jax.sharding.AxisType.Auto,))
    vals = [rng.randrange(F.p) for _ in range(1 << k)]
    x = np.asarray(jax.device_get(F.to_mont(vals)))
    out = four_step_ntt(jnp.asarray(x[four_step_input_perm(k, ndev)]), k,
                        mesh, inverse=True)
    outn = np.asarray(jax.device_get(out))[four_step_output_perm(k, ndev)]
    # single-chip inverse includes the n^-1 scale; undo it for comparison
    n_inv = pow(1 << k, -1, F.p)
    want = F.from_mont(ntt(k).inverse(jnp.asarray(x)))
    got = F.from_mont(jnp.asarray(outn))
    assert [v * n_inv % F.p for v in got] == want


@pytest.mark.slow  # mesh-SPMD prover compile is ~10 min cold on CPU
def test_mesh_sharded_prove_verifies(rng):
    """prove(mesh=...) runs commits through sharded_msm and NTTs through
    the four-step transform (VERDICT r2 next-step 5); the proof must
    verify with the ordinary host verifier."""
    from zksnap_tpu.prover.plonk import keygen, prove, verify
    from zksnap_tpu.prover.srs import gen_srs
    from zksnap_tpu.trace import Context

    mesh = jax.make_mesh((8,), ("x",),
                         axis_types=(jax.sharding.AxisType.Auto,))
    K = 7
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(7)
    b = ctx.load_witness(9)
    c = ctx.mul(a, b)
    d = ctx.add(c, ctx.load_constant(5))
    ctx.range_check(ctx.load_witness(37), 6)
    ctx.expose_public(d)
    srs = gen_srs(K)
    pk = keygen(ctx, K, srs, mesh=mesh)
    proof = prove(pk, [68], mesh=mesh)
    assert verify(pk.vk, srs.g2, srs.tau_g2, [68], proof)
