"""Batched short-Weierstrass group ops in Jacobian coordinates (a = 0).

TPU-native replacement for halo2curves' G1/secp256k1 group arithmetic (the
inner loops of halo2_proofs' MSM/commit, SURVEY.md L0/L1).  Points are
pytrees of three Montgomery limb tensors (X, Y, Z), each [..., 16];
Z == 0 encodes the identity.  All ops are branchless (selects instead of
data-dependent control flow) so they vectorize and jit cleanly.

Formula source: EFD (hyperelliptic.org) dbl-2009-l and add-2007-bl for
a = 0 curves (both BN254 G1 with b=3 and secp256k1 with b=7 qualify).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.common import N_LIMBS
from ..fields.field import PrimeField, bn254_fq, secp256k1_fp
from .native import BN254_G1, SECP256K1, AffinePoint, CurveParams


@dataclass(frozen=True)
class JacPoint:
    """Pytree of Jacobian coordinates; each leaf [..., 16] uint32."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    @property
    def batch_shape(self):
        return self.x.shape[:-1]


jax.tree_util.register_pytree_node(
    JacPoint,
    lambda p: ((p.x, p.y, p.z), None),
    lambda _, c: JacPoint(*c),
)


class CurveOps:
    """Batched group law for one curve over its device base field."""

    def __init__(self, params: CurveParams, F: PrimeField):
        assert params.a == 0
        self.params = params
        self.F = F

    # -- constructors -------------------------------------------------------

    def identity(self, shape=()) -> JacPoint:
        z = jnp.zeros(shape + (N_LIMBS,), jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(self.F.one), shape + (N_LIMBS,))
        return JacPoint(one, one, z)

    def from_affine_host(self, pts: list[AffinePoint]) -> JacPoint:
        """Host affine points -> device Jacobian batch (identity-safe)."""
        F = self.F
        xs = [0 if p.is_identity() else p.x for p in pts]
        ys = [1 if p.is_identity() else p.y for p in pts]
        zs = [0 if p.is_identity() else 1 for p in pts]
        return JacPoint(F.to_mont(xs), F.to_mont(ys), F.to_mont(zs))

    def to_affine_host(self, p: JacPoint) -> list[AffinePoint]:
        """Device Jacobian batch -> host affine points (python ints)."""
        F = self.F
        xs = F.from_mont(p.x)
        ys = F.from_mont(p.y)
        zs = F.from_mont(p.z)
        if isinstance(xs, int):
            xs, ys, zs = [xs], [ys], [zs]
        out = []
        for x, y, z in zip(xs, ys, zs):
            if z == 0:
                out.append(AffinePoint.identity(self.params))
            else:
                zinv = pow(z, -1, self.params.p)
                zi2 = zinv * zinv % self.params.p
                out.append(AffinePoint(
                    self.params, x * zi2 % self.params.p,
                    y * zi2 % self.params.p * zinv % self.params.p,
                ))
        return out

    # -- group law ----------------------------------------------------------

    def is_identity(self, p: JacPoint):
        return self.F.is_zero(p.z)

    def _pallas_block(self, *pts) -> int:
        """Fused point-kernel block size, or 0 for the jnp path."""
        import os

        if os.environ.get("ZKSNAP_TPU_PALLAS", "1") != "1":
            return 0
        if jax.default_backend() == "cpu":
            return 0
        shapes = {p.x.shape for p in pts}
        if len(shapes) != 1:
            return 0
        n = 1
        for d in pts[0].x.shape[:-1]:
            n *= int(d)
        if n < 256:
            return 0
        return 512

    def double(self, p: JacPoint) -> JacPoint:
        """dbl-2009-l (a=0).  Identity doubles to identity (Z stays 0)."""
        block = self._pallas_block(p)
        if block:
            from .pallas_point import point_dbl_batch

            x, y, z = point_dbl_batch(
                (p.x, p.y, p.z), self.F.p, self.F.n0, block, False)
            return JacPoint(x, y, z)
        F = self.F
        A = F.square(p.x)
        B = F.square(p.y)
        C = F.square(B)
        t = F.square(F.add(p.x, B))
        D = F.double(F.sub(F.sub(t, A), C))
        E = F.add(F.add(A, A), A)
        FF = F.square(E)
        X3 = F.sub(FF, F.double(D))
        Y3 = F.sub(F.mul(E, F.sub(D, X3)), F.double(F.double(F.double(C))))
        Z3 = F.double(F.mul(p.y, p.z))
        return JacPoint(X3, Y3, Z3)

    def add(self, p: JacPoint, q: JacPoint) -> JacPoint:
        """Complete branchless addition (handles P==Q, P==-Q, identities).

        NB: the fully-fused add kernel (curves/pallas_point.py) is gated
        off by default -- its ~50k-op straight-line body compiles too
        slowly under Mosaic; splitting it into 2-3 stages is the planned
        fix.  The composed path below still uses the fused field kernels.
        """
        import os

        # "staged" (3-kernel fused add) compiles ~5min per block shape and
        # needs longer validation -- off by default for now (round-2 item).
        mode = os.environ.get("ZKSNAP_TPU_FUSED_ADD", "0")
        if mode in ("staged", "1"):
            block = self._pallas_block(p, q)
            if block:
                if mode == "staged":
                    from .pallas_point import point_add_staged

                    x, y, z = point_add_staged(
                        (p.x, p.y, p.z), (q.x, q.y, q.z),
                        self.F.p, self.F.n0, block, False)
                else:
                    from .pallas_point import point_add_batch

                    x, y, z = point_add_batch(
                        (p.x, p.y, p.z), (q.x, q.y, q.z),
                        self.F.p, self.F.n0, block, False)
                return JacPoint(x, y, z)
        F = self.F
        z1z1 = F.square(p.z)
        z2z2 = F.square(q.z)
        u1 = F.mul(p.x, z2z2)
        u2 = F.mul(q.x, z1z1)
        s1 = F.mul(F.mul(p.y, q.z), z2z2)
        s2 = F.mul(F.mul(q.y, p.z), z1z1)
        h = F.sub(u2, u1)
        r = F.sub(s2, s1)

        # generic add (valid when h != 0)
        i = F.square(F.double(h))
        j = F.mul(h, i)
        r2 = F.double(r)
        v = F.mul(u1, i)
        x3 = F.sub(F.sub(F.square(r2), j), F.double(v))
        y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.double(F.mul(s1, j)))
        z3 = F.mul(F.sub(F.sub(F.square(F.add(p.z, q.z)), z1z1), z2z2), h)

        dbl = self.double(p)

        h_zero = F.is_zero(h)
        r_zero = F.is_zero(r)
        p_inf = self.is_identity(p)
        q_inf = self.is_identity(q)

        # h==0, r==0 -> doubling; h==0, r!=0 -> infinity
        use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
        to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

        x = F.select(use_dbl, dbl.x, x3)
        y = F.select(use_dbl, dbl.y, y3)
        z = F.select(use_dbl, dbl.z, z3)
        z = jnp.where(to_inf[..., None], jnp.zeros_like(z), z)
        # identity absorption
        x = F.select(q_inf, p.x, F.select(p_inf, q.x, x))
        y = F.select(q_inf, p.y, F.select(p_inf, q.y, y))
        z = F.select(q_inf, p.z, F.select(p_inf, q.z, z))
        return JacPoint(x, y, z)

    def neg(self, p: JacPoint) -> JacPoint:
        return JacPoint(p.x, self.F.neg(p.y), p.z)

    def select(self, cond, p: JacPoint, q: JacPoint) -> JacPoint:
        F = self.F
        return JacPoint(F.select(cond, p.x, q.x), F.select(cond, p.y, q.y),
                        F.select(cond, p.z, q.z))

    def scalar_mul(self, p: JacPoint, k_bits) -> JacPoint:
        """Double-and-add over a [nbits] (or [..., nbits]) bit tensor,
        MSB first.  Scan over bits: result body compiled once."""
        def step(acc, bit):
            acc = self.double(acc)
            added = self.add(acc, p)
            acc = self.select(bit.astype(bool), added, acc)
            return acc, None

        init = self.identity(p.batch_shape)
        out, _ = jax.lax.scan(step, init, jnp.moveaxis(k_bits, -1, 0))
        return out

    def generator(self, shape=()) -> JacPoint:
        F = self.F
        gx = jnp.broadcast_to(jnp.asarray(F.const(self.params.gx)), shape + (N_LIMBS,))
        gy = jnp.broadcast_to(jnp.asarray(F.const(self.params.gy)), shape + (N_LIMBS,))
        gz = jnp.broadcast_to(jnp.asarray(F.one), shape + (N_LIMBS,))
        return JacPoint(gx, gy, gz)


@functools.cache
def bn254_ops() -> CurveOps:
    return CurveOps(BN254_G1, bn254_fq())


@functools.cache
def secp_ops() -> CurveOps:
    return CurveOps(SECP256K1, secp256k1_fp())
