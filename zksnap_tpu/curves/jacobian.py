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

    def use_fused(self) -> bool:
        """Route group ops through the fused Pallas kernels (TPU only)."""
        import os

        return (os.environ.get("ZKSNAP_TPU_PALLAS", "1") == "1"
                and jax.default_backend() != "cpu")

    def _pallas_block(self, *pts) -> int:
        """1 if the fused point kernels apply, else 0 (composed jnp path).

        Tiny widths pad up to one 128-lane block inside fused.py, so the
        kernels are worth it at ANY width under jit (one dispatch vs ~30)."""
        if not self.use_fused():
            return 0
        shapes = {p.x.shape for p in pts}
        if len(shapes) != 1:
            return 0
        return 1

    def double(self, p: JacPoint) -> JacPoint:
        """dbl-2009-l (a=0).  Identity doubles to identity (Z stays 0)."""
        if self._pallas_block(p):
            from .fused import point_dbl_fused

            x, y, z = point_dbl_fused(
                (p.x, p.y, p.z), self.F.p, int(self.F.n0))
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

        Routes to the fused single-kernel add (curves/fused.py) on TPU:
        stacked [16, W] pad-shift Montgomery muls compile in seconds
        where round 1's per-limb-row unrolled kernel wedged Mosaic."""
        if self._pallas_block(p, q):
            from .fused import point_add_fused

            x, y, z = point_add_fused(
                (p.x, p.y, p.z), (q.x, q.y, q.z), self.F.p, int(self.F.n0))
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

    def madd(self, p: JacPoint, q: JacPoint) -> JacPoint:
        """Mixed complete add: q.z MUST be 0 (identity) or Montgomery 1
        (affine).  Saves ~1/3 of the muls vs `add` -- the Pippenger
        bucket-accumulation scan streams affine base points through this."""
        if self._pallas_block(p, q):
            from .fused import point_add_fused

            x, y, z = point_add_fused(
                (p.x, p.y, p.z), (q.x, q.y, q.z), self.F.p, int(self.F.n0),
                mixed=True)
            return JacPoint(x, y, z)
        return self.add(p, q)

    def normalize(self, p: JacPoint) -> JacPoint:
        """Batched Jacobian -> affine-or-identity (z in {0, mont 1}).

        One Fermat inversion for the whole batch (Montgomery's trick in
        F.batch_inv).  Required before feeding points into the MSM, whose
        bucket-accumulation scan streams operands through the mixed add."""
        F = self.F
        bs = p.batch_shape
        n = 1
        for d in bs:
            n *= int(d)
        z = p.z.reshape(n, N_LIMBS)
        zinv = F.batch_inv(z)  # zeros -> zeros
        zi2 = F.square(zinv)
        x = F.mul(p.x.reshape(n, N_LIMBS), zi2)
        y = F.mul(p.y.reshape(n, N_LIMBS), F.mul(zi2, zinv))
        inf = F.is_zero(z)
        one = jnp.broadcast_to(jnp.asarray(F.one), z.shape)
        zout = jnp.where(inf[..., None], jnp.zeros_like(z), one)
        return JacPoint(x.reshape(*bs, N_LIMBS), y.reshape(*bs, N_LIMBS),
                        zout.reshape(*bs, N_LIMBS))

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
