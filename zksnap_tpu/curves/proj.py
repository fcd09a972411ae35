"""Batched group ops in homogeneous projective coordinates with the
Renes-Costello-Batina COMPLETE addition formulas (a = 0 curves).

This is the MSM hot-path coordinate system: the complete formulas need
no doubling fallback, no h==0/r==0 case analysis and no identity
selects, so the Pippenger bucket-accumulation scan body drops from
~24 Montgomery muls + glue (Jacobian madd + dbl + 4 selects) to 11
muls + one select (STATUS r2 roadmap item 1; replaces halo2curves'
Jacobian mixed add inside `best_multiexp`, SURVEY.md section 2.2).

Encoding: pytrees of three Montgomery limb tensors (X, Y, Z), identity
is any (0 : lambda : 0) -- `from_affine_host` produces (0 : 1 : 0).
Affine points embed as (x : y : 1), identically to the Jacobian
encoding, so SRS point caches work for both coordinate systems.

Formula source: Renes, Costello, Batina, "Complete addition formulas
for prime order elliptic curves" (EUROCRYPT 2016), Algorithms 7-9.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.common import N_LIMBS
from ..fields.field import PrimeField, bn254_fq, secp256k1_fp
from .fused import _FieldK, _run_body
from .jacobian import CurveOps, JacPoint
from .native import BN254_G1, SECP256K1, AffinePoint, CurveParams


class _FieldAdapter(_FieldK):
    """Run the fused-kernel bodies on [..., 16] limb-minor tensors via the
    PrimeField ops (non-fused fallback path, CPU/test parity)."""

    def __init__(self, F: PrimeField):
        self.F = F

    def mul(self, a, b):
        return self.F.mul(a, b)

    def sqr(self, a):
        return self.F.square(a)

    def add(self, a, b):
        return self.F.add(a, b)

    def dbl(self, a):
        return self.F.add(a, a)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def is_zero(self, a):
        return self.F.is_zero(a)

    def select(self, cond, a, b):
        return self.F.select(cond, a, b)


class ProjOps(CurveOps):
    """CurveOps with the RCB complete projective group law.

    Drop-in for the MSM pipeline: same method surface as the Jacobian
    CurveOps, but `add` is a single complete formula (no selects) and
    `madd` needs only the q==identity select.
    """

    def __init__(self, params: CurveParams, F: PrimeField):
        super().__init__(params, F)
        self.b3 = 3 * params.b

    # identity: (0 : 1 : 0)
    def identity(self, shape=()) -> JacPoint:
        z = jnp.zeros(shape + (N_LIMBS,), jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(self.F.one), shape + (N_LIMBS,))
        return JacPoint(jnp.zeros_like(z), one, z)

    def double(self, p: JacPoint) -> JacPoint:
        if self._pallas_block(p):
            from .fused import point_dbl_fused

            x, y, z = point_dbl_fused(
                (p.x, p.y, p.z), self.F.p, int(self.F.n0), proj_b3=self.b3)
            return JacPoint(x, y, z)
        A = _FieldAdapter(self.F)
        x, y, z = _run_body("pdbl", A, (p.x, p.y, p.z), self.b3)
        return JacPoint(x, y, z)

    def add(self, p: JacPoint, q: JacPoint) -> JacPoint:
        if self._pallas_block(p, q):
            from .fused import point_add_fused

            x, y, z = point_add_fused(
                (p.x, p.y, p.z), (q.x, q.y, q.z), self.F.p, int(self.F.n0),
                proj_b3=self.b3)
            return JacPoint(x, y, z)
        A = _FieldAdapter(self.F)
        x, y, z = _run_body("padd", A, (p.x, p.y, p.z, q.x, q.y, q.z),
                            self.b3)
        return JacPoint(x, y, z)

    def madd(self, p: JacPoint, q: JacPoint) -> JacPoint:
        """q MUST be affine (z == mont 1) or identity (z == 0)."""
        if self._pallas_block(p, q):
            from .fused import point_add_fused

            x, y, z = point_add_fused(
                (p.x, p.y, p.z), (q.x, q.y, q.z), self.F.p, int(self.F.n0),
                mixed=True, proj_b3=self.b3)
            return JacPoint(x, y, z)
        A = _FieldAdapter(self.F)
        x, y, z = _run_body("pmadd", A, (p.x, p.y, p.z, q.x, q.y, q.z),
                            self.b3)
        return JacPoint(x, y, z)

    def to_affine_host(self, p: JacPoint) -> list[AffinePoint]:
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
                out.append(AffinePoint(
                    self.params, x * zinv % self.params.p,
                    y * zinv % self.params.p))
        return out

    def normalize(self, p: JacPoint) -> JacPoint:
        """Projective -> affine-or-identity (z in {0, mont 1})."""
        F = self.F
        bs = p.batch_shape
        n = 1
        for d in bs:
            n *= int(d)
        # the fused kernels emit lazy-form values (< 2p): canonicalize z
        # so true identities (z = p representing 0) are detected -- a
        # missed zero would poison the Montgomery-trick batch inversion
        z = F.canon(p.z.reshape(n, N_LIMBS))
        zinv = F.batch_inv(z)  # zeros -> zeros
        x = F.mul(p.x.reshape(n, N_LIMBS), zinv)
        y = F.mul(p.y.reshape(n, N_LIMBS), zinv)
        inf = F.is_zero(z)
        one = jnp.broadcast_to(jnp.asarray(F.one), z.shape)
        zout = jnp.where(inf[..., None], jnp.zeros_like(z), one)
        return JacPoint(x.reshape(*bs, N_LIMBS), y.reshape(*bs, N_LIMBS),
                        zout.reshape(*bs, N_LIMBS))


@functools.cache
def bn254_proj_ops() -> ProjOps:
    return ProjOps(BN254_G1, bn254_fq())


@functools.cache
def secp_proj_ops() -> ProjOps:
    return ProjOps(SECP256K1, secp256k1_fp())
