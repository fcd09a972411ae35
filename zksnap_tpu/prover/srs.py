"""KZG structured reference string (dev trusted setup).

Reference parity: halo2_proofs `ParamsKZG::setup` / halo2-base `gen_srs`
(wrapper.rs:961,1001,1051).  Like the reference's dev flow, tau comes from
a local RNG -- NOT a production ceremony (the reference's browser flow
fetches Axiom's ceremony SRS instead, worker.js:218-224; a loader for such
files can be added at the serialization layer).

The G1 powers [tau^i]G are computed ON DEVICE: tau powers by log-doubling
(device, log n muls) then one batched double-and-add scalar multiplication
over all i simultaneously (254-step scan of width-n point ops) -- no host
bignum loop, no 100MB host->device upload.  Results are cached to disk.
"""

from __future__ import annotations

import functools
import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.jacobian import JacPoint, bn254_ops
from ..curves.native import AffinePoint, BN254_G1, bn254_generator
from ..fields.field import bn254_fr
from ..poly.ntt import _powers_device
from . import pairing as pr


class SRS:
    """[tau^i]G1 and [L_i(tau)]G1 for i < n (device) + [tau]G2 (host).

    The Lagrange-basis powers let evaluation-form polynomials commit
    without an iNTT (halo2's `ParamsKZG::{g, g_lagrange}` split)."""

    def __init__(self, k: int, g1_powers: JacPoint, g1_lagrange: JacPoint,
                 tau_g2, g2):
        self.k = k
        self.n = 1 << k
        self.g1 = g1_powers          # JacPoint [n], monomial basis
        self.g1_lagrange = g1_lagrange  # JacPoint [n], Lagrange basis
        self.tau_g2 = tau_g2         # twist point (Fq2 pair)
        self.g2 = g2


def _tau_from_seed(seed: bytes) -> int:
    return int.from_bytes(hashlib.sha512(b"zksnap-tpu-srs" + seed).digest(),
                          "big") % BN254_G1.n


@functools.lru_cache(maxsize=8)
def gen_srs(k: int, seed: bytes = b"dev") -> SRS:
    """Dev SRS for domain size 2^k (cached on disk under build/)."""
    F = bn254_fr()
    ops = bn254_ops()
    n = 1 << k
    tau = _tau_from_seed(seed)

    cache = os.path.join(os.path.dirname(__file__), "..", "..", "build",
                         f"srs_{k}_{hashlib.sha256(seed).hexdigest()[:8]}.npz")
    cache = os.path.abspath(cache)
    if os.path.exists(cache):
        d = np.load(cache)
        g1 = JacPoint(jnp.asarray(d["x"]), jnp.asarray(d["y"]),
                      jnp.asarray(d["z"]))
        g1_lag = JacPoint(jnp.asarray(d["lx"]), jnp.asarray(d["ly"]),
                          jnp.asarray(d["lz"]))
    else:
        nbits = 254

        @jax.jit
        def batched_mul(c):
            # NB: the generator is built INSIDE the jit from numpy constants;
            # closing over a device array would force a device->host constant
            # fetch at lowering time (pathological over the TPU relay).
            idx = jnp.arange(nbits - 1, -1, -1)
            limb = idx // 16
            off = idx % 16
            bits = ((c[:, limb] >> off) & 1).astype(jnp.uint32)
            g = ops.generator((c.shape[0],))
            return ops.scalar_mul(g, bits)

        from ..fields.common import ints_to_limbs

        CHUNK = 1 << 20  # the 2^22-point scalar-mul kernel faults the
        # TPU worker (observed twice at k=22); 2^20..2^21 slabs are known
        # good, and chunking also bounds the bit-matrix transient (4.3GB
        # at 2^22)

        def powers_to_points(scalars_int: list[int]) -> JacPoint:
            if len(scalars_int) <= CHUNK:
                arr = jnp.asarray(ints_to_limbs(scalars_int))
                return batched_mul(arr)
            parts = []
            for s in range(0, len(scalars_int), CHUNK):
                arr = jnp.asarray(ints_to_limbs(scalars_int[s : s + CHUNK]))
                p_ = batched_mul(arr)
                parts.append(JacPoint(np.asarray(jax.device_get(p_.x)),
                                      np.asarray(jax.device_get(p_.y)),
                                      np.asarray(jax.device_get(p_.z))))
            return JacPoint(
                jnp.asarray(np.concatenate([p_.x for p_ in parts])),
                jnp.asarray(np.concatenate([p_.y for p_ in parts])),
                jnp.asarray(np.concatenate([p_.z for p_ in parts])))

        # monomial powers tau^i (host: n small muls)
        taus = [1] * n
        for i in range(1, n):
            taus[i] = taus[i - 1] * tau % F.p
        g1 = powers_to_points(taus)

        # Lagrange scalars: L_i(tau) = w^i (tau^n - 1) / (n (tau - w^i))
        from ..poly.domain import domain as _domain

        dom = _domain(k)
        w = [1] * n
        for i in range(1, n):
            w[i] = w[i - 1] * dom.omega % F.p
        zn = (pow(tau, n, F.p) - 1) % F.p
        n_inv = pow(n, -1, F.p)
        denoms = [(tau - w[i]) % F.p for i in range(n)]
        # batch inversion
        pref = [1]
        for d_ in denoms:
            pref.append(pref[-1] * d_ % F.p)
        inv_tot = pow(pref[-1], -1, F.p)
        invs = [0] * n
        for i in range(n - 1, -1, -1):
            invs[i] = pref[i] * inv_tot % F.p
            inv_tot = inv_tot * denoms[i] % F.p
        lags = [w[i] * zn % F.p * n_inv % F.p * invs[i] % F.p for i in range(n)]
        g1_lag = powers_to_points(lags)

        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(
            cache,
            x=np.asarray(jax.device_get(g1.x)),
            y=np.asarray(jax.device_get(g1.y)),
            z=np.asarray(jax.device_get(g1.z)),
            lx=np.asarray(jax.device_get(g1_lag.x)),
            ly=np.asarray(jax.device_get(g1_lag.y)),
            lz=np.asarray(jax.device_get(g1_lag.z)),
        )

    tau_g2 = pr.g2_mul(pr.G2_GEN, tau)
    # normalize to affine-or-identity (z in {0, 1}): msm_impl streams the
    # points through mixed-add kernels that REQUIRE it, and the projective-
    # coordinate MSM reinterprets the same limbs as homogeneous (x:y:z) --
    # unnormalized Jacobian z would silently change the point.  Applied on
    # the cache-load path too so stale unnormalized caches self-heal.
    # Chunked at 2^21: single 2^22-row point kernels fault the TPU worker.
    g1 = _normalize_chunked(ops, g1)
    g1_lag = _normalize_chunked(ops, g1_lag)
    return SRS(k, g1, g1_lag, tau_g2, pr.G2_GEN)


def _normalize_chunked(ops, pts: JacPoint, chunk: int = 1 << 21) -> JacPoint:
    n = pts.x.shape[0]
    if n <= chunk:
        return ops.normalize(pts)
    parts = []
    for s in range(0, n, chunk):
        p_ = ops.normalize(JacPoint(pts.x[s : s + chunk],
                                    pts.y[s : s + chunk],
                                    pts.z[s : s + chunk]))
        parts.append(p_)
    return JacPoint(jnp.concatenate([p_.x for p_ in parts]),
                    jnp.concatenate([p_.y for p_ in parts]),
                    jnp.concatenate([p_.z for p_ in parts]))


# ---------------------------------------------------------------------------
# Ceremony SRS file ingestion (halo2 ParamsKZG wire format)
# ---------------------------------------------------------------------------
#
# Layout (halo2_proofs `ParamsKZG::write`, the format of the Axiom
# trusted-setup files the reference browser fetches -- worker.js:218-224
# `challenge_0085/kzg_bn254_{k}.srs`):
#   k               u32 LE
#   g               2^k G1 points, 64 B each: x || y, 32-byte LE canonical
#                   Fq; the identity is encoded as x = y = 0
#   g_lagrange      2^k G1 points, same encoding
#   g2              G2 point, 128 B: x.c0 || x.c1 || y.c0 || y.c1 (LE Fq)
#   s_g2 = [tau]G2  G2 point, 128 B
# Every loaded G1 point is curve-checked; the SRS passes the pairing
# sanity e([tau]G1, G2) == e(G1, [tau]G2) and the Lagrange-basis identity
# sum_i [L_i(tau)]G1 == G1 (sum of Lagrange polys is 1) before use.

def _read_g1(buf: bytes, off: int):
    x = int.from_bytes(buf[off : off + 32], "little")
    y = int.from_bytes(buf[off + 32 : off + 64], "little")
    q = BN254_G1.p
    if x == 0 and y == 0:
        return 0, 0, True
    if x >= q or y >= q or (y * y - x * x * x - BN254_G1.b) % q:
        raise ValueError(f"G1 point at byte {off} not on curve")
    return x, y, False


def _g2_in_subgroup(pt) -> bool:
    """r-torsion check: [r]Q == identity.

    BN254's twist has a large cofactor, so an on-twist point is NOT
    necessarily in the r-order subgroup; pairings on off-subgroup points
    are ill-defined.  The reference stack (halo2curves) subgroup-checks G2
    on deserialization -- this is the equivalent for untrusted ceremony
    files.  g2_mul reduces the scalar mod r, so the ladder is inlined."""
    from .pairing import R, g2_add

    acc = None
    add = pt
    k = R
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc is None


def _read_g2(buf: bytes, off: int):
    from .pairing import Fq2, g2_is_on_curve

    c = [int.from_bytes(buf[off + 32 * i : off + 32 * (i + 1)], "little")
         for i in range(4)]
    pt = (Fq2(c[0], c[1]), Fq2(c[2], c[3]))
    if not g2_is_on_curve(pt):
        raise ValueError(f"G2 point at byte {off} not on the twist")
    if not _g2_in_subgroup(pt):
        raise ValueError(f"G2 point at byte {off} not in the r-order subgroup")
    return pt


def load_srs(path: str) -> SRS:
    """Ingest a ceremony `.srs` file; validates before returning."""
    with open(path, "rb") as f:
        buf = f.read()
    k = int.from_bytes(buf[0:4], "little")
    n = 1 << k
    need = 4 + 2 * n * 64 + 2 * 128
    if len(buf) < need:
        raise ValueError(f"srs file truncated: {len(buf)} < {need}")

    ops = bn254_ops()

    def read_block(base):
        pts = []
        for i in range(n):
            x, y, inf = _read_g1(buf, base + 64 * i)
            pts.append(AffinePoint.identity(BN254_G1) if inf
                       else AffinePoint(BN254_G1, x, y))
        return ops.from_affine_host(pts)

    g1 = read_block(4)
    g1_lag = read_block(4 + n * 64)
    g2 = _read_g2(buf, 4 + 2 * n * 64)
    s_g2 = _read_g2(buf, 4 + 2 * n * 64 + 128)
    srs = SRS(k, g1, g1_lag, s_g2, g2)
    if not srs_sanity_check(srs):
        raise ValueError("srs failed the pairing sanity check")
    if not _lagrange_sum_check(srs):
        raise ValueError("srs failed the Lagrange-sum check")
    return srs


def save_srs(srs: SRS, path: str):
    """Write an SRS in the ceremony wire format (round-trip testing and
    dev-SRS export; byte layout identical to `load_srs`'s contract)."""
    ops = bn254_ops()
    out = bytearray()
    out += int(srs.k).to_bytes(4, "little")
    for block in (srs.g1, srs.g1_lagrange):
        for pt in ops.to_affine_host(block):
            if pt.is_identity():
                out += b"\x00" * 64
            else:
                out += int(pt.x).to_bytes(32, "little")
                out += int(pt.y).to_bytes(32, "little")
    for g2pt in (srs.g2, srs.tau_g2):
        gx, gy = g2pt
        for c in (gx.a, gx.b, gy.a, gy.b):
            out += int(c).to_bytes(32, "little")
    with open(path, "wb") as f:
        f.write(bytes(out))


def _lagrange_sum_check(srs: SRS) -> bool:
    """sum_i [L_i(tau)]G1 == G1 (sum of the Lagrange basis is 1)."""
    ops = bn254_ops()
    import jax as _jax

    @_jax.jit
    def tree_sum(px, py, pz):
        p = JacPoint(px, py, pz)
        n = p.x.shape[0]
        while n > 1:
            half = n // 2
            p = ops.add(
                JacPoint(p.x[:half], p.y[:half], p.z[:half]),
                JacPoint(p.x[half:n], p.y[half:n], p.z[half:n]))
            n = half
        return p.x, p.y, p.z

    sx, sy, sz = tree_sum(srs.g1_lagrange.x, srs.g1_lagrange.y,
                          srs.g1_lagrange.z)
    total = ops.to_affine_host(JacPoint(sx, sy, sz))[0]
    return total == bn254_generator()


def srs_sanity_check(srs: SRS) -> bool:
    """e([tau]G1, G2) == e(G1, [tau]G2)."""
    ops = bn254_ops()
    pts = ops.to_affine_host(
        JacPoint(srs.g1.x[:2], srs.g1.y[:2], srs.g1.z[:2]))
    g1_0, g1_tau = pts
    if g1_0 != bn254_generator():
        return False
    return pr.pairing_check([
        (g1_tau, srs.g2),
        (-g1_0, srs.tau_g2),
    ])
