"""Batched prime-field arithmetic in Montgomery form.

One `PrimeField` instance per modulus (BN254 Fr/Fq, secp256k1 Fp/Fq --
the four fields the reference stack uses, see SURVEY.md section 2.2 /
halo2curves).  Elements live in uint32 tensors of shape [..., 16]
(16x16-bit limbs, little-endian) and are kept in Montgomery form
(x * 2^256 mod p) on device; conversions happen at the host boundary.

All ops are pure, shape-static and jit/vmap-safe.  Multiplication is a
one-hot convolution matmul (MXU) followed by a 16-step vectorized
Montgomery REDC (VPU); see fields/common.py.

Reference parity: halo2curves `Fr`/`Fq`/`secp256k1::{Fp,Fq}` Montgomery
arithmetic (used throughout /root/reference, e.g. voter/src/lib.rs:12,
voter_tests/src/lib.rs:1-6).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np

from .common import (
    LIMB_BITS,
    LIMB_MASK,
    N_LIMBS,
    WIDE_LIMBS,
    carry_propagate,
    int_to_limbs,
    ints_to_limbs,
    limbs_geq,
    limbs_to_int,
    limbs_to_ints,
    mul_wide,
    raw_sub,
)

R_BITS = N_LIMBS * LIMB_BITS  # 256


class PrimeField:
    """Arithmetic for Z/p with p < 2^256, batched over leading dims."""

    def __init__(self, name: str, modulus: int, generator: int | None = None):
        assert modulus % 2 == 1 and modulus < (1 << R_BITS)
        self.name = name
        self.p = modulus
        self.bits = modulus.bit_length()
        self.generator = generator  # multiplicative generator (for NTT roots)
        self.R = 1 << R_BITS
        self.R_inv = pow(self.R, -1, modulus)
        self.R2 = self.R * self.R % modulus
        # n0 = -p^{-1} mod 2^16 (per-limb Montgomery constant)
        self.n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.p_limbs_np = int_to_limbs(modulus)
        self.r2_limbs_np = int_to_limbs(self.R2)
        self.one_mont_np = int_to_limbs(self.R % modulus)
        self.zero_np = np.zeros(N_LIMBS, np.uint32)
        # 2-adicity for NTT domains
        s = 0
        t = modulus - 1
        while t % 2 == 0:
            s += 1
            t //= 2
        self.two_adicity = s
        self.t_odd = t

    # -- host-side canonical <-> device Montgomery -------------------------

    def to_mont(self, xs) -> jnp.ndarray:
        """Python ints (scalar or list) -> Montgomery limb tensor.

        Conversion happens host-side (python-int Montgomery multiply) so no
        device kernel is compiled for boundary traffic; only the bulk compute
        path runs on TPU.
        """
        if isinstance(xs, int):
            arr = int_to_limbs(xs % self.p * self.R % self.p)
        else:
            arr = ints_to_limbs([x % self.p * self.R % self.p for x in xs])
        return jnp.asarray(arr)

    def from_mont(self, limbs) -> list | int:
        """Montgomery limb tensor -> python int(s) (host sync, host REDC)."""
        canon = np.asarray(jax.device_get(limbs))
        if canon.ndim == 1:
            return limbs_to_int(canon) * self.R_inv % self.p
        return [v * self.R_inv % self.p for v in limbs_to_ints(canon)]

    # -- constants ----------------------------------------------------------
    # Kept as NUMPY arrays on purpose: traced code closing over numpy values
    # embeds them as HLO constants directly; device-resident constants would
    # force a blocking device->host fetch during MLIR lowering (pathological
    # over a remote-TPU tunnel) and can leak tracers when cached.

    @property
    def p_limbs(self):
        return self.p_limbs_np

    @property
    def zero(self):
        return self.zero_np

    @property
    def one(self):
        """1 in Montgomery form (= R mod p)."""
        return self.one_mont_np

    def const(self, x: int):
        """Host constant -> Montgomery limb vector (numpy, no device op)."""
        return int_to_limbs(x * self.R % self.p)

    def const_np(self, x: int) -> np.ndarray:
        return int_to_limbs(x * self.R % self.p)

    # -- modular add/sub/neg ------------------------------------------------

    def add(self, a, b):
        if self._use_pallas(a, b):
            from .pallas_mont import mont_addsub_batch

            return mont_addsub_batch(a, b, self.p, "add")
        s, carry = carry_propagate(a + b)
        # s + carry*2^256; subtract p once if >= p (sum < 2p so once suffices)
        ge = (carry > 0) | limbs_geq(s, self.p_limbs)
        d, _ = raw_sub(s, self.p_limbs)
        return jnp.where(ge[..., None], d, s)

    def sub(self, a, b):
        if self._use_pallas(a, b):
            from .pallas_mont import mont_addsub_batch

            return mont_addsub_batch(a, b, self.p, "sub")
        d, borrow = raw_sub(a, b)
        dp, _ = carry_propagate(d + self.p_limbs)
        return jnp.where((borrow > 0)[..., None], dp, d)

    def neg(self, a):
        d, _ = raw_sub(self.p_limbs, a)
        return jnp.where(jnp.all(a == 0, axis=-1, keepdims=True), a, d)

    def double(self, a):
        return self.add(a, a)

    def canon(self, a):
        """Reduce a lazy-form value in [0, 2p) to canonical [0, p).

        The fused point kernels (curves/fused.py) keep intermediates in
        lazy Montgomery form; call this before raw-limb equality or
        is_zero tests on their outputs."""
        ge = limbs_geq(a, self.p_limbs)
        d, _ = raw_sub(a, self.p_limbs)
        return jnp.where(ge[..., None], d, a)

    # -- Montgomery multiply ------------------------------------------------

    def mont_redc(self, cols):
        """REDC of a redundant 32-column product (each column < 2^23).

        Returns canonical limbs [..., 16] < p.
        Word-by-word Montgomery reduction expressed as a 16-step lax.scan
        with a SHIFTING accumulator (the head column is eliminated each
        step, then the window slides) -- the step body is ~12 HLO ops, so
        graphs that instantiate many multiplies stay compilable.
        Accumulator columns stay < 2^24 (no uint32 overflow).
        """
        n0 = jnp.uint32(self.n0)
        N = self.p_limbs  # numpy [16]
        batch = cols.shape[:-1]
        zero_col = jnp.zeros(batch + (1,), jnp.uint32)

        def step(T, _):
            # T: [..., 32]; eliminate column 0, slide window left
            m = ((T[..., 0] & LIMB_MASK) * n0) & LIMB_MASK
            prod = m[..., None] * N  # [..., 16] uint32 exact
            plo = prod & LIMB_MASK
            phi = prod >> LIMB_BITS
            T = T.at[..., 0:N_LIMBS].add(plo)
            T = T.at[..., 1 : N_LIMBS + 1].add(phi)
            T = T.at[..., 1].add(T[..., 0] >> LIMB_BITS)
            T = jnp.concatenate([T[..., 1:], zero_col], axis=-1)
            return T, None

        T, _ = jax.lax.scan(step, cols, None, length=N_LIMBS)
        res, carry = carry_propagate(T[..., : N_LIMBS])
        # result < 2p (may exceed 16 limbs only via `carry` for 256-bit p)
        ge = (carry > 0) | limbs_geq(res, self.p_limbs)
        d, _ = raw_sub(res, self.p_limbs)
        return jnp.where(ge[..., None], d, res)

    def mul(self, a, b):
        if self._use_pallas(a, b):
            from .pallas_mont import mont_mul_batch

            return mont_mul_batch(a, b, self.p, self.n0)
        return self.mont_redc(mul_wide(a, b))

    def _use_pallas(self, a, b) -> bool:
        """Fused Pallas kernel on TPU for non-tiny batches; jnp elsewhere."""
        if _os.environ.get("ZKSNAP_TPU_PALLAS", "1") != "1":
            return False
        if jax.default_backend() == "cpu":
            return False
        shape = jnp.broadcast_shapes(a.shape, b.shape)[:-1]
        n = 1
        for d in shape:
            n *= int(d)
        return n >= 256

    def square(self, a):
        return self.mul(a, a)

    def mont_reduce_narrow(self, a):
        """REDC(a): maps Montgomery form back to canonical (divides by R)."""
        cols = jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (N_LIMBS,), jnp.uint32)], axis=-1
        )
        return self.mont_redc(cols)

    # -- select / predicates -------------------------------------------------

    def select(self, cond, a, b):
        """cond ? a : b, cond is bool [...] matching leading dims."""
        return jnp.where(cond[..., None], a, b)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    # -- exponentiation / inversion ------------------------------------------

    def pow_const(self, a, e: int):
        """a^e for a host-known exponent.

        Square-and-multiply expressed as a lax.scan over the (static) bit
        string so the multiply body is traced/compiled once, not |e| times.
        """
        result = jnp.broadcast_to(self.one, a.shape)
        if e == 0:
            return result
        bits = jnp.array([b == "1" for b in bin(e)[2:]])

        def step(res, bit):
            res = self.square(res)
            res = jnp.where(bit, self.mul(res, a), res)
            return res, None

        result, _ = jax.lax.scan(step, result, bits)
        return result

    def inv(self, a):
        """Batched inversion via Fermat: a^(p-2).  inv(0) = 0."""
        return self.pow_const(a, self.p - 2)

    def batch_inv(self, a):
        """Batched inversion along the leading axis; zeros map to zeros.

        Montgomery's trick, log-depth: Hillis-Steele prefix and suffix
        product scans (2*log2(n) full-width muls), one Fermat inversion of
        the total, then inv(a_i) = prefix_excl(i) * suffix_excl(i) *
        inv(total).  The old sequential-scan variant was n dependent steps
        of single-element muls -- pathological on TPU.
        """
        n = a.shape[0]
        zero_mask = self.is_zero(a)
        one = jnp.broadcast_to(self.one, a.shape)
        a_safe = jnp.where(zero_mask[..., None], one, a)
        if n == 1:
            inv = self.inv(a_safe)
            return jnp.where(zero_mask[..., None], jnp.zeros_like(a), inv)
        idx = jnp.arange(n).reshape((n,) + (1,) * (a.ndim - 1))

        pref = a_safe
        d = 1
        while d < n:
            sh = jnp.where(idx >= d, jnp.roll(pref, d, axis=0), one)
            pref = self.mul(pref, sh)
            d <<= 1
        suf = a_safe
        d = 1
        while d < n:
            sh = jnp.where(idx < n - d, jnp.roll(suf, -d, axis=0), one)
            suf = self.mul(suf, sh)
            d <<= 1

        total_inv = self.inv(pref[-1])
        pref_ex = jnp.concatenate([one[:1], pref[:-1]], axis=0)
        suf_ex = jnp.concatenate([suf[1:], one[:1]], axis=0)
        invs = self.mul(self.mul(pref_ex, suf_ex), total_inv[None])
        return jnp.where(zero_mask[..., None], jnp.zeros_like(a), invs)

    # -- misc ----------------------------------------------------------------

    def random(self, key, shape=()):
        """Uniform field elements in Montgomery form (for tests/benches)."""

        @jax.jit
        def gen(key):
            raw = jax.random.randint(
                key, shape + (N_LIMBS,), 0, 1 << LIMB_BITS, dtype=jnp.uint32
            )
            # clear top bits then cond-sub (near-uniform; test/bench use only)
            raw = raw.at[..., N_LIMBS - 1].set(
                raw[..., N_LIMBS - 1] & (LIMB_MASK >> 2))
            ge = limbs_geq(raw, self.p_limbs)
            d, _ = raw_sub(raw, self.p_limbs)
            return jnp.where(ge[..., None], d, raw)

        return gen(key)


# ---------------------------------------------------------------------------
# Field instances (moduli match halo2curves bn256 / secp256k1)
# ---------------------------------------------------------------------------

BN254_FR_MOD = 21888242871839275222246405745257275088548364400416034343698204186575808495617
BN254_FQ_MOD = 21888242871839275222246405745257275088696311157297823662689037894645226208583
SECP_P = 2**256 - 2**32 - 977
SECP_N = 115792089237316195423570985008687907852837564279074904382605163141518161494337


@functools.cache
def bn254_fr() -> PrimeField:
    """BN254 scalar field (halo2curves bn256::Fr, generator 7, 2-adicity 28)."""
    return PrimeField("bn254_fr", BN254_FR_MOD, generator=7)


@functools.cache
def bn254_fq() -> PrimeField:
    """BN254 base field (halo2curves bn256::Fq)."""
    return PrimeField("bn254_fq", BN254_FQ_MOD, generator=3)


@functools.cache
def secp256k1_fp() -> PrimeField:
    """secp256k1 base field (halo2curves secp256k1::Fp)."""
    return PrimeField("secp_fp", SECP_P, generator=3)


@functools.cache
def secp256k1_fq() -> PrimeField:
    """secp256k1 scalar field (halo2curves secp256k1::Fq)."""
    return PrimeField("secp_fq", SECP_N, generator=7)
