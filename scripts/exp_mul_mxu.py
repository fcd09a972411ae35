"""Montgomery-mul kernel experiments: Karatsuba conv + MXU REDC.

Variants benchmarked against the production kernel
(fields/pallas_mont.py):
  base    -- 16x16 schoolbook + word-by-word REDC (current)
  kar     -- 2-level Karatsuba product (144 muls vs 256), word REDC
  mxu     -- schoolbook product + REDC as two bf16 MXU matmuls with
             fixed Toeplitz matrices of n' and p (the reduction has a
             FIXED operand, so it maps to the systolic array; the a*b
             product does not and stays on the VPU)
  kar+mxu -- both

Run on TPU: python scripts/exp_mul_mxu.py [batch_log2]
Prints Mmul/s per variant + correctness vs host oracle.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from zksnap_tpu.fields.common import (LIMB_BITS, LIMB_MASK, N_LIMBS,
                                      int_to_limbs, ints_to_limbs)
from zksnap_tpu.fields.field import bn254_fr

FR = bn254_fr()
P = FR.p
MASK = np.uint32(LIMB_MASK)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def conv_schoolbook(a, b):
    """a, b: lists of 16 [B] u32 rows -> 33 columns < 2^21."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * N_LIMBS + 1)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            prod = a[i] * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    return cols


def conv_mul_n(a, b, n):
    """n-limb schoolbook -> 2n cols (lo/hi split)."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * n + 1)
    for i in range(n):
        for j in range(n):
            prod = a[i] * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    return cols


def conv_karatsuba(a, b, n=N_LIMBS, depth=2):
    """Karatsuba on limb lists; returns 2n+1 columns.

    Operands at depth d are sums of up to 2^d limbs (< 2^(16+d)); the
    lo/hi split keeps columns bounded: products < 2^(32+2d) still fit
    u32 after the & MASK / >> 16 split only if 16+2d+16 <= 32 ... so
    operand growth must go to a THIRD column instead.  We keep operands
    exact by splitting the (a_lo+a_hi) sums: sum < 2^17 -> product
    < 2^34; lo/hi split leaves hi < 2^18: still u32-safe, columns just
    grow a bit (< 2^23 at depth 2).
    """
    if depth == 0 or n <= 4:
        return conv_mul_n(a, b, n)
    h = n // 2
    a0, a1 = a[:h], a[h:]
    b0, b1 = b[:h], b[h:]
    # middle operands: 17-bit values; their schoolbook products are
    # < 2^34 -- the lo/hi u32 split overflows.  Split each 17-bit sum
    # into (16-bit, 1-bit carry) and expand: (x + c*2^16)(y + d*2^16)
    # = xy + (xd + yc)*2^16 + cd*2^32 where xd/yc are cheap 16-bit
    # masked adds, not muls.
    s_a = [a0[i] + a1[i] for i in range(h)]  # < 2^17
    s_b = [b0[i] + b1[i] for i in range(h)]
    z0 = conv_karatsuba(a0, b0, h, depth - 1)
    z2 = conv_karatsuba(a1, b1, h, depth - 1)
    z1 = conv_mid(s_a, s_b, h, depth - 1)
    zero = jnp.zeros_like(a[0])
    out = [zero] * (2 * n + 1)
    for i, v in enumerate(z0):
        out[i] = out[i] + v
    for i, v in enumerate(z2):
        out[i + 2 * h] = out[i + 2 * h] + v
    # z1 - z0 - z2 at offset h: subtraction in u32 would underflow;
    # add the complement trick: keep signed via int32 is unsafe (values
    # to 2^23).  Instead accumulate z1 and subtract z0,z2 using
    # borrow-free arithmetic: out[i+h] += z1[i] + (2^24 - z0[i] - z2[i])
    # - 2^24 ... simplest: do signed int32 math (values < 2^23 fit).
    for i in range(len(z1)):
        v = z1[i]
        if i < len(z0):
            v = v - z0[i]
        if i < len(z2):
            v = v - z2[i]
        # v in (-2^23, 2^24): bias to keep uint32 wraparound harmless --
        # u32 arithmetic is modular, and the final carry pass interprets
        # columns mod 2^32 with positive bias applied
        out[i + h] = out[i + h] + v + (np.uint32(3) << np.uint32(24))
        out[i + h] = out[i + h] - (np.uint32(3) << np.uint32(24))
    return out


def conv_mid(s_a, s_b, n, depth):
    """Product of 17-bit-limb operands (Karatsuba middle term)."""
    zero = jnp.zeros_like(s_a[0])
    cols = [zero] * (2 * n + 1)
    for i in range(n):
        xa = s_a[i] & MASK
        ca = s_a[i] >> LIMB_BITS  # 0/1
        for j in range(n):
            xb = s_b[j] & MASK
            cb = s_b[j] >> LIMB_BITS
            prod = xa * xb
            cross = jnp.where(cb > 0, xa, 0) + jnp.where(ca > 0, xb, 0)
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = (cols[i + j + 1] + (prod >> LIMB_BITS)
                               + (cross & MASK))
            cols[i + j + 2] = cols[i + j + 2] + (cross >> LIMB_BITS) + ca * cb
    return cols


def word_redc(cols, p_rows, n0_u):
    """Word-by-word REDC + carry + conditional subtract (current)."""
    zero = jnp.zeros_like(cols[0])
    for i in range(N_LIMBS):
        m = (cols[i] * n0_u) & MASK
        for j in range(N_LIMBS):
            prod = m * p_rows[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
    res = cols[N_LIMBS: 2 * N_LIMBS]
    top = cols[2 * N_LIMBS]
    carry = zero
    out = []
    for i in range(N_LIMBS):
        tot = res[i] + carry
        out.append(tot & MASK)
        carry = tot >> LIMB_BITS
    carry = carry + top
    return cond_sub(out, carry, p_rows)


def cond_sub(out, carry, p_rows):
    zero = jnp.zeros_like(out[0])
    ge_flag = carry > 0
    eq_run = jnp.ones_like(ge_flag)
    gt_flag = jnp.zeros_like(ge_flag)
    for i in range(N_LIMBS - 1, -1, -1):
        pi = p_rows[i]
        gt_flag = gt_flag | (eq_run & (out[i] > pi))
        eq_run = eq_run & (out[i] == pi)
    ge = ge_flag | gt_flag | eq_run
    borrow = zero
    res = []
    for i in range(N_LIMBS):
        t = out[i] - p_rows[i] - borrow
        nb = (t >> 31) & 1
        sub_i = t + (nb << LIMB_BITS)
        res.append(jnp.where(ge, sub_i & MASK, out[i]))
        borrow = nb
    return res


# ---------------------------------------------------------------------------
# MXU REDC: m = (T mod R)*n' mod R and m*p as bf16 matmuls
# ---------------------------------------------------------------------------

def _np_limbs8(x: int, n: int) -> np.ndarray:
    return np.array([(x >> (8 * i)) & 0xFF for i in range(n)], np.float32)


@functools.cache
def _mxu_tables(p_int: int):
    nprime = (-pow(p_int, -1, 1 << 256)) % (1 << 256)
    np8 = _np_limbs8(nprime, 32)
    p8 = _np_limbs8(p_int, 32)
    # Components for m: T's u32 columns at 16-bit positions re-chunked
    # into 8-bit digits (c0,c1,c2 at 8-bit positions 2k,2k+1,2k+2);
    # component (k, d) contributes n'8[j - (2k+d)] to output col j < 32.
    comps = [(k, d) for k in range(N_LIMBS + 1) for d in range(3)
             if 2 * k + d < 32]
    # out[j, b] = sum_r NMAT[j, r] * comp[r, b]  (positions on sublanes,
    # batch on lanes -- matches the limb-major kernel layout)
    NMAT = np.zeros((32, len(comps)), np.float32)
    for r, (k, d) in enumerate(comps):
        pos = 2 * k + d
        for j in range(32):
            if 0 <= j - pos < 32:
                NMAT[j, r] = np8[j - pos]
    # mp[j, b] = sum_i PMAT[j, i] * m8[i, b], j < 64
    PMAT = np.zeros((64, 32), np.float32)
    for i in range(32):
        for j in range(64):
            if 0 <= j - i < 32:
                PMAT[j, i] = p8[j - i]
    return comps, jnp.asarray(NMAT, jnp.bfloat16), \
        jnp.asarray(PMAT, jnp.bfloat16)


def _to_bf16(v):
    """u32 (< 2^8) -> bf16 exactly; Mosaic has no direct u32->bf16 cast."""
    return v.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def mxu_redc(cols, p_rows, p_int: int, nmat, pmat, comps):
    """cols: 16-bit-position u32 columns of T = a*b (values < 2^23).

    Returns 16 reduced limbs of (T + m*p) / 2^256 after one conditional
    subtract.  Matmul operands are bf16-exact (<= 255); accumulations
    < 2^22 are exact in f32.  All tensors stay limb-major [rows, B].
    """
    # -- chunk T columns into 8-bit components for the m matmul --------
    lhs_rows = []
    for (k, d) in comps:
        c = cols[k]
        v = ((c >> (8 * d)) & 0xFF) if d < 2 else (c >> 16)
        lhs_rows.append(_to_bf16(v))
    lhs = jnp.stack(lhs_rows, axis=0)  # [n_comps, B]
    m_cols_f = jax.lax.dot_general(
        nmat, lhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [32, B] < 2^22
    m_cols = m_cols_f.astype(jnp.int32).astype(jnp.uint32)
    # -- normalize m to true 8-bit limbs (mod 2^256: drop final carry) --
    m8 = []
    carry = jnp.zeros_like(cols[0])
    for j in range(32):
        t = m_cols[j, :] + carry
        m8.append(t & 0xFF)
        carry = t >> 8
    mlhs = jnp.stack([_to_bf16(v) for v in m8], axis=0)
    mp_f = jax.lax.dot_general(
        pmat, mlhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [64, B] < 2^21
    mp = mp_f.astype(jnp.int32).astype(jnp.uint32)

    # T's 8-bit digit at position j (0..63)
    def tdig(j):
        k, d = divmod(j, 2)
        v = (cols[k] >> (8 * d)) & 0xFF
        if d == 0 and k >= 1:  # c2 of column k-1 sits at position 2k
            v = v + (cols[k - 1] >> 16)
        return v

    # -- S = T + m*p: low 32 positions contribute only their carry -----
    carry = jnp.zeros_like(cols[0])
    for j in range(32):
        t = mp[j, :] + tdig(j) + carry
        carry = t >> 8
    # -- high 32 positions + carry -> 16 16-bit limbs ------------------
    # (positions >= 64 are provably zero: H = S/2^256 < 2p < 2^255)
    out = []
    for i in range(N_LIMBS):
        j = 32 + 2 * i
        lo = mp[j, :] + tdig(j) + carry
        hi = mp[j + 1, :] + tdig(j + 1) + (lo >> 8)
        out.append((lo & 0xFF) | ((hi & 0xFF) << 8))
        carry = hi >> 8
    return cond_sub(out, carry, p_rows)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def make_kernel(variant: str, p_int: int, n0: int):
    from jax.experimental import pallas as pl

    p_limbs = int_to_limbs(p_int)
    p_rows = [np.uint32(v) for v in p_limbs]
    n0_u = np.uint32(n0)
    comps, nmat_h, pmat_h = _mxu_tables(p_int)

    def kernel(nmat_ref, pmat_ref, a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(N_LIMBS)]
        b = [b_ref[i, :] for i in range(N_LIMBS)]
        if variant.startswith("kar"):
            cols = conv_karatsuba(a, b)
        else:
            cols = conv_schoolbook(a, b)
        if variant == "convonly":  # timing ablation: no reduction
            for i in range(N_LIMBS):
                o_ref[i, :] = cols[i] ^ cols[i + N_LIMBS]
            return
        if variant == "mxunocarry":  # ablation: matmuls, no carry chains
            lhs_rows = []
            for (k, d) in comps:
                c = cols[k]
                v = ((c >> (8 * d)) & 0xFF) if d < 2 else (c >> 16)
                lhs_rows.append(_to_bf16(v))
            lhs = jnp.stack(lhs_rows, axis=0)
            m_cols = jax.lax.dot_general(
                nmat_ref[:, :], lhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mlhs = _to_bf16(m_cols.astype(jnp.int32).astype(jnp.uint32)
                            & 0xFF)
            mp = jax.lax.dot_general(
                pmat_ref[:, :], mlhs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(jnp.int32).astype(jnp.uint32)
            for i in range(N_LIMBS):
                o_ref[i, :] = mp[i, :] ^ mp[i + 32, :]
            return
        if variant.endswith("mxu"):
            out = mxu_redc(cols, p_rows, p_int, nmat_ref[:, :],
                           pmat_ref[:, :], comps)
        else:
            out = word_redc(cols, p_rows, n0_u)
        for i in range(N_LIMBS):
            o_ref[i, :] = out[i]

    @functools.cache
    def run_fn(n: int, block: int):
        grid = (n // block,)

        def go(nmat, pmat, a, b):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
                grid=grid,
                in_specs=[
                    pl.BlockSpec(nmat_h.shape, lambda i: (0, 0)),
                    pl.BlockSpec(pmat_h.shape, lambda i: (0, 0)),
                    pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
                    pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
                ],
                out_specs=pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
                interpret=jax.default_backend() == "cpu",
            )(nmat, pmat, a, b)

        return jax.jit(go)

    def call(a, b, block=1024):
        return run_fn(a.shape[1], block)(nmat_h, pmat_h, a, b)

    return call


def sync(x):
    return np.asarray(jax.device_get(x))


def main():
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    B = 1 << blog
    import secrets
    n0 = int(FR.n0)
    avals = [secrets.randbelow(P) for _ in range(256)]
    bvals = [secrets.randbelow(P) for _ in range(256)]
    a_small = jnp.asarray(ints_to_limbs(avals)).T
    b_small = jnp.asarray(ints_to_limbs(bvals)).T
    R_inv = pow(1 << 256, -1, P)
    want = [(x * y % P) * R_inv % P for x, y in zip(avals, bvals)]

    key = jax.random.PRNGKey(1)
    a_big = jax.random.randint(key, (N_LIMBS, B), 0, 1 << 16,
                               dtype=jnp.uint32)
    b_big = jax.random.randint(jax.random.PRNGKey(2), (N_LIMBS, B), 0,
                               1 << 16, dtype=jnp.uint32)

    variants = sys.argv[2].split(",") if len(sys.argv) > 2 else (
        "base", "mxu")
    for variant in variants:
        try:
            fn = make_kernel(variant, P, n0)
            if variant in ("convonly", "mxunocarry"):
                out = fn(a_big, b_big)
                sync(out[0, :1])
                iters = 20
                t0 = time.time()
                for _ in range(iters):
                    out = fn(a_big, b_big)
                sync(out[0, :1])
                dt = (time.time() - t0) / iters
                print(f"{variant}: (timing only) {B/dt/1e6:.0f} Mmul/s"
                      f" ({dt*1e3:.2f} ms @ 2^{blog})")
                continue
            got = sync(fn(a_small, b_small, block=256)).T
            got_ints = [sum(int(r[i]) << (16 * i) for i in range(16))
                        for r in got]
            ok = got_ints == want
            if not ok:
                bad = [i for i, (g, w) in enumerate(zip(got_ints, want))
                       if g != w]
                print(f"{variant}: WRONG ({len(bad)} bad, first {bad[:3]})")
                continue
            # warm
            out = fn(a_big, b_big)
            sync(out[0, :1])
            iters = 20
            t0 = time.time()
            for _ in range(iters):
                out = fn(a_big, b_big)
            sync(out[0, :1])
            dt = (time.time() - t0) / iters
            print(f"{variant}: OK  {B/dt/1e6:.0f} Mmul/s  ({dt*1e3:.2f} ms"
                  f" @ 2^{blog})")
        except Exception as e:  # noqa: BLE001
            print(f"{variant}: ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
