"""Fused Montgomery-multiply Pallas kernel.

The scanned-REDC jnp path (fields/field.py) is compile-friendly but
HBM-bound: every REDC step round-trips the [B,32] accumulator.  This
kernel keeps the whole schoolbook product + word-by-word REDC in
VMEM/registers: one HBM read per operand, one write for the result --
the speed-of-light path for the framework's dominant op.

Layout: operands are limb-major [16, B] uint32 (limbs on the sublane
axis, batch on the lane axis) so every limb row is a full-width vector
and no lane padding is wasted.  `mont_mul_limb_major` is the raw kernel;
`PrimeField.mul` routes through it on TPU via fields/field.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .common import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs

_INTERPRET = False  # set True to debug on CPU


def _kernel_body(p_limbs: np.ndarray, n0: int):
    p_rows = [np.uint32(v) for v in p_limbs]
    mask = np.uint32(LIMB_MASK)
    n0_u = np.uint32(n0)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(N_LIMBS)]
        b = [b_ref[i, :] for i in range(N_LIMBS)]
        zero = jnp.zeros_like(a[0])
        cols = [zero] * (2 * N_LIMBS + 1)
        # schoolbook product, lo/hi split (cols stay < 2^21)
        for i in range(N_LIMBS):
            ai = a[i]
            for j in range(N_LIMBS):
                prod = ai * b[j]
                cols[i + j] = cols[i + j] + (prod & mask)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        # word-by-word REDC (columns stay < 2^24)
        for i in range(N_LIMBS):
            m = (cols[i] * n0_u) & mask
            for j in range(N_LIMBS):
                prod = m * p_rows[j]
                cols[i + j] = cols[i + j] + (prod & mask)
                cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
            cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
        res = cols[N_LIMBS : 2 * N_LIMBS]
        top = cols[2 * N_LIMBS]
        # carry propagation
        carry = zero
        out = []
        for i in range(N_LIMBS):
            tot = res[i] + carry
            out.append(tot & mask)
            carry = tot >> LIMB_BITS
        carry = carry + top  # result < 2p; may exceed 16 limbs via carry

        # conditional subtract p: ge = (carry > 0) | (out >= p)
        ge_flag = carry > 0
        eq_run = jnp.ones_like(ge_flag)
        gt_flag = jnp.zeros_like(ge_flag)
        for i in range(N_LIMBS - 1, -1, -1):
            pi = p_rows[i]
            gt_flag = gt_flag | (eq_run & (out[i] > pi))
            eq_run = eq_run & (out[i] == pi)
        ge = ge_flag | gt_flag | eq_run

        borrow = zero
        for i in range(N_LIMBS):
            t = out[i] - p_rows[i] - borrow
            nb = (t >> 31) & 1  # borrow when negative (two's complement)
            sub_i = t + (nb << LIMB_BITS)
            out_i = jnp.where(ge, sub_i & mask, out[i])
            o_ref[i, :] = out_i
            borrow = nb

    return kernel


@functools.cache
def _mont_mul_fn(p_int: int, n0: int, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    p_limbs = int_to_limbs(p_int)
    kernel = _kernel_body(p_limbs, n0)

    def run(a, b):
        n = a.shape[1]
        grid = (n // block,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
            grid=grid,
            in_specs=[
                pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
                pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
            interpret=interpret,
        )(a, b)

    return run


def _use_interpret() -> bool:
    return _INTERPRET or jax.default_backend() == "cpu"


def mont_mul_limb_major(a, b, p_int: int, n0: int, block: int = 1024):
    """a, b: [16, B] uint32 limb-major Montgomery operands; B % block == 0."""
    return _mont_mul_fn(p_int, n0, block, _use_interpret())(a, b)


def _addsub_kernel_body(p_limbs: np.ndarray, mode: str):
    """mode 'add': (a+b) mod p; mode 'sub': (a-b) mod p.  Unrolled carry
    chains, all in VMEM."""
    p_rows = [np.uint32(v) for v in p_limbs]
    mask = np.uint32(LIMB_MASK)

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i, :] for i in range(N_LIMBS)]
        b = [b_ref[i, :] for i in range(N_LIMBS)]
        zero = jnp.zeros_like(a[0])

        if mode == "add":
            carry = zero
            s = []
            for i in range(N_LIMBS):
                tot = a[i] + b[i] + carry
                s.append(tot & mask)
                carry = tot >> LIMB_BITS
            # ge = carry | (s >= p)
            eq_run = jnp.ones_like(carry, dtype=bool)
            gt = jnp.zeros_like(eq_run)
            for i in range(N_LIMBS - 1, -1, -1):
                gt = gt | (eq_run & (s[i] > p_rows[i]))
                eq_run = eq_run & (s[i] == p_rows[i])
            ge = (carry > 0) | gt | eq_run
            borrow = zero
            for i in range(N_LIMBS):
                t = s[i] - p_rows[i] - borrow
                nb = (t >> 31) & 1
                sub_i = (t + (nb << LIMB_BITS)) & mask
                o_ref[i, :] = jnp.where(ge, sub_i, s[i])
                borrow = nb
        else:  # sub
            borrow = zero
            d = []
            for i in range(N_LIMBS):
                t = a[i] - b[i] - borrow
                nb = (t >> 31) & 1
                d.append((t + (nb << LIMB_BITS)) & mask)
                borrow = nb
            under = borrow > 0  # a < b: add p back
            carry = zero
            for i in range(N_LIMBS):
                tot = d[i] + p_rows[i] + carry
                o_ref[i, :] = jnp.where(under, tot & mask, d[i])
                carry = tot >> LIMB_BITS

    return kernel


@functools.cache
def _addsub_fn(p_int: int, mode: str, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    kernel = _addsub_kernel_body(int_to_limbs(p_int), mode)

    def run(a, b):
        n = a.shape[1]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
            grid=(n // block,),
            in_specs=[
                pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
                pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
            ],
            out_specs=pl.BlockSpec((N_LIMBS, block), lambda i: (0, i)),
            interpret=interpret,
        )(a, b)

    return run


def mont_addsub_batch(a, b, p_int: int, mode: str):
    """(a +/- b) mod p over [..., 16] tensors via the fused kernel."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    batch_shape = shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    block = 1024 if n >= 1024 else max(8, 1 << (n - 1).bit_length())
    pad = (-n) % block
    a2 = a.reshape(n, N_LIMBS)
    b2 = b.reshape(n, N_LIMBS)
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
    out = _addsub_fn(p_int, mode, block, _use_interpret())(a2.T, b2.T).T
    if pad:
        out = out[:n]
    return out.reshape(*batch_shape, N_LIMBS)


def mont_mul_batch(a, b, p_int: int, n0: int):
    """[..., 16] layout wrapper: transpose -> kernel -> transpose back.

    Pads the flattened batch up to the block size."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    batch_shape = shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    block = 1024 if n >= 1024 else max(8, 1 << (n - 1).bit_length())
    pad = (-n) % block
    a2 = a.reshape(n, N_LIMBS)
    b2 = b.reshape(n, N_LIMBS)
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
    out = mont_mul_limb_major(a2.T, b2.T, p_int, n0, block).T
    if pad:
        out = out[:n]
    return out.reshape(*batch_shape, N_LIMBS)
