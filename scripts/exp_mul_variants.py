"""Experiment: compile time + throughput of restructured Montgomery-mul
Pallas kernels, to pick the design for fused point-add kernels.

Variants:
  A: baseline fields/pallas_mont.py (fully unrolled per-limb-row lists)
  B: stacked [16, W] values, static 16-iter loops with .at[] slice adds
  C: scratch-ref cols + fori_loop (rolled; dynamic sublane slices)

Run on the real TPU:  python scripts/exp_mul_variants.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zksnap_tpu.fields.common import LIMB_BITS, N_LIMBS, int_to_limbs
from zksnap_tpu.fields.field import bn254_fq

MASK = np.uint32((1 << LIMB_BITS) - 1)
F = bn254_fq()
P_LIMBS = int_to_limbs(F.p)
N0 = np.uint32(F.n0)
P_COL = P_LIMBS.reshape(N_LIMBS, 1)  # [16,1] broadcastable


# --------------------------------------------------------------- variant B
NROWS = 2 * N_LIMBS + 1


def _shifted(rows, i):
    """Pad [16, W] rows to [NROWS, W] so row j lands at i+j (static concat)."""
    return jnp.pad(rows, ((i, NROWS - N_LIMBS - i), (0, 0)))


def mul_b(a, b, p_arr):
    """a, b: [16, W] uint32 values -> [16, W] canonical Montgomery product."""
    W = a.shape[1]
    cols = jnp.zeros((NROWS, W), jnp.uint32)
    for i in range(N_LIMBS):
        prod = a[i][None, :] * b  # [16, W]
        cols = cols + _shifted(prod & MASK, i) + _shifted(prod >> LIMB_BITS, i + 1)
    for i in range(N_LIMBS):
        m = (cols[i] * N0) & MASK
        prod = m[None, :] * p_arr
        cols = cols + _shifted(prod & MASK, i) + _shifted(prod >> LIMB_BITS, i + 1)
        carry_row = jnp.pad((cols[i] >> LIMB_BITS)[None, :],
                            ((i + 1, NROWS - i - 2), (0, 0)))
        cols = cols + carry_row
    res = [cols[N_LIMBS + i] for i in range(N_LIMBS)]
    top = cols[2 * N_LIMBS]
    carry = jnp.zeros_like(res[0])
    out = []
    for i in range(N_LIMBS):
        tot = res[i] + carry
        out.append(tot & MASK)
        carry = tot >> LIMB_BITS
    carry = carry + top
    # conditional subtract
    ge_flag = carry > 0
    eq = jnp.ones_like(ge_flag)
    gt = jnp.zeros_like(ge_flag)
    for i in range(N_LIMBS - 1, -1, -1):
        gt = gt | (eq & (out[i] > P_LIMBS[i]))
        eq = eq & (out[i] == P_LIMBS[i])
    ge = ge_flag | gt | eq
    borrow = jnp.zeros_like(out[0])
    res2 = []
    for i in range(N_LIMBS):
        t = out[i] - P_LIMBS[i] - borrow
        nb = (t >> 31) & 1
        res2.append(jnp.where(ge, (t + (nb << LIMB_BITS)) & MASK, out[i]))
        borrow = nb
    return jnp.stack(res2)


def kernel_b(p_ref, a_ref, b_ref, o_ref):
    o_ref[:] = mul_b(a_ref[:], b_ref[:], p_ref[:, :1])


# --------------------------------------------------------------- variant C
def kernel_c(p_ref, a_ref, b_ref, o_ref, cols_ref):
    b = b_ref[:]
    p_arr = p_ref[:, :1]
    cols_ref[:] = jnp.zeros_like(cols_ref)

    def cross(i, _):
        ai = a_ref[i, :]
        prod = ai[None, :] * b
        cur = cols_ref[pl.ds(i, N_LIMBS), :]
        cols_ref[pl.ds(i, N_LIMBS), :] = cur + (prod & MASK)
        cur2 = cols_ref[pl.ds(i + 1, N_LIMBS), :]
        cols_ref[pl.ds(i + 1, N_LIMBS), :] = cur2 + (prod >> LIMB_BITS)
        return 0

    jax.lax.fori_loop(0, N_LIMBS, cross, 0)

    def redc(i, _):
        m = (cols_ref[i, :] * N0) & MASK
        prod = m[None, :] * p_arr
        cur = cols_ref[pl.ds(i, N_LIMBS), :]
        cols_ref[pl.ds(i, N_LIMBS), :] = cur + (prod & MASK)
        cur2 = cols_ref[pl.ds(i + 1, N_LIMBS), :]
        cols_ref[pl.ds(i + 1, N_LIMBS), :] = cur2 + (prod >> LIMB_BITS)
        cols_ref[i + 1, :] = cols_ref[i + 1, :] + (cols_ref[i, :] >> LIMB_BITS)
        return 0

    jax.lax.fori_loop(0, N_LIMBS, redc, 0)

    res = [cols_ref[N_LIMBS + i, :] for i in range(N_LIMBS)]
    top = cols_ref[2 * N_LIMBS, :]
    carry = jnp.zeros_like(res[0])
    out = []
    for i in range(N_LIMBS):
        tot = res[i] + carry
        out.append(tot & MASK)
        carry = tot >> LIMB_BITS
    carry = carry + top
    ge_flag = carry > 0
    eq = jnp.ones_like(ge_flag)
    gt = jnp.zeros_like(ge_flag)
    for i in range(N_LIMBS - 1, -1, -1):
        gt = gt | (eq & (out[i] > P_LIMBS[i]))
        eq = eq & (out[i] == P_LIMBS[i])
    ge = ge_flag | gt | eq
    borrow = jnp.zeros_like(out[0])
    for i in range(N_LIMBS):
        t = out[i] - P_LIMBS[i] - borrow
        nb = (t >> 31) & 1
        o_ref[i, :] = jnp.where(ge, (t + (nb << LIMB_BITS)) & MASK, out[i])
        borrow = nb


# --------------------------------------------------------------- multi-mul B
def kernel_b_chain(n_muls):
    """Chain of n_muls dependent muls, variant-B style -- compile scaling."""

    def kernel(p_ref, a_ref, b_ref, o_ref):
        x = a_ref[:]
        b = b_ref[:]
        for _ in range(n_muls):
            x = mul_b(x, b, p_ref[:, :1])
        o_ref[:] = x

    return kernel


def run_kernel(kernel, block, n, scratch=False, n_in=2):
    spec = pl.BlockSpec((N_LIMBS, block), lambda i: (0, i))
    p_spec = pl.BlockSpec((N_LIMBS, 128), lambda i: (0, 0))
    kwargs = {}
    if scratch:
        kwargs["scratch_shapes"] = [
            pltpu.VMEM((2 * N_LIMBS + 1, block), jnp.uint32)
        ]
    inner = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32),
        grid=(n // block,),
        in_specs=[p_spec] + [spec] * n_in,
        out_specs=spec,
        **kwargs,
    )
    p_tile = jnp.asarray(np.broadcast_to(P_COL, (N_LIMBS, 128)).copy())
    return lambda *args: inner(p_tile, *args)


def bench(name, fn, args, n_ops, iters=20):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*args))
    dt = (time.time() - t0) / iters
    print(f"{name}: compile {compile_s:.1f}s, {dt*1e3:.2f} ms, "
          f"{n_ops/dt/1e6:.0f} Mop/s")
    return out


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    a_host = rng.integers(0, 1 << 16, (N_LIMBS, n), dtype=np.uint32)
    b_host = rng.integers(0, 1 << 16, (N_LIMBS, n), dtype=np.uint32)
    # keep < p: zero the top limb
    a_host[-1] &= 0x2FFF
    b_host[-1] &= 0x2FFF
    a = jnp.asarray(a_host)
    b = jnp.asarray(b_host)

    from zksnap_tpu.fields.pallas_mont import mont_mul_limb_major

    def fa(a, b):
        return mont_mul_limb_major(a, b, F.p, int(F.n0), 1024)

    oa = bench("A baseline  ", jax.jit(fa), (a, b), n)

    block = 1024
    fb = jax.jit(lambda a, b: run_kernel(kernel_b, block, n)(a, b))
    ob = bench("B stacked   ", fb, (a, b), n)
    print("  B == A:", bool(jnp.all(oa == ob)))

    # variant C (fori_loop + dynamic sublane slices) fails Mosaic lowering:
    # "cannot statically prove that index in dimension 0 is a multiple of 8".
    # Dead end -- sublane offsets must be 8-aligned.

    for n_muls in (4, 18, 40):
        fk = jax.jit(
            lambda a, b, k=n_muls: run_kernel(kernel_b_chain(k), block, n // 4)(
                a[:, : n // 4], b[:, : n // 4]
            )
        )
        bench(f"B chain x{n_muls:2d}", fk, (a, b), n // 4 * n_muls)


if __name__ == "__main__":
    main()
