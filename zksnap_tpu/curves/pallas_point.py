"""Fused Pallas kernels for batched Jacobian point add/double.

One kernel invocation per batched group op: all ~16 Montgomery multiplies
and the complete-addition select logic stay in VMEM, so HBM sees only the
coordinate reads/writes (vs ~28 separate field-kernel launches in the
composed path).  Formulas and edge-case handling mirror
curves/jacobian.py (EFD dbl-2009-l / add-2007-bl, branchless).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.common import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs

MASK = np.uint32(LIMB_MASK)


def _vec_mont_mul(a, b, p_rows, n0):
    """a, b: lists of 16 [T] uint32 vectors -> canonical product limbs."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * (2 * N_LIMBS + 1)
    for i in range(N_LIMBS):
        ai = a[i]
        for j in range(N_LIMBS):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
    for i in range(N_LIMBS):
        m = (cols[i] * n0) & MASK
        for j in range(N_LIMBS):
            prod = m * p_rows[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> LIMB_BITS)
        cols[i + 1] = cols[i + 1] + (cols[i] >> LIMB_BITS)
    res = cols[N_LIMBS : 2 * N_LIMBS]
    carry = jnp.zeros_like(a[0])
    out = []
    for i in range(N_LIMBS):
        tot = res[i] + carry
        out.append(tot & MASK)
        carry = tot >> LIMB_BITS
    carry = carry + cols[2 * N_LIMBS]
    return _vec_cond_sub_p(out, carry, p_rows)


def _vec_cond_sub_p(out, carry, p_rows):
    ge_flag = carry > 0
    eq_run = jnp.ones_like(ge_flag)
    gt = jnp.zeros_like(ge_flag)
    for i in range(N_LIMBS - 1, -1, -1):
        gt = gt | (eq_run & (out[i] > p_rows[i]))
        eq_run = eq_run & (out[i] == p_rows[i])
    ge = ge_flag | gt | eq_run
    borrow = jnp.zeros_like(out[0])
    res = []
    for i in range(N_LIMBS):
        t = out[i] - p_rows[i] - borrow
        nb = (t >> 31) & 1
        res.append(jnp.where(ge, (t + (nb << LIMB_BITS)) & MASK, out[i]))
        borrow = nb
    return res


def _vec_add(a, b, p_rows):
    carry = jnp.zeros_like(a[0])
    s = []
    for i in range(N_LIMBS):
        tot = a[i] + b[i] + carry
        s.append(tot & MASK)
        carry = tot >> LIMB_BITS
    return _vec_cond_sub_p(s, carry, p_rows)


def _vec_sub(a, b, p_rows):
    borrow = jnp.zeros_like(a[0])
    d = []
    for i in range(N_LIMBS):
        t = a[i] - b[i] - borrow
        nb = (t >> 31) & 1
        d.append((t + (nb << LIMB_BITS)) & MASK)
        borrow = nb
    under = borrow > 0
    carry = jnp.zeros_like(a[0])
    out = []
    for i in range(N_LIMBS):
        tot = d[i] + p_rows[i] + carry
        out.append(jnp.where(under, tot & MASK, d[i]))
        carry = tot >> LIMB_BITS
    return out


def _vec_dbl(a, p_rows):
    return _vec_add(a, a, p_rows)


def _vec_select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _vec_is_zero(a):
    acc = a[0]
    for x in a[1:]:
        acc = acc | x
    return acc == 0


def _vec_eq(a, b):
    acc = a[0] ^ b[0]
    for x, y in zip(a[1:], b[1:]):
        acc = acc | (x ^ y)
    return acc == 0


def _point_kernels(p_int: int, n0_int: int):
    p_rows = [np.uint32(v) for v in int_to_limbs(p_int)]
    n0 = np.uint32(n0_int)

    def load(ref):
        return [ref[i, :] for i in range(N_LIMBS)]

    def store(ref, limbs):
        for i in range(N_LIMBS):
            ref[i, :] = limbs[i]

    def mul(a, b):
        return _vec_mont_mul(a, b, p_rows, n0)

    def dbl_impl(x, y, z):
        A = mul(x, x)
        B = mul(y, y)
        C = mul(B, B)
        t = mul(_vec_add(x, B, p_rows), _vec_add(x, B, p_rows))
        D = _vec_dbl(_vec_sub(_vec_sub(t, A, p_rows), C, p_rows), p_rows)
        E = _vec_add(_vec_add(A, A, p_rows), A, p_rows)
        FF = mul(E, E)
        X3 = _vec_sub(FF, _vec_dbl(D, p_rows), p_rows)
        C8 = _vec_dbl(_vec_dbl(_vec_dbl(C, p_rows), p_rows), p_rows)
        Y3 = _vec_sub(mul(E, _vec_sub(D, X3, p_rows)), C8, p_rows)
        Z3 = _vec_dbl(mul(y, z), p_rows)
        return X3, Y3, Z3

    def dbl_kernel(x_ref, y_ref, z_ref, ox, oy, oz):
        X3, Y3, Z3 = dbl_impl(load(x_ref), load(y_ref), load(z_ref))
        store(ox, X3)
        store(oy, Y3)
        store(oz, Z3)

    def add_kernel(x1r, y1r, z1r, x2r, y2r, z2r, ox, oy, oz):
        x1, y1, z1 = load(x1r), load(y1r), load(z1r)
        x2, y2, z2 = load(x2r), load(y2r), load(z2r)

        z1z1 = mul(z1, z1)
        z2z2 = mul(z2, z2)
        u1 = mul(x1, z2z2)
        u2 = mul(x2, z1z1)
        s1 = mul(mul(y1, z2), z2z2)
        s2 = mul(mul(y2, z1), z1z1)
        h = _vec_sub(u2, u1, p_rows)
        r = _vec_sub(s2, s1, p_rows)

        i = mul(_vec_dbl(h, p_rows), _vec_dbl(h, p_rows))
        j = mul(h, i)
        r2 = _vec_dbl(r, p_rows)
        v = mul(u1, i)
        x3 = _vec_sub(_vec_sub(mul(r2, r2), j, p_rows),
                      _vec_dbl(v, p_rows), p_rows)
        y3 = _vec_sub(mul(r2, _vec_sub(v, x3, p_rows)),
                      _vec_dbl(mul(s1, j), p_rows), p_rows)
        zz = _vec_sub(_vec_sub(mul(_vec_add(z1, z2, p_rows),
                                   _vec_add(z1, z2, p_rows)),
                               z1z1, p_rows), z2z2, p_rows)
        z3 = mul(zz, h)

        dx, dy, dz = dbl_impl(x1, y1, z1)

        h_zero = _vec_is_zero(h)
        r_zero = _vec_is_zero(r)
        p_inf = _vec_is_zero(z1)
        q_inf = _vec_is_zero(z2)
        use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
        to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

        X = _vec_select(use_dbl, dx, x3)
        Y = _vec_select(use_dbl, dy, y3)
        Z = _vec_select(use_dbl, dz, z3)
        Z = [jnp.where(to_inf, jnp.zeros_like(v), v) for v in Z]
        X = _vec_select(q_inf, x1, _vec_select(p_inf, x2, X))
        Y = _vec_select(q_inf, y1, _vec_select(p_inf, y2, Y))
        Z = _vec_select(q_inf, z1, _vec_select(p_inf, z2, Z))
        store(ox, X)
        store(oy, Y)
        store(oz, Z)

    return add_kernel, dbl_kernel


def _staged_kernels(p_int: int, n0_int: int):
    """add = stage A (cross products) + dbl kernel + stage B (combine).

    Each stage is ~8 Montgomery muls -- inside Mosaic's practical size
    budget, unlike the 22-mul monolithic add kernel."""
    p_rows = [np.uint32(v) for v in int_to_limbs(p_int)]
    n0 = np.uint32(n0_int)

    def load(ref):
        return [ref[i, :] for i in range(N_LIMBS)]

    def store(ref, limbs):
        for i in range(N_LIMBS):
            ref[i, :] = limbs[i]

    def mul(a, b):
        return _vec_mont_mul(a, b, p_rows, n0)

    def stage_a(x1r, y1r, z1r, x2r, y2r, z2r,
                u1o, u2o, s1o, s2o, zz1o, zz2o):
        x1, y1, z1 = load(x1r), load(y1r), load(z1r)
        x2, y2, z2 = load(x2r), load(y2r), load(z2r)
        z1z1 = mul(z1, z1)
        z2z2 = mul(z2, z2)
        store(u1o, mul(x1, z2z2))
        store(u2o, mul(x2, z1z1))
        store(s1o, mul(mul(y1, z2), z2z2))
        store(s2o, mul(mul(y2, z1), z1z1))
        store(zz1o, z1z1)
        store(zz2o, z2z2)

    def stage_b(u1r, u2r, s1r, s2r, zz1r, zz2r, z1r, z2r,
                x1r, y1r, x2r, y2r, dxr, dyr, dzr,
                ox, oy, oz):
        u1, u2 = load(u1r), load(u2r)
        s1, s2 = load(s1r), load(s2r)
        z1z1, z2z2 = load(zz1r), load(zz2r)
        z1, z2 = load(z1r), load(z2r)
        x1, y1 = load(x1r), load(y1r)
        x2, y2 = load(x2r), load(y2r)
        dx, dy, dz = load(dxr), load(dyr), load(dzr)

        h = _vec_sub(u2, u1, p_rows)
        r = _vec_sub(s2, s1, p_rows)
        i = mul(_vec_dbl(h, p_rows), _vec_dbl(h, p_rows))
        j = mul(h, i)
        r2 = _vec_dbl(r, p_rows)
        v = mul(u1, i)
        x3 = _vec_sub(_vec_sub(mul(r2, r2), j, p_rows),
                      _vec_dbl(v, p_rows), p_rows)
        y3 = _vec_sub(mul(r2, _vec_sub(v, x3, p_rows)),
                      _vec_dbl(mul(s1, j), p_rows), p_rows)
        zsum = _vec_add(z1, z2, p_rows)
        zz = _vec_sub(_vec_sub(mul(zsum, zsum), z1z1, p_rows), z2z2, p_rows)
        z3 = mul(zz, h)

        h_zero = _vec_is_zero(h)
        r_zero = _vec_is_zero(r)
        p_inf = _vec_is_zero(z1)
        q_inf = _vec_is_zero(z2)
        use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
        to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

        X = _vec_select(use_dbl, dx, x3)
        Y = _vec_select(use_dbl, dy, y3)
        Z = _vec_select(use_dbl, dz, z3)
        Z = [jnp.where(to_inf, jnp.zeros_like(vv), vv) for vv in Z]
        X = _vec_select(q_inf, x1, _vec_select(p_inf, x2, X))
        Y = _vec_select(q_inf, y1, _vec_select(p_inf, y2, Y))
        Z = _vec_select(q_inf, z1, _vec_select(p_inf, z2, Z))
        store(ox, X)
        store(oy, Y)
        store(oz, Z)

    return stage_a, stage_b


@functools.cache
def _staged_add_fn(p_int: int, n0_int: int, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    stage_a, stage_b = _staged_kernels(p_int, n0_int)
    _, dbl_run = _point_fns(p_int, n0_int, block, interpret)

    def spec():
        return pl.BlockSpec((N_LIMBS, block), lambda i: (0, i))

    def run(x1, y1, z1, x2, y2, z2):
        n = x1.shape[1]
        shp = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        u1, u2, s1, s2, zz1, zz2 = pl.pallas_call(
            stage_a,
            out_shape=(shp,) * 6,
            grid=(n // block,),
            in_specs=[spec() for _ in range(6)],
            out_specs=(spec(),) * 6,
            interpret=interpret,
        )(x1, y1, z1, x2, y2, z2)
        dx, dy, dz = dbl_run(x1, y1, z1)
        return pl.pallas_call(
            stage_b,
            out_shape=(shp,) * 3,
            grid=(n // block,),
            in_specs=[spec() for _ in range(15)],
            out_specs=(spec(),) * 3,
            interpret=interpret,
        )(u1, u2, s1, s2, zz1, zz2, z1, z2, x1, y1, x2, y2, dx, dy, dz)

    return run


def point_add_staged(p_coords, q_coords, p_int: int, n0: int, block: int,
                     interpret: bool):
    arrs, batch_shape, n = _prep(list(p_coords) + list(q_coords), block)
    run = _staged_add_fn(p_int, n0, block, interpret)
    out = run(*arrs)
    return _unprep(list(out), batch_shape, n)


@functools.cache
def _point_fns(p_int: int, n0_int: int, block: int, interpret: bool):
    from jax.experimental import pallas as pl

    add_kernel, dbl_kernel = _point_kernels(p_int, n0_int)

    def spec():
        return pl.BlockSpec((N_LIMBS, block), lambda i: (0, i))

    def add_run(*coords):
        n = coords[0].shape[1]
        shp = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            add_kernel,
            out_shape=(shp, shp, shp),
            grid=(n // block,),
            in_specs=[spec() for _ in range(6)],
            out_specs=(spec(), spec(), spec()),
            interpret=interpret,
        )(*coords)

    def dbl_run(*coords):
        n = coords[0].shape[1]
        shp = jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32)
        return pl.pallas_call(
            dbl_kernel,
            out_shape=(shp, shp, shp),
            grid=(n // block,),
            in_specs=[spec() for _ in range(3)],
            out_specs=(spec(), spec(), spec()),
            interpret=interpret,
        )(*coords)

    return add_run, dbl_run


def _prep(arrs, block):
    """[..., 16] tensors -> transposed [16, n_padded] + restore info."""
    shape = arrs[0].shape
    batch_shape = shape[:-1]
    n = 1
    for d in batch_shape:
        n = n * int(d)
    pad = (-n) % block
    out = []
    for a in arrs:
        a2 = a.reshape(n, N_LIMBS)
        if pad:
            a2 = jnp.concatenate(
                [a2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        out.append(a2.T)
    return out, batch_shape, n


def _unprep(arrs, batch_shape, n):
    return [a.T[:n].reshape(*batch_shape, N_LIMBS) for a in arrs]


def point_add_batch(p_coords, q_coords, p_int: int, n0: int, block: int,
                    interpret: bool):
    """p_coords/q_coords: (x, y, z) tensors [..., 16] -> summed point."""
    arrs, batch_shape, n = _prep(list(p_coords) + list(q_coords), block)
    add_run, _ = _point_fns(p_int, n0, block, interpret)
    out = add_run(*arrs)
    return _unprep(list(out), batch_shape, n)


def point_dbl_batch(p_coords, p_int: int, n0: int, block: int,
                    interpret: bool):
    arrs, batch_shape, n = _prep(list(p_coords), block)
    _, dbl_run = _point_fns(p_int, n0, block, interpret)
    out = dbl_run(*arrs)
    return _unprep(list(out), batch_shape, n)
