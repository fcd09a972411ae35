"""Fused Pallas point-addition kernels (the MSM hot path).

One kernel call per batched group op instead of ~30 field-kernel
launches: the entire add formula (every Montgomery mul, the carry
chains, the completeness selects) runs out of VMEM.  This is the fix
for round 1's MSM bottleneck (VERDICT.md "What's weak" #1): the fused
add there was a fully-unrolled per-limb-row body (~50k ops) that
wedged the Mosaic compiler; here every field op works on stacked
[16, W] tiles with static pad-shifts instead of per-row lists, which
measured ~0.75 s compile and ~0.5 ms runtime per dependent mul at
2^18 lanes (scripts/exp_mul_variants.py on v5e).

Kernels (all complete group laws, branchless selects):
  * jac_madd  -- Jacobian += {affine | identity}; madd-2007-bl + fused
                 dbl-2009-l fallback (~17 muls).  Used by the Pippenger
                 bucket-accumulation scan where the streamed operand is
                 always an (affine) base point.
  * jac_add   -- Jacobian + Jacobian; add-2007-bl + dbl fallback
                 (~21 muls).  Used by bucket/window reductions.
  * jac_dbl   -- dbl-2009-l (~7 muls).

Replaces the group-op inner loops of halo2curves / halo2_proofs
`best_multiexp` (SURVEY.md section 2.2 rows 1-2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.common import LIMB_BITS, LIMB_MASK, N_LIMBS, int_to_limbs

_MASK = np.uint32(LIMB_MASK)
_NROWS = 2 * N_LIMBS + 1


# --------------------------------------------------------------------------
# In-kernel field helpers.  All values are [16, W] uint32 canonical
# Montgomery limb stacks (limb index on the sublane axis).
# --------------------------------------------------------------------------

def _shifted(rows, i):
    """Pad [16, W] rows into [_NROWS, W] so row j lands at row i+j."""
    return jnp.pad(rows, ((i, _NROWS - N_LIMBS - i), (0, 0)))


def _cond_sub_p(out_rows, ge_extra, p_rows):
    """Subtract p from the 16 row-vectors where (ge_extra | rows >= p)."""
    eq = jnp.ones_like(ge_extra)
    gt = jnp.zeros_like(ge_extra)
    for i in range(N_LIMBS - 1, -1, -1):
        gt = gt | (eq & (out_rows[i] > p_rows[i]))
        eq = eq & (out_rows[i] == p_rows[i])
    ge = ge_extra | gt | eq
    borrow = jnp.zeros_like(out_rows[0])
    res = []
    for i in range(N_LIMBS):
        t = out_rows[i] - p_rows[i] - borrow
        nb = (t >> 31) & 1
        res.append(jnp.where(ge, (t + (nb << LIMB_BITS)) & _MASK, out_rows[i]))
        borrow = nb
    return jnp.stack(res)


class _FieldK:
    """Field ops for use inside a Pallas kernel body.

    `lazy=True` switches to LAZY Montgomery arithmetic: all values live in
    [0, 2p) instead of [0, p).  Products skip the final conditional
    subtract entirely (for p < 2^254, inputs < 2p give T = a*b < 4p^2 <
    R*p, so REDC(T) < 2p with a provably-zero top carry -- the classic
    "Montgomery without final subtraction" bound); adds reduce against 2p
    and subs add back 2p, both the same cost as their canonical forms.
    Net: one ~100-op conditional subtract saved per multiply, ~25% of the
    point-add kernel body.  Downstream consumers stay correct because
    every value is still the right residue mod p; only raw-limb equality
    and is_zero tests must see canonical values (the point kernels only
    apply is_zero to canonical STREAM inputs, and the host boundary
    `from_mont` reduces mod p).
    """

    def __init__(self, p_col, p_limbs: np.ndarray, n0: int,
                 lazy: bool = False):
        self.p_col = p_col                    # [16, 1] traced (kernel input)
        self.p_rows = [np.uint32(v) for v in p_limbs]
        self.n0 = np.uint32(n0)
        if lazy:
            # the no-final-subtraction bound needs 4p < 2^256; for wider
            # moduli (secp256k1's 2^256-ish p) fall back to canonical form
            p_int = sum(int(v) << (LIMB_BITS * i)
                        for i, v in enumerate(p_limbs))
            lazy = p_int < 1 << 254
            if lazy:
                p2 = 2 * p_int
                self.p2_rows = [
                    np.uint32((p2 >> (LIMB_BITS * i)) & LIMB_MASK)
                    for i in range(N_LIMBS)]
        self.lazy = lazy

    def mul(self, a, b):
        """Montgomery product; canonical (< p), or < 2p in lazy mode.

        CIOS (coarsely integrated operand scanning): product and
        reduction interleave in ONE 16-step pass over a sliding [17, W]
        window -- each step adds a_i*b and m*p into the window, retires
        the (now ≡ 0 mod 2^16) head column, and shifts.  Roughly half
        the stacked-tile ops of the previous separate conv + REDC over
        a static [33, W] frame (the window rows stay < 2^22: ≤ 4
        sub-2^16 addends per row per step over ≤ 16 steps + retire
        carries, so uint32 never overflows)."""
        W = a.shape[1]
        rows = N_LIMBS + 1  # 17-row window

        def win(x, off):
            # pad [16, W] contributions into the window at row offset off
            return jnp.pad(x, ((off, rows - N_LIMBS - off), (0, 0)))

        t = jnp.zeros((rows, W), jnp.uint32)
        for i in range(N_LIMBS):
            prod = a[i][None, :] * b
            t = t + win(prod & _MASK, 0) + win(prod >> LIMB_BITS, 1)
            m = (t[0] * self.n0) & _MASK
            mp = m[None, :] * self.p_col
            t = t + win(mp & _MASK, 0) + win(mp >> LIMB_BITS, 1)
            # head ≡ 0 mod 2^16: carry it into the next column and shift
            head_carry = (t[0] >> LIMB_BITS)[None, :]
            t = jnp.concatenate(
                [t[1:2] + head_carry, t[2:], jnp.zeros((1, W), jnp.uint32)])
        carry = jnp.zeros_like(t[0])
        out = []
        for i in range(N_LIMBS):
            tot = t[i] + carry
            out.append(tot & _MASK)
            carry = tot >> LIMB_BITS
        if self.lazy:
            # result < 2p < 2^256: the top carry is provably zero
            return jnp.stack(out)
        return _cond_sub_p(out, (carry + t[N_LIMBS]) > 0, self.p_rows)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        carry = jnp.zeros_like(a[0])
        s = []
        for i in range(N_LIMBS):
            tot = a[i] + b[i] + carry
            s.append(tot & _MASK)
            carry = tot >> LIMB_BITS
        if self.lazy:
            # sum < 4p; reducing against 2p keeps the invariant < 2p
            return _cond_sub_p(s, carry > 0, self.p2_rows)
        return _cond_sub_p(s, carry > 0, self.p_rows)

    def dbl(self, a):
        return self.add(a, a)

    def sub(self, a, b):
        borrow = jnp.zeros_like(a[0])
        d = []
        for i in range(N_LIMBS):
            t = a[i] - b[i] - borrow
            nb = (t >> 31) & 1
            d.append((t + (nb << LIMB_BITS)) & _MASK)
            borrow = nb
        under = borrow > 0
        mod_rows = self.p2_rows if self.lazy else self.p_rows
        carry = jnp.zeros_like(a[0])
        res = []
        for i in range(N_LIMBS):
            tot = d[i] + mod_rows[i] + carry
            res.append(jnp.where(under, tot & _MASK, d[i]))
            carry = tot >> LIMB_BITS
        return jnp.stack(res)

    def is_zero(self, a):
        """-> [W] bool."""
        acc = a[0]
        for i in range(1, N_LIMBS):
            acc = acc | a[i]
        return acc == 0

    def select(self, cond, a, b):
        """cond: [W] bool -> where(cond, a, b) rowwise."""
        return jnp.where(cond[None, :], a, b)


def _small_mul(F: _FieldK, a, c: int):
    """a * c for a small host constant c (double-and-add chain of field
    adds; Montgomery form is linear so plain integer scaling is exact)."""
    assert c >= 1
    acc = None
    run = a
    bits = c
    while bits:
        if bits & 1:
            acc = run if acc is None else F.add(acc, run)
        bits >>= 1
        if bits:
            run = F.dbl(run)
    return acc


def _dbl_body_proj(F: _FieldK, x, y, z, b3: int):
    """RCB 2015 Algorithm 9 (a=0): complete projective doubling, 6 full
    muls + 2 squarings + one b3 chain.  Identity (0:1:0) -> (0:1:0)."""
    t0 = F.sqr(y)
    z3 = F.dbl(F.dbl(F.dbl(t0)))
    t1 = F.mul(y, z)
    t2 = _small_mul(F, F.sqr(z), b3)
    x3 = F.mul(t2, z3)
    y3 = F.add(t0, t2)
    z3 = F.mul(t1, z3)
    t1 = F.dbl(t2)
    t2 = F.add(t1, t2)
    t0 = F.sub(t0, t2)
    y3 = F.add(x3, F.mul(t0, y3))
    x3 = F.dbl(F.mul(t0, F.mul(x, y)))
    return x3, y3, z3


def _add_body_proj(F: _FieldK, x1, y1, z1, x2, y2, z2, mixed: bool, b3: int):
    """RCB 2015 complete projective addition for a=0 curves.

    mixed=False: Algorithm 7 (12 muls) -- complete for ALL inputs incl.
    identities (0:1:0): no selects, no doubling fallback.
    mixed=True: Algorithm 8 (11 muls), assumes Q affine (Z2==1); the one
    exceptional input Q == identity (z2==0 in the stream encoding) is
    fixed up with a single select.  This replaces the Jacobian madd's
    ~17 muls + 7-mul doubling fallback + 4 selects in the Pippenger
    bucket scan (STATUS r2 roadmap item 1)."""
    t0 = F.mul(x1, x2)
    t1 = F.mul(y1, y2)
    if mixed:
        t3 = F.mul(F.add(x2, y2), F.add(x1, y1))
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.add(F.mul(y2, z1), y1)
        y3 = F.add(F.mul(x2, z1), x1)
        t2m = _small_mul(F, z1, b3)
    else:
        t2 = F.mul(z1, z2)
        t3 = F.mul(F.add(x1, y1), F.add(x2, y2))
        t3 = F.sub(t3, F.add(t0, t1))
        t4 = F.mul(F.add(y1, z1), F.add(y2, z2))
        t4 = F.sub(t4, F.add(t1, t2))
        y3 = F.mul(F.add(x1, z1), F.add(x2, z2))
        y3 = F.sub(y3, F.add(t0, t2))
        t2m = _small_mul(F, t2, b3)
    t0_3 = F.add(F.dbl(t0), t0)
    z3 = F.add(t1, t2m)
    t1 = F.sub(t1, t2m)
    y3 = _small_mul(F, y3, b3)
    x3 = F.sub(F.mul(t3, t1), F.mul(t4, y3))
    y3 = F.add(F.mul(t1, z3), F.mul(y3, t0_3))
    z3 = F.add(F.mul(z3, t4), F.mul(t0_3, t3))
    if mixed:
        # Q == identity (stream padding): complete formulas don't cover
        # an affine-encoded identity -- pass P through.
        q_inf = F.is_zero(z2)
        x3 = F.select(q_inf, x1, x3)
        y3 = F.select(q_inf, y1, y3)
        z3 = F.select(q_inf, z1, z3)
    return x3, y3, z3


def _dbl_body(F: _FieldK, x, y, z):
    """dbl-2009-l (a=0).  Identity (z=0) doubles to z=0."""
    A = F.sqr(x)
    B = F.sqr(y)
    C = F.sqr(B)
    t = F.sqr(F.add(x, B))
    D = F.dbl(F.sub(F.sub(t, A), C))
    E = F.add(F.dbl(A), A)
    FF = F.sqr(E)
    X3 = F.sub(FF, F.dbl(D))
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), F.dbl(F.dbl(F.dbl(C))))
    Z3 = F.dbl(F.mul(y, z))
    return X3, Y3, Z3


def _add_body(F: _FieldK, x1, y1, z1, x2, y2, z2, mixed: bool):
    """Complete add.  mixed=True assumes z2 in {0, 1} (affine stream),
    skipping z2^2/z2^3 muls (madd-2007-bl)."""
    z1z1 = F.sqr(z1)
    if mixed:
        u1 = x1
        s1 = y1
        u2 = F.mul(x2, z1z1)
        s2 = F.mul(F.mul(y2, z1), z1z1)
    else:
        z2z2 = F.sqr(z2)
        u1 = F.mul(x1, z2z2)
        u2 = F.mul(x2, z1z1)
        s1 = F.mul(F.mul(y1, z2), z2z2)
        s2 = F.mul(F.mul(y2, z1), z1z1)
    h = F.sub(u2, u1)
    r = F.sub(s2, s1)

    i = F.sqr(F.dbl(h))
    j = F.mul(h, i)
    r2 = F.dbl(r)
    v = F.mul(u1, i)
    x3 = F.sub(F.sub(F.sqr(r2), j), F.dbl(v))
    y3 = F.sub(F.mul(r2, F.sub(v, x3)), F.dbl(F.mul(s1, j)))
    if mixed:
        z3 = F.mul(F.dbl(z1), h)
    else:
        z3 = F.mul(F.sub(F.sub(F.sqr(F.add(z1, z2)), z1z1), z2z2), h)

    dx, dy, dz = _dbl_body(F, x1, y1, z1)

    h_zero = F.is_zero(h)
    r_zero = F.is_zero(r)
    p_inf = F.is_zero(z1)
    q_inf = F.is_zero(z2)

    use_dbl = h_zero & r_zero & ~p_inf & ~q_inf
    to_inf = h_zero & ~r_zero & ~p_inf & ~q_inf

    x = F.select(use_dbl, dx, x3)
    y = F.select(use_dbl, dy, y3)
    z = F.select(use_dbl, dz, z3)
    z = F.select(to_inf, jnp.zeros_like(z), z)
    x = F.select(q_inf, x1, F.select(p_inf, x2, x))
    y = F.select(q_inf, y1, F.select(p_inf, y2, y))
    z = F.select(q_inf, z1, F.select(p_inf, z2, z))
    return x, y, z


# --------------------------------------------------------------------------
# pallas_call plumbing
# --------------------------------------------------------------------------

# On CPU the kernel BODIES run directly as jitted jnp on the stacked
# [16, W] layout (bit-identical math, no Pallas interpreter): the
# interpreter re-lowers the ~3k-op body per distinct width, which makes
# the test suite pathologically slow.  Set ZKSNAP_TPU_PALLAS_INTERP=1 to
# force the true pallas_call-interpret path (plumbing coverage).
_INTERPRET = False


def _use_interpret() -> bool:
    import os

    return ((_INTERPRET or jax.default_backend() == "cpu")
            and os.environ.get("ZKSNAP_TPU_PALLAS_INTERP") == "1")


def _use_direct() -> bool:
    import os

    return (jax.default_backend() == "cpu"
            and os.environ.get("ZKSNAP_TPU_PALLAS_INTERP") != "1")


def _run_body(kind: str, F: _FieldK, arrays, b3: int):
    if kind == "dbl":
        return _dbl_body(F, *arrays)
    if kind == "pdbl":
        return _dbl_body_proj(F, *arrays, b3=b3)
    if kind in ("padd", "pmadd"):
        return _add_body_proj(F, *arrays, mixed=(kind == "pmadd"), b3=b3)
    return _add_body(F, *arrays, mixed=(kind == "madd"))


@functools.cache
def _direct_call(kind: str, p_int: int, n0: int, b3: int = 0):
    """CPU path: the exact kernel body, jitted as plain jnp."""
    p_limbs = int_to_limbs(p_int)

    def run(*arrays):
        p_col = jnp.asarray(p_limbs.reshape(N_LIMBS, 1))
        F = _FieldK(p_col, p_limbs, n0, lazy=bool(b3))
        return _run_body(kind, F, arrays, b3)

    return jax.jit(run)


@functools.cache
def _point_call(kind: str, p_int: int, n0: int, block: int, n: int,
                interpret: bool, b3: int = 0):
    """Jitted pallas_call for one (kind, modulus, width) -- cached so
    eager callers don't re-lower the kernel on every invocation."""
    from jax.experimental import pallas as pl

    p_limbs = int_to_limbs(p_int)
    n_in = 3 if kind in ("dbl", "pdbl") else 6

    def kernel(p_ref, *refs):
        ins, outs = refs[:n_in], refs[n_in:]
        F = _FieldK(p_ref[:, :1], p_limbs, n0, lazy=bool(b3))
        vals = [r[:] for r in ins]
        res = _run_body(kind, F, vals, b3)
        for o, v in zip(outs, res):
            o[:] = v

    spec = pl.BlockSpec((N_LIMBS, block), lambda i: (0, i))
    p_spec = pl.BlockSpec((N_LIMBS, 128), lambda i: (0, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((N_LIMBS, n), jnp.uint32) for _ in range(3))
    inner = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n // block,),
        in_specs=[p_spec] + [spec] * n_in,
        out_specs=(spec,) * 3,
        interpret=interpret,
    )
    p_tile = np.broadcast_to(
        p_limbs.reshape(N_LIMBS, 1), (N_LIMBS, 128)).copy()

    return jax.jit(lambda *arrays: inner(jnp.asarray(p_tile), *arrays))


def _point_fn(kind: str, p_int: int, n0: int, block: int, interpret: bool,
              b3: int = 0):
    def run(*arrays):
        n = arrays[0].shape[1]
        return _point_call(kind, p_int, n0, block, n, interpret, b3)(*arrays)

    return run


def _to_major(arrs, block):
    """[..., 16] leaves -> ([16, n_pad] stacks, batch_shape, n)."""
    shape = jnp.broadcast_shapes(*[a.shape for a in arrs])
    batch_shape = shape[:-1]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    pad = (-n) % block
    out = []
    for a in arrs:
        a2 = jnp.broadcast_to(a, shape).reshape(n, N_LIMBS)
        if pad:
            a2 = jnp.concatenate([a2, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        out.append(a2.T)
    return out, batch_shape, n


def _from_major(arrs, batch_shape, n):
    return tuple(a.T[:n].reshape(*batch_shape, N_LIMBS) for a in arrs)


def _pick_block(n: int) -> int:
    # quantize small widths to one full 128-lane block so eager callers
    # of many tiny widths share a single compiled kernel (n_pad = 128)
    return 1024 if n >= 1024 else 128


def point_add_fused(p, q, p_int: int, n0: int, mixed: bool = False,
                    proj_b3: int = 0):
    """p, q: (x, y, z) tuples of [..., 16] tensors -> fused complete add.

    Jacobian (proj_b3=0): mixed=True requires q.z in {0, one_mont}.
    RCB projective (proj_b3=3b of the curve): complete add; mixed=True
    additionally assumes q affine-or-identity."""
    block = _pick_block(int(np.prod(p[0].shape[:-1]) or 1))
    arrs, bs, n = _to_major([*p, *q], block)
    kind = ("pmadd" if mixed else "padd") if proj_b3 else (
        "madd" if mixed else "add")
    if _use_direct():
        out = _direct_call(kind, p_int, n0, proj_b3)(*arrs)
    else:
        out = _point_fn(kind, p_int, n0, block, _use_interpret(),
                        proj_b3)(*arrs)
    return _from_major(out, bs, n)


def point_dbl_fused(p, p_int: int, n0: int, proj_b3: int = 0):
    block = _pick_block(int(np.prod(p[0].shape[:-1]) or 1))
    arrs, bs, n = _to_major(list(p), block)
    kind = "pdbl" if proj_b3 else "dbl"
    if _use_direct():
        out = _direct_call(kind, p_int, n0, proj_b3)(*arrs)
    else:
        out = _point_fn(kind, p_int, n0, block, _use_interpret(),
                        proj_b3)(*arrs)
    return _from_major(out, bs, n)


# --------------------------------------------------------------------------
# Segmented bucket-accumulation mega-kernel: the whole K-step scan in ONE
# pallas_call.  TPU grid steps run sequentially, so the running per-lane
# accumulator lives in VMEM scratch across steps -- no per-step dispatch,
# transposes, or select glue.  This is the Pippenger hot loop.
# --------------------------------------------------------------------------

@functools.cache
def _bucket_scan_call(p_int: int, n0: int, M: int, K: int, interpret: bool,
                      b3: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)  # mont 1

    def kernel(p_ref, fl_ref, x_ref, y_ref, z_ref, ox_ref, oy_ref, oz_ref,
               ax, ay, az):
        k = pl.program_id(0)

        @pl.when(k == 0)
        def _init():
            # identity: Jacobian (1, 1, 0) / projective (0, 1, 0), in
            # Montgomery form.  Row-by-row scalar fills: jnp consts would
            # be captured constants (disallowed).
            az[:] = jnp.zeros((N_LIMBS, M), jnp.uint32)
            if b3:
                ax[:] = jnp.zeros((N_LIMBS, M), jnp.uint32)
            for i in range(N_LIMBS):
                row = jnp.full((M,), np.uint32(one_rows[i]))
                if not b3:
                    ax[i, :] = row
                ay[i, :] = row

        F = _FieldK(p_ref[:, :1], p_limbs, n0, lazy=bool(b3))
        px, py, pz = x_ref[:], y_ref[:], z_ref[:]
        sx, sy, sz = _run_body("pmadd" if b3 else "madd", F,
                               (ax[:], ay[:], az[:], px, py, pz), b3)
        restart = fl_ref[0, :] != 0  # segment start: accumulator resets
        nx = F.select(restart, px, sx)
        ny = F.select(restart, py, sy)
        nz = F.select(restart, pz, sz)
        ox_ref[:], oy_ref[:], oz_ref[:] = nx, ny, nz
        ax[:], ay[:], az[:] = nx, ny, nz

    spec = pl.BlockSpec((N_LIMBS, M), lambda k: (0, k))
    f_spec = pl.BlockSpec((8, M), lambda k: (0, k))
    p_spec = pl.BlockSpec((N_LIMBS, 128), lambda k: (0, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((N_LIMBS, K * M), jnp.uint32) for _ in range(3))
    # the add body keeps ~30 live [16, M] tiles: ~4.6KB/lane of frame.
    # The default scoped-vmem budget (16MB) caps M at 2048; raising the
    # per-kernel limit lets wider lanes cut the scan step count 4x
    # (v5e has 128MB VMEM; leave headroom for pipelining buffers).
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024))
    inner = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(K,),
        in_specs=[p_spec, f_spec, spec, spec, spec],
        out_specs=(spec,) * 3,
        scratch_shapes=[pltpu.VMEM((N_LIMBS, M), jnp.uint32)] * 3,
        interpret=interpret,
        **params,
    )
    p_tile = np.broadcast_to(
        p_limbs.reshape(N_LIMBS, 1), (N_LIMBS, 128)).copy()

    return jax.jit(
        lambda fl, x, y, z: inner(jnp.asarray(p_tile), fl, x, y, z))


# --------------------------------------------------------------------------
# Weighted-suffix + ladder/tree kernels: the Pippenger POST-scan stages
# (bucket weighting, window combine, final reduction) as in-kernel
# lax.fori loops.  The previous jnp composition dispatched ~50 separate
# point-kernel launches per MSM (suffix rounds, tree halvings, 240
# Horner doublings); measured 84ms of the 185ms 2^16 MSM.  Loop bodies
# stay small (one add/dbl body), so Mosaic compile stays safe.
# --------------------------------------------------------------------------

@functools.cache
def _weighted_suffix_call(p_int: int, n0: int, total: int, B: int,
                          interpret: bool, b3: int):
    """[16, total] window-major flat bucket sums -> double-suffix s2:
    s2[w*B + b] = sum_{b' >= b} (b' - b + 1) * S[w, b'] (window-local)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)
    # block = a multiple of B (window-local rolls must not cross blocks)
    # that divides total; aim for ~8192 lanes per grid step
    mult = max(1, 8192 // B)
    while (total // B) % mult:
        mult -= 1
    block = min(total, B * mult)
    rounds = max(B.bit_length() - 1, 1) if B > 1 else 0

    def kernel(p_ref, x_ref, y_ref, z_ref, ox, oy, oz):
        F = _FieldK(p_ref[:, :1], p_limbs, n0, lazy=bool(b3))
        lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, block), 1) % B
        one_y = jnp.stack(
            [jnp.full((block,), np.uint32(one_rows[i]))
             for i in range(N_LIMBS)])
        zero = jnp.zeros((N_LIMBS, block), jnp.uint32)

        def suffix(st):
            def rnd(r, st):
                x, y, z = st
                d = jnp.int32(1) << r
                valid = lane_b + d < B  # [1, block]
                sx = jnp.where(valid, pltpu.roll(x, -d, axis=1), zero)
                sy = jnp.where(valid, pltpu.roll(y, -d, axis=1), one_y)
                sz = jnp.where(valid, pltpu.roll(z, -d, axis=1), zero)
                return _run_body("padd" if b3 else "add", F,
                                 (x, y, z, sx, sy, sz), b3)

            return jax.lax.fori_loop(0, rounds, rnd, st)

        s1 = suffix((x_ref[:], y_ref[:], z_ref[:]))
        s2 = suffix(s1)
        ox[:], oy[:], oz[:] = s2

    spec = pl.BlockSpec((N_LIMBS, block), lambda i: (0, i))
    p_spec = pl.BlockSpec((N_LIMBS, 128), lambda i: (0, 0))
    out_shape = tuple(
        jax.ShapeDtypeStruct((N_LIMBS, total), jnp.uint32) for _ in range(3))
    params = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024))
    inner = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(total // block,),
        in_specs=[p_spec, spec, spec, spec],
        out_specs=(spec,) * 3,
        interpret=interpret,
        **params,
    )
    p_tile = np.broadcast_to(
        p_limbs.reshape(N_LIMBS, 1), (N_LIMBS, 128)).copy()
    return jax.jit(lambda x, y, z: inner(jnp.asarray(p_tile), x, y, z))


@functools.cache
def _weighted_suffix_direct(p_int: int, n0: int, total: int, B: int,
                            b3: int):
    """CPU mirror of _weighted_suffix_call (jnp.roll, same bodies)."""
    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)
    rounds = max(B.bit_length() - 1, 1) if B > 1 else 0

    def run(x, y, z):
        p_col = jnp.asarray(p_limbs.reshape(N_LIMBS, 1))
        F = _FieldK(p_col, p_limbs, n0, lazy=bool(b3))
        lane_b = (jnp.arange(total) % B)[None, :]
        one_y = jnp.broadcast_to(
            jnp.asarray(one_rows)[:, None], (N_LIMBS, total))
        zero = jnp.zeros((N_LIMBS, total), jnp.uint32)

        def suffix(st):
            def rnd(r, st):
                x, y, z = st
                d = jnp.int32(1) << r
                valid = lane_b + d < B
                sx = jnp.where(valid, jnp.roll(x, -d, axis=1), zero)
                sy = jnp.where(valid, jnp.roll(y, -d, axis=1), one_y)
                sz = jnp.where(valid, jnp.roll(z, -d, axis=1), zero)
                return _run_body("padd" if b3 else "add", F,
                                 (x, y, z, sx, sy, sz), b3)

            return jax.lax.fori_loop(0, rounds, rnd, st)

        return suffix(suffix((x, y, z)))

    return jax.jit(run)


def weighted_suffix_fused(flat, B: int, p_int: int, n0: int, b3: int = 0):
    """flat: (x, y, z) each [total, 16] limb-minor window-major bucket
    sums -> double-suffix s2 in the same layout (see _weighted_suffix_call).
    """
    total = flat[0].shape[0]
    maj = [a.T for a in flat]
    if _use_direct():
        out = _weighted_suffix_direct(p_int, n0, total, B, b3)(*maj)
    else:
        out = _weighted_suffix_call(p_int, n0, total, B,
                                    _use_interpret(), b3)(*maj)
    return tuple(a.T for a in out)


@functools.cache
def _ladder_tree_call(p_int: int, n0: int, c: int, W: int,
                      interpret: bool, b3: int):
    """[16, 128] window sums (lane w < W = window w, rest identity) ->
    [16, 128] whose lane 0 is T = sum_w 2^(c*w) S_w: in-kernel Horner
    ladder (c*(W-1) masked doublings) + masked suffix tree."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)
    LW = 128

    def kernel(p_ref, x_ref, y_ref, z_ref, ox, oy, oz):
        F = _FieldK(p_ref[:, :1], p_limbs, n0, lazy=bool(b3))
        widx = jax.lax.broadcasted_iota(jnp.int32, (1, LW), 1)
        one_y = jnp.stack(
            [jnp.full((LW,), np.uint32(one_rows[i])) for i in range(N_LIMBS)])
        zero = jnp.zeros((N_LIMBS, LW), jnp.uint32)

        def ladder(i, st):
            x, y, z = st
            dx, dy, dz = _run_body("pdbl" if b3 else "dbl", F, (x, y, z), b3)
            need = (widx * c) > i  # [1, LW]
            return (jnp.where(need, dx, x), jnp.where(need, dy, y),
                    jnp.where(need, dz, z))

        st = jax.lax.fori_loop(0, c * (W - 1), ladder,
                               (x_ref[:], y_ref[:], z_ref[:]))

        def tree(r, st):
            x, y, z = st
            d = jnp.int32(1) << r
            valid = widx + d < LW
            sx = jnp.where(valid, pltpu.roll(x, -d, axis=1), zero)
            sy = jnp.where(valid, pltpu.roll(y, -d, axis=1), one_y)
            sz = jnp.where(valid, pltpu.roll(z, -d, axis=1), zero)
            return _run_body("padd" if b3 else "add", F,
                             (x, y, z, sx, sy, sz), b3)

        st = jax.lax.fori_loop(0, 7, tree, st)
        ox[:], oy[:], oz[:] = st

    out_shape = tuple(
        jax.ShapeDtypeStruct((N_LIMBS, LW), jnp.uint32) for _ in range(3))
    inner = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        interpret=interpret,
    )
    p_tile = np.broadcast_to(
        p_limbs.reshape(N_LIMBS, 1), (N_LIMBS, 128)).copy()
    return jax.jit(lambda x, y, z: inner(jnp.asarray(p_tile), x, y, z))


@functools.cache
def _ladder_tree_direct(p_int: int, n0: int, c: int, W: int, b3: int):
    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)
    LW = 128

    def run(x, y, z):
        p_col = jnp.asarray(p_limbs.reshape(N_LIMBS, 1))
        F = _FieldK(p_col, p_limbs, n0, lazy=bool(b3))
        widx = jnp.arange(LW)[None, :]
        one_y = jnp.broadcast_to(jnp.asarray(one_rows)[:, None],
                                 (N_LIMBS, LW))
        zero = jnp.zeros((N_LIMBS, LW), jnp.uint32)

        def ladder(i, st):
            xx, yy, zz = st
            dx, dy, dz = _run_body("pdbl" if b3 else "dbl", F,
                                   (xx, yy, zz), b3)
            need = (widx * c) > i
            return (jnp.where(need, dx, xx), jnp.where(need, dy, yy),
                    jnp.where(need, dz, zz))

        st = jax.lax.fori_loop(0, c * (W - 1), ladder, (x, y, z))

        def tree(r, st):
            xx, yy, zz = st
            d = jnp.int32(1) << r
            valid = widx + d < LW
            sx = jnp.where(valid, jnp.roll(xx, -d, axis=1), zero)
            sy = jnp.where(valid, jnp.roll(yy, -d, axis=1), one_y)
            sz = jnp.where(valid, jnp.roll(zz, -d, axis=1), zero)
            return _run_body("padd" if b3 else "add", F,
                             (xx, yy, zz, sx, sy, sz), b3)

        return jax.lax.fori_loop(0, 7, tree, st)

    return jax.jit(run)


def ladder_tree_fused(wsums, c: int, W: int, p_int: int, n0: int,
                      b3: int = 0):
    """wsums: (x, y, z) each [W, 16] -> single combined point
    ((x, y, z) each [16]): T = sum_w 2^(c*w) S_w."""
    pad = 128 - W
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)
    xs = jnp.pad(wsums[0], ((0, pad), (0, 0))).T
    ys = jnp.concatenate(
        [wsums[1], jnp.broadcast_to(jnp.asarray(one_rows),
                                    (pad, N_LIMBS))]).T
    zs = jnp.pad(wsums[2], ((0, pad), (0, 0))).T
    if _use_direct():
        out = _ladder_tree_direct(p_int, n0, c, W, b3)(xs, ys, zs)
    else:
        out = _ladder_tree_call(p_int, n0, c, W, _use_interpret(),
                                b3)(xs, ys, zs)
    return tuple(a[:, 0] for a in out)


@functools.cache
def _bucket_scan_direct(p_int: int, n0: int, M: int, K: int, b3: int = 0):
    """CPU path: lax.scan with the exact kernel step body."""
    p_limbs = int_to_limbs(p_int)
    one_rows = int_to_limbs((1 << (LIMB_BITS * N_LIMBS)) % p_int)

    def run(fl, x, y, z):
        p_col = jnp.asarray(p_limbs.reshape(N_LIMBS, 1))
        F = _FieldK(p_col, p_limbs, n0, lazy=bool(b3))

        def to_k(a):  # [16, K*M] -> [K, 16, M]
            return jnp.moveaxis(a.reshape(N_LIMBS, K, M), 1, 0)

        def step(acc, inp):
            ax, ay, az = acc
            px, py, pz, f = inp
            sx, sy, sz = _run_body("pmadd" if b3 else "madd", F,
                                   (ax, ay, az, px, py, pz), b3)
            restart = f != 0
            nx = F.select(restart, px, sx)
            ny = F.select(restart, py, sy)
            nz = F.select(restart, pz, sz)
            return (nx, ny, nz), (nx, ny, nz)

        one_col = jnp.broadcast_to(
            jnp.asarray(one_rows)[:, None], (N_LIMBS, M))
        init = (jnp.zeros((N_LIMBS, M), jnp.uint32) if b3 else one_col,
                one_col,
                jnp.zeros((N_LIMBS, M), jnp.uint32))
        fk = fl[0].reshape(K, M)
        _, (ox, oy, oz) = jax.lax.scan(
            step, init, (to_k(x), to_k(y), to_k(z), fk))
        # [K, 16, M] -> [16, K*M]
        return tuple(jnp.moveaxis(a, 0, 1).reshape(N_LIMBS, K * M)
                     for a in (ox, oy, oz))

    return jax.jit(run)


def bucket_scan_fused(pts_sorted, flags, M: int, K: int, p_int: int, n0: int,
                      b3: int = 0):
    """Segmented mixed-add scan over the sorted point stream.

    pts_sorted: (x, y, z) each [n_pad, 16] limb-minor, sorted by bucket id,
        n_pad == M * K, z in {0, mont 1}.  Lane l owns positions
        [l*K, (l+1)*K); step k processes position l*K + k of every lane.
    flags: [n_pad] bool, True where a new segment starts.
    Returns (x, y, z) each [K, M, 16]: the running lane-local sums.
    """
    def km_major(a):
        # [M*K, 16] -> [16, K*M] with block k at columns [k*M, (k+1)*M)
        return a.reshape(M, K, N_LIMBS).transpose(2, 1, 0).reshape(
            N_LIMBS, K * M)

    fl = flags.astype(jnp.uint32).reshape(M, K).T.reshape(1, K * M)
    fl = jnp.pad(fl, ((0, 7), (0, 0)))
    if _use_direct():
        out = _bucket_scan_direct(p_int, n0, M, K, b3)(
            fl, *[km_major(a) for a in pts_sorted])
    else:
        out = _bucket_scan_call(p_int, n0, M, K, _use_interpret(), b3)(
            fl, *[km_major(a) for a in pts_sorted])
    return tuple(
        a.reshape(N_LIMBS, K, M).transpose(1, 2, 0) for a in out)
