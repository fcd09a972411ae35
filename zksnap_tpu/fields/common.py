"""Limb-vector bignum helpers shared by all prime fields.

Representation: a nonnegative integer x < 2^256 is a little-endian vector of
N_LIMBS=16 limbs of LIMB_BITS=16 bits each, stored in a uint32 tensor of shape
[..., 16].  All kernels are shape-static, jit/vmap-safe, and run on the VPU
(elementwise) or MXU (the wide-product convolution matmul).

This is the TPU-native replacement for the fixed-width word arithmetic in
halo2curves (reference: /root/reference uses halo2curves via halo2-base,
voter/src/lib.rs:10-13); instead of 4x64-bit words + ADX carries we use
16x16-bit limbs so products and redundant column sums fit in 32-bit lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_LIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
WIDE_LIMBS = 2 * N_LIMBS  # columns of a 256x256-bit product


# ---------------------------------------------------------------------------
# Host-side conversions (python int <-> limb arrays)
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, n_limbs: int = N_LIMBS) -> np.ndarray:
    """Python int -> little-endian uint32 limb vector."""
    assert 0 <= x < (1 << (LIMB_BITS * n_limbs)), "value out of range"
    return np.array(
        [(x >> (LIMB_BITS * i)) & LIMB_MASK for i in range(n_limbs)],
        dtype=np.uint32,
    )


def limbs_to_int(limbs) -> int:
    """Little-endian limb vector -> python int (host only)."""
    limbs = np.asarray(limbs)
    return sum(int(v) << (LIMB_BITS * i) for i, v in enumerate(limbs.reshape(-1)))


def ints_to_limbs(xs, n_limbs: int = N_LIMBS) -> np.ndarray:
    """List of python ints -> [len(xs), n_limbs] uint32 array."""
    return np.stack([int_to_limbs(x, n_limbs) for x in xs], axis=0)


def ints_to_limbs_fast(xs, modulus: int | None = None) -> np.ndarray:
    """List of python ints -> [len(xs), 16] uint32 limbs via a bytes blit.

    ~10x faster than ints_to_limbs for large lists (one `to_bytes` per int
    instead of 16 python shift/mask ops).  Optionally reduces mod `modulus`
    first.  256-bit values only (n_limbs=16).
    """
    if modulus is None:
        buf = b"".join(x.to_bytes(32, "little") for x in xs)
    else:
        buf = b"".join((x % modulus).to_bytes(32, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), N_LIMBS)
    return arr.astype(np.uint32)


def limbs_to_ints(arr) -> list:
    """[..., n_limbs] -> flat list of python ints over leading dims."""
    arr = np.asarray(arr)
    if arr.shape[-1] == N_LIMBS and arr.ndim >= 2:
        flat = arr.reshape(-1, N_LIMBS)
        if (flat >> LIMB_BITS).max(initial=0) == 0:  # canonical limbs
            buf = flat.astype("<u2").tobytes()
            return [
                int.from_bytes(buf[i * 32 : (i + 1) * 32], "little")
                for i in range(flat.shape[0])
            ]
    flat = arr.reshape(-1, arr.shape[-1])
    return [limbs_to_int(row) for row in flat]


# ---------------------------------------------------------------------------
# Raw (non-modular) limb arithmetic
# ---------------------------------------------------------------------------

def carry_propagate(cols, limb_bits: int = LIMB_BITS):
    """Reduce redundant column sums to canonical limbs.

    cols: uint32 [..., K] little-endian columns, each < 2^31.
    Returns (limbs [..., K] with each < 2^limb_bits, carry [...]) where carry
    is whatever spills past the last column.

    Implemented as a lax.scan over the limb axis (K sequential steps of
    batched vector ops -- K is 16..36, negligible next to the batch dim).
    """
    mask = jnp.uint32((1 << limb_bits) - 1)
    moved = jnp.moveaxis(cols, -1, 0)

    def step(carry, col):
        tot = col + carry
        return tot >> limb_bits, tot & mask

    carry, out = jax.lax.scan(step, jnp.zeros(moved.shape[1:], jnp.uint32), moved)
    return jnp.moveaxis(out, 0, -1), carry


def raw_add(a, b):
    """(a + b) over limb vectors -> (sum limbs [..., L], carry [...])."""
    return carry_propagate(a + b)


def raw_sub(a, b):
    """(a - b) over limb vectors -> (diff limbs [..., L], borrow [...]).

    borrow is 1 where a < b (result then equals a - b + 2^(16L)).
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    ai = jnp.moveaxis(a, -1, 0).astype(jnp.int32)
    bi = jnp.moveaxis(b, -1, 0).astype(jnp.int32)

    def step(borrow, ab):
        x, y = ab
        t = x - y - borrow
        new_borrow = (t < 0).astype(jnp.int32)
        return new_borrow, (t + (new_borrow << LIMB_BITS)).astype(jnp.uint32)

    borrow, out = jax.lax.scan(
        step, jnp.zeros(ai.shape[1:], jnp.int32), (ai, bi)
    )
    return jnp.moveaxis(out, 0, -1), borrow.astype(jnp.uint32)


def limbs_geq(a, b):
    """Lexicographic a >= b over canonical limb vectors -> bool [...]."""
    res = jnp.ones(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), bool)
    n = a.shape[-1]
    # LSB->MSB: later (more significant) differing limb overwrites the verdict.
    for i in range(n):
        ai, bi = a[..., i], b[..., i]
        res = jnp.where(ai > bi, True, jnp.where(ai < bi, False, res))
    return res


def limbs_eq(a, b):
    return jnp.all(a == b, axis=-1)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


# ---------------------------------------------------------------------------
# Wide product via one-hot convolution matmul (MXU path)
# ---------------------------------------------------------------------------

@functools.cache
def _conv_matrix() -> np.ndarray:
    """[2*256, 32] int32 0/1 matrix mapping flattened lo/hi partial products
    to their output column (i+j for lo halves, i+j+1 for hi halves)."""
    m = np.zeros((2 * N_LIMBS * N_LIMBS, WIDE_LIMBS), dtype=np.int32)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            m[i * N_LIMBS + j, i + j] = 1                       # lo half
            m[N_LIMBS * N_LIMBS + i * N_LIMBS + j, i + j + 1] = 1  # hi half
    return m


def mul_wide(a, b):
    """Full 256x256 -> 512-bit product in redundant column form.

    a, b: uint32 [..., 16] canonical limbs (< 2^16 each).
    Returns uint32 [..., 32] column sums, each < 2^21.

    The 256 partial products are split into 16-bit lo/hi halves and summed
    into output columns with a constant 0/1 matrix -- an int32 matmul that
    XLA tiles onto the MXU.  Column sums stay < 2^21 so int32 accumulation
    is exact.
    """
    p = a[..., :, None] * b[..., None, :]  # uint32, exact (16b x 16b)
    lo = (p & LIMB_MASK).astype(jnp.int32)
    hi = (p >> LIMB_BITS).astype(jnp.int32)
    batch = p.shape[:-2]
    flat = jnp.concatenate(
        [lo.reshape(*batch, N_LIMBS * N_LIMBS),
         hi.reshape(*batch, N_LIMBS * N_LIMBS)],
        axis=-1,
    )
    conv = jnp.asarray(_conv_matrix())
    cols = jax.lax.dot_general(
        flat, conv, (((flat.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return cols.astype(jnp.uint32)
