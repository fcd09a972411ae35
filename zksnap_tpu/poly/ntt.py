"""Number-theoretic transform over BN254 Fr: single-chip and mesh-sharded.

TPU-native replacement for halo2_proofs' FFT (`best_fft`, the prover hot
loop together with MSM -- SURVEY.md section 3.2: quotient construction at
2^15..2^22 sizes).

Single chip: iterative radix-2 decimation-in-time with a bit-reversal
gather and one vectorized butterfly per stage (k stages, each a full-width
mul/add/sub over [n/2, 16] limb tensors).

Multi chip: four-step NTT -- view the length-n vector as an n1 x n2 matrix
sharded by rows; column NTTs are local, a twiddle scale, then an all_to_all
transpose over the mesh axis, then row NTTs (SURVEY.md section 2.3: the
domain axis is this framework's "sequence parallelism").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import PrimeField
from .domain import Domain, domain


@functools.cache
def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _ntt_impl(x, twiddles, k: int, F: PrimeField):
    """x: [n, 16] coefficients -> [n, 16] evaluations (natural order).

    twiddles: [n/2, 16] table of omega^i.
    """
    n = 1 << k
    x = x[jnp.asarray(_bitrev_perm(k))]
    for s in range(k):
        m = 1 << s          # half-block
        nb = n >> (s + 1)   # number of blocks
        xb = x.reshape(nb, 2, m, 16)
        u = xb[:, 0]
        # twiddle for position j in block: omega^(j * n/(2m)) = twiddles[j << (k-1-s)]
        w = twiddles[:: (n // 2) // m] if m > 1 else twiddles[:1]
        t = F.mul(xb[:, 1], w[None, :, :])
        x = jnp.concatenate([F.add(u, t), F.sub(u, t)], axis=1).reshape(n, 16)
    return x


class NTT:
    """Jit-compiled NTT/iNTT for one domain size."""

    def __init__(self, dom: Domain):
        self.dom = dom
        self.F = dom.F
        self.k = dom.k

    @functools.cached_property
    def _fwd(self):
        F, k = self.F, self.k
        return jax.jit(lambda x, tw: _ntt_impl(x, tw, k, F))

    @functools.cached_property
    def _n_inv_mont(self):
        return np.asarray(self.F.const(self.dom.n_inv))

    def forward(self, x):
        """Coefficients -> evaluations on the domain (natural order)."""
        return self._fwd(x, self.dom.twiddles)

    def inverse(self, y):
        """Evaluations -> coefficients."""
        F = self.F
        x = self._fwd(y, self.dom.twiddles_inv)
        return self._scale(x)

    @functools.cached_property
    def _scale(self):
        F = self.F
        n_inv = self._n_inv_mont
        return jax.jit(lambda x: F.mul(x, jnp.asarray(n_inv)[None, :]))


@functools.cache
def ntt(k: int) -> NTT:
    return NTT(domain(k))


# ---------------------------------------------------------------------------
# Mesh-sharded four-step NTT
# ---------------------------------------------------------------------------

def four_step_input_perm(k: int, ndev: int) -> np.ndarray:
    """Gather indices putting x into the cyclic layout four_step_ntt expects:
    device d must hold x[d], x[d + n1], ..., x[d + (n2-1)*n1]."""
    n, n1 = 1 << k, ndev
    n2 = n // n1
    i = np.arange(n)
    return (i % n2) * n1 + i // n2  # x_prepared[d*n2 + j] = x[d + n1*j]


def four_step_output_perm(k: int, ndev: int) -> np.ndarray:
    """Gather indices mapping four_step_ntt's output (concatenated over
    devices) back to natural evaluation order: natural[X] = out[perm[X]]."""
    n, n1 = 1 << k, ndev
    n2 = n // n1
    chunk = n2 // n1  # t2-values per device after the transpose
    X = np.arange(n)
    t1, t2 = X // n2, X % n2
    d, r = t2 // chunk, t2 % chunk
    return d * n2 + t1 * chunk + r


def four_step_ntt(x, k: int, mesh, axis: str = "x", inverse: bool = False):
    """Distributed NTT of size n = 2^k over `mesh` (1-d axis `axis`).

    x: [n, 16] in the cyclic layout of `four_step_input_perm` (device d gets
    the residue-class d elements).  Returns the permuted evaluation layout
    undone by `four_step_output_perm`.

    `inverse=True` runs the transform with omega^-1 throughout (the caller
    scales by n^-1), so iNTTs shard the same way.

    Math (s = i1 + n1*i2, t = t2 + n2*t1):
      X[t2 + n2 t1] = sum_i1 (w^(i1 t2) * NTT_n2(x[i1 + n1*.])[t2]) * (w^n2)^(i1 t1)
    i.e. local length-n2 NTTs -> twiddle scale by w^(i1*t2) -> all_to_all
    transpose (the single ICI exchange) -> local length-n1 NTTs.
    """
    return _four_step_fn(k, mesh, axis, inverse)(x)


@functools.lru_cache(maxsize=64)
def _four_step_fn(k: int, mesh, axis: str, inverse: bool):
    """One compiled program per (k, mesh, axis, direction) -- building the
    shard_map closure per call would retrace every invocation."""
    from jax.sharding import PartitionSpec as P

    F = domain(k).F
    ndev = mesh.shape[axis]
    n = 1 << k
    assert n % ndev == 0 and (ndev & (ndev - 1)) == 0
    k1 = ndev.bit_length() - 1
    k2 = k - k1
    n1, n2 = ndev, n >> k1
    assert n2 % n1 == 0, "need n/ndev^2 >= 1"

    d2, d1 = domain(k2), (domain(k1) if k1 > 0 else None)
    tw2 = np.asarray(jax.device_get(
        d2.twiddles_inv if inverse else d2.twiddles))
    tw1 = (np.asarray(jax.device_get(
        d1.twiddles_inv if inverse else d1.twiddles)) if k1 > 0 else None)
    omega = domain(k).omega
    if inverse:
        omega = pow(omega, -1, F.p)

    def local(xs):
        # xs: [n2, 16] = x[i1 + n1*i2] for our i1 = mesh position.
        i1 = jax.lax.axis_index(axis)
        y = _ntt_impl(xs, jnp.asarray(tw2), k2, F)          # over t2
        base = _omega_pow(F, omega, i1)                      # w^i1
        pw = _powers_device(F, base, k2)                     # w^(i1*t2)
        y = F.mul(y, pw)
        # transpose: device j collects t2-chunk j from every i1
        y = y.reshape(n1, n2 // n1, 16)
        y = jax.lax.all_to_all(y, axis, 0, 0, tiled=False)   # [n1(i1), chunk, 16]
        if k1 > 0:
            z = jnp.moveaxis(y, 0, 1)                        # [chunk, n1, 16]
            z = jax.vmap(lambda v: _ntt_impl(v, jnp.asarray(tw1), k1, F))(z)
            y = jnp.moveaxis(z, 1, 0)                        # [n1(t1), chunk, 16]
        return y.reshape(n2, 16)

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,  # scan carries start unvarying; skip vma typing
    )
    jf = jax.jit(sharded)

    def run(x):
        with jax.set_mesh(mesh):
            return jf(x)

    return run


def _omega_pow(F: PrimeField, omega_int: int, e):
    """omega^e for a traced nonnegative int e (32-bit binary decomposition)."""
    result = jnp.broadcast_to(jnp.asarray(F.one), (16,))
    base_int = omega_int
    p = F.p
    for bit in range(32):
        take = ((e >> bit) & 1).astype(bool)
        base = jnp.asarray(F.const(base_int))
        result = jnp.where(take, F.mul(result, base), result)
        base_int = base_int * base_int % p
    return result


def _powers_device(F: PrimeField, base, count_log2: int):
    """[2^count_log2, 16] powers 1, b, b^2, ... of a traced base value."""
    if count_log2 == 0:
        return jnp.asarray(F.one)[None, :]
    powers = jnp.concatenate([jnp.asarray(F.one)[None, :], base[None, :]])
    for s in range(1, count_log2):
        mult = F.mul(powers[-1], base)
        powers = jnp.concatenate([powers, F.mul(powers, mult)])
    return powers
