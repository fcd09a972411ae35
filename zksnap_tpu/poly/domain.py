"""Radix-2 evaluation domains over BN254 Fr.

TPU-native equivalent of halo2_proofs' `EvaluationDomain` (used by keygen /
create_proof at every commit/quotient step, see SURVEY.md L1 and
aggregator/src/wrapper.rs:129-137 call stack).  BN254 Fr has 2-adicity 28
(generator 7), so domains up to 2^28 exist; the reference uses k=13..22.

Twiddle tables are COMPUTED ON DEVICE by repeated doubling (log n batched
multiplies) instead of being uploaded from the host: powers[0:2] = [1, w],
then powers[2^s:2^(s+1)] = powers[0:2^s] * w^(2^s).  This keeps hundreds of
MB of twiddles out of host->device traffic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.field import PrimeField, bn254_fr


class Domain:
    """Multiplicative subgroup of order 2^k with generator omega."""

    def __init__(self, F: PrimeField, k: int):
        assert k <= F.two_adicity
        self.F = F
        self.k = k
        self.n = 1 << k
        # omega = g^((p-1)/2^k) over python ints
        self.omega = pow(F.generator, (F.p - 1) >> k, F.p)
        self.omega_inv = pow(self.omega, -1, F.p)
        self.n_inv = pow(self.n, -1, F.p)

    # -- device twiddle tables ---------------------------------------------

    def powers_of(self, w_int: int, count_log2: int):
        """Device table [2^count_log2, 16] of w^i in Montgomery form."""
        F = self.F
        w = jnp.asarray(F.const(w_int))

        @jax.jit
        def build(w):
            if count_log2 == 0:
                return jnp.asarray(F.one)[None, :]
            powers = jnp.concatenate([jnp.asarray(F.one)[None, :], w[None, :]])
            for s in range(1, count_log2):
                # multiplier = w^(2^s) = powers[-1] * w ... use powers[2^s - ... ]
                mult = F.mul(powers[-1], w)  # w^(2^s)
                powers = jnp.concatenate([powers, F.mul(powers, mult)])
            return powers

        return build(w)

    @functools.cached_property
    def twiddles(self):
        """[n/2, 16] omega^i for i < n/2 (device, Montgomery)."""
        if self.k == 0:
            return jnp.asarray(self.F.one)[None, :]
        return self.powers_of(self.omega, self.k - 1)

    @functools.cached_property
    def twiddles_inv(self):
        if self.k == 0:
            return jnp.asarray(self.F.one)[None, :]
        return self.powers_of(self.omega_inv, self.k - 1)

    # -- host helpers -------------------------------------------------------

    def omega_powers_host(self, count: int) -> list[int]:
        out, cur = [], 1
        for _ in range(count):
            out.append(cur)
            cur = cur * self.omega % self.F.p
        return out


@functools.cache
def domain(k: int, field_name: str = "bn254_fr") -> Domain:
    assert field_name == "bn254_fr"
    return Domain(bn254_fr(), k)
