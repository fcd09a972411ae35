"""NTT: single-chip vs naive DFT oracle; inverse roundtrip; sharded
four-step NTT on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zksnap_tpu.fields import bn254_fr
from zksnap_tpu.poly.domain import domain
from zksnap_tpu.poly.ntt import (
    four_step_input_perm,
    four_step_ntt,
    four_step_output_perm,
    ntt,
)

F = bn254_fr()


def naive_dft(coeffs, k):
    d = domain(k)
    n = 1 << k
    return [
        sum(c * pow(d.omega, i * j, F.p) for j, c in enumerate(coeffs)) % F.p
        for i in range(n)
    ]


def test_domain_roots():
    d = domain(4)
    assert pow(d.omega, 16, F.p) == 1
    assert pow(d.omega, 8, F.p) != 1
    assert d.omega * d.omega_inv % F.p == 1


def test_twiddle_table():
    d = domain(5)
    tw = F.from_mont(d.twiddles)
    assert tw == [pow(d.omega, i, F.p) for i in range(16)]


@pytest.mark.parametrize("k", [1, 2, 4, 6])
def test_ntt_matches_naive(k, rng):
    n = 1 << k
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    x = F.to_mont(coeffs)
    got = F.from_mont(ntt(k).forward(x))
    assert got == naive_dft(coeffs, k)


@pytest.mark.parametrize("k", [3, 7])
def test_ntt_roundtrip(k, rng):
    n = 1 << k
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    x = F.to_mont(coeffs)
    t = ntt(k)
    back = F.from_mont(t.inverse(t.forward(x)))
    assert back == coeffs


def test_four_step_matches_single(rng):
    k = 9
    ndev = 8
    mesh = jax.make_mesh((ndev,), ("x",))
    n = 1 << k
    coeffs = [rng.randrange(F.p) for _ in range(n)]
    x = np.asarray(jax.device_get(F.to_mont(coeffs)))
    x_prep = jnp.asarray(x[four_step_input_perm(k, ndev)])
    out = four_step_ntt(x_prep, k, mesh)
    out_natural = np.asarray(jax.device_get(out))[four_step_output_perm(k, ndev)]
    single = np.asarray(jax.device_get(ntt(k).forward(jnp.asarray(x))))
    assert np.array_equal(out_natural, single)
