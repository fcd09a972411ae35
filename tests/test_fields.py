"""Field arithmetic vs a python-int oracle (differential testing, mirroring
the reference's native-mirror strategy, SURVEY.md section 4)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zksnap_tpu.fields import (
    N_LIMBS,
    bn254_fq,
    bn254_fr,
    ints_to_limbs,
    limbs_to_ints,
    secp256k1_fp,
    secp256k1_fq,
)

FIELDS = [bn254_fr(), bn254_fq(), secp256k1_fp(), secp256k1_fq()]


def rand_elems(rng, F, n):
    return [rng.randrange(F.p) for _ in range(n)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(F, rng):
    xs = [0, 1, F.p - 1] + rand_elems(rng, F, 13)
    m = F.to_mont(xs)
    back = F.from_mont(m)
    assert back == xs


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(F, rng):
    xs = [0, 1, F.p - 1] + rand_elems(rng, F, 29)
    ys = [F.p - 1, 0, F.p - 1] + rand_elems(rng, F, 29)
    a, b = F.to_mont(xs), F.to_mont(ys)
    assert F.from_mont(F.add(a, b)) == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert F.from_mont(F.sub(a, b)) == [(x - y) % F.p for x, y in zip(xs, ys)]
    assert F.from_mont(F.neg(a)) == [(-x) % F.p for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_mul(F, rng):
    xs = [0, 1, F.p - 1, F.p - 1] + rand_elems(rng, F, 28)
    ys = [F.p - 1, F.p - 1, F.p - 1, 1] + rand_elems(rng, F, 28)
    a, b = F.to_mont(xs), F.to_mont(ys)
    assert F.from_mont(F.mul(a, b)) == [(x * y) % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_square_pow(F, rng):
    xs = rand_elems(rng, F, 8)
    a = F.to_mont(xs)
    assert F.from_mont(F.square(a)) == [x * x % F.p for x in xs]
    e = 0xDEADBEEFCAFE
    assert F.from_mont(F.pow_const(a, e)) == [pow(x, e, F.p) for x in xs]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_inv(F, rng):
    xs = [1, F.p - 1] + rand_elems(rng, F, 6)
    a = F.to_mont(xs)
    assert F.from_mont(F.inv(a)) == [pow(x, -1, F.p) for x in xs]


@pytest.mark.parametrize("F", [bn254_fr(), secp256k1_fp()], ids=lambda f: f.name)
def test_batch_inv(F, rng):
    xs = [1, 0, F.p - 1] + rand_elems(rng, F, 13)
    a = F.to_mont(xs)
    got = F.from_mont(F.batch_inv(a))
    want = [pow(x, -1, F.p) if x else 0 for x in xs]
    assert got == want


def test_select_eq(rng):
    F = bn254_fr()
    xs = rand_elems(rng, F, 4)
    a = F.to_mont(xs)
    b = F.to_mont(list(reversed(xs)))
    cond = jnp.array([True, False, True, False])
    got = F.from_mont(F.select(cond, a, b))
    want = [xs[0], xs[2], xs[2], xs[0]]
    assert got == want
    assert list(np.asarray(F.eq(a, a))) == [True] * 4


def test_two_adicity():
    assert bn254_fr().two_adicity == 28
    assert (bn254_fr().p - 1) % (1 << 28) == 0


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_vmap_and_2d_batches(F, rng):
    xs = rand_elems(rng, F, 12)
    ys = rand_elems(rng, F, 12)
    a = F.to_mont(xs).reshape(3, 4, N_LIMBS)
    b = F.to_mont(ys).reshape(3, 4, N_LIMBS)
    out = F.mul(a, b)
    got = limbs_to_ints(np.asarray(F.mont_reduce_narrow(out)))
    assert got == [x * y % F.p for x, y in zip(xs, ys)]
