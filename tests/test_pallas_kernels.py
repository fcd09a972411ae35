"""Pallas field kernels vs the python oracle (interpret mode on CPU)."""

import pytest

from zksnap_tpu.fields import bn254_fr, secp256k1_fp
from zksnap_tpu.fields.pallas_mont import mont_addsub_batch, mont_mul_batch

FIELDS = [bn254_fr(), secp256k1_fp()]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_pallas_mont_mul(F, rng):
    xs = [0, 1, F.p - 1] + [rng.randrange(F.p) for _ in range(17)]
    ys = [F.p - 1, F.p - 1, F.p - 1] + [rng.randrange(F.p) for _ in range(17)]
    a, b = F.to_mont(xs), F.to_mont(ys)
    got = F.from_mont(mont_mul_batch(a, b, F.p, F.n0))
    assert got == [x * y % F.p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("F", FIELDS, ids=lambda f: f.name)
def test_pallas_add_sub(F, rng):
    xs = [0, F.p - 1, F.p - 1] + [rng.randrange(F.p) for _ in range(17)]
    ys = [F.p - 1, F.p - 1, 0] + [rng.randrange(F.p) for _ in range(17)]
    a, b = F.to_mont(xs), F.to_mont(ys)
    ga = F.from_mont(mont_addsub_batch(a, b, F.p, "add"))
    gs = F.from_mont(mont_addsub_batch(a, b, F.p, "sub"))
    assert ga == [(x + y) % F.p for x, y in zip(xs, ys)]
    assert gs == [(x - y) % F.p for x, y in zip(xs, ys)]


def test_pallas_broadcast(rng):
    F = bn254_fr()
    xs = [rng.randrange(F.p) for _ in range(8)]
    y = rng.randrange(F.p)
    a = F.to_mont(xs)
    b = F.to_mont(y)  # single element broadcast against the batch
    got = F.from_mont(mont_mul_batch(a, b, F.p, F.n0))
    assert got == [x * y % F.p for x in xs]
