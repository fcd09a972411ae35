"""Poseidon: grain constants sanity, native sponge semantics, and
native-vs-device differential tests."""

import numpy as np

from zksnap_tpu.fields import bn254_fr
from zksnap_tpu.hash import (
    PoseidonNative,
    default_spec,
    hash_fixed_batched,
    hash_fixed_native,
)
from zksnap_tpu.hash.grain import generate_poseidon_params

F = bn254_fr()


def test_grain_constants_shape_and_range():
    rc, mds, mds_inv = generate_poseidon_params(F.p, 3, 2, 8, 57)
    assert len(rc) == 65 and all(len(row) == 3 for row in rc)
    assert all(0 <= c < F.p for row in rc for c in row)
    # constants should be "random-looking": no repeats
    flat = [c for row in rc for c in row]
    assert len(set(flat)) == len(flat)
    # MDS * MDS^-1 == I
    for i in range(3):
        for j in range(3):
            v = sum(mds[i][k] * mds_inv[k][j] for k in range(3)) % F.p
            assert v == (1 if i == j else 0)


def test_permutation_changes_state_and_deterministic():
    spec = default_spec()
    s1 = spec.permute_native([1, 2, 3])
    s2 = spec.permute_native([1, 2, 3])
    assert s1 == s2
    assert s1 != [1, 2, 3]
    assert all(0 <= v < F.p for v in s1)


def test_sponge_rate_schedule():
    # hashing [a, b] (one full chunk) != hashing [a] then [b] in two updates?
    # both must be equal: update buffers across calls.
    h1 = PoseidonNative()
    h1.update([5, 6])
    o1 = h1.squeeze_and_reset()
    h2 = PoseidonNative()
    h2.update([5])
    h2.update([6])
    o2 = h2.squeeze_and_reset()
    assert o1 == o2
    # and distinct from the 1-element hash
    assert o1 != hash_fixed_native([5])


def test_padding_distinguishes_lengths():
    assert hash_fixed_native([7]) != hash_fixed_native([7, 0])
    assert hash_fixed_native([]) != hash_fixed_native([0])


def test_device_matches_native(rng):
    spec = default_spec()
    for n in (1, 2, 3, 4, 5, 6):
        batch = 3
        vals = [[rng.randrange(F.p) for _ in range(n)] for _ in range(batch)]
        flat = [v for row in vals for v in row]
        dev_in = F.to_mont(flat).reshape(batch, n, 16)
        out = hash_fixed_batched(dev_in, spec)
        got = F.from_mont(out)
        want = [hash_fixed_native(row) for row in vals]
        assert got == want, f"n={n}"


def test_device_permutation_matches_native(rng):
    spec = default_spec()
    state = [rng.randrange(F.p) for _ in range(3)]
    dev = F.to_mont(state).reshape(1, 3, 16)
    out = spec.permute(dev)
    assert F.from_mont(out.reshape(3, 16)) == spec.permute_native(state)
