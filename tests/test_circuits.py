"""Application circuits under the constraint checker (MockProver parity:
same structure as the reference's test_voter_circuit /
test_state_transition_circuit)."""

import pytest

from zksnap_tpu.circuits.state_transition import (
    expected_instances as st_expected,
    state_transition_circuit,
)
from zksnap_tpu.circuits.voter import (
    VoterFlags,
    expected_instances as voter_expected,
    voter_circuit,
)
from zksnap_tpu.natives import (
    generate_random_voter_circuit_inputs,
    generate_wrapper_circuit_input,
)
from zksnap_tpu.trace import Cell, ConstraintError, Context, check
from zksnap_tpu.gadgets import PoseidonGadget
from zksnap_tpu.hash import hash_fixed_native


def test_poseidon_gadget_matches_native(rng):
    ctx = Context()
    g = PoseidonGadget(ctx)
    vals = [rng.randrange(ctx.p) for _ in range(5)]
    cells = [ctx.load_witness(v) for v in vals]
    out = g.hash_fix_len_array(cells)
    assert out.value == hash_fixed_native(vals)
    check(ctx)


def test_gadget_primitives(rng):
    from zksnap_tpu.gadgets import less_than_field

    ctx = Context()
    a = ctx.load_witness(5)
    b = ctx.load_witness(7)
    assert ctx.add(a, b).value == 12
    assert ctx.mul(a, b).value == 35
    assert ctx.sub(b, a).value == 2
    assert ctx.select(a, b, ctx.load_witness(1)).value == 5
    assert ctx.is_zero(ctx.load_witness(0)).value == 1
    assert ctx.is_zero(a).value == 0
    big_a = rng.randrange(ctx.p)
    big_b = rng.randrange(ctx.p)
    lt = less_than_field(ctx, ctx.load_witness(big_a), ctx.load_witness(big_b))
    assert lt.value == (1 if big_a < big_b else 0)
    ctx.range_check(ctx.load_witness(12345), 16)
    check(ctx)


def test_bigint_mod_mul(rng):
    from zksnap_tpu.gadgets import BigUintChip

    ctx = Context()
    big = BigUintChip(ctx)
    a = rng.getrandbits(300)
    b = rng.getrandbits(300)
    m = rng.getrandbits(352) | (1 << 351)
    aa = big.assign(a, 352)
    bb = big.assign(b, 352)
    mm = big.assign(m, 352)
    r = big.mod_mul(aa, bb, mm, 352)
    assert r.value == a * b % m
    check(ctx)


# CI shape: PLUME off (the production default is ON; the full PLUME
# gadget is covered by tests/test_plume_gadget.py and the k=21 TPU run)
_CI_FLAGS = VoterFlags(check_plume=False)


def test_voter_circuit(rng):
    inp = generate_random_voter_circuit_inputs(rng)
    ctx = Context()
    pub: list[Cell] = []
    voter_circuit(ctx, inp, pub, _CI_FLAGS)
    assert len(pub) == 30
    stats = check(ctx, voter_expected(inp))
    assert stats["gates"] > 0


def test_voter_circuit_rejects_bad_root(rng):
    inp = generate_random_voter_circuit_inputs(rng)
    inp.membership_root = (inp.membership_root + 1) % (2**254)
    ctx = Context()
    pub: list[Cell] = []
    with pytest.raises(AssertionError):
        voter_circuit(ctx, inp, pub, _CI_FLAGS)
        check(ctx)


def test_state_transition_circuit_multi_round(rng):
    _, st_inputs = generate_wrapper_circuit_input(3, rng)
    for round_idx, inp in enumerate(st_inputs):
        ctx = Context()
        pub: list[Cell] = []
        state_transition_circuit(ctx, inp, pub)
        assert len(pub) == 70, f"round {round_idx}"
        check(ctx, st_expected(inp))


def test_state_transition_rejects_wrong_new_root(rng):
    _, st_inputs = generate_wrapper_circuit_input(1, rng)
    inp = st_inputs[0]
    inp.nullifier_tree.new_root = (inp.nullifier_tree.new_root + 1) % (2**254)
    with pytest.raises(AssertionError):
        ctx = Context()
        pub: list[Cell] = []
        state_transition_circuit(ctx, inp, pub)
        check(ctx)
