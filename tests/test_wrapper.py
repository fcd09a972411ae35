"""Wrapper (recursion) circuit: keygen fixed point, dummy snarks, and a
2-round checker-level IVC chain with miniature children.

Reference analogue: wrapper.rs RecursionCircuit + gen_dummy_snark +
test_recursion's structure (:943-1159) -- here the wrapper TRACE is
checker-verified and matched row-by-row against the native mirror; the
full-width proven chain runs in scripts/prove_wrapper_tpu.py (the trace
is ~35M cells at production width, out of unit-test budget).

The slow test shrinks the in-circuit MSMs with the explicitly-unsound
truncation knob (MsmGadget.unsound_truncate_bits): accumulator limbs
then differ from the native fold (rows 0..12 are NOT compared), but
every other row -- digest, payload, round -- and every constraint the
wrapper adds (digest/round chaining, linkage equalities, decode range
checks) is exercised at full fidelity.  Sound full-width accumulator
parity is pinned separately by tests/test_verifier_gadget.py.
"""

import pytest

from zksnap_tpu.circuits.wrapper import (
    WrapperConfig,
    WrapperRoundInput,
    WrapperShape,
    build_wrapper,
    default_accumulator,
    gen_dummy_proof,
    initial_snark,
    proof_shape,
    protocol_digest,
    solve_wrapper_shape,
    toy_linkage,
    wrapper_native,
)
from zksnap_tpu.fields.field import bn254_fr
from zksnap_tpu.prover.keygen import layout_circuit
from zksnap_tpu.prover.plonk import keygen, prove, verify_succinct
from zksnap_tpu.prover.recursion import Snark
from zksnap_tpu.prover.srs import gen_srs
from zksnap_tpu.trace import Context, check
from zksnap_tpu.trace.checker import ConstraintError

P = bn254_fr().p
K_CHILD = 7
K_WRAP = 16


def _toy_voter_ctx(out_val: int) -> Context:
    """out = a*b + 5, exposes [out]."""
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(1)
    b = ctx.load_witness((out_val - 5) % P)
    c = ctx.mul(a, b)
    d = ctx.add(c, ctx.load_constant(5))
    ctx.range_check(ctx.load_witness(37), 6)
    ctx.expose_public(d)
    return ctx


def _toy_state_ctx(in_val: int, out_val: int) -> Context:
    """out = in*3 + delta, exposes [in, out]."""
    ctx = Context(lookup_bits=6)
    i = ctx.load_witness(in_val % P)
    delta = ctx.load_witness((out_val - 3 * in_val) % P)
    o = ctx.mul_add(i, 3, delta)
    ctx.range_check(ctx.load_witness(21), 6)
    ctx.expose_public(i)
    ctx.expose_public(o)
    return ctx


@pytest.fixture(scope="module")
def children():
    srs = gen_srs(K_CHILD)
    vctx = _toy_voter_ctx(11)
    sctx = _toy_state_ctx(11, 40)
    vpk = keygen(vctx, K_CHILD, srs)
    spk = keygen(sctx, K_CHILD, srs)
    return srs, vpk, spk


def test_dummy_proof_parses(children):
    """gen_dummy_snark parity (wrapper.rs:254-273): a protocol-shaped
    random transcript must run the native succinct verifier to the end
    (garbage accumulator, no abort) -- that is exactly the round-0
    contract."""
    _, vpk, spk = children
    for vk in (vpk.vk, spk.vk):
        proof = gen_dummy_proof(vk, seed=9)
        shape = proof_shape(vk)
        assert len(proof) == sum(64 if s == "point" else 32 for s in shape)
        res = verify_succinct(vk, [0] * vk.num_instance, proof)
        assert res is not None  # parsed to completion


def test_shape_accounting_matches_layout(children):
    """_shape_from_counts must agree with keygen's layout_circuit."""
    from zksnap_tpu.circuits.wrapper import _shape_from_counts

    ctx = _toy_voter_ctx(23)
    layout = layout_circuit(ctx, K_CHILD)
    shape = _shape_from_counts(K_CHILD, len(ctx.advice), ctx.gate_offsets,
                               len(ctx.lookups))
    assert shape.n_advice == layout.n_advice
    assert shape.n_lookup == layout.n_lookup
    assert shape.n_perm == len(layout.perm_columns)


@pytest.fixture(scope="module")
def wrapper_cfg(children):
    srs, vpk, spk = children
    guess = WrapperShape(n_advice=40, n_lookup=5, n_z=24, n_perm=47,
                         ext_log=3)
    cfg = WrapperConfig(
        k=K_WRAP, lookup_bits=14, voter_vk=vpk.vk, state_vk=spk.vk,
        shape=guess, default_acc=default_accumulator(srs),
        linkage=toy_linkage, n_payload=1,
        msm_window=2, msm_unsound_truncate=8,
    )
    cfg, _ctx = solve_wrapper_shape(cfg, verbose=True)
    return cfg


@pytest.mark.slow
def test_two_round_ivc_checker(children, wrapper_cfg):
    """Two wrapper rounds, checker-verified, native-mirror parity on all
    non-accumulator rows; digest + round chaining live."""
    srs, vpk, spk = children
    cfg = wrapper_cfg
    assert cfg.shape.n_lookup <= 6

    comms = cfg.self_vk(None).commitments  # checker-level placeholder vk

    from zksnap_tpu.prover.plonk import rebind_witness

    def voter_snark(out):
        pk = rebind_witness(vpk, _toy_voter_ctx(out))
        return Snark(vk=vpk.vk, instances=[out % P],
                     proof=prove(pk, [out % P]))

    def state_snark(i, o):
        pk = rebind_witness(spk, _toy_state_ctx(i, o))
        return Snark(vk=spk.vk, instances=[i % P, o % P],
                     proof=prove(pk, [i % P, o % P]))

    # round 0: voter out 11 -> state 11 -> 40
    win0 = WrapperRoundInput(
        round=0, voter=voter_snark(11), state=state_snark(11, 40),
        prev=initial_snark(cfg, comms), self_commitments=comms)
    ctx0 = Context(lookup_bits=cfg.lookup_bits)
    cells0 = build_wrapper(ctx0, cfg, win0)
    inst0 = [c.value for c in cells0]
    check(ctx0, inst0)
    native0, _ = wrapper_native(cfg, win0)
    assert inst0[12:] == native0[12:]  # digest, payload, round
    assert inst0[-1] == 0 and inst0[13] == 40

    # round 1: carried 40 -> voter out 40 -> state 40 -> 99
    prev1 = Snark(vk=cfg.self_vk(comms), instances=inst0,
                  proof=gen_dummy_proof(cfg.self_vk(comms), seed=11))
    win1 = WrapperRoundInput(
        round=1, voter=voter_snark(40), state=state_snark(40, 99),
        prev=prev1, self_commitments=comms)
    ctx1 = Context(lookup_bits=cfg.lookup_bits)
    cells1 = build_wrapper(ctx1, cfg, win1)
    inst1 = [c.value for c in cells1]
    check(ctx1, inst1)
    native1, _ = wrapper_native(cfg, win1)
    assert inst1[12:] == native1[12:]
    assert inst1[-1] == 1 and inst1[13] == 99
    assert inst1[12] == inst0[12] == protocol_digest(
        comms, cfg.k, cfg.num_instance)

    # negative: a broken chain (carried value mismatch) must not check
    bad_prev = Snark(vk=prev1.vk,
                     instances=inst0[:13] + [inst0[13] + 1] + inst0[14:],
                     proof=prev1.proof)
    win_bad = WrapperRoundInput(round=1, voter=win1.voter, state=win1.state,
                                prev=bad_prev, self_commitments=comms)
    ctx_bad = Context(lookup_bits=cfg.lookup_bits, assert_witness=False)
    build_wrapper(ctx_bad, cfg, win_bad)
    with pytest.raises((ConstraintError, AssertionError)):
        check(ctx_bad)
