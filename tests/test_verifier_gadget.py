"""In-circuit PLONK succinct verifier vs the native verifier.

The L5 core test: a REAL (small) proof is verified both natively
(accumulator_from_proof) and as a circuit trace (succinct_verify_gadget);
the checker must accept the trace and the two accumulators must be
bit-identical.  Reference analogue: wrapper.rs succinct_verify (:302-359)
agreeing with its native pre-pass (:445-471)."""

import pytest

from zksnap_tpu.prover.accumulator import accumulator_from_proof, decide
from zksnap_tpu.prover.plonk import keygen, prove
from zksnap_tpu.prover.srs import gen_srs
from zksnap_tpu.prover.verifier_gadget import (
    VerifierChips,
    succinct_verify_gadget,
)
from zksnap_tpu.trace import Context, check

K = 7


@pytest.fixture(scope="module")
def child_proof():
    srs = gen_srs(K)
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(7)
    b = ctx.load_witness(9)
    c = ctx.mul(a, b)
    d = ctx.add(c, ctx.load_constant(5))
    ctx.range_check(ctx.load_witness(37), 6)
    ctx.expose_public(d)
    pk = keygen(ctx, K, srs)
    proof = prove(pk, [68])
    return srs, pk.vk, [68], proof


@pytest.mark.slow
def test_in_circuit_verify_matches_native(child_proof):
    srs, vk, instances, proof = child_proof
    native = accumulator_from_proof(vk, instances, proof)
    assert native is not None
    assert decide(native, srs.g2, srs.tau_g2)

    wctx = Context(lookup_bits=14)
    chips = VerifierChips.create(wctx)
    inst_cells = [wctx.load_witness(v) for v in instances]
    res = succinct_verify_gadget(wctx, chips, vk, inst_cells, proof)
    stats = check(wctx)
    print("wrapper-side stats:", stats)

    assert res.lhs.x.value == native.lhs.x
    assert res.lhs.y.value == native.lhs.y
    assert res.rhs.x.value == native.rhs.x
    assert res.rhs.y.value == native.rhs.y
    assert res.lhs.is_inf.value == 0 and res.rhs.is_inf.value == 0


@pytest.mark.slow
def test_in_circuit_verify_protocol_as_witness(child_proof):
    """Previous-wrapper mode: vk commitments witnessed, not constants."""
    srs, vk, instances, proof = child_proof
    native = accumulator_from_proof(vk, instances, proof)

    wctx = Context(lookup_bits=14)
    chips = VerifierChips.create(wctx)
    inst_cells = [wctx.load_witness(v) for v in instances]
    res = succinct_verify_gadget(wctx, chips, vk, inst_cells, proof,
                                 protocol_witness=True)
    check(wctx)
    assert res.protocol_cells is not None
    assert len(res.protocol_cells) == len(vk.commitments)
    assert res.lhs.x.value == native.lhs.x and res.rhs.x.value == native.rhs.x


@pytest.mark.slow
def test_in_circuit_verify_rejects_tampered_eval(child_proof):
    """halo2/snark-verifier semantics: the quotient opening claim t(x) is
    DERIVED from the constraint identity, so a flipped eval does not break
    the trace -- it yields a garbage accumulator whose decide pairing
    fails (wrapper.rs:361-385 relies on exactly this for round-0 dummy
    snarks).  Native and in-circuit must agree on that garbage."""
    srs, vk, instances, proof = child_proof
    bad = bytearray(proof)
    mid = (len(bad) // 2 // 32) * 32
    bad[mid] ^= 1
    native = accumulator_from_proof(vk, instances, bytes(bad))
    assert native is not None
    assert not decide(native, srs.g2, srs.tau_g2)

    wctx = Context(lookup_bits=14)
    chips = VerifierChips.create(wctx)
    inst_cells = [wctx.load_witness(v) for v in instances]
    res = succinct_verify_gadget(wctx, chips, vk, inst_cells, bytes(bad))
    check(wctx)  # trace itself is consistent
    assert res.lhs.x.value == native.lhs.x
    assert res.rhs.x.value == native.rhs.x
