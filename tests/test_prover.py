"""PLONK prover/verifier end-to-end (the gen_proof/verify_proof parity
tests; reference wrapper.rs:111-158 self-verify flow)."""

import pytest

from zksnap_tpu.prover.plonk import keygen, prove, verify
from zksnap_tpu.prover.srs import gen_srs, srs_sanity_check
from zksnap_tpu.trace import Context


K = 7


@pytest.fixture(scope="module")
def srs():
    return gen_srs(K)


@pytest.fixture(scope="module")
def small_proof(srs):
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(7)
    b = ctx.load_witness(9)
    c = ctx.mul(a, b)
    d = ctx.add(c, ctx.load_constant(5))
    ctx.range_check(ctx.load_witness(37), 6)
    sel = ctx.load_witness(1)
    e = ctx.select(a, b, sel)
    ctx.constrain_equal(e, a)
    ctx.expose_public(d)
    pk = keygen(ctx, K, srs)
    proof = prove(pk, [68])
    return pk, proof


def test_srs_sanity(srs):
    assert srs_sanity_check(srs)


def test_prove_verify_roundtrip(small_proof, srs):
    pk, proof = small_proof
    assert verify(pk.vk, srs.g2, srs.tau_g2, [68], proof)


def test_verify_rejects_wrong_instance(small_proof, srs):
    pk, proof = small_proof
    with pytest.raises(AssertionError):
        verify(pk.vk, srs.g2, srs.tau_g2, [69], proof)


def test_verify_rejects_tampered_scalar(small_proof, srs):
    pk, proof = small_proof
    # find the first non-instance scalar (an evaluation) and flip it
    bad = list(proof)
    for i, (kind, v) in enumerate(bad):
        if kind == "scalar" and i > 0 and bad[i - 1][0] != "scalar":
            continue
    # locate an eval scalar after the first point entries
    idx = next(i for i, (kind, _) in enumerate(bad)
               if kind == "scalar" and i > 5)
    bad[idx] = ("scalar", (bad[idx][1] + 1) % (2**200))
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], bad)


def test_verify_rejects_tampered_point(small_proof, srs):
    pk, proof = small_proof
    bad = list(proof)
    idx = next(i for i, (kind, _) in enumerate(bad) if kind == "point")
    from zksnap_tpu.curves import bn254_generator

    bad[idx] = ("point", bad[idx][1] + bn254_generator())
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], bad)


def test_unsatisfied_witness_fails_early(srs):
    """A bad witness must be caught (by h/Z closure asserts) at prove time."""
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(3)
    b = ctx.load_witness(4)
    c = ctx.mul(a, b)
    # forge the advice value behind the checker's back
    ctx.advice[c.idx] = 13  # 3*4 != 13
    ctx.expose_public(a)
    pk = keygen(ctx, K, srs)
    proof = prove(pk, [3])
    # gate violation doesn't break h/Z, so proving "succeeds" -- but the
    # verifier must reject.
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [3], proof)
