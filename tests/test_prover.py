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
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [69], proof)


def test_verify_rejects_tampered_scalar(small_proof, srs):
    """Flip one bit of an evaluation scalar in the middle of the stream."""
    pk, proof = small_proof
    bad = bytearray(proof)
    mid = (len(bad) // 2 // 32) * 32  # start of a 32-byte element
    bad[mid] ^= 1
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], bytes(bad))


def test_verify_rejects_tampered_point(small_proof, srs):
    """Replace the first committed point with a different valid point."""
    pk, proof = small_proof
    from zksnap_tpu.curves import bn254_generator

    g2x = bn254_generator() + bn254_generator()
    bad = (g2x.x.to_bytes(32, "little") + g2x.y.to_bytes(32, "little")
           + proof[64:])
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], bad)


def test_verify_rejects_truncated_and_garbage(small_proof, srs):
    pk, proof = small_proof
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], proof[:-32])
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], proof + b"\x00" * 32)
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [68], b"\xff" * len(proof))


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


def test_many_lookup_columns_prove_verify(srs):
    """n_lookup >= 3 end-to-end: locks in the widened logUp degree
    budget (n_lookup <= 6, degree-8 quotient) with a real proof, not
    just the checker (ADVICE r2: the wrapper needs 3+ lookup columns
    and nothing proved through that path)."""
    ctx = Context(lookup_bits=6)
    acc = ctx.load_witness(1)
    for i in range(3 * (128 - 8) + 5):  # > 3 * usable lookups at K=7
        ctx.range_check(ctx.load_witness(i % 64), 6)
    ctx.expose_public(acc)
    pk = keygen(ctx, K, srs)
    assert pk.vk.n_lookup >= 3, pk.vk.n_lookup
    proof = prove(pk, [1])
    assert verify(pk.vk, srs.g2, srs.tau_g2, [1], proof)
    from zksnap_tpu.prover.plonk import verify_succinct

    assert verify_succinct(pk.vk, [1], proof) is not None
    bad = bytearray(proof)
    bad[-16] ^= 1
    assert not verify(pk.vk, srs.g2, srs.tau_g2, [1], bytes(bad))
