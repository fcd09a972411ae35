"""KZG accumulation + native recursion chain (succinct-verify, fold,
decide -- the wrapper.rs native pre-pass)."""

import pytest

from zksnap_tpu.prover.accumulator import (
    accumulator_from_proof,
    decide,
    fold_accumulators,
)
from zksnap_tpu.prover.plonk import keygen, prove
from zksnap_tpu.prover.srs import gen_srs
from zksnap_tpu.trace import Context

K = 7


@pytest.fixture(scope="module")
def proofs():
    srs = gen_srs(K)
    out = []
    for seed in (3, 4):
        ctx = Context(lookup_bits=6)
        a = ctx.load_witness(seed)
        b = ctx.load_witness(seed + 10)
        c = ctx.mul(a, b)
        ctx.range_check(ctx.load_witness(seed), 6)
        ctx.expose_public(c)
        pk = keygen(ctx, K, srs)
        proof = prove(pk, [seed * (seed + 10)])
        out.append((pk.vk, [seed * (seed + 10)], proof))
    return srs, out


def test_accumulate_and_decide_single(proofs):
    srs, ps = proofs
    vk, inst, proof = ps[0]
    acc = accumulator_from_proof(vk, inst, proof)
    assert acc is not None
    assert decide(acc, srs.g2, srs.tau_g2)


def test_fold_two_proofs(proofs):
    srs, ps = proofs
    accs = [accumulator_from_proof(vk, i, pr) for vk, i, pr in ps]
    assert all(a is not None for a in accs)
    folded, as_proof = fold_accumulators(accs)
    assert decide(folded, srs.g2, srs.tau_g2)
    assert as_proof == b""  # Gwc19 fold: pure Fiat-Shamir, no commitments


def test_fold_detects_bad_accumulator(proofs):
    srs, ps = proofs
    accs = [accumulator_from_proof(vk, i, pr) for vk, i, pr in ps]
    from zksnap_tpu.curves import bn254_generator

    bad = accs[0]
    bad.lhs = bad.lhs + bn254_generator()  # corrupt
    folded, _ = fold_accumulators(accs)
    assert not decide(folded, srs.g2, srs.tau_g2)


def test_tampered_proof_fails_succinct(proofs):
    srs, ps = proofs
    vk, inst, proof = ps[0]
    bad = bytearray(proof)
    mid = (len(bad) // 2 // 32) * 32
    bad[mid] ^= 1
    acc = accumulator_from_proof(vk, inst, bytes(bad))
    # either the identity already fails (None) or the accumulator is invalid
    assert acc is None or not decide(acc, srs.g2, srs.tau_g2)
