"""Proof byte-format and pk/vk checkpoint roundtrips."""

import os
import tempfile

import pytest

from zksnap_tpu.prover import (
    keygen,
    load_pk,
    load_vk,
    proof_from_bytes,
    proof_to_bytes,
    prove,
    save_pk,
    save_vk,
    verify,
)
from zksnap_tpu.prover.srs import gen_srs
from zksnap_tpu.trace import Context

K = 7


@pytest.fixture(scope="module")
def setup():
    srs = gen_srs(K)
    ctx = Context(lookup_bits=6)
    a = ctx.load_witness(6)
    b = ctx.load_witness(7)
    c = ctx.mul(a, b)
    ctx.expose_public(c)
    pk = keygen(ctx, K, srs)
    proof = prove(pk, [42])
    return srs, pk, proof


def test_proof_bytes_roundtrip(setup):
    srs, pk, proof = setup
    raw = proof_to_bytes(proof)
    assert isinstance(raw, bytes) and len(raw) > 100
    back = proof_from_bytes(raw)
    assert len(back) == len(proof)
    assert verify(pk.vk, srs.g2, srs.tau_g2, [42], back)


def test_pk_vk_checkpoint_roundtrip(setup):
    srs, pk, proof = setup
    with tempfile.TemporaryDirectory() as d:
        save_pk(pk, os.path.join(d, "pk.bin"))
        save_vk(pk.vk, os.path.join(d, "vk.bin"))
        pk2 = load_pk(os.path.join(d, "pk.bin"))
        vk2 = load_vk(os.path.join(d, "vk.bin"))
    proof2 = prove(pk2, [42])
    assert verify(vk2, srs.g2, srs.tau_g2, [42], proof2)
    assert proof_to_bytes(proof2) == proof_to_bytes(proof)  # deterministic