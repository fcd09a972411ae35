"""Frozen wire-protocol golden vectors (generated ONCE by
scripts/gen_protocol_vectors.py, asserted forever).

These pin the protocol as a testable contract (VERDICT r2 item 7):
  * Poseidon permutation + sponge values (pse-poseidon equivalent,
    reference wrapper.rs:54-60 PoseidonTranscript spec);
  * transcript byte wire format + LimbsEncoding<3,88> absorption;
  * a complete K=7 proof byte stream that must VERIFY forever -- any
    change to keygen layout, sigma assignment, transcript ordering,
    quotient/query plan, or SRS derivation breaks this test and is a
    breaking protocol change (bump the vector version knowingly).

PROTOCOL.md is the prose spec these vectors enforce.
"""

import hashlib
import json
import os

import pytest

VEC = os.path.join(os.path.dirname(__file__), "vectors",
                   "transcript_v1.json")


@pytest.fixture(scope="module")
def vectors():
    with open(VEC) as f:
        return json.load(f)


def test_poseidon_permutation_vector(vectors):
    from zksnap_tpu.hash.poseidon import default_spec

    v = vectors["poseidon_permute"]
    got = default_spec().permute_native([int(x) for x in v["in"]])
    assert [str(x) for x in got] == v["out"]


def test_poseidon_sponge_vector(vectors):
    from zksnap_tpu.hash.poseidon import PoseidonNative

    v = vectors["poseidon_sponge"]
    sp = PoseidonNative()
    squeezes = []
    for upd in v["updates"]:
        sp.update([int(x) for x in upd])
        squeezes.append(str(sp.squeeze_and_reset()))
    assert squeezes == v["squeezes"]


def test_transcript_vector(vectors):
    from zksnap_tpu.curves.native import BN254_G1, AffinePoint
    from zksnap_tpu.prover.transcript import (ByteReader, Transcript,
                                              fe_to_limbs)

    v = vectors["transcript"]
    tr = Transcript()
    tr.absorb_scalar(int(v["absorb_scalar"]))
    g = AffinePoint.generator(BN254_G1)
    assert [hex(g.x), hex(g.y)] == v["write_point"]
    assert [str(x) for x in fe_to_limbs(g.x)] == v["point_limbs_g_x"]
    tr.write_point(g)
    tr.write_scalar(int(v["write_scalar"]))
    assert hex(tr.challenge()) == v["challenge_1"]
    tr.write_point(AffinePoint.identity(BN254_G1))
    assert hex(tr.challenge()) == v["identity_then_challenge_2"]
    raw = tr.proof()
    assert raw.hex() == v["stream_hex"]

    # replay through the reader reproduces the challenges
    tv = Transcript()
    tv.absorb_scalar(int(v["absorb_scalar"]))
    stream = ByteReader(raw)
    assert tv.read_point(stream) == g
    assert tv.read_scalar(stream) == int(v["write_scalar"])
    assert hex(tv.challenge()) == v["challenge_1"]
    assert tv.read_point(stream).is_identity()
    assert hex(tv.challenge()) == v["identity_then_challenge_2"]
    assert stream.done()


@pytest.fixture(scope="module")
def frozen_pk(vectors):
    """keygen over the frozen circuit must reproduce the frozen vk."""
    import sys

    from zksnap_tpu.prover.plonk import keygen
    from zksnap_tpu.prover.srs import gen_srs

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from gen_protocol_vectors import build_fixed_circuit

    v = vectors["proof_k7"]
    srs = gen_srs(v["k"], seed=v["srs_seed"].encode())
    pk = keygen(build_fixed_circuit(), v["k"], srs)
    return srs, pk


def test_vk_digest_frozen(vectors, frozen_pk):
    v = vectors["proof_k7"]
    _, pk = frozen_pk
    for key, want in v["vk_shape"].items():
        assert getattr(pk.vk, key) == want, key
    h = hashlib.sha256()
    for name in sorted(pk.vk.commitments):
        pt = pk.vk.commitments[name]
        x, y = (0, 0) if pt.is_identity() else (pt.x, pt.y)
        h.update(name.encode() + x.to_bytes(32, "little")
                 + y.to_bytes(32, "little"))
    assert h.hexdigest() == v["vk_sha256"]


def test_frozen_proof_verifies(vectors, frozen_pk):
    """Old proofs must verify forever: protocol stability contract."""
    from zksnap_tpu.prover.plonk import verify

    v = vectors["proof_k7"]
    srs, pk = frozen_pk
    proof = bytes.fromhex(v["proof_hex"])
    assert len(proof) == v["proof_len"]
    instances = [int(x) for x in v["instances"]]
    assert verify(pk.vk, srs.g2, srs.tau_g2, instances, proof)
    # and a single flipped byte must not
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify(pk.vk, srs.g2, srs.tau_g2, instances, bytes(bad))
