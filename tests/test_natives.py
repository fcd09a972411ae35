"""Native protocol mirror tests (hash-to-curve vectors, PLUME, Paillier,
Merkle/IMT, input generators)."""

import random

import pytest

from zksnap_tpu.curves import SECP256K1, AffinePoint, secp_generator
from zksnap_tpu.natives import (
    IMTLeaf,
    MerkleTree,
    compress_point,
    gen_nullifier,
    generate_random_voter_circuit_inputs,
    generate_wrapper_circuit_input,
    hash_imt_leaf,
    paillier_add,
    paillier_enc,
    verify_nullifier,
)
from zksnap_tpu.natives.hash_to_curve import hash_to_curve
from zksnap_tpu.natives.inputs import compress_native_nullifier


def test_curve_basics():
    g = secp_generator()
    assert g.on_curve()
    assert (SECP256K1.n * g).is_identity()
    assert (2 * g) + g == 3 * g
    assert (5 * g) - (2 * g) == 3 * g


def test_hash_to_curve_rfc9380_vectors():
    """RFC 9380 J.8.1 vectors, suite secp256k1_XMD:SHA-256_SSWU_RO_
    (the exact suite+DST of voter_tests/src/lib.rs:36-55)."""
    dst = b"QUUX-V01-CS02-with-secp256k1_XMD:SHA-256_SSWU_RO_"
    vectors = [
        (b"",
         0xC1CAE290E291AEE617EBAEF1BE6D73861479C48B841EABA9B7B5852DDFEB1346,
         0x64FA678E07AE116126F08B022A94AF6DE15985C996C3A91B64C406A960E51067),
        (b"abc",
         0x3377E01EAB42DB296B512293120C6CEE72B6ECF9F9205760BD9FF11FB3CB2C4B,
         0x7F95890F33EFEBD1044D382A01B1BEE0900FB6116F94688D487C6C7B9C8371F6),
        (b"q128_" + b"q" * 128,
         0xE2167BC785333A37AA562F021F1E881DEFB853839BABF52A7F72B102E41890E9,
         0xF2401DD95CC35867FFED4F367CD564763719FBC6A53E969FB8496A1E6685D873),
    ]
    for msg, ex, ey in vectors:
        p = hash_to_curve(msg, dst)
        assert (p.x, p.y) == (ex, ey)


def test_plume_sign_verify(rng):
    sk = rng.randrange(1, SECP256K1.n)
    message = bytes([1, 0])
    r = rng.randrange(1, SECP256K1.n)
    nullifier, s, c = gen_nullifier(sk, message, r)
    pk = sk * secp_generator()
    assert verify_nullifier(message, nullifier, pk, s, c)
    # determinism of the nullifier point (PLUME property)
    nullifier2, s2, c2 = gen_nullifier(sk, message, rng.randrange(1, SECP256K1.n))
    assert nullifier2 == nullifier and (s2, c2) != (s, c)
    # tampered verify fails
    assert not verify_nullifier(message, nullifier, pk, s, (c + 1) % SECP256K1.n)
    assert not verify_nullifier(bytes([2, 0]), nullifier, pk, s, c)


def test_compress_point():
    g = secp_generator()
    c = compress_point(g)
    assert len(c) == 33 and c[0] in (2, 3)
    assert int.from_bytes(c[1:], "big") == g.x


def test_paillier_homomorphism(rng):
    n = rng.getrandbits(176)
    g = rng.getrandbits(176)
    m1, m2 = 3, 4
    r1, r2 = rng.getrandbits(176), rng.getrandbits(176)
    c1 = paillier_enc(n, g, m1, r1)
    c2 = paillier_enc(n, g, m2, r2)
    # enc(m1)*enc(m2) = g^(m1+m2) (r1 r2)^n mod n^2
    expected = pow(g, m1 + m2, n * n) * pow(r1 * r2, n, n * n) % (n * n)
    assert paillier_add(n, c1, c2) == expected


def test_merkle_tree(rng):
    leaves = [rng.randrange(2**200) for _ in range(8)]
    t = MerkleTree(leaves)
    for i in range(8):
        proof, helper = t.get_proof(i)
        assert len(proof) == 3
        assert t.verify_proof(leaves[i], i, t.get_root(), proof)
        assert helper == [1 - ((i >> lvl) & 1) for lvl in range(3)]
    assert not t.verify_proof(leaves[0] + 1, 0, t.get_root(), t.get_proof(0)[0])


def test_voter_input_generation(rng):
    inp = generate_random_voter_circuit_inputs(rng)
    assert sum(inp.vote) == 1 and len(inp.vote) == 5
    assert len(inp.vote_enc) == 5
    assert len(inp.membership_proof) == 3
    assert verify_nullifier(bytes([1, 0]), inp.nullifier, inp.pk_voter,
                            inp.s_nullifier, inp.c_nullifier)
    n2 = inp.pk_enc.n ** 2
    for ve in inp.vote_enc:
        assert 0 <= ve < n2
    tag = compress_native_nullifier(inp.nullifier)
    assert tag[0] in (2, 3)


def test_wrapper_input_generation(rng):
    voter_inputs, state_inputs = generate_wrapper_circuit_input(3, rng)
    assert len(voter_inputs) == 3 and len(state_inputs) == 3
    n = voter_inputs[0].pk_enc.n
    # chained roots: round i's new_root == round i+1's old_root
    for a, b in zip(state_inputs, state_inputs[1:]):
        assert a.nullifier_tree.new_root == b.nullifier_tree.old_root
    # running homomorphic tally: prev_vote of round i+1 = prev + incoming of round i
    for a, b in zip(state_inputs, state_inputs[1:]):
        for j in range(5):
            assert b.prev_vote[j] == paillier_add(n, a.prev_vote[j], a.incoming_vote[j])
    # IMT low-leaf semantics: new_leaf.val is poseidon of compressed nullifier
    from zksnap_tpu.hash import PoseidonNative
    h = PoseidonNative()
    h.update(compress_native_nullifier(state_inputs[0].nullifier))
    assert state_inputs[0].nullifier_tree.new_leaf.val == h.squeeze_and_reset()
