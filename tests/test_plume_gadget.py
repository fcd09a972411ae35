"""In-circuit PLUME verification (hash-to-curve, SHA-256, Shamir muls)
against the native oracle.  The full-voter-with-PLUME synthesis is the
reference's main live constraint (voter/src/lib.rs:276-283)."""

import pytest

from zksnap_tpu.curves import SECP256K1, secp_generator
from zksnap_tpu.gadgets.plume_gadget import (
    DST,
    PlumeInput,
    hash_to_curve_gadget,
    make_plume_chips,
    verify_plume,
)
from zksnap_tpu.natives import gen_nullifier, verify_nullifier
from zksnap_tpu.natives.hash_to_curve import hash_to_curve
from zksnap_tpu.trace import Context, check


def test_sha256_gadget_matches_hashlib(rng):
    import hashlib

    from zksnap_tpu.gadgets.sha256 import Sha256Gadget

    msg = bytes(rng.randrange(256) for _ in range(35))
    ctx = Context()
    g = Sha256Gadget(ctx)
    cells = [ctx.load_witness(b) for b in msg]
    digest = g.bits_to_bytes(g.hash_bits(g.bytes_to_bits(cells)))
    assert bytes(c.value for c in digest) == hashlib.sha256(msg).digest()
    check(ctx)


def test_hash_to_curve_gadget_matches_native(rng):
    msg = bytes([1, 0]) + bytes(rng.randrange(256) for _ in range(33))
    want = hash_to_curve(msg, DST)
    ctx = Context()
    chips = make_plume_chips(ctx)
    pt = hash_to_curve_gadget(chips, [ctx.load_witness(b) for b in msg])
    assert (pt.x.value, pt.y.value) == (want.x, want.y)
    check(ctx)


@pytest.mark.slow
def test_verify_plume_gadget(rng):
    sk = rng.randrange(1, SECP256K1.n)
    msg = bytes([1, 0])
    r = rng.randrange(1, SECP256K1.n)
    nullifier, s, c = gen_nullifier(sk, msg, r)
    pk = sk * secp_generator()
    assert verify_nullifier(msg, nullifier, pk, s, c)

    ctx = Context()
    chips = make_plume_chips(ctx)
    inp = PlumeInput(
        nullifier=chips.ecc.load_point_unchecked(nullifier.x, nullifier.y),
        s=chips.fq.assign(s),
        c=chips.fq.assign(c),
        pk=chips.ecc.load_point_unchecked(pk.x, pk.y),
        message=[ctx.load_witness(b) for b in msg],
    )
    verify_plume(chips, inp)
    check(ctx)


@pytest.mark.slow
def test_verify_plume_rejects_wrong_challenge(rng):
    sk = rng.randrange(1, SECP256K1.n)
    msg = bytes([1, 0])
    nullifier, s, c = gen_nullifier(sk, msg, rng.randrange(1, SECP256K1.n))
    pk = sk * secp_generator()
    ctx = Context()
    chips = make_plume_chips(ctx)
    with pytest.raises(AssertionError):
        inp = PlumeInput(
            nullifier=chips.ecc.load_point_unchecked(nullifier.x, nullifier.y),
            s=chips.fq.assign(s),
            c=chips.fq.assign((c + 1) % SECP256K1.n),
            pk=chips.ecc.load_point_unchecked(pk.x, pk.y),
            message=[ctx.load_witness(b) for b in msg],
        )
        verify_plume(chips, inp)
        check(ctx)
