"""Non-native field + EC gadgets under the constraint checker, against the
host curve oracle."""

import pytest

from zksnap_tpu.curves import SECP256K1, AffinePoint, secp_generator
from zksnap_tpu.gadgets.bigint import BigUintChip
from zksnap_tpu.gadgets.ecc import EccGadget
from zksnap_tpu.gadgets.nonnative import NonNativeChip
from zksnap_tpu.trace import Context, check

P = SECP256K1.p


def make_chips():
    ctx = Context()
    big = BigUintChip(ctx)
    fp = NonNativeChip(ctx, big, P)
    ecc = EccGadget(ctx, fp, 0, 7)
    return ctx, fp, ecc


def test_nonnative_field_ops(rng):
    ctx, fp, _ = make_chips()
    a_val = rng.randrange(P)
    b_val = rng.randrange(P)
    a = fp.assign(a_val)
    b = fp.assign(b_val)
    assert fp.add(a, b).value == (a_val + b_val) % P
    assert fp.sub(a, b).value == (a_val - b_val) % P
    assert fp.mul(a, b).value == a_val * b_val % P
    assert fp.div(a, b).value == a_val * pow(b_val, -1, P) % P
    assert fp.neg(a).value == (-a_val) % P
    assert fp.is_equal(a, a).value == 1
    assert fp.is_equal(a, b).value == 0
    check(ctx)


def test_nonnative_rejects_forged_mul(rng):
    ctx, fp, _ = make_chips()
    a = fp.assign(5)
    b = fp.assign(7)
    r = fp.mul(a, b)
    # forge the result limb
    ctx.advice[r.limbs[0].idx] = (r.limbs[0].value + 1) % ctx.p
    with pytest.raises(AssertionError):
        check(ctx)


def test_ec_add_double(rng):
    ctx, fp, ecc = make_chips()
    g = secp_generator()
    k1 = rng.randrange(1, SECP256K1.n)
    k2 = rng.randrange(1, SECP256K1.n)
    p_n = k1 * g
    q_n = k2 * g
    p = ecc.load_point_checked(p_n.x, p_n.y)
    q = ecc.load_point_checked(q_n.x, q_n.y)
    s = ecc.add(p, q)
    want = p_n + q_n
    assert (s.x.value, s.y.value, s.is_inf.value) == (want.x, want.y, 0)
    d = ecc.double(p)
    want2 = p_n + p_n
    assert (d.x.value, d.y.value) == (want2.x, want2.y)
    # P + (-P) = identity
    z = ecc.add(p, ecc.neg(p))
    assert z.is_inf.value == 1
    # identity + Q = Q
    iq = ecc.add(ecc.identity(), q)
    assert (iq.x.value, iq.y.value, iq.is_inf.value) == (q_n.x, q_n.y, 0)
    check(ctx)


def test_ec_scalar_mul_small(rng):
    ctx, fp, ecc = make_chips()
    g = secp_generator()
    k = rng.randrange(1, 256)
    bits = [(k >> (7 - i)) & 1 for i in range(8)]
    p = ecc.load_point_checked(g.x, g.y)
    bit_cells = [ctx.load_witness(b) for b in bits]
    for b in bit_cells:
        ctx.assert_bit(b)
    r = ecc.scalar_mul_bits(p, bit_cells)
    want = k * g
    assert (r.x.value, r.y.value) == (want.x, want.y)
    check(ctx)


def test_ec_shamir_mul(rng):
    ctx, fp, ecc = make_chips()
    g = secp_generator()
    h_n = rng.randrange(2, SECP256K1.n) * g
    a, b = rng.randrange(1, 64), rng.randrange(1, 64)
    a_bits = [(a >> (5 - i)) & 1 for i in range(6)]
    b_bits = [(b >> (5 - i)) & 1 for i in range(6)]
    p = ecc.load_point_checked(g.x, g.y)
    q = ecc.load_point_checked(h_n.x, h_n.y)
    ab = [ctx.load_witness(v) for v in a_bits]
    bb = [ctx.load_witness(v) for v in b_bits]
    r = ecc.shamir_mul(p, ab, q, bb)
    want = a * g + b * h_n
    assert (r.x.value, r.y.value) == (want.x, want.y)
    check(ctx)
