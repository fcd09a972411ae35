"""In-circuit BN254 MSM gadget vs native group arithmetic (the recursion
circuit's EC workhorse -- wrapper.rs:291 FpChip / halo2-ecc MSM parity)."""

import random

import pytest

from zksnap_tpu.curves.native import BN254_G1, AffinePoint, bn254_generator
from zksnap_tpu.gadgets.bigint import BigUintChip
from zksnap_tpu.gadgets.ecc import EccGadget, NNPoint
from zksnap_tpu.gadgets.ecc_msm import MsmGadget
from zksnap_tpu.gadgets.nonnative import NonNativeChip
from zksnap_tpu.trace import Context, check


def _chips(ctx):
    big = BigUintChip(ctx)
    fq = NonNativeChip(ctx, big, BN254_G1.p)
    ecc = EccGadget(ctx, fq, 0, BN254_G1.b)
    return fq, ecc, MsmGadget(ctx, fq)


def _load_nn(ctx, fq, pt):
    if pt.is_identity():
        return NNPoint(fq.assign(0), fq.assign(0), ctx.load_constant(1))
    return NNPoint(fq.assign(pt.x), fq.assign(pt.y), ctx.load_constant(0))


N_BITS_TEST = 16  # small scalars keep the trace unit-test sized


def test_msm_gadget_mixed_bases():
    rng = random.Random(99)
    ctx = Context(lookup_bits=11)
    fq, ecc, msm = _chips(ctx)
    g = bn254_generator()

    # witnessed variable bases (incl. one identity), one constant base
    pts = [(rng.randrange(1, 1 << 60)) * g for _ in range(3)]
    scalars = [rng.randrange(1 << N_BITS_TEST) for _ in range(5)]
    pairs = [
        (ctx.load_witness(scalars[0]), _load_nn(ctx, fq, pts[0])),
        (ctx.load_witness(scalars[1]), _load_nn(ctx, fq, pts[1])),
        (ctx.load_witness(scalars[2]),
         _load_nn(ctx, fq, AffinePoint.identity(BN254_G1))),
        (ctx.load_witness(scalars[3]), pts[2]),       # constant base
        (ctx.load_witness(scalars[4]), g),            # constant base
    ]
    out = msm.msm(pairs, n_bits=N_BITS_TEST)
    check(ctx)

    want = (scalars[0] * pts[0] + scalars[1] * pts[1]
            + scalars[3] * pts[2] + scalars[4] * g)
    assert out.x.value == want.x and out.y.value == want.y
    assert out.is_inf.value == 0


def test_msm_gadget_zero_scalar_and_soundness():
    rng = random.Random(7)
    ctx = Context(lookup_bits=11)
    fq, ecc, msm = _chips(ctx)
    g = bn254_generator()
    p1 = 777 * g
    s = rng.randrange(1, 1 << N_BITS_TEST)
    pairs = [
        (ctx.load_witness(0), _load_nn(ctx, fq, p1)),  # zero scalar
        (ctx.load_witness(s), g),
    ]
    out = msm.msm(pairs, n_bits=N_BITS_TEST)
    check(ctx)
    want = s * g
    assert out.x.value == want.x and out.y.value == want.y

    # soundness: forging the result coordinates must break a constraint
    bad = Context(lookup_bits=11)
    fq2, _, msm2 = _chips(bad)
    pairs2 = [(bad.load_witness(s), g)]
    out2 = msm2.msm(pairs2, n_bits=N_BITS_TEST)
    # tamper the final canonical x limb witness value behind the runtime
    bad.advice[out2.x.limbs[0].idx] = (bad.advice[out2.x.limbs[0].idx] + 1)
    with pytest.raises(AssertionError):
        check(bad)
