#!/usr/bin/env python
"""Reproduce the round-0 fold MSM collision with the REAL accumulators.

The k=22 wrapper run died in `build_wrapper`'s fold MSM ("lazy identity
violated": an exact x-collision in the incomplete-add chain).  This
rebuilds the children, derives the four fold accumulators natively
(verify_succinct host path, seconds), prints them, and synthesizes JUST
the fold MSM gadget on those values to find the colliding pair.
"""
import os, random, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def main():
    import jax
    from zksnap_tpu.circuits.state_transition import state_transition_circuit
    from zksnap_tpu.circuits.voter import VoterFlags, voter_circuit
    from zksnap_tpu.circuits.wrapper import (
        WrapperConfig, WrapperShape, default_accumulator, initial_snark,
        zksnap_linkage, _self_commitment_names)
    from zksnap_tpu.natives import generate_wrapper_circuit_input
    from zksnap_tpu.prover import gen_srs, keygen, prove
    from zksnap_tpu.prover.plonk import verify_succinct
    from zksnap_tpu.prover.recursion import Snark
    from zksnap_tpu.prover.accumulator import KzgAccumulator
    from zksnap_tpu.prover.serialize import load_pk
    from zksnap_tpu.trace import Context

    t0 = time.time()
    rng = random.Random(20260818)  # same seed as the driver
    k_child = 13
    srs_child = gen_srs(k_child)
    voter_inputs, state_inputs = generate_wrapper_circuit_input(2, rng)
    vctx = Context(lookup_bits=k_child - 1)
    vpub = []
    voter_circuit(vctx, voter_inputs[0], vpub, VoterFlags(check_plume=False))
    sctx = Context(lookup_bits=k_child - 1)
    spub = []
    state_transition_circuit(sctx, state_inputs[0], spub)
    vpk = keygen(vctx, k_child, srs_child)
    spk = keygen(sctx, k_child, srs_child)
    voter = Snark(vpk.vk, [c.value for c in vpub], prove(vpk, [c.value for c in vpub]))
    state = Snark(spk.vk, [c.value for c in spub], prove(spk, [c.value for c in spub]))
    print(f"children {time.time()-t0:.1f}s", flush=True)

    wpk = load_pk("build/wrapper_67d023f2b5ff5dd8.pk")
    comms = wpk.vk.commitments
    srs_wrap = gen_srs(22)
    cfg = WrapperConfig(
        k=22, lookup_bits=14, voter_vk=vpk.vk, state_vk=spk.vk,
        shape=WrapperShape(n_advice=30, n_lookup=3, n_z=18, n_perm=35, ext_log=3),
        default_acc=default_accumulator(srs_wrap), linkage=zksnap_linkage,
        n_payload=28, msm_window=4)
    prev = initial_snark(cfg, comms)

    def acc_of(vk, snark):
        res = verify_succinct(vk, snark.instances, snark.proof)
        assert res is not None
        g2_side, tau_side = res
        return KzgAccumulator(lhs=tau_side, rhs=g2_side)

    acc_v = acc_of(vpk.vk, voter)
    acc_s = acc_of(spk.vk, state)
    acc_p = acc_of(cfg.self_vk(comms), prev)
    d = cfg.default_acc
    print("acc_v.lhs", hex(acc_v.lhs.x)[:20], "rhs", hex(acc_v.rhs.x)[:20], flush=True)
    print("acc_s.lhs", hex(acc_s.lhs.x)[:20], "rhs", hex(acc_s.rhs.x)[:20], flush=True)
    print("acc_p.lhs", hex(acc_p.lhs.x)[:20], flush=True)
    print("default lhs", hex(d.lhs.x)[:20], "rhs", hex(d.rhs.x)[:20], flush=True)
    pts = {"v.lhs": acc_v.lhs, "s.lhs": acc_s.lhs, "v.rhs": acc_v.rhs,
           "s.rhs": acc_s.rhs, "d.lhs": d.lhs, "d.rhs": d.rhs}
    names = list(pts)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = pts[names[i]], pts[names[j]]
            if not a.is_identity() and not b.is_identity() and a.x == b.x:
                print("X-COLLISION among inputs:", names[i], names[j], flush=True)

    # synthesize the fold msm with these values (round-0 select applied)
    from zksnap_tpu.gadgets.bigint import BigUintChip
    from zksnap_tpu.gadgets.nonnative import NonNativeChip
    from zksnap_tpu.gadgets.ecc_msm import MsmGadget
    from zksnap_tpu.gadgets.ecc import NNPoint
    from zksnap_tpu.hash.poseidon import PoseidonNative
    from zksnap_tpu.prover.transcript import Transcript

    accs = [acc_v, acc_s, d, d]
    tr = Transcript()
    for a in accs:
        tr.absorb_point(a.lhs)
        tr.absorb_point(a.rhs)
    r = tr.challenge()
    print("fold challenge r", hex(r)[:20], flush=True)

    for side in ("lhs", "rhs"):
        ctx = Context(lookup_bits=14)
        big = BigUintChip(ctx)
        from zksnap_tpu.curves.native import BN254_G1
        fq = NonNativeChip(ctx, big, BN254_G1.p)
        msm = MsmGadget(ctx, fq, window=4)
        def wit(pt):
            return NNPoint(fq.assign(pt.x), fq.assign(pt.y), ctx.load_constant(0))
        one = ctx.load_constant(1)
        rc = ctx.load_witness(r)
        r2 = ctx.mul(rc, rc); r3 = ctx.mul(r2, rc)
        pairs = [(one, wit(getattr(accs[0], side))), (rc, wit(getattr(accs[1], side))),
                 (r2, wit(getattr(accs[2], side))), (r3, wit(getattr(accs[3], side)))]
        try:
            msm.msm(pairs)
            print(f"fold {side}: OK", flush=True)
        except AssertionError as e:
            print(f"fold {side}: COLLIDES ({e})", flush=True)

if __name__ == "__main__":
    main()
