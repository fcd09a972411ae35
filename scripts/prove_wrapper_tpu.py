#!/usr/bin/env python
"""Full-width wrapper (recursion) proving driver -- gen_recursion_snark
parity (wrapper.rs:869-902 + test_recursion :943-1159).

Per round: prove the voter + state-transition circuits, build the
wrapper trace (3 in-circuit succinct verifications + fold, ~35M cells at
production width), prove it at k_wrap, carry the snark into the next
round; finally run the native decide (digest pin + two pairings).

This is the heavyweight path (hours at production width) -- run on real
TPU hardware.  --toy swaps in the miniature children + truncated MSMs of
tests/test_wrapper.py for a fast structural end-to-end (proven wrapper,
checker-equivalent constraints, decide skipped since truncated MSMs
break accumulator soundness by design).

Usage: python scripts/prove_wrapper_tpu.py [rounds] [k_wrap] [--toy]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    toy = "--toy" in sys.argv
    rounds = int(args[0]) if args else 2
    k_wrap = int(args[1]) if len(args) > 1 else (16 if toy else 22)

    import jax

    from zksnap_tpu.circuits.wrapper import (
        WrapperConfig,
        WrapperRoundInput,
        WrapperShape,
        build_wrapper,
        default_accumulator,
        gen_wrapper_pk,
        initial_snark,
        toy_linkage,
        verify_wrapper_snark,
        wrapper_native,
        zksnap_linkage,
    )
    from zksnap_tpu.prover import gen_srs, keygen, prove
    from zksnap_tpu.prover.plonk import rebind_witness
    from zksnap_tpu.prover.recursion import Snark
    from zksnap_tpu.trace import Context

    print(f"devices: {jax.devices()}; rounds={rounds} k_wrap={k_wrap} "
          f"toy={toy}", flush=True)
    rng = random.Random(20260818)

    # --- children -----------------------------------------------------------
    t0 = time.time()
    if toy:
        from tests.test_wrapper import _toy_state_ctx, _toy_voter_ctx

        k_child = 7
        srs_child = gen_srs(k_child)
        # voter out r == state in r; state in r == state out r-1 (r>0)
        outs = []
        v = 11
        for r in range(rounds):
            nxt = (v * 3 + 7) % ((1 << 61) - 1)
            outs.append((v, nxt))
            v = nxt
        vpk = keygen(_toy_voter_ctx(outs[0][0]), k_child, srs_child)
        spk = keygen(_toy_state_ctx(*outs[0]), k_child, srs_child)

        def child_ctxs(r):
            """Host-only synthesis (runs on the Lookahead worker)."""
            vi, vo = outs[r]
            return _toy_voter_ctx(vi), [vi], _toy_state_ctx(vi, vo), [vi, vo]

        def child_snarks(synth):
            vc, vi, sc, si = synth
            return (Snark(vpk.vk, vi, prove(rebind_witness(vpk, vc), vi)),
                    Snark(spk.vk, si, prove(rebind_witness(spk, sc), si)))

        linkage, n_payload = toy_linkage, 1
        msm_trunc = 8
        shape_guess = WrapperShape(n_advice=40, n_lookup=5, n_z=24,
                                   n_perm=47, ext_log=3)
    else:
        from zksnap_tpu.circuits.state_transition import (
            expected_instances as st_expected,
            state_transition_circuit,
        )
        from zksnap_tpu.circuits.voter import (
            VoterFlags,
            expected_instances as voter_expected,
            voter_circuit,
        )
        from zksnap_tpu.natives import generate_wrapper_circuit_input

        k_child = 13
        srs_child = gen_srs(k_child)
        voter_inputs, state_inputs = generate_wrapper_circuit_input(
            rounds, rng)
        vctx = Context(lookup_bits=k_child - 1)
        vpub = []
        # children prove at k_child=13: PLUME (~15.5M cells) only fits
        # the k>=21 shape -- explicit opt-out (VoterFlags default is on)
        child_flags = VoterFlags(check_plume=False)
        voter_circuit(vctx, voter_inputs[0], vpub, child_flags)
        sctx = Context(lookup_bits=k_child - 1)
        spub = []
        state_transition_circuit(sctx, state_inputs[0], spub)
        vpk = keygen(vctx, k_child, srs_child)
        spk = keygen(sctx, k_child, srs_child)

        def child_ctxs(r):
            """Host-only synthesis (runs on the Lookahead worker)."""
            vc = Context(lookup_bits=k_child - 1)
            vp = []
            voter_circuit(vc, voter_inputs[r], vp, child_flags)
            sc = Context(lookup_bits=k_child - 1)
            sp = []
            state_transition_circuit(sc, state_inputs[r], sp)
            return vc, [c.value for c in vp], sc, [c.value for c in sp]

        def child_snarks(synth):
            vc, vi, sc, si = synth
            return (Snark(vpk.vk, vi, prove(rebind_witness(vpk, vc), vi)),
                    Snark(spk.vk, si, prove(rebind_witness(spk, sc), si)))

        linkage, n_payload = zksnap_linkage, 28
        msm_trunc = None
        # the measured k=22 fixed point (runs/exp_shape_solve_k22_r5.log):
        # starting AT it makes the driver's solve a 1-iteration confirm
        shape_guess = WrapperShape(n_advice=30, n_lookup=3, n_z=18,
                                   n_perm=35, ext_log=3)
    print(f"children ready: {time.time()-t0:.1f}s", flush=True)

    # --- wrapper keygen (fixed point + real commitments) ---------------------
    t0 = time.time()
    srs_wrap = gen_srs(k_wrap)
    cfg = WrapperConfig(
        k=k_wrap, lookup_bits=14, voter_vk=vpk.vk, state_vk=spk.vk,
        shape=shape_guess, default_acc=default_accumulator(srs_wrap),
        linkage=linkage, n_payload=n_payload,
        msm_unsound_truncate=msm_trunc,
        msm_window=2 if toy else 4,
    )
    cfg, wpk = gen_wrapper_pk(cfg, srs_wrap, allow_unsound=toy,
                              cache_dir="build")
    comms = wpk.vk.commitments
    print(f"wrapper keygen: {time.time()-t0:.1f}s shape={cfg.shape}",
          flush=True)

    # --- the IVC loop ---------------------------------------------------------
    # Pipeline parallelism (SURVEY 2.3 P4): round r+1's child witnesses
    # are synthesized on a worker thread while round r's proofs occupy
    # the chip (the reference is strictly sequential, wrapper.rs:884-901).
    from zksnap_tpu.parallel.pipeline import Lookahead

    prev = initial_snark(cfg, comms)
    for r, synth in enumerate(Lookahead(child_ctxs, rounds)):
        t0 = time.time()
        voter, state = child_snarks(synth)
        print(f"round {r}: child proofs {time.time()-t0:.1f}s", flush=True)
        win = WrapperRoundInput(round=r, voter=voter, state=state,
                                prev=prev, self_commitments=comms)
        t0 = time.time()
        ctx = Context(lookup_bits=cfg.lookup_bits)
        cells = build_wrapper(ctx, cfg, win)
        inst = [c.value for c in cells]
        print(f"round {r}: wrapper trace {time.time()-t0:.1f}s "
              f"({len(ctx.advice)} cells)", flush=True)
        t0 = time.time()
        pk_r = rebind_witness(wpk, ctx)
        proof = prove(pk_r, inst)
        print(f"round {r}: wrapper proof {time.time()-t0:.1f}s "
              f"({len(proof)} bytes)", flush=True)
        prev = Snark(wpk.vk, inst, proof)
        if not toy:
            native, _ = wrapper_native(cfg, win)
            assert native == inst, "native mirror disagrees with trace"

    # --- decide ----------------------------------------------------------------
    if toy:
        print("toy mode: decide skipped (truncated MSMs are unsound by "
              "design); wrapper snarks proved + structure verified")
    else:
        ok = verify_wrapper_snark(cfg, comms, prev, srs_wrap)
        print(f"final decide: {ok}")
        assert ok
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
