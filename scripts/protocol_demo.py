#!/usr/bin/env python
"""Full-protocol demo: the native parity of the reference's
`test_recursion` flow (wrapper.rs:943-1159) minus the in-circuit wrapper:

  N voting rounds -> voter proof + state-transition proof per round ->
  succinct-verify each into KZG accumulators -> fold across the chain
  with cross-proof consistency checks -> ONE final pairing.

Usage: python scripts/protocol_demo.py [rounds] [k]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 13

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
    from zksnap_tpu.prover import (
        RecursionChain,
        Snark,
        gen_srs,
        keygen,
        prove,
    )
    from zksnap_tpu.prover.plonk import rebind_witness
    from zksnap_tpu.trace import Context, check

    print(f"devices: {jax.devices()}; rounds={rounds} k={k}", flush=True)
    rng = random.Random(20260817)

    t0 = time.time()
    voter_inputs, state_inputs = generate_wrapper_circuit_input(rounds, rng)
    print(f"protocol inputs: {time.time()-t0:.1f}s", flush=True)

    srs = gen_srs(k)
    chain = RecursionChain(srs.g2, srs.tau_g2)
    pk_cache = {}

    for rnd in range(rounds):
        t0 = time.time()
        vctx = Context(lookup_bits=min(14, k - 1))
        vpub = []
        # demo runs at small k: opt out of the k>=21 PLUME shape
        voter_circuit(vctx, voter_inputs[rnd], vpub,
                      VoterFlags(check_plume=False))
        check(vctx, voter_expected(voter_inputs[rnd]))
        sctx = Context(lookup_bits=min(14, k - 1))
        spub = []
        state_transition_circuit(sctx, state_inputs[rnd], spub)
        check(sctx, st_expected(state_inputs[rnd]))
        print(f"round {rnd}: witnesses {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        if "voter" not in pk_cache:
            pk_cache["voter"] = keygen(vctx, k, srs)
            pk_cache["state"] = keygen(sctx, k, srs)
            print(f"round {rnd}: keygen {time.time()-t0:.1f}s", flush=True)
        vpk = rebind_witness(pk_cache["voter"], vctx)
        spk = rebind_witness(pk_cache["state"], sctx)

        t0 = time.time()
        vproof = prove(vpk, [c.value for c in vpub])
        sproof = prove(spk, [c.value for c in spub])
        print(f"round {rnd}: proofs {time.time()-t0:.1f}s", flush=True)

        t0 = time.time()
        chain.add_round(
            Snark(vpk.vk, [c.value for c in vpub], vproof),
            Snark(spk.vk, [c.value for c in spub], sproof),
        )
        print(f"round {rnd}: accumulated {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    ok = chain.finalize()
    print(f"FINAL DECIDE (one pairing for {rounds} rounds, "
          f"{2*rounds} proofs): {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok


if __name__ == "__main__":
    main()
