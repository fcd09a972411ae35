#!/usr/bin/env python
"""Solve the wrapper's self-referential shape fixed point on CPU.

Runs `solve_wrapper_shape` (pure host synthesis, no TPU) with STRUCTURAL
child vks (real k=13 voter/state layouts, placeholder commitments -- the
shape only depends on vk structure) and prints every iteration.  Used to
pick the production wrapper domain size k (r5: the k=21 solve diverged
before the verifier gadget's per-base scalar aggregation; this measures
the post-dedupe fixed point per k).

Usage: python scripts/exp_shape_solve.py [k_wrap] [guess_advice]
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    k_wrap = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    guess_adv = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from zksnap_tpu.circuits.state_transition import state_transition_circuit
    from zksnap_tpu.circuits.voter import VoterFlags, voter_circuit
    from zksnap_tpu.circuits.wrapper import (
        WrapperConfig,
        WrapperShape,
        default_accumulator,
        solve_wrapper_shape,
        zksnap_linkage,
    )
    from zksnap_tpu.curves.native import BN254_G1, AffinePoint
    from zksnap_tpu.natives import generate_wrapper_circuit_input
    from zksnap_tpu.poly.domain import domain
    from zksnap_tpu.prover.keygen import (
        PERM_CHUNK,
        layout_circuit,
        quotient_ext_log,
    )
    from zksnap_tpu.prover.plonk import VerifyingKey
    from zksnap_tpu.prover.srs import gen_srs
    from zksnap_tpu.trace import Context

    t0 = time.time()
    rng = random.Random(20260820)
    k_child = 13
    voter_inputs, state_inputs = generate_wrapper_circuit_input(1, rng)
    vctx = Context(lookup_bits=k_child - 1)
    voter_circuit(vctx, voter_inputs[0], [], VoterFlags(check_plume=False))
    sctx = Context(lookup_bits=k_child - 1)
    state_transition_circuit(sctx, state_inputs[0], [])

    def structural_vk(cctx, k):
        layout = layout_circuit(cctx, k)
        n_perm = len(layout.perm_columns)
        g = AffinePoint.generator(BN254_G1)
        names = ([f"q_{i}" for i in range(layout.n_advice)]
                 + ["const", "table", "active"]
                 + [f"sigma_{j}" for j in range(n_perm)])
        return VerifyingKey(
            k=k, ext_log=quotient_ext_log(layout.n_lookup),
            n_advice=layout.n_advice, n_lookup=layout.n_lookup,
            lookup_bits=layout.lookup_bits, n_perm=n_perm,
            n_z=-(-n_perm // PERM_CHUNK), usable=layout.usable,
            deltas=layout.deltas, num_instance=len(cctx.instance),
            commitments={nm: (i + 2) * g for i, nm in enumerate(names)},
            omega=domain(k).omega)

    voter_vk = structural_vk(vctx, k_child)
    state_vk = structural_vk(sctx, k_child)
    print(f"[{time.time()-t0:.1f}s] children structural: "
          f"voter {voter_vk.n_advice}adv state {state_vk.n_advice}adv",
          flush=True)

    guess = WrapperShape(
        n_advice=guess_adv, n_lookup=3,
        n_z=-(-(guess_adv + 5) // PERM_CHUNK), n_perm=guess_adv + 5,
        ext_log=3)
    cfg = WrapperConfig(
        k=k_wrap, lookup_bits=14, voter_vk=voter_vk, state_vk=state_vk,
        shape=guess, default_acc=default_accumulator(gen_srs(13)),
        linkage=zksnap_linkage, n_payload=28)
    cfg, ctx = solve_wrapper_shape(cfg, max_iter=8, verbose=True)
    print(f"[{time.time()-t0:.1f}s] CONVERGED k={k_wrap}: {cfg.shape} "
          f"({len(ctx.advice)} cells)", flush=True)


if __name__ == "__main__":
    main()
