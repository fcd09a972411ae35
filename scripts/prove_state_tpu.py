#!/usr/bin/env python
"""Prove + verify the state-transition circuit end-to-end on the current
device at the reference's k=15 (state_transition.rs:328-335) -- the TPU
analogue of `cargo bench --bench state_transition_circuit`."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    import random

    from zksnap_tpu.circuits.state_transition import (
        expected_instances,
        state_transition_circuit,
    )
    from zksnap_tpu.natives import generate_wrapper_circuit_input
    from zksnap_tpu.prover.plonk import keygen, prove, verify
    from zksnap_tpu.prover.srs import gen_srs
    from zksnap_tpu.trace import Context, check

    print(f"devices: {jax.devices()}", flush=True)
    rng = random.Random(20260817)

    t0 = time.time()
    _, st_inputs = generate_wrapper_circuit_input(1, rng)
    inp = st_inputs[0]
    ctx = Context(lookup_bits=min(14, k - 1))
    pub = []
    state_transition_circuit(ctx, inp, pub)
    stats = check(ctx, expected_instances(inp))
    print(f"witness gen + mock check: {time.time()-t0:.2f}s  {stats}", flush=True)

    t0 = time.time()
    srs = gen_srs(k)
    print(f"srs(k={k}): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    pk = keygen(ctx, k, srs)
    print(f"keygen: {time.time()-t0:.1f}s  (advice={pk.vk.n_advice} "
          f"lookup={pk.vk.n_lookup} perm={pk.vk.n_perm} z={pk.vk.n_z})",
          flush=True)

    instances = [c.value for c in pub]
    t0 = time.time()
    proof = prove(pk, instances)
    print(f"prove: {time.time()-t0:.1f}s ({len(proof)} elements)", flush=True)

    t0 = time.time()
    ok = verify(pk.vk, srs.g2, srs.tau_g2, instances, proof)
    print(f"verify: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok

    t0 = time.time()
    prove(pk, instances)
    print(f"prove (warm): {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
