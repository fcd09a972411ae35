#!/usr/bin/env python
"""Prove + verify the voter circuit end-to-end on the current JAX device.

The TPU analogue of the reference's `cargo bench --bench voter_circuit`
(voter/benches/voter_circuit.rs: witness gen + gen_proof at K=13) plus the
self-verify from wrapper.rs:141-155.  `--plume` turns on the reference's
dominant LIVE constraint, `verify_plume(ctx, ecc, sha256, 4, 4, input)`
(voter/src/lib.rs:276-283); `--enc` additionally enables the Paillier
re-encryption check the reference keeps commented out
(voter/src/lib.rs:243-248).

Usage: python scripts/prove_voter_tpu.py [k] [--plume] [--enc] [--no-check]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("k", nargs="?", type=int, default=13)
    ap.add_argument("--plume", action="store_true", default=True,
                    help="in-circuit PLUME verification (the reference's "
                         "live heavyweight constraint) -- DEFAULT ON")
    ap.add_argument("--no-plume", dest="plume", action="store_false",
                    help="opt out of PLUME (small-k shapes)")
    ap.add_argument("--enc", action="store_true",
                    help="enable the Paillier re-encryption check")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the MockProver-style witness check")
    ap.add_argument("--warm-iters", type=int, default=1)
    args = ap.parse_args()
    k = args.k
    import random

    from zksnap_tpu.circuits.voter import (
        VoterFlags, expected_instances, voter_circuit)
    from zksnap_tpu.natives import generate_random_voter_circuit_inputs
    from zksnap_tpu.prover.plonk import keygen, prove, verify
    from zksnap_tpu.prover.srs import gen_srs
    from zksnap_tpu.trace import Context, check

    print(f"devices: {jax.devices()}", flush=True)
    rng = random.Random(20260817)

    t0 = time.time()
    inp = generate_random_voter_circuit_inputs(rng)
    # halo2-base convention: lookup_bits = k - 1 (reference uses 14 at k=15)
    ctx = Context(lookup_bits=min(14, k - 1))
    pub = []
    flags = VoterFlags(check_plume=args.plume, check_encryption=args.enc)
    voter_circuit(ctx, inp, pub, flags)
    t_wit = time.time() - t0
    print(f"witness gen: {t_wit:.2f}s  {ctx.stats()}  flags={flags}",
          flush=True)
    if not args.no_check:
        t0 = time.time()
        stats = check(ctx, expected_instances(inp))
        print(f"mock check: {time.time()-t0:.2f}s  {stats}", flush=True)

    t0 = time.time()
    srs = gen_srs(k)
    print(f"srs(k={k}): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    pk = keygen(ctx, k, srs)
    print(f"keygen: {time.time()-t0:.1f}s  "
          f"(advice={pk.vk.n_advice} lookup={pk.vk.n_lookup} "
          f"perm={pk.vk.n_perm} ext=2^{pk.vk.ext_log})", flush=True)

    instances = [c.value for c in pub]
    t0 = time.time()
    proof = prove(pk, instances)
    t_prove = time.time() - t0
    print(f"prove: {t_prove:.1f}s ({len(proof)} proof bytes)", flush=True)

    t0 = time.time()
    ok = verify(pk.vk, srs.g2, srs.tau_g2, instances, proof)
    print(f"verify: {ok} ({time.time()-t0:.1f}s)", flush=True)
    assert ok

    # warm proofs with compiled kernels = the steady-state number
    for _ in range(args.warm_iters):
        t0 = time.time()
        prove(pk, instances)
        print(f"prove (warm): {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
