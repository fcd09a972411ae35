#!/usr/bin/env python
"""Criterion-parity benchmark suite on the real TPU chip.

Mirrors the reference's bench matrix (SURVEY.md section 3.5):
  * voter-circuit prove latency at K=13 (voter/benches/voter_circuit.rs:23)
  * state-transition prove latency at K=15
    (aggregator/benches/state_transition_circuit.rs:22)
plus the kernel-level metrics BASELINE.md tracks:
  * BN254 Pippenger MSM throughput, 2^16..2^20
  * radix-2 NTT latency, 2^16..2^22

Writes BENCH_SUITE.json (one object, keyed metrics) and prints a table.
Usage: python scripts/bench_suite.py [--quick] [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.device_get(x))


def bench_msm(results, sizes, iters=3, profile_dir=None):
    import zksnap_tpu  # noqa: F401
    from zksnap_tpu.curves.jacobian import bn254_ops
    from zksnap_tpu.msm.pippenger import bn254_msm_proj

    ops = bn254_ops()  # point generation only; the MSM runs projective
    msm = bn254_msm_proj()
    for n_log in sizes:
        n = 1 << n_log

        @jax.jit
        def make_points():
            g = ops.generator((n,))
            idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
            nb = n_log + 1
            bits = jnp.stack([(idx >> (nb - 1 - b)) & 1 for b in range(nb)],
                             axis=-1)
            return ops.scalar_mul(g, bits)

        pts = jax.jit(lambda: ops.normalize(make_points()))()
        sync(pts.z[:1])
        key = jax.random.PRNGKey(n_log)
        scalars = jax.random.randint(key, (n, 16), 0, 1 << 16,
                                     dtype=jnp.uint32)
        scalars = scalars.at[:, 15].set(scalars[:, 15] & 0x3FFF)
        out = msm(pts, scalars)
        sync(out.z)
        t0 = time.time()
        for _ in range(iters):
            out = msm(pts, scalars)
        sync(out.z)
        dt = (time.time() - t0) / iters
        if profile_dir and n_log == sizes[-1]:
            # criterion+pprof analogue (voter_circuit.rs:87-92): one
            # device trace of the steady-state MSM at the LAST (largest)
            # swept size, viewable in tensorboard / xprof
            with jax.profiler.trace(profile_dir):
                sync(msm(pts, scalars).z)
            profile_dir = None
        results[f"msm_2e{n_log}_ms"] = round(dt * 1000, 1)
        results[f"msm_2e{n_log}_mpts_s"] = round(n / dt / 1e6, 3)
        print(f"msm 2^{n_log}: {dt*1000:.1f} ms  "
              f"{n/dt/1e6:.3f} Mpts/s", flush=True)


def bench_ntt(results, sizes, iters=5):
    from zksnap_tpu.fields.field import bn254_fr
    from zksnap_tpu.poly.ntt import ntt

    F = bn254_fr()
    for k in sizes:
        n = 1 << k
        x = F.to_mont(list(range(1, n + 1)))
        fwd = ntt(k).forward
        out = fwd(x)
        sync(out[:1])
        t0 = time.time()
        for _ in range(iters):
            out = fwd(x)
        sync(out[:1])
        dt = (time.time() - t0) / iters
        results[f"ntt_2e{k}_ms"] = round(dt * 1000, 2)
        print(f"ntt 2^{k}: {dt*1000:.2f} ms", flush=True)


def bench_proofs(results, voter_k=13, state_k=15):
    import random

    from zksnap_tpu.circuits.state_transition import (
        expected_instances as st_expected,
        state_transition_circuit,
    )
    from zksnap_tpu.circuits.voter import (
        expected_instances as voter_expected,
        voter_circuit,
    )
    from zksnap_tpu.natives import generate_wrapper_circuit_input
    from zksnap_tpu.prover import gen_srs, keygen, prove
    from zksnap_tpu.prover.plonk import rebind_witness, verify
    from zksnap_tpu.trace import Context

    rng = random.Random(20260818)
    voter_inputs, state_inputs = generate_wrapper_circuit_input(1, rng)

    for name, k, build, inp, exp in (
        ("voter", voter_k, voter_circuit, voter_inputs[0], voter_expected),
        ("state_transition", state_k, state_transition_circuit,
         state_inputs[0], st_expected),
    ):
        t0 = time.time()
        ctx = Context(lookup_bits=min(14, k - 1))
        pub = []
        if name == "voter":
            # bench shape is the reference's K=13 (voter_circuit.rs:23):
            # PLUME (default ON) only fits the k>=21 production shape
            from zksnap_tpu.circuits.voter import VoterFlags

            build(ctx, inp, pub, VoterFlags(check_plume=False))
        else:
            build(ctx, inp, pub)
        wit_s = time.time() - t0
        srs = gen_srs(k)
        t0 = time.time()
        pk = keygen(ctx, k, srs)
        keygen_s = time.time() - t0
        pk = rebind_witness(pk, ctx)
        inst = [c.value for c in pub]
        t0 = time.time()
        proof = prove(pk, inst)         # compile + prove (cold)
        cold_s = time.time() - t0
        t0 = time.time()
        proof = prove(pk, inst)         # warm
        warm_s = time.time() - t0
        assert verify(pk.vk, srs.g2, srs.tau_g2, inst, proof)
        results[f"{name}_k{k}_witness_s"] = round(wit_s, 2)
        results[f"{name}_k{k}_keygen_s"] = round(keygen_s, 2)
        results[f"{name}_k{k}_prove_cold_s"] = round(cold_s, 2)
        results[f"{name}_k{k}_prove_warm_s"] = round(warm_s, 2)
        print(f"{name} k={k}: witness {wit_s:.1f}s keygen {keygen_s:.1f}s "
              f"prove cold {cold_s:.1f}s warm {warm_s:.1f}s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sweep only (smoke test)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "BENCH_SUITE.json"))
    ap.add_argument("--skip-proofs", action="store_true")
    ap.add_argument("--profile", action="store_true",
                    help="capture a jax.profiler device trace of the "
                         "steady-state MSM into runs/profile/")
    args = ap.parse_args()

    prof = None
    if args.profile:
        prof = os.path.join(os.path.dirname(__file__), "..", "runs",
                            "profile")
        os.makedirs(prof, exist_ok=True)

    results = {"device": str(jax.devices()),
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    if args.quick:
        bench_msm(results, [14], iters=1, profile_dir=prof)
        bench_ntt(results, [14], iters=2)
    else:
        bench_msm(results, [16, 18, 20], profile_dir=prof)
        bench_ntt(results, [16, 18, 20, 22])
        if not args.skip_proofs:
            bench_proofs(results)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
