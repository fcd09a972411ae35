"""Command-line delivery surface.

Reference parity: the reference ships criterion benches + a browser
frontend (SURVEY.md L7); this framework's delivery surface is a python
API + this CLI:

  python -m zksnap_tpu.cli keygen  --circuit voter --k 13 --out build/
  python -m zksnap_tpu.cli prove   --circuit voter --k 13 --pk build/voter_pk.bin --out build/voter.proof
  python -m zksnap_tpu.cli verify  --vk build/voter_vk.bin --proof build/voter.proof --instances build/voter.inst.json
  python -m zksnap_tpu.cli bench   --kernel msm

Inputs are generated with the native mirror (random, like the reference
tests); wiring real DTOs in is a JSON-schema addition on VoterCircuitInput.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import time


def _build_circuit(name: str, k: int, seed: int):
    from .natives import (
        generate_random_voter_circuit_inputs,
        generate_wrapper_circuit_input,
    )
    from .trace import Context, check

    rng = random.Random(seed)
    ctx = Context(lookup_bits=min(14, k - 1))
    pub = []
    if name == "voter":
        from .circuits.voter import (VoterFlags, expected_instances,
                                     voter_circuit)

        inp = generate_random_voter_circuit_inputs(rng)
        # PLUME needs the k>=21 production shape; opt out below it
        voter_circuit(ctx, inp, pub,
                      VoterFlags(check_plume=k >= 21))
        check(ctx, expected_instances(inp))
    elif name == "state_transition":
        from .circuits.state_transition import (
            expected_instances,
            state_transition_circuit,
        )

        _, sts = generate_wrapper_circuit_input(1, rng)
        state_transition_circuit(ctx, sts[0], pub)
        check(ctx, expected_instances(sts[0]))
    else:
        raise SystemExit(f"unknown circuit {name}")
    return ctx, [c.value for c in pub]


def cmd_keygen(args):
    from .prover import gen_srs, keygen, save_pk, save_vk

    ctx, instances = _build_circuit(args.circuit, args.k, args.seed)
    srs = gen_srs(args.k)
    t0 = time.time()
    pk = keygen(ctx, args.k, srs)
    print(f"keygen {time.time()-t0:.1f}s", file=sys.stderr)
    save_pk(pk, f"{args.out}/{args.circuit}_pk.bin")
    save_vk(pk.vk, f"{args.out}/{args.circuit}_vk.bin")
    print(f"wrote {args.out}/{args.circuit}_{{pk,vk}}.bin")


def cmd_prove(args):
    from .prover import load_pk, prove, proof_to_bytes
    from .prover.plonk import rebind_witness

    ctx, instances = _build_circuit(args.circuit, args.k, args.seed)
    pk = rebind_witness(load_pk(args.pk), ctx)
    t0 = time.time()
    proof = prove(pk, instances)
    print(f"prove {time.time()-t0:.1f}s", file=sys.stderr)
    with open(args.out, "wb") as f:
        f.write(proof_to_bytes(proof))
    with open(args.out + ".inst.json", "w") as f:
        json.dump(instances, f)
    print(f"wrote {args.out} (+ .inst.json)")


def cmd_verify(args):
    from .prover import gen_srs, load_vk, proof_from_bytes, verify

    vk = load_vk(args.vk)
    with open(args.proof, "rb") as f:
        proof = proof_from_bytes(f.read())
    with open(args.instances) as f:
        instances = json.load(f)
    srs = gen_srs(vk.k)
    t0 = time.time()
    ok = verify(vk, srs.g2, srs.tau_g2, instances, proof)
    print(f"verify: {ok} ({time.time()-t0:.1f}s)")
    raise SystemExit(0 if ok else 1)


def cmd_bench(args):
    import subprocess

    raise SystemExit(subprocess.call([sys.executable, "bench.py"]))


def main():
    ap = argparse.ArgumentParser(prog="zksnap_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("keygen")
    kg.add_argument("--circuit", default="voter")
    kg.add_argument("--k", type=int, default=13)
    kg.add_argument("--seed", type=int, default=0)
    kg.add_argument("--out", default="build")
    kg.set_defaults(fn=cmd_keygen)

    pv = sub.add_parser("prove")
    pv.add_argument("--circuit", default="voter")
    pv.add_argument("--k", type=int, default=13)
    pv.add_argument("--seed", type=int, default=0)
    pv.add_argument("--pk", required=True)
    pv.add_argument("--out", default="build/proof.bin")
    pv.set_defaults(fn=cmd_prove)

    vf = sub.add_parser("verify")
    vf.add_argument("--vk", required=True)
    vf.add_argument("--proof", required=True)
    vf.add_argument("--instances", required=True)
    vf.set_defaults(fn=cmd_verify)

    bn = sub.add_parser("bench")
    bn.add_argument("--kernel", default="msm")
    bn.set_defaults(fn=cmd_bench)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
