#!/usr/bin/env python
"""P1 measurement: batched voter witness generation (VERDICT r3 item 9).

Synthesizes N voter circuits serially and then via
parallel.batch_witnesses (ProcessPoolExecutor) and reports the speedup.
Pure host CPU -- no TPU needed.

Usage: python scripts/bench_batch_witness.py [N=4] [--plume]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zksnap_tpu.circuits.voter import VoterFlags, voter_circuit
from zksnap_tpu.natives import generate_random_voter_circuit_inputs
from zksnap_tpu.parallel.batch_witness import batch_witnesses
from zksnap_tpu.trace import Context

_PLUME = False


def build_voter(inp):
    ctx = Context(lookup_bits=14)
    pub = []
    voter_circuit(ctx, inp, pub, VoterFlags(check_plume=_PLUME))
    return ctx, [c.value for c in pub]


def main():
    global _PLUME
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=4)
    ap.add_argument("--plume", action="store_true")
    args = ap.parse_args()
    _PLUME = args.plume

    import random

    rng = random.Random(20260820)
    inputs = [generate_random_voter_circuit_inputs(rng) for _ in range(args.n)]

    t0 = time.time()
    one = build_voter(inputs[0])
    t_one = time.time() - t0
    print(f"single witness: {t_one:.1f}s "
          f"({len(one[0].advice)} cells, plume={_PLUME})", flush=True)

    t0 = time.time()
    out = batch_witnesses(build_voter, inputs)
    t_batch = time.time() - t0
    assert len(out) == args.n and all(len(c.advice) == len(one[0].advice)
                                      for c, _ in out)
    print(f"batched x{args.n}: {t_batch:.1f}s total "
          f"({t_batch/args.n:.1f}s/witness, "
          f"{t_one*args.n/t_batch:.2f}x speedup vs serial, "
          f"{os.cpu_count()} cores)", flush=True)


if __name__ == "__main__":
    main()
