#!/usr/bin/env python
"""Probe the full-width wrapper dummy synthesis (the r4 ~100GB wall).

Runs ONE build_wrapper dummy-round synthesis at production width with:
  * a monitor thread printing advice-cell count + RSS every 30s;
  * faulthandler stack dumps every 120s (where is the time going?);
  * a hard deadline (default 900s) so the probe never hangs a session.

The r4 postmortem (runs/wrapper_sound_2x21_r4.log) saw >3h and ~100GB
RSS with zero "shape iter" lines: the FIRST dummy synthesis never
finished.  Isolated MsmGadget synthesis measures 400k cells/s flat
through 21M cells (~120B/cell RSS), so the pathology is in the
build_wrapper path proper -- this probe localizes it.

Usage: JAX_PLATFORMS=cpu python scripts/exp_wrapper_synth_probe.py [deadline_s]
"""

import faulthandler
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    import random

    import jax

    jax.config.update("jax_platforms", "cpu")

    from zksnap_tpu.circuits.state_transition import state_transition_circuit
    from zksnap_tpu.circuits.voter import VoterFlags, voter_circuit
    from zksnap_tpu.circuits.wrapper import (
        WrapperConfig,
        WrapperShape,
        _dummy_round,
        build_wrapper,
        default_accumulator,
        zksnap_linkage,
    )
    from zksnap_tpu.natives import generate_wrapper_circuit_input
    from zksnap_tpu.prover import gen_srs, keygen
    from zksnap_tpu.trace import Context

    t0 = time.time()

    def mark(s):
        print(f"[{time.time()-t0:7.1f}s] {s}", flush=True)

    rng = random.Random(20260820)
    k_child = 13
    voter_inputs, state_inputs = generate_wrapper_circuit_input(1, rng)
    vctx = Context(lookup_bits=k_child - 1)
    vpub = []
    voter_circuit(vctx, voter_inputs[0], vpub, VoterFlags(check_plume=False))
    sctx = Context(lookup_bits=k_child - 1)
    spub = []
    state_transition_circuit(sctx, state_inputs[0], spub)
    mark(f"child synth done ({len(vctx.advice)} + {len(sctx.advice)} cells)")

    # STRUCTURAL child vks: the shape solve only consumes vk structure +
    # commitment names (values are MSM bases; placeholders suffice for a
    # cell-count probe).  Skips the device keygen entirely -- the real
    # run's children keygen'd fine on TPU (697s); the probe target is the
    # PYTHON synthesis phase after it.
    from zksnap_tpu.curves.native import BN254_G1, AffinePoint
    from zksnap_tpu.poly.domain import domain
    from zksnap_tpu.prover.keygen import layout_circuit
    from zksnap_tpu.prover.plonk import PERM_CHUNK, VerifyingKey

    from zksnap_tpu.prover.keygen import quotient_ext_log

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
    mark(f"structural vks: voter {voter_vk.n_advice}adv/{voter_vk.n_lookup}lk"
         f" state {state_vk.n_advice}adv/{state_vk.n_lookup}lk")

    k_wrap = 21
    srs_wrap = gen_srs(13)  # only default_acc needs g1[:2]; k irrelevant
    cfg = WrapperConfig(
        k=k_wrap, lookup_bits=14, voter_vk=voter_vk, state_vk=state_vk,
        shape=WrapperShape(n_advice=12, n_lookup=6, n_z=10, n_perm=20,
                           ext_log=3),
        default_acc=default_accumulator(srs_wrap),
        linkage=zksnap_linkage, n_payload=28,
    )

    ctx = Context(lookup_bits=cfg.lookup_bits, assert_witness=False)
    done = threading.Event()

    def monitor():
        # NOTE: no dump_traceback_later(repeat=True) here -- walking the
        # running main thread's frames segfaulted libpython (observed
        # in-session); the one-shot dump at deadline is risk enough.
        while not done.wait(30):
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
            mark(f"monitor: {len(ctx.advice)/1e6:.2f}M cells, "
                 f"{len(ctx.copies)/1e6:.2f}M copies, rss {rss:.0f}MB")
            if time.time() - t0 > deadline:
                mark("DEADLINE: dumping final stack and exiting")
                faulthandler.dump_traceback()
                os._exit(3)

    threading.Thread(target=monitor, daemon=True).start()
    mark("dummy build_wrapper starting")
    build_wrapper(ctx, cfg, _dummy_round(cfg))
    done.set()
    mark(f"dummy build_wrapper DONE: {ctx.stats()}")


if __name__ == "__main__":
    main()
