"""Multi-host runtime: process bootstrap, ("host", "chip") meshes, and a
scaling-efficiency harness.

The reference is single-process (SURVEY.md section 2.3: rayon threads
inside the halo2 prover, no distributed backend at all); this module is
the NEW first-class communication layer the TPU build adds.  Design per
the standard JAX multi-host recipe: one process per host, XLA
collectives over ICI within a slice and DCN across slices, shardings
expressed on a 2-axis mesh so domain-sharded NTT / point-sharded MSM
collectives ride ICI ("chip" axis) and only coarse data parallelism
crosses hosts ("host" axis).

Everything degrades gracefully to single-process: `initialize()` is a
no-op without coordinator configuration, and `protocol_mesh()` folds the
host axis to 1 when there is a single process -- the same code paths run
on the 8-device virtual CPU mesh in tests and on a real pod.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Bring up the jax.distributed runtime when multi-host config is
    present (args > env > nothing).  Returns True iff distributed mode
    is active.

    Env contract (mirrors jax.distributed.initialize's auto-detection,
    with explicit overrides for bare-metal launches):
      ZKSNAP_COORDINATOR   host:port of process 0
      ZKSNAP_NUM_PROCESSES total process count
      ZKSNAP_PROCESS_ID    this process's rank
    """
    import jax

    coordinator = coordinator or os.environ.get("ZKSNAP_COORDINATOR")
    if num_processes is None and "ZKSNAP_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ZKSNAP_NUM_PROCESSES"])
    if process_id is None and "ZKSNAP_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ZKSNAP_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        # single-host (or TPU pod auto-detection handled by jax itself
        # when running under a supported orchestrator)
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


@dataclass
class ProtocolMesh:
    """The framework's standard 2-axis mesh.

    axis "host": data parallelism (independent proofs / witness batches)
    -- collectives cross DCN, so only coarse-grained work lands here.
    axis "chip": tensor/sequence parallelism (four-step NTT all_to_all,
    MSM psum) -- collectives stay on ICI.
    """

    mesh: object           # jax.sharding.Mesh
    n_hosts: int
    chips_per_host: int


def protocol_mesh(chips_per_host: int | None = None) -> ProtocolMesh:
    """Build the ("host", "chip") mesh over all addressable devices."""
    import jax

    n_proc = max(jax.process_count(), 1)
    total = len(jax.devices())
    if chips_per_host is None:
        chips_per_host = total // n_proc
    n_hosts = total // chips_per_host
    mesh = jax.make_mesh(
        (n_hosts, chips_per_host), ("host", "chip"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )
    return ProtocolMesh(mesh=mesh, n_hosts=n_hosts,
                        chips_per_host=chips_per_host)


def chip_submesh(pm: ProtocolMesh):
    """1-D ("x",) mesh over this configuration's chip axis -- the shape
    parallel/sharded.py and poly/ntt.py kernels take today."""
    import jax

    return jax.make_mesh(
        (pm.n_hosts * pm.chips_per_host,), ("x",),
        axis_types=(jax.sharding.AxisType.Auto,),
    )


# ---------------------------------------------------------------------------
# Scaling-efficiency harness (BASELINE.md: >= 70% at 1 -> N chips)
# ---------------------------------------------------------------------------

def scaling_efficiency(work_fn, sizes: list[int], mesh_for) -> list[dict]:
    """Measure strong-scaling efficiency of `work_fn(n_chips, mesh)`.

    `work_fn` must run ONE fixed-size workload sharded over the given
    mesh and block until done; `mesh_for(n)` builds an n-chip mesh.
    Returns [{n, seconds, speedup, efficiency}] with n=sizes[0] as the
    baseline.  Pure measurement -- callers print / persist.
    """
    out = []
    base = None
    for n in sizes:
        mesh = mesh_for(n)
        work_fn(n, mesh)          # warm-up / compile
        t0 = time.time()
        work_fn(n, mesh)
        dt = time.time() - t0
        if base is None:
            base = (sizes[0], dt)
        out.append({
            "n": n,
            "seconds": dt,
            "speedup": base[1] / dt if dt else float("inf"),
            "efficiency": (base[1] / dt) / (n / base[0]) if dt
                          else float("inf"),
        })
    return out
