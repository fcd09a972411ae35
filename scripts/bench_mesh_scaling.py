#!/usr/bin/env python
"""Virtual-mesh scaling table: sharded MSM + four-step NTT at 1/2/4/8
devices (VERDICT r4 item 8 / BASELINE.md >=70% scaling target).

Runs on the CPU backend with xla_force_host_platform_device_count, so
wall-clock "speedup" is bounded by the PHYSICAL core count -- the table
therefore reports, per device count:

  * measured wall time (honest, contention included);
  * per-device work share (the quantity that scales on real chips);
  * the communication model: bytes over the mesh axis per op.

Communication model (what rides ICI on real hardware):
  * sharded MSM: each device Pippengers its n/d point shard; ONE
    all_gather of d partial sums = 3*16*4 bytes * d per device.
  * four-step NTT: ONE all_to_all moving the full poly once =
    n*16*4 bytes / d per device (each device sends (d-1)/d of its shard).

Usage: python scripts/bench_mesh_scaling.py [out_json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from zksnap_tpu.curves.jacobian import bn254_ops
    from zksnap_tpu.fields import bn254_fr
    from zksnap_tpu.poly.ntt import (
        four_step_input_perm,
        four_step_ntt,
        four_step_output_perm,
        ntt,
    )
    from zksnap_tpu.curves.proj import bn254_proj_ops as bn254_proj
    from zksnap_tpu.parallel.sharded import sharded_msm

    F = bn254_fr()
    ops = bn254_ops()

    def sync(x):
        return np.asarray(jax.device_get(x))

    results = {"physical_cores": os.cpu_count(), "rows": []}

    def bench(fn, iters=3):
        fn()  # compile
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        sync(out if not isinstance(out, tuple) else out[0])
        return (time.time() - t0) / iters

    # --- MSM scaling -------------------------------------------------------
    for logn in (16, 18):
        n = 1 << logn
        g = ops.generator((n,))
        idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
        bits = jnp.stack([(idx >> (logn - b)) & 1
                          for b in range(logn + 1)], axis=-1)
        pts = jax.jit(lambda: ops.normalize(ops.scalar_mul(g, bits)))()
        sync(pts.z[:1])
        key = jax.random.PRNGKey(0)
        sc = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.uint32)
        sc = sc.at[:, 15].set(sc[:, 15] & 0x3FFF)

        for nd in (1, 2, 4, 8):
            if nd == 1:
                from zksnap_tpu.msm.pippenger import bn254_msm_proj

                msm = bn254_msm_proj()
                dt = bench(lambda: msm(pts, sc).z)
            else:
                mesh = jax.make_mesh(
                    (nd,), ("x",),
                    axis_types=(jax.sharding.AxisType.Auto,))
                dt = bench(lambda: sharded_msm(
                    bn254_proj(), pts, sc, mesh, "x").z)
            row = {
                "op": f"msm_2e{logn}", "devices": nd, "wall_s": round(dt, 3),
                "work_per_dev": n // nd,
                "comm_bytes_per_dev": 3 * 16 * 4 * nd,
            }
            results["rows"].append(row)
            print(row, flush=True)

    # --- four-step NTT scaling --------------------------------------------
    for logn in (20, 22):
        n = 1 << logn
        x = jax.jit(lambda: jnp.ones((n, 16), jnp.uint32))()
        sync(x[:1])
        for nd in (1, 2, 4, 8):
            if nd == 1:
                t = ntt(logn)
                dt = bench(lambda: t.forward(x))
            else:
                mesh = jax.make_mesh(
                    (nd,), ("x",),
                    axis_types=(jax.sharding.AxisType.Auto,))
                inp = jnp.asarray(four_step_input_perm(logn, nd))
                xp = x[inp]
                dt = bench(lambda: four_step_ntt(xp, logn, mesh, "x"))
            row = {
                "op": f"ntt_2e{logn}", "devices": nd, "wall_s": round(dt, 3),
                "work_per_dev": (n * logn) // nd,
                "comm_bytes_per_dev": (n * 16 * 4) // max(nd, 1),
            }
            results["rows"].append(row)
            print(row, flush=True)

    out = sys.argv[1] if len(sys.argv) > 1 else "runs/mesh_scaling_r5.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
