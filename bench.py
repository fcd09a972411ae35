#!/usr/bin/env python
"""Headline benchmark: BN254 Pippenger MSM throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo publishes no numbers (BASELINE.md); its hot path is
halo2_proofs' multicore CPU `best_multiexp` inside `create_proof`
(SURVEY.md section 3.2).  As the provisional baseline we use 4.0 Mpoints/s
-- a typical multicore-CPU Pippenger rate at 2^16 points for BN254 (the
class of machine `cargo bench` would use).  vs_baseline > 1 means faster
than that reference estimate.

Timing notes: through the axon relay `block_until_ready` does not block, so
we synchronize with a tiny readback after each run (see
.claude/skills/verify/SKILL.md).
"""

import json
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BENCH_DEADLINE_S = 30 * 60


def _deadline(signum, frame):
    # Emit a well-formed result even if the device/relay stalls: the driver
    # needs exactly one JSON line.
    print(json.dumps({
        "metric": "bn254_fixed_base_commit_2e16_throughput",
        "value": 0.0,
        "unit": "Mpoints/s",
        "vs_baseline": 0.0,
    }))
    print("# bench deadline hit (device stall?)", file=sys.stderr)
    sys.stdout.flush()
    sys.exit(0)


signal.signal(signal.SIGALRM, _deadline)
signal.alarm(BENCH_DEADLINE_S)


def sync(x):
    return np.asarray(jax.device_get(x))


def main():
    import zksnap_tpu  # noqa: F401  (enables the compile cache)
    from zksnap_tpu.curves.jacobian import bn254_ops
    from zksnap_tpu.msm.fixed_base import build_table, commit_fixed
    from zksnap_tpu.msm.pippenger import bn254_msm_proj

    ops = bn254_ops()  # point generation only; the MSM runs projective
    n = 1 << 16

    @jax.jit
    def make_points():
        # P_i = (i+1)*G, batched double-and-add over 17 index bits
        g = ops.generator((n,))
        idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
        bits = jnp.stack([(idx >> (16 - b)) & 1 for b in range(17)], axis=-1)
        return ops.scalar_mul(g, bits)

    # normalize to affine-or-identity: the MSM's bucket-accumulation scan
    # streams points through the mixed add (z must be 0 or Montgomery 1)
    pts = jax.jit(lambda: ops.normalize(make_points()))()
    sync(pts.z[:1])

    key = jax.random.PRNGKey(0)
    scalars = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.uint32)
    scalars = scalars.at[:, 15].set(scalars[:, 15] & 0x3FFF)  # < 2^254

    # headline: the prover's actual commit path -- fixed-base MSM over a
    # precomputed shifted-point table (every KZG commit multiplies the
    # same SRS basis; msm/fixed_base.py).  The table build is one-time
    # per (k, SRS) and excluded, like halo2 excludes SRS setup.
    tab = build_table(pts, n, c=16)
    out = commit_fixed(tab, scalars)   # compile + first run
    sync(out.z)
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        out = commit_fixed(tab, scalars)
    sync(out.z)
    dt = (time.time() - t0) / iters

    # secondary: variable-base Pippenger (kept for round-to-round
    # comparability with BENCH_r01..r04)
    msm = bn254_msm_proj()
    out2 = msm(pts, scalars)
    sync(out2.z)
    t0 = time.time()
    for _ in range(iters):
        out2 = msm(pts, scalars)
    sync(out2.z)
    dt_vb = (time.time() - t0) / iters

    mpts = n / dt / 1e6
    baseline = 4.0  # Mpoints/s, provisional CPU reference estimate
    print(json.dumps({
        "metric": "bn254_fixed_base_commit_2e16_throughput",
        "value": round(mpts, 3),
        "unit": "Mpoints/s",
        "vs_baseline": round(mpts / baseline, 3),
    }))
    print(f"# fixed-base commit 2^16: {dt*1000:.1f} ms/iter; "
          f"variable-base msm: {dt_vb*1000:.1f} ms/iter "
          f"({n/dt_vb/1e6:.3f} Mpts/s) on {jax.devices()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
