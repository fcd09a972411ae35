#!/usr/bin/env python
"""Sweep MSM configs on the real TPU: window size c, lane count, fused-add
mode.  One process, sequential configs (one TPU process at a time -- see
.claude/skills/verify/SKILL.md).

Usage: python scripts/bench_msm_stages.py [n_log=16]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import zksnap_tpu  # noqa: F401  (compile cache)
from zksnap_tpu.curves.jacobian import bn254_ops, JacPoint
from zksnap_tpu.msm.pippenger import MSM


def sync(x):
    return np.asarray(jax.device_get(x))


def make_points(ops, n):
    @jax.jit
    def mk():
        g = ops.generator((n,))
        idx = jnp.arange(1, n + 1, dtype=jnp.uint32)
        nb = max(n.bit_length(), 1)
        bits = jnp.stack([(idx >> (nb - 1 - b)) & 1 for b in range(nb)], axis=-1)
        return ops.scalar_mul(g, bits)

    pts = mk()
    sync(pts.z[:1])
    return pts


def main():
    n_log = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    n = 1 << n_log
    ops = bn254_ops()
    print(f"devices: {jax.devices()}", flush=True)

    # -- staged-add probe: correctness on 512 points first ------------------
    os.environ["ZKSNAP_TPU_FUSED_ADD"] = "staged"
    t0 = time.time()
    small = make_points(ops, 512)
    a = JacPoint(small.x[:256], small.y[:256], small.z[:256])
    b = JacPoint(small.x[256:], small.y[256:], small.z[256:])
    s_staged = jax.jit(ops.add)(a, b)
    got = sync(s_staged.x)
    print(f"staged add compile+run: {time.time()-t0:.1f}s", flush=True)
    os.environ["ZKSNAP_TPU_FUSED_ADD"] = "0"
    s_plain = jax.jit(lambda p, q: ops.add(p, q))(a, b)
    want = sync(s_plain.x)
    zg, zw = sync(s_staged.z), sync(s_plain.z)
    assert np.array_equal(got, want) and np.array_equal(zg, zw), \
        "staged add mismatch vs composed path"
    print("staged add matches composed path on 256 pairs", flush=True)

    pts = make_points(ops, n)
    key = jax.random.PRNGKey(0)
    scalars = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.uint32)
    scalars = scalars.at[:, 15].set(scalars[:, 15] & 0x3FFF)

    ref_out = None
    for mode in ("0", "staged"):
        os.environ["ZKSNAP_TPU_FUSED_ADD"] = mode
        for c in (12, 13, 14):
            for lanes in (16384, 65536):
                msm = MSM(ops)
                msm.lanes = lanes
                t0 = time.time()
                out = msm(pts, scalars, c=c)
                sync(out.z)
                compile_s = time.time() - t0
                iters = 3
                t0 = time.time()
                for _ in range(iters):
                    out = msm(pts, scalars, c=c)
                    sync(out.z)
                dt = (time.time() - t0) / iters
                host = ops.to_affine_host(out)[0]
                if ref_out is None:
                    ref_out = host
                ok = host == ref_out
                print(f"mode={mode:6s} c={c} lanes={lanes:6d}: "
                      f"{dt*1e3:8.1f} ms  ({n/dt/1e6:6.3f} Mpts/s) "
                      f"compile {compile_s:.0f}s  match={ok}", flush=True)


if __name__ == "__main__":
    main()
