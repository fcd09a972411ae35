#!/usr/bin/env python
"""Kernel micro-benchmarks on the current device: Montgomery multiply
(Pallas fused vs jnp scanned-REDC), Poseidon, NTT, MSM."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return np.asarray(jax.device_get(jnp.sum(x)))


def bench(fn, args, iters=10, chain=False):
    r = fn(*args)
    sync(r if not isinstance(r, tuple) else r[0])
    t0 = time.time()
    if chain:
        r = args[0]
        for _ in range(iters):
            r = fn(r, *args[1:])
        sync(r)
    else:
        for _ in range(iters):
            r = fn(*args)
        sync(r if not isinstance(r, tuple) else r[0])
    return (time.time() - t0) / iters


def main():
    import zksnap_tpu  # noqa
    from zksnap_tpu.fields import bn254_fr
    from zksnap_tpu.fields.common import mul_wide
    from zksnap_tpu.fields.pallas_mont import mont_mul_batch

    F = bn254_fr()
    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    B = 1 << 20
    key = jax.random.PRNGKey(0)
    a = F.random(key, (B,))
    b = F.random(jax.random.PRNGKey(1), (B,))
    sync(a)

    jnp_mul = jax.jit(lambda x, y: F.mont_redc(mul_wide(x, y)))
    dt = bench(jnp_mul, (a, b), chain=True)
    print(f"mul jnp     : {dt*1000:7.2f} ms /1M = {B/dt/1e6:8.1f} Mmul/s", flush=True)

    pl_mul = jax.jit(lambda x, y: mont_mul_batch(x, y, F.p, F.n0))
    dt = bench(pl_mul, (a, b), chain=True)
    print(f"mul pallas  : {dt*1000:7.2f} ms /1M = {B/dt/1e6:8.1f} Mmul/s", flush=True)

    # poseidon
    from zksnap_tpu.hash import hash_fixed_batched

    leaves = a[: 1 << 17].reshape(-1, 2, 16)
    dt = bench(lambda x: hash_fixed_batched(x), (leaves,), iters=3)
    nh = leaves.shape[0]
    print(f"poseidon    : {dt*1000:7.1f} ms /{nh} = {nh/dt/1e3:8.1f} khash/s", flush=True)

    # NTT 2^16
    from zksnap_tpu.poly.ntt import ntt

    t = ntt(16)
    x = a[: 1 << 16]
    dt = bench(lambda v: t.forward(v), (x,), iters=5)
    print(f"ntt 2^16    : {dt*1000:7.1f} ms = {(1<<16)/dt/1e6:8.2f} Mpts/s", flush=True)

    # MSM 2^16
    from zksnap_tpu.curves.jacobian import JacPoint, bn254_ops
    from zksnap_tpu.msm.pippenger import msm_impl

    ops = bn254_ops()
    n = 1 << 16
    c = 12
    nw = -(-254 // c)
    g = ops.generator((n,))
    s = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.uint32)
    fn = jax.jit(lambda px, py, pz, sc: msm_impl(ops, JacPoint(px, py, pz), sc, c, nw))
    r = fn(g.x, g.y, g.z, s)
    sync(r.z)
    t0 = time.time()
    for _ in range(3):
        r = fn(g.x, g.y, g.z, s)
    sync(r.z)
    dt = (time.time() - t0) / 3
    print(f"msm 2^16    : {dt*1000:7.1f} ms = {n/dt/1e6:8.3f} Mpts/s", flush=True)


if __name__ == "__main__":
    main()
