#!/usr/bin/env python
"""Raw TPU op-rate probes: what does one VPU op actually cost?

Times chains of dependent ops in a Pallas kernel on [16, W] u32/f32
tiles -- the layout the field kernels use -- to find the fastest
substrate for the 256-bit limb product:

  u32mul   -- chained 32x32 u32 multiplies (current conv substrate)
  u32add   -- chained u32 adds (carry-chain substrate)
  f32fma   -- chained f32 multiply-adds
  u32mask  -- chained (x & 0xffff) masks
  u32shift -- chained >> 16
  i8dot    -- int8 MXU matmul [64,32]x[32,W] s32 accumulate (REDC shape)
  bf16dot  -- bf16 MXU matmul, f32 accumulate

Usage: python scripts/exp_vpu_rates.py [w_log=18] [chain=512]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def sync(x):
    # axon relay: block_until_ready does not block; force a readback
    np.asarray(jax.device_get(x.reshape(-1)[:1]))


def bench(fn, args, iters=30):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / iters


def make_chain(kind: str, chain: int, W: int):
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        if kind == "u32mul":
            for _ in range(chain):
                a = a * b + jnp.uint32(1)
        elif kind == "u16mul":
            # operands pre-masked to 16 bits; does Mosaic use a cheaper mul?
            a = a & jnp.uint32(0xFFFF)
            b = b & jnp.uint32(0xFFFF)
            for _ in range(chain):
                a = (a * b) & jnp.uint32(0xFFFF)
        elif kind == "u32add":
            for _ in range(chain):
                a = a + b
        elif kind == "u32mask":
            for _ in range(chain):
                a = (a & jnp.uint32(0xFFFF)) | (a >> 16)
        elif kind == "f32fma":
            x = a.astype(jnp.int32).astype(jnp.float32)
            y = b.astype(jnp.int32).astype(jnp.float32)
            for _ in range(chain):
                x = x * y + jnp.float32(1.0)
            a = x.astype(jnp.int32).astype(jnp.uint32)
        o_ref[:] = a

    def go(a, b):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, W), jnp.uint32),
            interpret=jax.default_backend() == "cpu",
        )(a, b)

    return jax.jit(go)


def make_dot(kind: str, W: int, n_mm: int):
    from jax.experimental import pallas as pl

    if kind == "i8dot":
        lhs = np.random.randint(-8, 8, (64, 32)).astype(np.int8)

        def kernel(l_ref, x_ref, o_ref):
            acc = jnp.zeros((64, W), jnp.int32)
            x = x_ref[:]
            for _ in range(n_mm):
                y = jax.lax.dot_general(
                    l_ref[:], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = acc + y
                x = y[:32, :].astype(jnp.int8)
            o_ref[:] = acc

        def go(l, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((64, W), jnp.int32),
                interpret=jax.default_backend() == "cpu",
            )(l, x)

        x0 = np.random.randint(-8, 8, (32, W)).astype(np.int8)
        return jax.jit(go), (jnp.asarray(lhs), jnp.asarray(x0))
    else:
        lhs = np.random.randn(64, 32).astype(np.float32)

        def kernel(l_ref, x_ref, o_ref):
            acc = jnp.zeros((64, W), jnp.float32)
            x = x_ref[:]
            for _ in range(n_mm):
                y = jax.lax.dot_general(
                    l_ref[:].astype(jnp.bfloat16), x,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + y
                x = (y[:32, :] * 1e-3).astype(jnp.bfloat16)
            o_ref[:] = acc

        def go(l, x):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((64, W), jnp.float32),
                interpret=jax.default_backend() == "cpu",
            )(l, x)

        x0 = (np.random.randn(32, W) * 0.1).astype(np.bfloat16)
        return jax.jit(go), (jnp.asarray(lhs), jnp.asarray(x0))


def main():
    w_log = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    W = 1 << w_log
    lanes = 16 * W

    key = jax.random.PRNGKey(0)
    a = jax.random.randint(key, (16, W), 0, 1 << 16, dtype=jnp.uint32)
    b = jax.random.randint(jax.random.PRNGKey(1), (16, W), 0, 1 << 16,
                           dtype=jnp.uint32)

    for kind in ("u32mul", "u16mul", "u32add", "u32mask", "f32fma"):
        try:
            print(f"{kind}: compiling...", flush=True)
            fn = make_chain(kind, chain, W)
            dt = bench(fn, (a, b))
            rate = lanes * chain / dt / 1e9
            print(f"{kind:8s}: {rate:8.1f} Gop/s  ({dt*1e3:.2f} ms,"
                  f" chain={chain}, {lanes} lanes)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: ERROR {type(e).__name__}: {e}", flush=True)

    n_mm = 64
    for kind in ("i8dot", "bf16dot"):
        try:
            fn, args = make_dot(kind, W, n_mm)
            dt = bench(fn, args, iters=10)
            macs = 64 * 32 * W * n_mm
            print(f"{kind:8s}: {macs/dt/1e12:8.2f} Tmac/s  ({dt*1e3:.2f} ms,"
                  f" {n_mm} matmuls [64,32]x[32,{W}])", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
