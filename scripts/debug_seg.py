"""Isolate _segmented_bucket_sums with a mock integer group (add = +)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax.numpy as jnp

from zksnap_tpu.msm import pippenger
from zksnap_tpu.curves.jacobian import JacPoint


class MockOps:
    def add(self, a, b):
        return JacPoint(a.x + b.x, a.y + b.y, a.z + b.z)

    def double(self, a):
        return JacPoint(2 * a.x, 2 * a.y, 2 * a.z)

    def identity(self, shape):
        z = jnp.zeros(shape + (16,), jnp.uint32)
        return JacPoint(z, z, z)


rng = np.random.default_rng(0)
ops = MockOps()
for trial in range(50):
    n = int(rng.integers(1, 200))
    n_buckets = int(rng.integers(2, 40))
    lanes = int(rng.integers(1, 32))
    ids = rng.integers(0, n_buckets, size=n).astype(np.int32)
    vals = rng.integers(0, 1000, size=(n, 16)).astype(np.uint32)
    pts = JacPoint(jnp.asarray(vals), jnp.asarray(vals), jnp.asarray(vals))
    out = pippenger._segmented_bucket_sums(
        ops, pts, jnp.asarray(ids), n_buckets, lanes=lanes)
    got = np.asarray(out.x)
    want = np.zeros((n_buckets, 16), np.uint32)
    for i, b in enumerate(ids):
        want[b] += vals[i]
    if not np.array_equal(got, want):
        bad = np.nonzero((got != want).any(axis=1))[0]
        print(f"FAIL trial={trial} n={n} n_buckets={n_buckets} lanes={lanes}")
        print("bad buckets:", bad[:10])
        print("ids sorted:", np.sort(ids)[:50])
        for b in bad[:3]:
            print(f"  bucket {b}: got {got[b][0]} want {want[b][0]}")
        break
else:
    print("all mock trials pass")
