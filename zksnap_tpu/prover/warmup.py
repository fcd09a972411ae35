"""Parallel compile warm-up for the proving pipeline.

XLA compiles release the GIL, so the ~15 distinct programs `prove()`
needs can compile CONCURRENTLY from worker threads instead of serially
on first use inside the prover (cold-start latency was the round-3
multichip-dryrun failure: the k=7 mesh pipeline took ~470s of strictly
sequential first-compiles).  `warm_prove(ctx, k, srs, mesh)` derives
every program's exact shapes from the host-side layout (no proving key
needed) and fires them with dummy inputs across a thread pool; a
subsequent `keygen` + `prove` then runs almost entirely from the jit
caches.

The dummy values are garbage on purpose -- only the compiled
executables matter -- and every call goes through the same
functools-cached factories the prover uses, so there is no risk of
warming a near-miss shape.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.common import N_LIMBS
from ..fields.field import bn254_fr
from .keygen import PERM_CHUNK, layout_circuit, quotient_ext_log

FR = bn254_fr()


def _dummy(n):
    return jnp.ones((n, N_LIMBS), jnp.uint32)


def _dummy16(n):
    """At-rest (packed) poly stand-in: prove-time coefficient tensors are
    uint16 (poly_device.pack_poly), so warm compiles must match dtype."""
    return jnp.ones((n, N_LIMBS), jnp.uint16)


def _scalar():
    return jnp.asarray(FR.one)


def warm_prove(ctx, k: int, mesh=None, mesh_axis: str = "x",
               verbose: bool = False):
    """Compile (concurrently) every program keygen+prove will need for
    the circuit in `ctx` at domain size 2^k.  Returns per-task seconds."""
    from . import poly_device as pd
    from . import plonk
    from .device_rounds import _compute_h_fn, _omega_pows_dev, _z_chunk_fn

    layout = layout_circuit(ctx, k)
    n = 1 << k
    n_perm = len(layout.perm_columns)
    n_z = -(-n_perm // PERM_CHUNK)
    e_log = quotient_ext_log(layout.n_lookup)
    E = 1 << e_log

    names = (
        [f"advice_{i}" for i in range(layout.n_advice)]
        + [f"lookup_{i}" for i in range(layout.n_lookup)]
        + [f"z_{c}" for c in range(n_z)]
        + ["m", "h", "instance"]
        + [f"q_{i}" for i in range(layout.n_advice)]
        + ["const", "table", "active"]
        + [f"sigma_{j}" for j in range(n_perm)]
    )
    names = sorted(names)

    vk = plonk.VerifyingKey(
        k=k, ext_log=e_log, n_advice=layout.n_advice,
        n_lookup=layout.n_lookup, lookup_bits=layout.lookup_bits,
        n_perm=n_perm, n_z=n_z, usable=layout.usable,
        deltas=layout.deltas, num_instance=len(ctx.instance),
        commitments={}, omega=0,
    )
    queries = plonk._query_plan(vk, E)
    by_point = {}
    for nm, pt in sorted(queries):
        by_point.setdefault(pt, []).append(nm)

    def run(name, fn):
        t0 = time.time()
        if mesh is not None:
            with pd.prover_mesh(mesh, mesh_axis):
                fn()
        else:
            fn()
        dt = time.time() - t0
        if verbose:
            print(f"  warm {name}: {dt:.1f}s", flush=True)
        return name, dt

    def w_to_mont():
        pd.to_device_poly([1] * n)

    def w_commit():
        from ..curves.jacobian import JacPoint

        zeros = jnp.zeros((n, N_LIMBS), jnp.uint32)
        pt = JacPoint(zeros, zeros, zeros)
        c = pd.commit_evals(pt, pd.mont_to_canonical(_dummy(n)))
        np.asarray(jax.device_get(c.z))

    def w_ntts():
        x = _dummy(n)
        pd.evals_to_coeffs(x, k)
        pd.coeffs_to_evals(x, k)
        pd.coeffs_to_evals(_dummy16(n), k)      # packed at-rest inputs
        pd.coset_evals(_dummy16(n), _dummy(n), k)
        pd._pack_fn()(x)

    def w_interp():
        # per-coset chunk interpolation (plonk._quotient tail)
        plonk._mul_rows_fn(k)(_dummy(n), _dummy(n))
        plonk._chunk_combine_fn(k, e_log)([_dummy(n) for _ in range(E)])

    def w_h():
        if layout.n_lookup:
            fn = _compute_h_fn(k, layout.n_lookup)
            fn(jnp.stack([_dummy(n)] * layout.n_lookup), _dummy(n),
               _dummy(n), _scalar())

    def w_z():
        om = _omega_pows_dev(k)
        for c0 in range(0, n_perm, PERM_CHUNK):
            sz = min(PERM_CHUNK, n_perm - c0)
            fn = _z_chunk_fn(k, layout.usable, sz,
                             tuple(layout.deltas[c0 : c0 + sz]))
            fn(jnp.stack([_dummy(n)] * sz), jnp.stack([_dummy(n)] * sz),
               om, _scalar(), _scalar(), _scalar())

    def w_quotient():
        y = _scalar()
        plonk._coset_tables_fn(k)(_dummy(n), y, y, y)
        t = jnp.zeros((n, N_LIMBS), jnp.uint32)
        t = plonk._gate_term_fn(k)(t, _dummy(n), _dummy(n), y)
        if layout.n_lookup:
            t = plonk._logup_term_fn(k, layout.n_lookup)(
                t, _dummy(n), _dummy(n), _dummy(n),
                [_dummy(n)] * layout.n_lookup, y, y)
        for sz in sorted({min(PERM_CHUNK, n_perm - c0)
                          for c0 in range(0, n_perm, PERM_CHUNK)}):
            djs = jnp.ones((sz, N_LIMBS), jnp.uint32)
            t = plonk._perm_term_fn(k, sz)(
                t, _dummy(n), _dummy(n), _dummy(n), [_dummy(n)] * sz,
                [_dummy(n)] * sz, djs, y, y, y)
        t = plonk._lagrange_z_term_fn(k, 0)(t, _dummy(n), _dummy(n), y)
        t = plonk._lagrange_z_term_fn(k, 1)(t, _dummy(n), _dummy(n), y)
        if n_z > 1:
            t = plonk._chain_term_fn(k, layout.usable)(
                t, _dummy(n), _dummy(n), _dummy(n), y)
        plonk._zhinv_scale_fn(k)(t, y)

    def w_evals():
        pd._pow_table_traced_fn(k)(_scalar())
        # round 4 runs in 16-poly chunks; warm the full chunk + remainder
        total = len(names) + 1
        for sz in sorted({min(16, total), total % 16 or 16}):
            pd._eval_coeffs_list_fn(k, sz)([_dummy16(n)] * sz, _dummy(n))

    def w_rlc():
        pd.rlc_list([_dummy(n)] * E, list(range(1, E + 1)), k)
        sizes = set()
        for pt_names in by_point.values():
            s = len(pt_names)
            sizes.add(min(16, s))
            sizes.add(s % 16 or 16)
        for sz in sorted(sizes):
            pd.rlc_list([_dummy16(n)] * sz, list(range(1, sz + 1)), k)

    def w_open():
        pd.opening_witness_evals(_dummy(n), 3, 5, k)

    def w_sigma():
        next(iter(plonk._sigma_values_dev(layout)))

    tasks = [
        ("quotient", w_quotient),
        ("commit", w_commit),
        ("ntts", w_ntts),
        ("interp", w_interp),
        ("z", w_z),
        ("evals", w_evals),
        ("rlc", w_rlc),
        ("h", w_h),
        ("open", w_open),
        ("sigma", w_sigma),
        ("to_mont", w_to_mont),
    ]
    import os

    out = {}
    workers = min(len(tasks), max(2, (os.cpu_count() or 4)))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(run, nm, fn) for nm, fn in tasks]
        for f in futs:
            nm, dt = f.result()
            out[nm] = dt
    return out
