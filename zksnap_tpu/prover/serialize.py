"""Proof and key serialization.

Reference parity: proof byte streams (halo2 transcript output) and the
pk/vk checkpointing of wrapper.rs:967-989 (`build/voter_pk.bin` etc.,
written with `SerdeFormat::RawBytesUnchecked` -- i.e. trusted local
caches; same trust model here).

Proof wire format: proofs ARE bytes (prover/transcript.py docstring: 32-byte
LE scalars, 64-byte x||y points, identity = zeros, no tags -- the verifying
key determines the shape).  The two helpers below are identity functions
kept for API stability from when proofs were structured logs.
"""

from __future__ import annotations

import os
import pickle


def proof_to_bytes(proof: bytes) -> bytes:
    assert isinstance(proof, (bytes, bytearray))
    return bytes(proof)


def proof_from_bytes(data: bytes) -> bytes:
    return bytes(data)


def save_pk(pk, path: str, strip_witness: bool = False):
    """Checkpoint a proving key (trusted local cache, like the reference's
    RawBytesUnchecked pk files).  Device arrays are pulled to host.

    strip_witness=True drops the layout's witness value buffer (keygen's
    dummy synthesis values -- ~3GB at wrapper width) from the file; the
    loaded pk must then be `rebind_witness`-ed before proving, which is
    how the wrapper driver always uses it (wrapper.rs:945-947 pk reuse)."""
    import copy

    import jax
    import numpy as np

    from .plonk import LazyFixedCoeffs

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if isinstance(pk.fixed_coeffs, LazyFixedCoeffs):
        fixed_host = pk.fixed_coeffs  # host-backed; pickles directly
    else:
        fixed_host = {k: np.asarray(jax.device_get(v))
                      for k, v in pk.fixed_coeffs.items()}
    layout = pk.layout
    if strip_witness:
        layout = copy.copy(layout)
        layout.advice_limbs = np.empty((0, 16), np.uint16)
    with open(path, "wb") as f:
        pickle.dump({"vk": pk.vk, "layout": layout, "fixed_form": "coeff",
                     "fixed": fixed_host, "srs_k": pk.srs.k}, f)


def load_pk(path: str):
    import jax.numpy as jnp

    from .plonk import ProvingKey
    from .srs import gen_srs

    from .plonk import LazyFixedCoeffs

    with open(path, "rb") as f:
        d = pickle.load(f)
    assert d.get("fixed_form") == "coeff", \
        "pk file predates the coefficient-form prover; re-run keygen"
    if isinstance(d["fixed"], LazyFixedCoeffs):
        fixed = d["fixed"]
    else:
        fixed = {k: jnp.asarray(v) for k, v in d["fixed"].items()}
    return ProvingKey(vk=d["vk"], layout=d["layout"], srs=gen_srs(d["srs_k"]),
                      fixed_coeffs=fixed)


def save_vk(vk, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(vk, f)


def load_vk(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
