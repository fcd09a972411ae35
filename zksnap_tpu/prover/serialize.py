"""Proof and key serialization.

Reference parity: proof byte streams (halo2 transcript output) and the
pk/vk checkpointing of wrapper.rs:967-989 (`build/voter_pk.bin` etc.,
written with `SerdeFormat::RawBytesUnchecked` -- i.e. trusted local
caches; same trust model here).

Proof wire format: sequence of tagged elements
  0x00 | 32-byte LE scalar
  0x01 | 32-byte LE x | 32-byte LE y      (finite point)
  0x02                                     (identity point)
"""

from __future__ import annotations

import os
import pickle

from ..curves.native import BN254_G1, AffinePoint


def proof_to_bytes(proof: list) -> bytes:
    out = bytearray()
    for kind, v in proof:
        if kind == "scalar":
            out.append(0x00)
            out += int(v).to_bytes(32, "little")
        else:
            if v.is_identity():
                out.append(0x02)
            else:
                out.append(0x01)
                out += int(v.x).to_bytes(32, "little")
                out += int(v.y).to_bytes(32, "little")
    return bytes(out)


def proof_from_bytes(data: bytes) -> list:
    out = []
    i = 0
    while i < len(data):
        tag = data[i]
        i += 1
        if tag == 0x00:
            out.append(("scalar", int.from_bytes(data[i : i + 32], "little")))
            i += 32
        elif tag == 0x01:
            x = int.from_bytes(data[i : i + 32], "little")
            y = int.from_bytes(data[i + 32 : i + 64], "little")
            out.append(("point", AffinePoint(BN254_G1, x, y)))
            i += 64
        elif tag == 0x02:
            out.append(("point", AffinePoint.identity(BN254_G1)))
        else:
            raise ValueError(f"bad proof tag {tag} at offset {i-1}")
    return out


def save_pk(pk, path: str):
    """Checkpoint a proving key (trusted local cache, like the reference's
    RawBytesUnchecked pk files).  Device arrays are pulled to host."""
    import jax
    import numpy as np

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fixed_host = {k: np.asarray(jax.device_get(v))
                  for k, v in pk.fixed_dev.items()}
    with open(path, "wb") as f:
        pickle.dump({"vk": pk.vk, "layout": pk.layout,
                     "fixed": fixed_host, "srs_k": pk.srs.k}, f)


def load_pk(path: str):
    import jax.numpy as jnp

    from .plonk import ProvingKey
    from .srs import gen_srs

    with open(path, "rb") as f:
        d = pickle.load(f)
    fixed_dev = {k: jnp.asarray(v) for k, v in d["fixed"].items()}
    return ProvingKey(vk=d["vk"], layout=d["layout"], srs=gen_srs(d["srs_k"]),
                      fixed_dev=fixed_dev)


def save_vk(vk, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(vk, f)


def load_vk(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)
