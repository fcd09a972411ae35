"""Poseidon Fiat-Shamir transcript (host side).

Reference parity: snark-verifier's `PoseidonTranscript<NativeLoader, _>`
(wrapper.rs:59-60,127-128) -- Poseidon over BN254 Fr with T=3/RATE=2/
R_F=8/R_P=57.  Structure matches (absorb proof elements, squeeze
challenges); byte-level parity with the Rust transcript (point encoding,
limb packing) is tracked as a cross-verification work item.

Points are absorbed as their affine coordinates reduced into Fr; the
identity absorbs as (0, 0).  Challenges are squeezed scalars.
"""

from __future__ import annotations

from ..curves.native import AffinePoint
from ..fields.field import bn254_fr
from ..hash.poseidon import PoseidonNative

FR = bn254_fr()


class Transcript:
    def __init__(self):
        self.sponge = PoseidonNative()
        self.log: list = []  # (kind, value) pairs -- the proof stream

    # -- prover side --------------------------------------------------------

    def write_point(self, p: AffinePoint):
        self.log.append(("point", p))
        self._absorb_point(p)

    def write_scalar(self, s: int):
        self.log.append(("scalar", s % FR.p))
        self.sponge.update([s % FR.p])

    # -- verifier side ------------------------------------------------------

    def read_point(self, stream) -> AffinePoint:
        kind, p = next(stream)
        assert kind == "point", f"transcript desync: expected point, got {kind}"
        self._absorb_point(p)
        return p

    def read_scalar(self, stream) -> int:
        kind, s = next(stream)
        assert kind == "scalar", f"transcript desync: expected scalar, got {kind}"
        self.sponge.update([s])
        return s

    # -- shared -------------------------------------------------------------

    def _absorb_point(self, p: AffinePoint):
        if p.is_identity():
            self.sponge.update([0, 0])
        else:
            self.sponge.update([p.x % FR.p, p.y % FR.p])

    def challenge(self) -> int:
        return self.sponge.squeeze()

    def proof(self) -> list:
        return list(self.log)
