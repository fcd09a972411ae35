"""Circuit-builder runtime: the halo2-base equivalent for this framework.

Reference parity (SURVEY.md L2): halo2-base's `BaseCircuitBuilder` /
`Context` / flex-gate / `RangeChip` (voter/src/lib.rs:3-19 imports).  The
reference records circuit cells into a single "vertical" advice column per
thread with the basic gate

    q[i] * (a[i] + a[i+1] * a[i+2] - a[i+3]) == 0

plus copy (permutation) constraints, constants, a range-lookup table and
instance cells.  This module records the same structure into python lists
during witness generation (host side); `export()` lowers them to numpy
column arrays that the constraint checker (trace/checker.py) and the PLONK
prover (prover/) consume on device.

Cells are integers indices into one logical advice array; gate ops append
4-cell windows.  Values are python ints (exact field arithmetic), converted
to limb tensors only at export.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fields.field import PrimeField, bn254_fr


@dataclass(frozen=True)
class Cell:
    """Handle to one advice cell (index into the flat advice vector)."""

    idx: int
    value: int  # witness value (python int, canonical)


@dataclass
class LookupTable:
    bits: int  # table contains [0, 2^bits)


class Context:
    """One proving thread's trace (flat advice vector + gate selectors)."""

    def __init__(self, F: PrimeField | None = None, lookup_bits: int = 14,
                 assert_witness: bool = True):
        """assert_witness=False records constraints WITHOUT asserting the
        witness satisfies them -- used for dummy-snark keygen synthesis
        (the reference's CsProxy, wrapper.rs:187-234), where only the
        circuit SHAPE matters and the witness is protocol-shaped garbage."""
        self.F = F or bn254_fr()
        self.p = self.F.p
        self.assert_witness = assert_witness
        self.advice: list[int] = []          # cell values
        self.gate_offsets: list[int] = []    # rows where the basic gate is on
        self.copies: list[tuple[int, int]] = []   # equality constraints
        self.constants: list[tuple[int, int]] = []  # (cell idx, constant value)
        self.lookups: list[int] = []         # cell idxs range-checked to lookup_bits
        self.lookup_bits = lookup_bits
        self.instance: list[Cell] = []       # public input cells

    # -- raw cell ops -------------------------------------------------------

    def _push(self, v: int) -> Cell:
        v %= self.p
        self.advice.append(v)
        return Cell(len(self.advice) - 1, v)

    def load_witness(self, v: int) -> Cell:
        return self._push(v)

    def load_constant(self, v: int) -> Cell:
        c = self._push(v)
        self.constants.append((c.idx, v % self.p))
        return c

    def load_zero(self) -> Cell:
        return self.load_constant(0)

    def constrain_equal(self, a: Cell, b: Cell):
        assert not self.assert_witness or a.value == b.value, (
            f"constrain_equal witness mismatch: {a.value} != {b.value}")
        self.copies.append((a.idx, b.idx))

    def expose_public(self, cell: Cell):
        self.instance.append(cell)

    # -- the vertical basic gate -------------------------------------------
    # rows: | x | y | z | out |  with  x + y*z == out

    def _gate(self, x: Cell | int, y: Cell | int, z: Cell | int,
              out_val: int) -> Cell:
        """Append a 4-cell gate window; ints are constants (auto-loaded as
        copies of existing cells when Cell, constant-constrained otherwise)."""
        base = len(self.advice)
        self.gate_offsets.append(base)
        cells = []
        for operand in (x, y, z):
            if isinstance(operand, Cell):
                c = self._push(operand.value)
                self.copies.append((operand.idx, c.idx))
            else:
                c = self._push(operand)
                self.constants.append((c.idx, operand % self.p))
            cells.append(c)
        out = self._push(out_val)
        return out

    # -- arithmetic instructions (halo2-base GateInstructions parity) ------

    def add(self, a: Cell, b: Cell) -> Cell:
        return self._gate(a, b, 1, a.value + b.value)

    def sub(self, a: Cell, b: Cell) -> Cell:
        # out + b*1 == a  =>  out = a - b ; out sits in the x slot
        base = len(self.advice)
        self.gate_offsets.append(base)
        out = self._push(a.value - b.value)
        bb = self._push(b.value)
        self.copies.append((b.idx, bb.idx))
        one = self._push(1)
        self.constants.append((one.idx, 1))
        aa = self._push(a.value)
        self.copies.append((a.idx, aa.idx))
        return out

    def mul(self, a: Cell, b: Cell) -> Cell:
        return self._gate(0, a, b, a.value * b.value)

    def mul_add(self, a: Cell, b: Cell | int, c: Cell) -> Cell:
        """c + a*b"""
        bval = b.value if isinstance(b, Cell) else b
        return self._gate(c, a, b, c.value + a.value * bval)

    def neg(self, a: Cell) -> Cell:
        return self.sub(self.load_constant(0), a)

    def scalar_mul(self, a: Cell, k: int) -> Cell:
        return self._gate(0, a, k, a.value * k)

    def add_const(self, a: Cell, k: int) -> Cell:
        return self._gate(a, k, 1, a.value + k)

    def select(self, a: Cell, b: Cell, sel: Cell) -> Cell:
        """sel ? a : b  (sel must be a bit): out = b + sel*(a-b)."""
        diff = self.sub(a, b)
        return self.mul_add(diff, sel, b)

    def assert_bit(self, a: Cell):
        """a*(a-1) == 0 : row |0|a|a-1|0| ... expressed as a*a = a."""
        sq = self.mul(a, a)
        self.constrain_equal(sq, a)

    def is_zero(self, a: Cell) -> Cell:
        """Returns 1 if a == 0 else 0, with witness inverse trick."""
        inv = pow(a.value, -1, self.p) if a.value != 0 else 0
        inv_c = self.load_witness(inv)
        prod = self.mul(a, inv_c)           # a * a^-1
        out_val = 1 if a.value == 0 else 0
        out = self.load_witness(out_val)
        # out == 1 - a*inv
        one_minus = self.sub(self.load_constant(1), prod)
        self.constrain_equal(out, one_minus)
        # a * out == 0
        z = self.mul(a, out)
        zero = self.load_constant(0)
        self.constrain_equal(z, zero)
        return out

    def is_equal(self, a: Cell, b: Cell) -> Cell:
        return self.is_zero(self.sub(a, b))

    def inner_product(self, xs: list[Cell], ys: list[Cell | int]) -> Cell:
        acc = self.load_constant(0)
        for x, y in zip(xs, ys):
            acc = self.mul_add(x, y, acc)
        return acc

    def sum(self, xs: list[Cell]) -> Cell:
        acc = self.load_constant(0)
        for x in xs:
            acc = self.add(acc, x)
        return acc

    # -- range chip (halo2-base RangeChip parity) ---------------------------

    def range_check(self, a: Cell, bits: int):
        """Constrain 0 <= a < 2^bits via lookup_bits-wide limb decomposition."""
        assert not self.assert_witness or a.value < (1 << bits), \
            "range_check witness too large"
        lb = self.lookup_bits
        n_limbs = -(-bits // lb)
        rem = bits - (n_limbs - 1) * lb  # width of the top limb
        limbs = [(a.value >> (lb * i)) & ((1 << lb) - 1) for i in range(n_limbs)]
        limb_cells = [self.load_witness(v) for v in limbs]
        # recomposition constraint
        acc = self.load_constant(0)
        for i, lc in enumerate(limb_cells):
            acc = self.mul_add(lc, 1 << (lb * i), acc)
        self.constrain_equal(acc, a)
        # lookups
        for i, lc in enumerate(limb_cells):
            if i < n_limbs - 1 or rem == lb:
                self.lookups.append(lc.idx)
            else:
                # top limb: lookup both limb and limb << (lb - rem)
                self.lookups.append(lc.idx)
                shifted = self.scalar_mul(lc, 1 << (lb - rem))
                self.lookups.append(shifted.idx)

    def check_less_than_safe(self, a: Cell, bound: int):
        """a < bound for a bound < 2^lookup_bits*k: range check a and bound-1-a
        via the standard trick a + (2^bits - bound) < 2^bits."""
        bits = (bound - 1).bit_length() if bound > 1 else 1
        bits = -(-bits // self.lookup_bits) * self.lookup_bits
        shift = (1 << bits) - bound
        shifted = self.add_const(a, shift)
        self.range_check(shifted, bits)
        self.range_check(a, bits)

    def num_to_bits(self, a: Cell, bits: int) -> list[Cell]:
        out = []
        for i in range(bits):
            bit_val = (a.value >> i) & 1
            b = self.load_witness(bit_val)
            self.assert_bit(b)
            out.append(b)
        acc = self.load_constant(0)
        for i, b in enumerate(out):
            acc = self.mul_add(b, 1 << i, acc)
        self.constrain_equal(acc, a)
        return out

    # -- export -------------------------------------------------------------

    def stats(self) -> dict:
        return {
            "advice_cells": len(self.advice),
            "gates": len(self.gate_offsets),
            "copies": len(self.copies),
            "constants": len(self.constants),
            "lookups": len(self.lookups),
            "instances": len(self.instance),
        }

    def export(self):
        """-> dict of numpy arrays for the checker/prover."""
        return {
            "advice": self.advice,  # python ints (exact)
            "gate_offsets": np.asarray(self.gate_offsets, np.int64),
            "copies": np.asarray(self.copies, np.int64).reshape(-1, 2),
            "constants": self.constants,
            "lookups": np.asarray(self.lookups, np.int64),
            "lookup_bits": self.lookup_bits,
            "instance": [(c.idx, c.value) for c in self.instance],
        }
