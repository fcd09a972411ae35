"""Circuit layout + proving/verifying key generation.

Reference parity: halo2_proofs `keygen_vk`/`keygen_pk` +
`BaseCircuitBuilder`'s column assignment (SURVEY.md L1/L2; used at
wrapper.rs:106-109).  Takes a synthesized trace Context and a domain size
k and produces:

  * the column layout -- advice cells packed column-major into columns of
    height `usable = n - ZK_ROWS`, with break points chosen so no 4-cell
    gate window crosses a column boundary (halo2-base "break points");
  * fixed columns: per-advice-column gate selectors q_c, one constants
    column, the lookup table column;
  * lookup-advice columns (cells range-checked get copied there) and the
    logUp multiplicity column;
  * the copy-constraint permutation sigma over all involved columns
    (union-find cycles -> sigma_j(w^i) = delta^{j'} w^{i'});
  * commitments to all fixed/sigma columns (the verifying key).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..fields.field import bn254_fr
from ..trace.context import Context

FR = bn254_fr()
ZK_ROWS = 8
PERM_CHUNK = 2  # columns per permutation grand-product poly (degree 4 constraint)
PERM_COLS_NAME = ("advice", "lookup", "const", "instance")


@dataclass
class Layout:
    k: int
    n: int
    usable: int
    n_advice: int
    n_lookup: int
    lookup_bits: int
    col_starts: list[int]          # flat-cell start index of each advice col
    cell_map: np.ndarray           # [n_cells, 2] -> (col, row)
    # columns as python-int lists (host); device export happens in the prover
    advice_cols: list[list[int]]
    q_cols: list[list[int]]
    active_col: list[int]
    const_col: list[int]
    lookup_cols: list[list[int]]
    table_col: list[int]
    instance_col: list[int]
    multiplicity: list[int]
    # permutation
    perm_columns: list[tuple[str, int]]  # ordered involved columns
    sigma: np.ndarray              # [n_perm_cols, n, 2] -> (col_idx, row)
    deltas: list[int]              # coset shift per perm column


def _multiplicity_counts(lookup_cols: list[list[int]], n: int) -> list[int]:
    """logUp multiplicity column via vectorized bincount (the per-element
    python loop was O(n_lookup * n) -- 12M+ ops at wrapper scale)."""
    mult = np.zeros(n, dtype=np.int64)
    for col in lookup_cols:
        mult += np.bincount(np.asarray(col, dtype=np.int64), minlength=n)
    return mult.tolist()


def _union_find(n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    return find, union


def layout_circuit(ctx: Context, k: int) -> Layout:
    n = 1 << k
    usable = n - ZK_ROWS
    cells = ctx.advice
    n_cells = len(cells)
    gate_set = ctx.gate_offsets

    # --- break advice cells into columns at gate-aligned boundaries --------
    col_starts = [0]
    gates = np.asarray(sorted(gate_set), dtype=np.int64)
    while col_starts[-1] + usable < n_cells:
        tentative = col_starts[-1] + usable
        # find gates straddling [tentative-3, tentative): move cut to gate start
        lo = np.searchsorted(gates, tentative - 3)
        cut = tentative
        for g in gates[lo : lo + 4]:
            if g < tentative < g + 4:
                cut = int(g)
                break
        col_starts.append(cut)
    n_advice = len(col_starts)

    cell_map = np.zeros((n_cells, 2), dtype=np.int64)
    advice_cols, q_cols = [], []
    bounds = col_starts + [n_cells]
    for c in range(n_advice):
        s, e = bounds[c], bounds[c + 1]
        col = cells[s:e] + [0] * (n - (e - s))
        advice_cols.append(col)
        cell_map[s:e, 0] = c
        cell_map[s:e, 1] = np.arange(e - s)
        q = [0] * n
        for g in gates[(gates >= s) & (gates < e)]:
            assert g + 4 <= e, "gate crosses column boundary"
            q[g - s] = 1
        q_cols.append(q)

    # --- constants column ---------------------------------------------------
    const_values = []
    const_rows = {}
    for idx, v in ctx.constants:
        if v not in const_rows:
            assert len(const_values) < usable, "too many constants for one column"
            const_rows[v] = len(const_values)
            const_values.append(v)
    const_col = const_values + [0] * (n - len(const_values))
    # make sure 0 is in the column (padding) for lookup-col padding copies
    if 0 not in const_rows and len(const_values) < usable:
        const_rows[0] = len(const_values)
        const_values.append(0)
        const_col = const_values + [0] * (n - len(const_values))

    # --- lookup advice columns + table + multiplicities --------------------
    lookup_bits = ctx.lookup_bits
    assert lookup_bits < k, "lookup table must fit in the domain"
    n_lookup = max(1, -(-len(ctx.lookups) // usable)) if ctx.lookups else 0
    lookup_cols = []
    lk_positions = []  # (col, row) of each ctx.lookups entry
    for c in range(n_lookup):
        chunk = ctx.lookups[c * usable : (c + 1) * usable]
        col = [ctx.advice[i] for i in chunk] + [0] * (n - len(chunk))
        lookup_cols.append(col)
        for r, _ in enumerate(chunk):
            lk_positions.append((c, r))
    table_col = list(range(1 << lookup_bits)) + [0] * (n - (1 << lookup_bits))
    # v < 2^lookup_bits <= n; padding 0s count too
    multiplicity = _multiplicity_counts(lookup_cols, n)

    # --- instance column ----------------------------------------------------
    instance_col = [c.value for c in ctx.instance] + [0] * (n - len(ctx.instance))
    assert len(ctx.instance) <= usable

    # --- permutation active-rows selector (rows < usable) -------------------
    active_col = [1] * usable + [0] * (n - usable)

    # --- permutation cycles -------------------------------------------------
    # involved columns in order: advice..., lookup..., const, instance
    perm_columns = (
        [("advice", c) for c in range(n_advice)]
        + [("lookup", c) for c in range(n_lookup)]
        + [("const", 0), ("instance", 0)]
    )
    col_index = {key: i for i, key in enumerate(perm_columns)}
    n_perm = len(perm_columns)
    total = n_perm * n

    def pos_id(kind, col, row):
        return col_index[(kind, col)] * n + row

    find, union = _union_find(total)
    # advice-advice copies
    for i, j in ctx.copies:
        ci, ri = cell_map[i]
        cj, rj = cell_map[j]
        union(pos_id("advice", int(ci), int(ri)), pos_id("advice", int(cj), int(rj)))
    # constants
    for idx, v in ctx.constants:
        c, r = cell_map[idx]
        union(pos_id("advice", int(c), int(r)), pos_id("const", 0, const_rows[v]))
    # lookup copies
    for (lc, lr), cell_idx in zip(lk_positions, ctx.lookups):
        c, r = cell_map[cell_idx]
        union(pos_id("lookup", lc, lr), pos_id("advice", int(c), int(r)))
    # instance copies
    for row, cell in enumerate(ctx.instance):
        c, r = cell_map[cell.idx]
        union(pos_id("instance", 0, row), pos_id("advice", int(c), int(r)))

    # build cycles -> sigma mapping (next element in cycle)
    groups: dict[int, list[int]] = {}
    for x in range(total):
        groups.setdefault(find(x), []).append(x)
    sigma = np.zeros((n_perm, n, 2), dtype=np.int64)
    # identity default
    for j in range(n_perm):
        sigma[j, :, 0] = j
        sigma[j, :, 1] = np.arange(n)
    for members in groups.values():
        if len(members) == 1:
            continue
        for a, b in zip(members, members[1:] + members[:1]):
            ja, ra = divmod(a, n)
            jb, rb = divmod(b, n)
            sigma[ja, ra] = (jb, rb)

    # coset shifts delta^j (delta = odd-order generator component)
    delta = pow(FR.generator, 1 << FR.two_adicity, FR.p)
    deltas = [pow(delta, j, FR.p) for j in range(n_perm)]

    return Layout(
        k=k, n=n, usable=usable, n_advice=n_advice, n_lookup=n_lookup,
        lookup_bits=lookup_bits, col_starts=col_starts, cell_map=cell_map,
        advice_cols=advice_cols, q_cols=q_cols, active_col=active_col,
        const_col=const_col,
        lookup_cols=lookup_cols, table_col=table_col,
        instance_col=instance_col, multiplicity=multiplicity,
        perm_columns=perm_columns, sigma=sigma, deltas=deltas,
    )
