"""Constraint checker: the MockProver equivalent.

Reference parity: halo2_proofs `MockProver::run(...).verify()` as used by
every reference test (voter_tests/src/lib.rs:239-240,
state_transition.rs:341-342) and as the pre-flight inside gen_proof
(wrapper.rs:117-123).  Checks constraint satisfiability without any crypto:
gate equations, copy constraints, constant bindings, range lookups and
instance layout, with precise error reporting.
"""

from __future__ import annotations

from .context import Context


class ConstraintError(AssertionError):
    pass


def check(ctx: Context, instances: list[int] | None = None) -> dict:
    """Verify every recorded constraint over the witness; returns stats.

    Raises ConstraintError with the first failing site otherwise.
    """
    p = ctx.p
    a = ctx.advice

    for g in ctx.gate_offsets:
        lhs = (a[g] + a[g + 1] * a[g + 2] - a[g + 3]) % p
        if lhs != 0:
            raise ConstraintError(
                f"gate at offset {g}: {a[g]} + {a[g+1]}*{a[g+2]} != {a[g+3]}"
            )

    for i, j in ctx.copies:
        if a[i] != a[j]:
            raise ConstraintError(f"copy ({i},{j}): {a[i]} != {a[j]}")

    for i, v in ctx.constants:
        if a[i] != v % p:
            raise ConstraintError(f"constant at {i}: {a[i]} != {v % p}")

    bound = 1 << ctx.lookup_bits
    for i in ctx.lookups:
        if not (0 <= a[i] < bound):
            raise ConstraintError(
                f"lookup at {i}: {a[i]} not in [0, 2^{ctx.lookup_bits})"
            )

    if instances is not None:
        got = [c.value for c in ctx.instance]
        if got != [v % p for v in instances]:
            raise ConstraintError(
                f"instance mismatch: circuit exposes {len(got)} values; "
                f"first diff at "
                f"{next((k for k, (x, y) in enumerate(zip(got, instances)) if x != y % p), 'len')}"
            )

    return ctx.stats()
