"""Contract quarantine: split a table into (valid, quarantined) rows
against a declared per-column contract — the ingest gate a 100 TB
pipeline puts in front of every landing zone.

The rules formalize the cross-engine validity policies the hostile-
corpus program pinned (see tests/test_hostile_*.py and PERF.md round-4
notes): every downstream operator family assumes SOME subset of them
(timeline ops need timestamps, exact-unit accumulators need
representable money, geometric ops need finite fixed-dim vectors,
sketch-keyed ops need non-NULL keys). Quarantining once at ingest — and
KEEPING the rejects with machine-readable reasons — replaces N silent
per-operator drops with one auditable split.

Everything is a codegen-friendly boolean column: one projection, zero
shuffles, the split is two filters over the same scan (or one pass with
a writer that partitions by `__quarantine_reason`). At 100 TB the valid
side flows on unchanged; the quarantine side is typically ~0 rows and
costs nothing beyond the predicate.

Rules (each a (name, Column-builder) pair):
- ``not_null``            — SQL NULL.
- ``finite``              — DOUBLE is non-NULL, not NaN, not ±Inf
                            (x − x = 0, the same predicate
                            llm.similarity.finite_vectors uses).
- ``unit_band(scale, bound)`` — value scales to an exact int64 unit:
                            finite AND |value·scale| < bound. Defaults
                            pin the exact-money contract (×100 units,
                            < 2⁶³) from parity.u2; pass bound=2**31 for
                            the exact-moment stats band.
- ``vector(dim)``         — array is non-NULL, exactly dim wide, all
                            components finite.
- ``non_empty``           — string is non-NULL and not ''.

Reference: the quarantine-not-crash stance mirrors the reference
pipeline's malformed-row tolerance (scan_json_malformed's PERMISSIVE
decode; najann/trino-demo fill_postgresql.sql:12 sed-cleanup of '$').
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, Callable[[Column], Column]]

_I64 = 9223372036854775808.0  # 2**63 as the exact double


def not_null() -> Rule:
    return ("not_null", lambda c: c.isNotNull())


def finite() -> Rule:
    return ("finite", lambda c: c.isNotNull() & ((c - c) == F.lit(0.0)))


def unit_band(scale: int = 100, bound: float = _I64) -> Rule:
    b = float(bound)

    def ok(c: Column) -> Column:
        v = c * F.lit(float(scale))
        return c.isNotNull() & (v >= F.lit(-b)) & (v < F.lit(b))

    return (f"unit_band_{scale}", ok)


def vector(dim: int) -> Rule:
    def ok(c: Column) -> Column:
        # NULL-safe element predicate: forall over a NULL component
        # yields NULL (not false) under three-valued logic, which would
        # let [1.0, NULL] sail through the gate (ADVICE r4). isNotNull
        # first forces a definite false per element.
        return (
            c.isNotNull()
            & (F.size(c) == F.lit(dim))
            & F.forall(c, lambda x: x.isNotNull() & ((x - x) == F.lit(0.0)))
        )

    return (f"vector_{dim}", ok)


def non_empty() -> Rule:
    return ("non_empty", lambda c: c.isNotNull() & (c != F.lit("")))


def contract_check(
    df: DataFrame,
    contract: Sequence[tuple[str, Rule]],
    reason_col: str = "__quarantine_reason",
) -> DataFrame:
    """Annotate every row with its quarantine reason (NULL = valid).

    The reason is the sorted comma-joined list of every violated
    ``column:rule`` — deterministic whatever the rule declaration
    order, and machine-parseable for reprocessing queues."""
    # Defense in depth: a rule that evaluates to NULL (three-valued
    # logic) counts as a violation — ~NULL is NULL and F.when(NULL, ...)
    # would silently pass the row to the valid side (ADVICE r4).
    flags = [
        F.when(
            ~F.coalesce(rule(F.col(col)), F.lit(False)),
            F.lit(f"{col}:{name}"),
        )
        for col, (name, rule) in contract
    ]
    reasons = F.array_compact(F.array(*flags))
    return df.withColumn(
        reason_col,
        F.when(
            F.size(reasons) > 0, F.array_join(F.array_sort(reasons), ",")
        ),
    )


def quarantine(
    df: DataFrame,
    contract: Sequence[tuple[str, Rule]],
    reason_col: str = "__quarantine_reason",
) -> tuple[DataFrame, DataFrame]:
    """Split into (valid, quarantined-with-reason). Both sides derive
    from ONE annotated plan, so a persisted/checkpointed input is
    scanned once per side with no recomputation of the predicate."""
    annotated = contract_check(df, contract, reason_col)
    valid = annotated.filter(F.col(reason_col).isNull()).drop(reason_col)
    rejected = annotated.filter(F.col(reason_col).isNotNull())
    return valid, rejected
