"""Generate-stage helpers: explode/posexplode WITHOUT the inferred
pre-filter re-evaluation trap.

Spark plans `size(arr) > 0 AND isnotnull(arr)` ahead of every non-outer
explode/posexplode (``InferFiltersFromGenerate``), and predicate pushdown
then sinks that filter below intervening projections, all the way to the
scan — so the array EXPRESSION is evaluated up to two extra times per
input row. For cheap arrays that is noise; for computed arrays (regex
splits, higher-order functions, per-element dot products) it multiplies
the dominant cost of the stage by ~3. Measured on llm_dedup_span at
sf1-equivalent: the explode stage alone dropped 8.2s → 1.0s after
switching to the outer+filter shape below. No repartition/cache barrier
helps — filter pushdown crosses exchanges; only the *_outer generators
(which infer no filter) avoid it, and one cheap filter on a GENERATED
attribute after the Generate restores exact non-outer semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_col(
    df: DataFrame, arr: Column | str, alias: str, *keep: Column | str
) -> DataFrame:
    """``df.select(*keep, explode(arr) AS alias)`` minus the inferred
    pre-filter. Requires array ELEMENTS to be provably non-NULL (true
    for split() tokens, array_join()/concat-of-non-null strings,
    zip_with structs, xxhash64 values): the NULL placeholder row that
    explode_outer emits for an empty/NULL array is filtered on the
    element itself, so a legitimately-NULL element would be dropped
    with it. Use posexplode_col when elements can be NULL."""
    out = df.select(*keep, F.explode_outer(arr).alias(alias))
    return out.filter(F.col(alias).isNotNull())


def posexplode_col(
    df: DataFrame,
    arr: Column | str,
    pos_alias: str,
    val_alias: str,
    *keep: Column | str,
) -> DataFrame:
    """``df.select(*keep, posexplode(arr) AS (pos_alias, val_alias))``
    minus the inferred pre-filter; exact non-outer semantics for ANY
    element type (the filter is on the generated position, which is
    NULL only for the empty/NULL-array placeholder row)."""
    out = df.select(
        *keep, F.posexplode_outer(arr).alias(pos_alias, val_alias)
    )
    return out.filter(F.col(pos_alias).isNotNull())


def milli_units(col: Column | str) -> Column:
    """Exact milli-unit accumulator cell: floor(value·1000) as BIGINT,
    NULL when the scaled value has no int64 representation (NULL, NaN,
    ±Inf, |v| ≥ 2⁶³ after scaling).

    The explicit range guard matters because Spark's FLOOR(DOUBLE)
    returns BIGINT directly and CLAMPS ±Inf/out-of-range to
    Long.MAX/MIN — two clamped cells then blow up the downstream
    SUM with an ANSI ARITHMETIC_OVERFLOW (observed in the hostile-
    events sweep). The guard bounds are the exact doubles 2⁶³ and
    -2⁶³, matching DuckDB's TRY_CAST(FLOOR(v) AS BIGINT) oracle
    mirror cell-for-cell."""
    c = F.col(col) if isinstance(col, str) else col
    v = c * F.lit(1000.0)
    in_range = (v >= F.lit(-9223372036854775808.0)) & (
        v < F.lit(9223372036854775808.0)
    )
    return F.when(in_range, F.floor(v)).otherwise(F.lit(None)).cast("long")
