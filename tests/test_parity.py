"""Local replica of the driver's correctness gate: run every PARITY query
on Spark and its oracle SQL on DuckDB over the same parquet, compare
row count, column names/order-insensitive values.

Floats are compared with a tiny absolute tolerance AFTER the queries'
own rounding — the driver hashes exact values, so any tolerance hit here
is a red flag; we therefore also report exact-match status.
"""

from __future__ import annotations

import math

import pytest

from trino_demo_spark.parity import PARITY
import trino_demo_spark.parity_llm  # noqa: F401  (registers llm entries)
import trino_demo_spark.parity_ml  # noqa: F401  (registers ml entries)

from .conftest import SF_PARITY

ORACLE_CASES = sorted(n for n, p in PARITY.items() if p.sql is not None)
ROWS_ONLY_CASES = sorted(n for n, p in PARITY.items() if p.sql is None)


def _normalize(rows, columns):
    """Sort columns by name, then rows by string repr — order-insensitive
    comparison like the driver's value hash."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in idx))
    return sorted(columns), sorted(out, key=lambda t: tuple(str(x) for x in t))


def _values_equal(a, b):
    """BIT-EXACT comparison, floats included: the engine's rounding
    discipline (identical both-side arithmetic + the tie epsilon) makes
    every oracle query byte-identical to DuckDB — verified across all 123
    oracle queries at sf0.01. Any tolerance here would mask regressions
    the driver's value hash will catch."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(name, spark, duck):
    p = PARITY[name]
    sdf = p.fn(spark, SF_PARITY)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = list(sdf.columns)

    res = duck.sql(p.sql)
    duck_cols = list(res.columns)
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    cols_s, rows_s = _normalize(spark_rows, spark_cols)
    cols_d, rows_d = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, rs, rd)
        for i, (rs, rd) in enumerate(zip(rows_s, rows_d))
        if not _values_equal(rs, rd)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_runs(name, spark):
    p = PARITY[name]
    sdf = p.fn(spark, SF_PARITY)
    n = sdf.count()
    assert n >= 0
    # deterministic across two runs
    assert sdf.count() == n
