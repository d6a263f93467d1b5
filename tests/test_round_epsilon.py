"""Property test for the cross-engine rounding discipline (PERF.md
finding 6, VERDICT r1 item 9).

Spark rounds the shortest decimal string of a double (HALF_UP); DuckDB
rounds the binary double. At an exact decimal tie at the rounding
position the two disagree (0.73135 → 0.7314 vs 0.7313), which is why
every ratio/avg/corr output in the engine goes through
`parity.r_(x, n)` ≡ `ROUND(x + 1e-9, n)` on BOTH sides: the epsilon
pushes exact ties off the boundary before either engine rounds.

The property: for the value shapes our aggregates produce — exact
decimal ties (sums/avgs of 2-decimal money values) and small-integer
ratios (avg/count shapes) — post-epsilon rounding is identical across
engines. Raw adversarial floats within 1e-9 of a tie are NOT covered by
the discipline (and don't occur: aggregate results are either exactly
on a tie or, being short decimals, far from one by ≫1e-9).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from trino_demo_spark.parity import EPS


def _duck_round(con, x: float, n: int) -> float:
    return con.sql(f"SELECT ROUND(CAST({x!r} AS DOUBLE) + 1e-9, {n})").fetchone()[0]


@pytest.fixture(scope="module")
def duck_con():
    con = duckdb.connect()
    yield con
    con.close()


# Exact decimal ties at the rounding position: k·10 + 5 as the digit
# string, i.e. x = (10k + 5) / 10^(n+1); the classic HALF_UP-vs-binary
# divergence shape.
ties = st.tuples(
    st.integers(min_value=-(10**8), max_value=10**8),
    st.integers(min_value=2, max_value=6),
).map(lambda t: ((t[0] * 10 + 5) / 10 ** (t[1] + 1), t[1]))

# Ratio/avg shapes: a/b over the integer magnitudes the testdata's
# count/sum aggregates produce.
ratios = st.tuples(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=2, max_value=6),
).map(lambda t: (t[0] / t[1], t[2]))

# Sums of 2-decimal money values land on exact short decimals.
money_sums = st.tuples(
    st.integers(min_value=-(10**12), max_value=10**12),
    st.integers(min_value=2, max_value=4),
).map(lambda t: (t[0] / 100.0, t[1]))


@settings(max_examples=12, deadline=None)
@given(st.lists(st.one_of(ties, ratios, money_sums), min_size=1, max_size=60))
def test_round_epsilon_matches_across_engines(spark, duck_con, cases):
    # Spark's round() scale must be a literal — run one pass per scale.
    by_n: dict[int, list[float]] = {}
    for x, n in cases:
        by_n.setdefault(int(n), []).append(float(x))
    for n, xs in by_n.items():
        df = spark.createDataFrame([(x,) for x in xs], "x double")
        got = {
            r.x: r.r
            for r in df.selectExpr("x", f"round(x + {EPS!r}, {n}) AS r").collect()
        }
        for x, spark_r in got.items():
            duck_r = _duck_round(duck_con, x, n)
            assert spark_r == duck_r, (
                f"ROUND({x!r} + eps, {n}): spark={spark_r!r} duck={duck_r!r}"
            )
