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
    # the repo-wide oracle convention: (ROUND(x + 1e-9, n) + 0.0) — the
    # + 0.0 normalizes DuckDB's signed zero (r9; see parity.r_)
    return con.sql(
        f"SELECT (ROUND(CAST({x!r} AS DOUBLE) + 1e-9, {n}) + 0.0)"
    ).fetchone()[0]


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
            # STRING comparison (driver canonicalizer semantics): float
            # == treats -0.0 == 0.0 as equal and hides exactly the
            # signed-zero render divergence the r9 sf1 sweep caught on
            # llm_sample_weighted.
            assert str(spark_r) == str(duck_r), (
                f"ROUND({x!r} + eps, {n}): spark={spark_r!r} duck={duck_r!r}"
            )


def test_usum_surfacing_bit_identical_past_2p53(spark, duck_con):
    """r9 sf1-sweep regression: group unit totals PAST 2^53 must
    surface as the bit-identical double on both engines. The old
    DECIMAL(38,s)->DOUBLE surfacing double-rounded in DuckDB (int128
    times an inexact 10^-s) and diverged by one ulp at sf1 magnitudes
    (tpch_q1 sum_charge, 2.8e16 units). The fixed double(S)/10^scale
    takes one int->double rounding then an exact-power-of-ten IEEE
    division. Compared as STRINGS (driver canonicalizer semantics —
    float == hides ulp-level and signed-zero drift)."""
    import pyspark.sql.functions as F

    from trino_demo_spark.parity import USUM, usum

    # per-group totals straddling 2^53 = 9007199254740992, including
    # the exact sf1 repro total and an odd just-past-the-boundary sum
    groups = {
        "a": [27864155010941590 - 12345, 12345],            # sf1 repro
        "b": [2**53 - 1, 2],                                # lands on 2^53+1
        "c": [2**53 + 3, 0],
        "d": [123456789012345675, 1],
        "e": [-27864155010941591, -2],
        "f": [999, 1],                                      # small control
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, units long")
    got = {
        r.g: str(r.s)
        for r in df.groupBy("g")
        .agg(usum(F.col("units"), 6).alias("s"))
        .collect()
    }
    duck_con.execute("CREATE OR REPLACE TABLE _usum(g VARCHAR, units BIGINT)")
    duck_con.executemany("INSERT INTO _usum VALUES (?, ?)", rows)
    want = {
        g: str(s)
        for g, s in duck_con.execute(
            f"SELECT g, {USUM('units', 6)} AS s FROM _usum GROUP BY g"
        ).fetchall()
    }
    assert got == want


def test_weighted_sample_key_never_renders_negative_zero(spark, duck_con):
    """r9 sf1-sweep regression: a sample key that rounds to zero must
    render '0.0' on both engines. DuckDB's ROUND keeps the sign of a
    near-zero negative (-> '-0.0' under the driver's string
    canonicalizer) while Spark's BigDecimal round does not; both sides
    now normalize with + 0.0. Weights are huge so ln(u)/w rounds to
    zero at 6 decimals — the sf1 top-of-sample regime."""
    from trino_demo_spark.operators.relational import weighted_sample_topk

    df = spark.createDataFrame(
        [(i, 10**9 + i) for i in range(20)], "doc_id long, w long"
    )
    out = weighted_sample_topk(df, "doc_id", "w", k=20)
    skeys = {str(r.sample_key) for r in out.collect()}
    assert "-0.0" not in skeys and "0.0" in skeys

    duck = duck_con.execute(
        """
        SELECT DISTINCT CAST(ROUND(
            ln(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
               / 281474976710656.0) / w + 1e-9, 6) + 0.0 AS VARCHAR) AS k
        FROM (SELECT UNNEST(range(20)) AS doc_id, 1000000000 + UNNEST(range(20)) AS w)
        """
    ).fetchall()
    assert {"0.0"} == {k for (k,) in duck}
