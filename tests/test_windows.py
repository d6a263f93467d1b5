"""Operator-library unit tests: sliding sequences (the reference's
invariant), keep-last dedup, chrono split, tail-n, business-day snap
(validated against pandas), as-of join semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from trino_demo_spark.operators import relational as rel
from trino_demo_spark.operators import windows as win
from trino_demo_spark.registry import load_table

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, "events", SF_SMOKE)


def test_sliding_seq_invariant(spark, events):
    """Reference invariant (localTrinoTest.ipynb:616-620): window i ends at
    row i; label(i) = value(i+1); so seq[i][-1] == value at i and
    label(i-1) == seq[i][-1] for consecutive samples."""
    out = win.sliding_sequences(
        events,
        order_by=[F.col("ts"), F.col("event_id")],
        feature_cols=["value"],
        label_col="value",
        length=3,
        partition_by=["user_id"],
    ).select("user_id", "event_id", F.col("seq.value").alias("seq"), "label", "value")
    rows = out.orderBy("user_id", "event_id").collect()
    assert rows, "no sequences produced"
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for user_rows in by_user.values():
        for r in user_rows:
            assert len(r.seq) == 3
            assert r.seq[-1] == r.value  # window ends at current row
        for prev, cur in zip(user_rows, user_rows[1:]):
            # consecutive samples (stride 1): prev label == cur last element
            if prev.label is not None and cur.seq[-1] is not None:
                assert prev.label == cur.seq[-1]
                checked += 1
    assert checked > 50


def test_keep_last_matches_pandas(spark, events):
    got = rel.keep_last(
        events,
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").desc(), F.col("event_id").desc()],
    ).select("user_id", "event_type", "event_id")
    pdf = events.select("user_id", "event_type", "event_id", "ts").toPandas()
    exp = (
        pdf.sort_values(["ts", "event_id"])
        .groupby(["user_id", "event_type"], as_index=False)
        .last()[["user_id", "event_type", "event_id"]]
    )
    got_set = {tuple(r) for r in got.collect()}
    exp_set = {tuple(r) for r in exp.itertuples(index=False)}
    assert got_set == exp_set


def test_chrono_split_fraction(spark, events):
    tagged = rel.chrono_split(
        events, order_by=[F.col("ts"), F.col("event_id")], train_fraction=0.8
    )
    counts = dict(
        tagged.groupBy("split").count().collect()[0].__class__ and
        [(r["split"], r["count"]) for r in tagged.groupBy("split").count().collect()]
    )
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.8) < 0.01
    # boundary is chronological: max train ts <= min test ts
    maxtrain = tagged.filter("split = 'train'").agg(F.max("ts")).first()[0]
    mintest = tagged.filter("split = 'test'").agg(F.min("ts")).first()[0]
    assert maxtrain <= mintest


def test_chrono_split_cutoff_path(spark, events):
    tagged, cutoff = rel.chrono_split_by_cutoff(events, "ts", 0.8)
    counts = {r["split"]: r["count"] for r in tagged.groupBy("split").count().collect()}
    total = sum(counts.values())
    assert 0.75 <= counts["train"] / total <= 0.85
    assert cutoff


def test_tail_n(spark, events):
    got = [r.event_id for r in rel.tail_n(events, 10, [F.col("ts"), F.col("event_id")]).collect()]
    exp = [
        r.event_id
        for r in events.orderBy(F.col("ts").desc(), F.col("event_id").desc()).limit(10).collect()
    ][::-1]
    assert got == exp


def test_business_day_snap_vs_pandas(spark):
    dates = pd.date_range("2024-01-01", "2024-03-31", freq="D")
    pdf = pd.DataFrame({"d": dates.date})
    sdf = spark.createDataFrame(pdf)
    got = {
        str(r.d): str(r.b)
        for r in sdf.select("d", win.business_day_snap(F.col("d")).alias("b")).collect()
    }
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = {
            str(d.date()): str(d.to_period("B").start_time.date()) for d in dates
        }
    assert got == exp


def test_asof_join_backward(spark):
    left = spark.createDataFrame([(5,), (10,), (15,)], "t int")
    right = spark.createDataFrame([(3, "a"), (10, "b"), (12, "c")], "t int, v string")
    out = {
        r.t: r.v
        for r in rel.asof_join(left, right, on="t", right_value_cols=["v"]).collect()
    }
    assert out == {5: "a", 10: "b", 15: "c"}


def test_window_plan_has_single_shuffle(spark, events):
    """keep_last must shuffle exactly once (on the partition keys)."""
    df = rel.keep_last(
        events, keys=["user_id"], order_by=[F.col("ts").desc()]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_asof_join_property_vs_pandas(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    left = sorted(rng.randint(0, 1000, size=40).tolist())
    right = sorted(set(rng.randint(0, 1000, size=25).tolist()))
    ldf = spark.createDataFrame([(int(t),) for t in left], "t long")
    rdf = spark.createDataFrame([(int(t), f"v{t}") for t in right], "t long, v string")
    got = {
        (r.t, r.v)
        for r in __import__("trino_demo_spark.operators.relational", fromlist=["asof_join"])
        .asof_join(ldf, rdf, on="t", right_value_cols=["v"])
        .collect()
    }
    lpd = pd.DataFrame({"t": left})
    rpd = pd.DataFrame({"t": right, "v": [f"v{t}" for t in right]})
    exp_df = pd.merge_asof(lpd, rpd, on="t", direction="backward")
    exp = {
        (int(r.t), None if pd.isna(r.v) else r.v) for r in exp_df.itertuples(index=False)
    }
    assert got == exp


def test_resample_ffill_gaps_and_leading_nulls(spark):
    from trino_demo_spark.operators import windows as win

    df = spark.createDataFrame(
        [
            ("a", "2020-01-02", 10.0),
            ("a", "2020-01-05", 20.0),
            ("b", "2020-01-01", 1.0),
        ],
        "k string, d string, v double",
    ).withColumn("d", F.col("d").cast("date"))
    out = win.resample_ffill(df, "k", "d", "v", "2020-01-01", "2020-01-06")
    rows = {(r.k, str(r.d)): (r.v, r.filled) for r in out.collect()}
    assert len(rows) == 12  # 2 keys x 6 days
    # leading gap before first observation stays NULL but is marked filled
    assert rows[("a", "2020-01-01")] == (None, True)
    assert rows[("a", "2020-01-02")] == (10.0, False)
    # interior gap carries the last observation forward
    assert rows[("a", "2020-01-03")] == (10.0, True)
    assert rows[("a", "2020-01-04")] == (10.0, True)
    assert rows[("a", "2020-01-05")] == (20.0, False)
    assert rows[("a", "2020-01-06")] == (20.0, True)
    # key b fills to the end of the spine
    assert rows[("b", "2020-01-06")] == (1.0, True)


def test_session_window_exact_gap_merges(spark):
    """Boundary semantics pin for the win_session_native oracle: Spark's
    session_window MERGES touching sessions, so an event landing exactly
    `gap` after the previous one stays in the SAME session (verified
    empirically — 3 events at +0, +gap, +gap+10min form one session).
    The lag-based oracle therefore starts a new session only on
    `diff > gap`, strictly."""
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),  # exactly 30 min later → merges
            (1, "2024-01-01 00:40:00"),
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    sessions = (
        df.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .count()
        .collect()
    )
    assert [r["count"] for r in sessions] == [3]


def test_partitioned_prefix_sum_matches_naive_window(spark):
    """The two-phase distributed prefix sum is bit-identical to the
    naive single-window cumsum for every (key, order) — including
    order values that straddle bucket boundaries and negative
    values."""
    from pyspark.sql import Window as W

    from trino_demo_spark.operators.windows import partitioned_prefix_sum

    rows = [
        (k, i, (i * 7 + kn * 3) % 11 - 5)
        for kn, k in enumerate(("a", "b"))
        for i in range(0, 50, 3)
    ]
    df = spark.createDataFrame(rows, "k string, ord long, v long")
    got = {
        (r["k"], r["ord"]): r["__cum"]
        for r in partitioned_prefix_sum(
            df, "k", "ord", "v", bucket_width=8
        ).collect()
    }
    w = (
        W.partitionBy("k")
        .orderBy("ord")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    want = {
        (r["k"], r["ord"]): r["cum"]
        for r in df.select(
            "k", "ord", F.sum("v").over(w).alias("cum")
        ).collect()
    }
    assert got == want


def test_resample_interp_linear_edges(spark):
    """Interior gaps land on the straight line between bracketing
    observations; edge days clamp to the nearest observation;
    observed days pass through untouched."""
    from trino_demo_spark.operators.windows import resample_interp_linear

    df = spark.createDataFrame(
        [("a", "2020-01-02", 100), ("a", "2020-01-05", 400)],
        "k string, d string, v long",
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    out = {
        str(r["d"]): (r["v"], r["filled"])
        for r in resample_interp_linear(
            df, "k", "d", "v", "2020-01-01", "2020-01-06"
        ).collect()
    }
    assert out["2020-01-01"] == (100.0, True)   # left edge clamps
    assert out["2020-01-02"] == (100.0, False)  # observation
    assert out["2020-01-03"] == (200.0, True)   # 1/3 of the way
    assert out["2020-01-04"] == (300.0, True)   # 2/3 of the way
    assert out["2020-01-05"] == (400.0, False)  # observation
    assert out["2020-01-06"] == (400.0, True)   # right edge clamps


def test_ewma_matches_pandas(spark):
    """The closed-form windowed EWMA reproduces pandas
    ewm(alpha, adjust=False).mean() — the independent reference
    implementation of the recursion y_t = (1-a)y_{t-1} + a*x_t."""
    import pandas as pd

    from trino_demo_spark.operators.windows import ewma

    vals = [3.0, 7.0, 1.0, 4.0, 9.0, 2.0, 8.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, i int, v double"
    )
    got = [
        r["ewma"]
        for r in ewma(df, "k", "i", "v", alpha=0.3).orderBy("i").collect()
    ]
    want = pd.Series(vals).ewm(alpha=0.3, adjust=False).mean().tolist()
    assert got == pytest.approx(want, rel=1e-12)


def test_rolling_median_matches_pandas(spark):
    """Frame-bounded rolling median matches pandas
    rolling(window, min_periods=1).median() including even-count
    interpolation."""
    from trino_demo_spark.operators.windows import rolling_median

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0, 4.0, 6.0]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "k string, i int, v double"
    )
    got = [
        r["median"]
        for r in rolling_median(df, "k", "i", "v", frame_rows=4)
        .orderBy("i")
        .collect()
    ]
    want = pd.Series(vals).rolling(4, min_periods=1).median().tolist()
    assert got == pytest.approx(want)


def test_ewma_chunked_matches_plain_and_pandas(spark):
    """The two-phase chunked EWMA (linear-recurrence analogue of the
    distributed prefix sum) agrees with both the closed-form window
    EWMA and pandas across chunk boundaries."""
    from trino_demo_spark.operators.windows import ewma, ewma_chunked

    vals = [((i * 37) % 19) - 4.0 for i in range(47)]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)]
        + [("z", i, -v) for i, v in enumerate(vals[:29])],
        "k string, i int, v double",
    )
    for key in ("k", "z"):
        got = [
            r["ewma"]
            for r in ewma_chunked(df, "k", "i", "v", alpha=0.25, chunk_width=8)
            .filter(F.col("k") == key)
            .orderBy("i")
            .collect()
        ]
        plain = [
            r["ewma"]
            for r in ewma(df, "k", "i", "v", alpha=0.25)
            .filter(F.col("k") == key)
            .orderBy("i")
            .collect()
        ]
        series = vals if key == "k" else [-v for v in vals[:29]]
        want = pd.Series(series).ewm(alpha=0.25, adjust=False).mean().tolist()
        assert got == pytest.approx(want, rel=1e-9)
        assert got == pytest.approx(plain, rel=1e-9)


def test_ewma_alpha_validation_and_unit_alpha(spark):
    from trino_demo_spark.operators.windows import ewma, ewma_chunked

    df = spark.createDataFrame(
        [("k", 0, 3.0), ("k", 1, 7.0)], "k string, i int, v double"
    )
    for fn in (ewma, ewma_chunked):
        with pytest.raises(ValueError):
            fn(df, "k", "i", "v", alpha=0.0)
        with pytest.raises(ValueError):
            fn(df, "k", "i", "v", alpha=1.5)
        got = [
            r["ewma"]
            for r in fn(df, "k", "i", "v", alpha=1.0).orderBy("i").collect()
        ]
        assert got == [3.0, 7.0]  # alpha=1 -> y_t = x_t, no NaNs


def test_asof_join_nearest_matches_pandas(spark):
    """direction='nearest' + tolerance matches pandas merge_asof on a
    numeric key, including backward tie-break and out-of-tolerance
    nulls."""
    import numpy as np

    rng = np.random.RandomState(11)
    left = sorted(int(t) for t in rng.randint(0, 300, size=60))
    right = sorted({int(t) for t in rng.randint(0, 300, size=18)})
    ldf = spark.createDataFrame([(t,) for t in left], "t long")
    rdf = spark.createDataFrame(
        [(t, f"v{t}") for t in right], "t long, v string"
    )
    got = {}
    for r in rel.asof_join_nearest(
        ldf, rdf, on="t", right_value_cols=["v"], tolerance=10
    ).collect():
        got.setdefault(r.t, r.v)
    lpd = pd.DataFrame({"t": left}).drop_duplicates()
    rpd = pd.DataFrame({"t": right, "v": [f"v{t}" for t in right]})
    exp_df = pd.merge_asof(
        lpd, rpd, on="t", direction="nearest", tolerance=10
    )
    exp = {
        int(r.t): (None if pd.isna(r.v) else r.v)
        for r in exp_df.itertuples(index=False)
    }
    assert got == exp and len(exp) > 30
    # explicit equidistant tie: backward wins (pandas semantics)
    ldf2 = spark.createDataFrame([(5,)], "t long")
    rdf2 = spark.createDataFrame([(3, "a"), (7, "b")], "t long, v string")
    r = rel.asof_join_nearest(
        ldf2, rdf2, on="t", right_value_cols=["v"]
    ).collect()[0]
    assert (r.v, r["__asof_dist"]) == ("a", 2)


def test_interval_overlap_preserves_multiplicity(spark):
    """The bucketized overlap join must emit duplicate input rows the
    same number of times the theta join would — the canonical-bucket
    predicate dedups multi-bucket matches of one pair WITHOUT
    collapsing genuinely duplicate rows."""
    l = spark.createDataFrame(
        [(0, 40), (0, 40), (5, 8)], "s long, e long"  # duplicate interval
    )
    r = spark.createDataFrame([(30, 50), (0, 3)], "rs long, re long")
    got = rel.interval_overlap_join_bucketed(
        l, r, "s", "e", "rs", "re", bucket_width=16
    ).collect()
    theta = l.join(
        r, (F.col("s") < F.col("re")) & (F.col("rs") < F.col("e"))
    ).collect()
    key = lambda rows: sorted((x.s, x.e, x.rs, x.re) for x in rows)
    assert key(got) == key(theta)
    # the duplicate left interval appears twice per matching right row
    assert key(got).count((0, 40, 30, 50)) == 2


def test_rolling_median_null_frames(spark):
    """A frame containing only NULLs (collect_list drops them) must
    yield NULL, not crash with INVALID_INDEX_OF_ZERO — regression for
    the n==0 branch evaluating element_at(arr, 0)."""
    from trino_demo_spark.operators.windows import rolling_median

    df = spark.createDataFrame(
        [("k", 0, None), ("k", 1, None), ("k", 2, 5.0), ("k", 3, None)],
        "k string, i int, v double",
    )
    got = [
        r["median"]
        for r in rolling_median(df, "k", "i", "v", frame_rows=2)
        .orderBy("i")
        .collect()
    ]
    # frames: [N], [N,N], [N,5], [5,N] -> None, None, 5.0, 5.0
    assert got == [None, None, 5.0, 5.0]
