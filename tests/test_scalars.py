"""Scalar-function unit tests: the three NULL-ish representations,
money stripping, affine scalers (fit/transform/inverse), casts, JSON."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trino_demo_spark.functions import scalars
from trino_demo_spark.operators import aggregates as agg
from trino_demo_spark.registry import load_table

from .conftest import SF_SMOKE


def test_normalize_nullish_all_three(spark):
    """SQL NULL, float NaN, and the string 'NaN' all collapse (SURVEY.md §7)."""
    df = spark.createDataFrame(
        [("1.5",), (None,), ("NaN",), ("nan",), ("",), ("2.0",)], "v string"
    )
    out = df.select(scalars.normalize_nullish(F.col("v"), fill=0.0).alias("n")).collect()
    assert [r.n for r in out] == [1.5, 0.0, 0.0, 0.0, 0.0, 2.0]
    # float NaN input path
    df2 = spark.createDataFrame([(float("nan"),), (3.0,), (None,)], "v double")
    out2 = df2.select(scalars.normalize_nullish(F.col("v")).alias("n")).collect()
    assert out2[0].n is None and out2[1].n == 3.0 and out2[2].n is None


def test_strip_money(spark):
    df = spark.createDataFrame([("$12.50",), ("8.25",), ("junk",)], "m string")
    out = [r.v for r in df.select(scalars.strip_money(F.col("m")).alias("v")).collect()]
    assert out[0] == 12.50 and out[1] == 8.25 and out[2] is None


def test_affine_roundtrip(spark):
    li = load_table(spark, "lineitem", SF_SMOKE)
    fit = agg.minmax_fit(li, ["l_quantity"])
    scaled = agg.minmax_transform(li, fit, ["l_quantity"])
    # inverse recovers the original
    row = fit.first()
    mn, mx = row["l_quantity_min"], row["l_quantity_max"]
    back = scaled.select(
        "l_quantity",
        scalars.affine_inverse(F.col("l_quantity_scaled"), F.lit(mn), F.lit(mx - mn)).alias("b"),
    )
    bad = back.filter(F.abs(F.col("l_quantity") - F.col("b")) > 1e-9).count()
    assert bad == 0
    # scaled range is [0, 1]
    stats = scaled.agg(
        F.min("l_quantity_scaled"), F.max("l_quantity_scaled")
    ).first()
    assert math.isclose(stats[0], 0.0) and math.isclose(stats[1], 1.0)


def test_robust_scaler_approx_path(spark):
    li = load_table(spark, "lineitem", SF_SMOKE)
    exact = agg.robust_fit(li, ["l_extendedprice"], exact=True).first()
    approx = agg.robust_fit(li, ["l_extendedprice"], exact=False).first()
    # approx_percentile is within a few percent at this size
    for q in ("q25", "q50", "q75"):
        e, a = exact[f"l_extendedprice_{q}"], approx[f"l_extendedprice_{q}"]
        assert abs(e - a) / e < 0.05


def test_parse_dates(spark):
    df = spark.createDataFrame(
        [("2022-09-01", "2022-09-01T14:30:00.123456")], "d string, t string"
    )
    r = df.select(
        scalars.parse_iso_date(F.col("d")).alias("d"),
        scalars.parse_iso_timestamp(F.col("t")).alias("t"),
    ).first()
    assert str(r.d) == "2022-09-01"
    assert str(r.t).startswith("2022-09-01 14:30:00.123456")


def test_cast_all(spark):
    li = load_table(spark, "lineitem", SF_SMOKE)
    out = scalars.cast_all(li, ["l_quantity", "l_extendedprice"], "float")
    types = dict(out.dtypes)
    assert types["l_quantity"] == "float" and types["l_extendedprice"] == "float"


def test_json_roundtrip(spark):
    sup = load_table(spark, "supplier", SF_SMOKE)
    enc = sup.select(scalars.json_encode(["s_suppkey", "s_acctbal"]).alias("j"))
    dec = enc.select(
        scalars.json_decode(F.col("j"), "s_suppkey BIGINT, s_acctbal DOUBLE").alias("m")
    ).select("m.*")
    orig = {(r.s_suppkey, r.s_acctbal) for r in sup.select("s_suppkey", "s_acctbal").collect()}
    back = {(r.s_suppkey, r.s_acctbal) for r in dec.collect()}
    assert orig == back


def test_stats_ops_match_independent_python(spark, duck):
    """Independent-model checks for the round-4 statistics operators —
    cross-engine parity alone can share a formula bug (both sides are
    written by the same author), so each statistic is re-derived here
    with plain Python/pandas/numpy from the raw data."""
    import numpy as np

    import trino_demo_spark.parity_ml  # noqa: F401  (registers entries)
    from trino_demo_spark.parity import PARITY

    sf = "/root/testdata/sf0.001"

    # --- Welch t-test (agg_ab_test) vs a direct numpy derivation
    row = PARITY["agg_ab_test"].fn(spark, sf).first()
    ev = duck.sql(
        f"SELECT event_type, value FROM read_parquet('{sf}/events.parquet') "
        "WHERE value IS NOT NULL AND event_type IN ('click', 'view')"
    ).df()
    a = ev[ev.event_type == "click"].value.to_numpy()
    b = ev[ev.event_type == "view"].value.to_numpy()
    se2 = a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df_w = se2**2 / (
        (a.var(ddof=1) / len(a)) ** 2 / (len(a) - 1)
        + (b.var(ddof=1) / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["t_stat"] == pytest.approx(t, abs=2e-4)
    assert row["welch_df"] == pytest.approx(df_w, abs=2e-2)

    # --- KS statistic (agg_ks_test) vs brute-force ECDF sweep
    row = PARITY["agg_ks_test"].fn(spark, sf).first()
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    assert row["ks_d"] == pytest.approx(float(np.abs(fa - fb).max()), abs=2e-4)

    # --- AUC (ml_eval_auc) vs explicit pairwise comparison
    row = PARITY["ml_eval_auc"].fn(spark, sf).first()
    docs = duck.sql(
        f"SELECT n_chars, lang = 'en' AS y FROM read_parquet('{sf}/documents.parquet')"
    ).df()
    pos = docs[docs.y].n_chars.to_numpy().astype(float)
    neg = docs[~docs.y].n_chars.to_numpy().astype(float)
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (
        pos[:, None] == neg[None, :]
    ).sum()
    assert row["auc"] == pytest.approx(wins / (len(pos) * len(neg)), abs=2e-4)

    # --- chi-square (agg_chi_square) vs direct contingency arithmetic
    row = PARITY["agg_chi_square"].fn(spark, sf).first()
    evc = duck.sql(
        f"SELECT event_type, CAST(user_id % 2 AS INT) AS cohort "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).df()
    ct = evc.groupby(["event_type", "cohort"]).size().unstack(fill_value=0)
    obs = ct.to_numpy().astype(float)
    exp = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert row["chi2"] == pytest.approx(chi2, abs=2e-3)
    assert row["dof"] == (obs.shape[0] - 1) * (obs.shape[1] - 1)


def test_decompose_and_holt_match_pandas_models(spark, duck):
    """Seasonal decomposition vs a pandas rolling/groupby re-derivation
    and Holt's smoothing vs an explicit Python recursion."""
    import pandas as pd

    from trino_demo_spark.parity import PARITY

    sf = "/root/testdata/sf0.001"

    out = (
        PARITY["win_seasonal_decompose"]
        .fn(spark, sf)
        .toPandas()
        .sort_values("o_orderdate")
        .reset_index(drop=True)
    )
    daily = duck.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
               datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS di,
               COUNT(*) * 1.0 AS n
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
        GROUP BY 1, 2 ORDER BY 1"""
    ).df()
    daily["n"] = daily["n"].astype(float)
    # pandas centered MA over ROW positions mirrors the rows-frame
    trend = daily["n"].rolling(7, center=True).mean()
    detr = daily["n"] - trend
    seasonal = detr.groupby(daily["di"] % 7).transform("mean")
    keep = trend.notna()
    exp = pd.DataFrame(
        {
            "d": daily["d"][keep].values,
            "trend": trend[keep].round(4).values,
            "seasonal": seasonal[keep].round(4).values,
        }
    ).reset_index(drop=True)
    assert len(out) == len(exp)
    assert out["trend"].tolist() == pytest.approx(exp["trend"].tolist(), abs=2e-4)
    assert out["seasonal"].tolist() == pytest.approx(
        exp["seasonal"].tolist(), abs=2e-4
    )

    holt = {
        r["event_type"]: (r["level"], r["trend"])
        for r in PARITY["win_holt_linear"].fn(spark, sf).collect()
    }
    series = duck.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS x
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2 ORDER BY 1, 2"""
    ).df()
    for k, grp in series.groupby("event_type"):
        xs = grp["x"].tolist()
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l2 = 0.3 * x + 0.7 * (l + b)
            b = 0.1 * (l2 - l) + 0.9 * b
            l = l2
        assert holt[k][0] == pytest.approx(l, abs=2e-4), k
        assert holt[k][1] == pytest.approx(b, abs=2e-4), k
