"""Scalar-function unit tests: the three NULL-ish representations,
money stripping, affine scalers (fit/transform/inverse), casts, JSON."""

from __future__ import annotations

import math

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
