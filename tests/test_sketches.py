"""Sketch-aggregate error bounds: HLL estimates vs exact distinct
counts on the same data (the accuracy contract rows-only driver checks
can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_demo_spark.operators import aggregates as agg_ops
from trino_demo_spark.registry import load_table

from .conftest import SF_SMOKE


def test_approx_distinct_error_bound(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    day = F.to_date("ts").alias("day")
    apx = {
        r.day: r.approx_distinct
        for r in agg_ops.approx_distinct_by_key(ev, day, "user_id").collect()
    }
    exact = {
        r.day: r.n
        for r in ev.groupBy(day).agg(F.countDistinct("user_id").alias("n")).collect()
    }
    assert set(apx) == set(exact)
    for d, n in exact.items():
        # rsd=0.05; allow 3 standard deviations plus integer slack
        assert abs(apx[d] - n) <= max(3, 0.15 * n), (d, apx[d], n)


def test_approx_distinct_deterministic_across_partitionings(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    day = F.to_date("ts").alias("day")
    a = sorted(
        (r.day, r.approx_distinct)
        for r in agg_ops.approx_distinct_by_key(ev, day, "user_id").collect()
    )
    b = sorted(
        (r.day, r.approx_distinct)
        for r in agg_ops.approx_distinct_by_key(
            ev.repartition(13), day, "user_id"
        ).collect()
    )
    assert a == b  # commutative merges: estimate is layout-independent


def test_hll_rollup_error_bound_and_merge(spark):
    ev = load_table(spark, "events", SF_SMOKE)
    day = F.to_date("ts").alias("day")
    wk = F.weekofyear("day").alias("wk")
    est = {
        r.wk: r.est_distinct
        for r in agg_ops.hll_rollup(ev, day, wk, "user_id").collect()
    }
    exact = {
        r.wk: r.n
        for r in ev.groupBy(F.weekofyear(F.to_date("ts")).alias("wk"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for w, n in exact.items():
        # merged-sketch estimate must bound error vs the RAW exact
        # distinct (proves union-of-daily == sketch-of-week semantics)
        assert abs(est[w] - n) <= max(3, 0.15 * n), (w, est[w], n)
