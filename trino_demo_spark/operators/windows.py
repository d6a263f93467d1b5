"""Window / sequence operator library.

The reference builds sliding training sequences with a pandas loop
(`partition_dataset`, localTrinoTest.ipynb:593-612) and business-day
snapping with `to_period('B')` (:1191). Both become engine-side window
expressions here — no Python in the hot path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def sliding_sequences(
    df: DataFrame,
    order_by: Sequence[Column | str],
    feature_cols: Sequence[str],
    label_col: str,
    length: int = 10,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Sliding windows of `length` rows (stride 1) per partition, label =
    next row's `label_col` (lead 1). Mirrors `partition_dataset`
    (localTrinoTest.ipynb:600-612): sample i's window ends at row i, its
    label is row i+1's y — reproducing the invariant
    ``x[i][length-1][y_idx] == y[i-1]`` (:616-620).

    Output: original order keys + `seq` array<struct<features>> + `label`.
    Windows shorter than `length` (the first length-1 rows) and rows with
    no next label are dropped, as in the reference.

    Scale: one shuffle on partition_by; rowsBetween window is streaming
    over sorted partitions — no explosion, memory O(length) per row.
    """
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    frame = w.rowsBetween(-(length - 1), 0)
    seq = F.collect_list(F.struct(*[F.col(c) for c in feature_cols])).over(frame)
    out = (
        df.withColumn("seq", seq)
        .withColumn("label", F.lead(label_col, 1).over(w))
        .filter((F.size("seq") == length) & F.col("label").isNotNull())
    )
    return out


def business_day_snap(col: Column) -> Column:
    """pandas ``to_period('B')`` semantics (localTrinoTest.ipynb:1191):
    weekend dates snap FORWARD to the following Monday; weekdays are
    unchanged. Verified against pandas 2.x in tests. Pure date arithmetic
    (codegen'd), no UDF.

    Spark dayofweek: 1=Sunday … 7=Saturday.
    """
    dow = F.dayofweek(col)
    return (
        F.when(dow == 7, F.date_add(col, 2))  # Saturday -> +2 = Monday
        .when(dow == 1, F.date_add(col, 1))  # Sunday   -> +1 = Monday
        .otherwise(F.to_date(col))
    )


def resample_ffill(
    df,
    key_col: str,
    date_col: str,
    value_col: str,
    start: str,
    end: str,
):
    """Calendar resample + forward fill: densify a sparse per-(key, day)
    series onto every day in [start, end] and carry the last observed
    value forward across the gaps — pandas `resample('D').ffill()` as an
    engine-side operator (the reference's stock/weather series have
    exactly these market-closed / sensor-gap holes).

    Scale shape: the day spine is `sequence(start, end)` exploded against
    the DISTINCT key set — spine size = keys × days, independent of fact
    rows. The fill is `last(value, ignorenulls=True)` over (key, date
    ROWS UNBOUNDED PRECEDING): ONE hash partition by key, sort by date
    within partition — no global sort, no iterative driver loop, and the
    unbounded-preceding frame is a running accumulator, not a rescan.
    Emits `filled` so downstream can distinguish observation from carry.
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    lo = F.lit(start).cast("date")
    hi = F.lit(end).cast("date")
    obs = (
        df.filter((F.col(date_col) >= lo) & (F.col(date_col) <= hi))
        .groupBy(key_col, date_col)
        .agg(F.sum(value_col).alias("__v"))
    )
    keys = obs.select(key_col).distinct()
    spine = keys.join(
        F.broadcast(
            df.sparkSession.range(1).select(
                F.explode(F.sequence(lo, hi)).alias(date_col)
            )
        )
    )
    w = (
        W.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    joined = spine.join(obs, [key_col, date_col], "left")
    return joined.select(
        key_col,
        date_col,
        F.last("__v", ignorenulls=True).over(w).alias(value_col),
        F.col("__v").isNull().alias("filled"),
    )
