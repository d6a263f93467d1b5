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


def resample_interp_linear(
    df,
    key_col: str,
    date_col: str,
    value_col: str,
    start: str,
    end: str,
):
    """Calendar resample + LINEAR interpolation: densify a sparse
    per-(key, day) series onto every day in [start, end] and fill each
    gap on the straight line between its bracketing observations —
    pandas `resample('D').interpolate('linear')` as an engine-side
    operator (the natural companion to `resample_ffill` for the
    reference's market-closed price-series holes, where carrying the
    last close flat biases returns).

    Fill rule per spine day d: with prev = last observation at or
    before d and nxt = first observation at or after d,
    ``v = prev_v + (nxt_v - prev_v) * (d - prev_d) / (nxt_d - prev_d)``;
    observed days reduce to their own value (prev_d = nxt_d = d), and
    days before the first / after the last observation clamp to the
    nearest one (edge extrapolation = nearest, like pandas
    ``interpolate(limit_direction='both')``).

    Scale shape: identical to resample_ffill — spine = keys × days
    (independent of fact rows), then TWO frame-bounded running
    accumulators (last-ignorenulls unbounded-preceding and
    first-ignorenulls unbounded-following) over ONE hash partition by
    key and ONE within-partition sort; Spark evaluates both frames in
    a single Window physical node, no second exchange, no rescan per
    gap.
    """
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
    wb = (
        W.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key_col)
        .orderBy(date_col)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    joined = spine.join(obs, [key_col, date_col], "left")
    prev_v = F.last("__v", ignorenulls=True).over(wb)
    prev_d = F.last(
        F.when(F.col("__v").isNotNull(), F.col(date_col)), ignorenulls=True
    ).over(wb)
    nxt_v = F.first("__v", ignorenulls=True).over(wf)
    nxt_d = F.first(
        F.when(F.col("__v").isNotNull(), F.col(date_col)), ignorenulls=True
    ).over(wf)
    span = F.datediff(nxt_d, prev_d)
    interp = F.when(prev_v.isNull(), nxt_v.cast("double")).otherwise(
        F.when(nxt_v.isNull() | (span == 0), prev_v.cast("double")).otherwise(
            prev_v
            + (nxt_v - prev_v)
            * F.datediff(F.col(date_col), prev_d)
            / span
        )
    )
    return joined.select(
        key_col,
        date_col,
        interp.alias(value_col),
        F.col("__v").isNull().alias("filled"),
    )


def partitioned_prefix_sum(
    df,
    part_col: str,
    order_col: str,
    value_col: str,
    bucket_width: int = 1024,
):
    """Distributed running sum of `value_col` over `order_col` within
    each `part_col` group — WITHOUT putting a whole group into one
    window task.

    A plain ``sum().over(partitionBy(part).orderBy(ord))`` serializes
    each partition-key's entire history through one task; when a single
    key spans terabytes (one language of a pretraining corpus, one hot
    ticker) that task is the job. This is the classic two-phase
    parallel prefix sum expressed declaratively:

    1. map-side: bucket = floor(order / bucket_width) — parallelism is
       now (#keys × #buckets), not #keys;
    2. per-(key, bucket) subtotals — ONE partial+final aggregate whose
       result frame is tiny (≤ keys × buckets rows);
    3. exclusive running sum of the subtotal frame — a window over the
       TINY frame (cheap regardless of its partitioning);
    4. broadcast the offsets back and add the intra-bucket running sum,
       a window whose partitions are (key, bucket) — bounded by
       bucket_width rows each, never a whole key.

    Result is bit-identical to the naive single-window formulation
    (asserted in tests) for any integral value column.

    PRECONDITION — dense order values: buckets come from
    ``floor(order / bucket_width)``, so the subtotal/offset frame has
    one row per OCCUPIED bucket: ~rows/bucket_width for dense ids
    (doc_id, day index), but up to one per row for sparse domains
    (raw nanosecond timestamps, hash ids) — which makes the broadcast
    as big as the input and fails loudly at the broadcast-size limit.
    For sparse order columns, first densify (dict-encode the order
    values, itself a prefix-sum-free job: distinct + zipWithIndex or a
    day/hour truncation) or raise bucket_width to match the domain
    spacing.
    """
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width)).alias("__bkt")
    src = df.withColumn("__bkt", bucket)
    subtotals = src.groupBy(part_col, "__bkt").agg(
        F.sum(value_col).alias("__sub")
    )
    w_off = (
        W.partitionBy(part_col)
        .orderBy("__bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offsets = subtotals.select(
        part_col,
        "__bkt",
        (F.sum("__sub").over(w_off) - F.col("__sub")).alias("__off"),
    )
    w_in = (
        W.partitionBy(part_col, "__bkt")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        src.join(F.broadcast(offsets), [part_col, "__bkt"])
        .withColumn(
            "__cum", F.col("__off") + F.sum(value_col).over(w_in)
        )
        .drop("__bkt", "__off")
    )


def ewma(
    df,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
):
    """Per-key exponentially weighted moving average (pandas
    ``ewm(alpha, adjust=False)`` semantics: y_0 = x_0,
    y_t = (1-α)·y_{t-1} + α·x_t) — the recursive smoother every
    time-series feature pipeline wants, expressed WITHOUT a recursive
    loop so it stays one window pass.

    Closed form: y_t = (1-α)^t · Σ_{i≤t} w_i·x_i with w_0 = 1,
    w_i = α·(1-α)^{-i} — i.e. a weighted running sum (ROWS UNBOUNDED
    PRECEDING, a streaming accumulator) times a per-row factor. ONE
    hash partition by key + one within-partition sort, identical to a
    plain cumsum; no self-join, no per-row driver recursion, no O(n²)
    array fold.

    Numeric range: the (1-α)^{-i} weight grows geometrically, so the
    formulation is exact-in-double for series up to
    ~log(1e300)/log(1/(1-α)) rows per key (α=0.2 → ~3000 rows; α=0.05
    → ~13000). Beyond that, chunk the series (the same two-phase
    trick as partitioned_prefix_sum: per-chunk EWMA + carry-in scaled
    by (1-α)^chunk_len) — at daily/hourly grain this bound covers
    decades per key.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if alpha == 1.0:  # y_t = x_t exactly; avoid 1/(1-alpha)
        return df.withColumn(out_col, F.col(value_col).cast("double"))
    w = (
        W.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    i = F.row_number().over(
        W.partitionBy(key_col).orderBy(order_col)
    ) - F.lit(1)
    decay = F.lit(1.0 - alpha)
    weight = F.when(i == 0, F.lit(1.0)).otherwise(
        F.lit(alpha) * F.pow(F.lit(1.0) / decay, i)
    )
    c = F.sum(weight * F.col(value_col)).over(w)
    return df.withColumn(out_col, F.pow(decay, i) * c)


def rolling_median(
    df,
    key_col: str,
    order_col: str,
    value_col: str,
    frame_rows: int = 7,
    out_col: str = "median",
):
    """Per-key rolling median over a trailing row frame — the robust
    alternative to a moving average that no built-in window aggregate
    provides. Implemented as sort_array(collect_list) over the frame
    plus middle-element pick (averaging the two middles for even
    counts, matching DuckDB/pandas interpolation).

    Scale shape: one hash partition by key + one within-partition
    sort, the same single window pass as any moving aggregate; the
    collected frame is bounded by `frame_rows` (per-ROW working set =
    O(frame), NOT O(partition)), so memory is flat regardless of key
    size. For very wide frames (thousands of rows) switch to the
    two-heap / indexable-skiplist streaming algorithm via
    applyInPandas — at typical feature-engineering frames (7/30/90)
    the array formulation wins on codegen simplicity.
    """
    w = (
        W.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(-(frame_rows - 1), W.currentRow)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))
    n = F.size(arr)
    # n == 0 (frame holds only NULLs — collect_list drops them) must
    # yield NULL, and must not even FORM element_at(arr, 0): Spark
    # rejects index 0 eagerly, so the even branch guards the index.
    lo = F.element_at(arr, F.greatest((n / 2).cast("int"), F.lit(1)))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    med = F.when(n == 0, F.lit(None).cast("double")).when(
        n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")).cast("double")
    ).otherwise((lo + hi) / F.lit(2.0))
    return df.withColumn(out_col, med)


def ewma_chunked(
    df,
    key_col: str,
    order_col: str,
    value_col: str,
    alpha: float,
    chunk_width: int = 1024,
    out_col: str = "ewma",
):
    """EWMA for series too long for the closed-form window (`ewma`'s
    geometric weight overflows past ~log(1e300)/log(1/(1-α)) rows):
    the same two-phase decomposition as `partitioned_prefix_sum`, but
    for a LINEAR RECURRENCE y_t = (1-α)·y_{t-1} + α·x_t instead of a
    sum.

    Uniform per-row form with a chunk carry-in c:
    ``y_j = ycf_j + (1-α)^{j+1}·c`` where ycf is the carry-free local
    closed form (α-weighted running sum) and, for the key's FIRST
    chunk, c = x_first (which makes y_0 = x_0 exactly — pandas
    adjust=False semantics).

    Phases:
    1. chunk = floor(order / chunk_width) — map-side; the geometric
       weights now span at most chunk_width rows, so they never
       overflow regardless of series length;
    2. per-(key, chunk) windows (bounded by chunk_width) compute ycf;
    3. each chunk reduces to (A = carry-free end value,
       B = (1-α)^len, F = first x): y_end(k) = A_k + B_k·y_end(k-1) —
       a linear recurrence over the TINY chunk-summary frame, solved
       exactly by a sequential fold over the per-key sorted summary
       array (chunks per key = rows / chunk_width, driver-free);
    4. carries broadcast back; one more bounded window adds the decay-
       scaled carry to every row.

    Agrees with `ewma` to float associativity (equivalence tested);
    per-task working set is O(chunk_width + chunks_per_key).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if alpha == 1.0:  # y_t = x_t exactly; avoid 1/(1-alpha)
        return df.withColumn(out_col, F.col(value_col).cast("double"))
    decay = 1.0 - alpha
    src = df.withColumn(
        "__chunk", F.floor(F.col(order_col) / F.lit(chunk_width))
    )
    wloc = W.partitionBy(key_col, "__chunk").orderBy(order_col)
    wloc_run = wloc.rowsBetween(W.unboundedPreceding, W.currentRow)
    i = F.row_number().over(wloc) - F.lit(1)
    term = F.pow(F.lit(1.0 / decay), i) * F.col(value_col)
    ycf = (
        F.lit(alpha) * F.pow(F.lit(decay), i) * F.sum(term).over(wloc_run)
    )
    rows = src.withColumn("__i", i).withColumn("__ycf", ycf)
    summaries = rows.groupBy(key_col, "__chunk").agg(
        F.max_by("__ycf", "__i").alias("__A"),
        F.pow(F.lit(decay), F.count("*")).alias("__B"),
        F.min_by(F.col(value_col), "__i").cast("double").alias("__F"),
    )
    # Exact sequential solve of y_end(k) = A_k + B_k * y_end(k-1) per key,
    # initialized with carry = F of the first chunk; emits each chunk's
    # carry-IN. The summary array is tiny (chunks per key), so the
    # quadratic array build of the fold is irrelevant.
    carry_rows = (
        summaries.groupBy(key_col)
        .agg(
            F.sort_array(
                F.collect_list(F.struct("__chunk", "__A", "__B", "__F"))
            ).alias("__s")
        )
        .select(
            key_col,
            F.explode(
                F.expr(
                    "aggregate(__s, "
                    "named_struct('prev', CAST(NULL AS DOUBLE), "
                    "             'out', CAST(array() AS ARRAY<STRUCT<chunk: BIGINT, carry: DOUBLE>>)), "
                    "(acc, s) -> named_struct("
                    "  'prev', s.__A + s.__B * coalesce(acc.prev, s.__F), "
                    "  'out', concat(acc.out, array(named_struct("
                    "    'chunk', s.__chunk, "
                    "    'carry', coalesce(acc.prev, s.__F))))), "
                    "acc -> acc.out)"
                )
            ).alias("__c"),
        )
        .select(
            key_col,
            F.col("__c.chunk").alias("__chunk"),
            F.col("__c.carry").alias("__carry"),
        )
    )
    out = rows.join(F.broadcast(carry_rows), [key_col, "__chunk"]).withColumn(
        out_col,
        F.col("__ycf")
        + F.pow(F.lit(decay), F.col("__i") + 1) * F.col("__carry"),
    )
    return out.drop("__chunk", "__i", "__ycf", "__carry")
