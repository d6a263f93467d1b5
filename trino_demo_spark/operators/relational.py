"""Relational operator library: joins, set ops, dedup, as-of join.

Everything here is declarative DataFrame composition — Catalyst picks the
physical strategy (broadcast vs sort-merge, LOJ→inner rewrite, top-k), and
each helper documents why the shape survives a 100×-scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep the last row per key by the given ordering (descending applied
    by caller via F.desc). Mirrors the reference's keep-last Kafka dedup:
    sort by `timestamp`, `drop_duplicates(subset=['Date'], keep='last')`
    (KubeflowStockPricePrediction.ipynb:547-549).

    Scale: one hash-shuffle on `keys`; window row_number over small
    per-key groups, no global sort. Skewed keys are handled by AQE.
    """
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def tail_n(df: DataFrame, n: int, order_by: Sequence[Column | str]) -> DataFrame:
    """Last n rows by the given (ascending) ordering, returned ascending.

    Mirrors the reference's `df[-10:]` (localTrinoTest.ipynb:1194).
    Implemented as orderBy(desc).limit(n) so Catalyst plans a
    TakeOrderedAndProject (per-partition top-k + driver merge of k·p rows,
    no global sort) — the only shape that survives when df is 100 TB.
    """
    desc_cols = [
        c.desc() if isinstance(c, Column) else F.col(c).desc() for c in order_by
    ]
    asc_cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    return df.orderBy(*desc_cols).limit(n).orderBy(*asc_cols)


def chrono_split(
    df: DataFrame,
    order_by: Sequence[Column | str],
    train_fraction: float = 0.8,
    split_col: str = "split",
) -> DataFrame:
    """Tag rows 'train'/'test' by chronological fraction, no shuffle of the
    assignment logic itself. Mirrors `train_test_split(..., shuffle=False)`
    (localTrinoTest.ipynb:535).

    Scale note: row_number over a global window is a single-partition sort
    — fine for the reference's time series (one entity), but for 100 TB
    prefer a *date cutoff* computed from approx quantiles instead. Both are
    provided; this helper uses percent_rank which needs the global order.
    """
    w = W.orderBy(*order_by)
    return df.withColumn(
        split_col,
        F.when(F.percent_rank().over(w) < train_fraction, F.lit("train")).otherwise(
            F.lit("test")
        ),
    )


def chrono_split_by_cutoff(
    df: DataFrame, time_col: str, train_fraction: float = 0.8, split_col: str = "split"
) -> tuple[DataFrame, str]:
    """Scale-path chronological split: compute the fraction's time cutoff
    with approx_percentile (one partial-agg pass, no global sort), then tag
    with a plain filter — fully parallel, shuffle-free."""
    cutoff = df.agg(
        F.expr(f"approx_percentile({time_col}, {train_fraction})")
    ).first()[0]
    tagged = df.withColumn(
        split_col,
        F.when(F.col(time_col) <= F.lit(cutoff), "train").otherwise("test"),
    )
    return tagged, str(cutoff)


def _asof_tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_value_cols: Sequence[str],
    partition_cols: Sequence[str],
) -> DataFrame:
    """Shared scaffolding of the union-merge as-of joins: tag the left
    side 1 / right side 0, null-pad each side to a common schema, and
    union — the frame both the directional and nearest variants window
    over. Any schema-alignment fix lands here once."""
    lcols = left.columns
    l_tagged = left.withColumn("__side", F.lit(1)).select(
        *lcols,
        "__side",
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in right_value_cols
        ],
    )
    keep = {on, *partition_cols}
    r_tagged = right.select(
        *[
            F.col(c)
            if c in keep
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    return l_tagged.unionByName(r_tagged)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_value_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, attach the most recent right row with
    ``right.on <= left.on`` (direction='backward').

    Not in the reference (SURVEY.md §2.3 notes its absence); provided as a
    first-class extension. Implemented with the union-merge trick: tag both
    sides, union, and carry the right values forward with last(ignorenulls)
    over an ordered window — O(n log n) per partition, ONE shuffle on
    (partition_cols, on), no range/cross join. This is the shape that holds
    at 100 TB; a broadcast variant is unnecessary because Catalyst will
    already broadcast the union's small side if applicable.

    Determinism note: if the right side has multiple rows with the same
    `on` value, which one wins is sort-order-dependent — deduplicate the
    right side first (e.g. keep_last) when that matters.
    """
    lcols = left.columns
    merged = _asof_tagged_union(
        left, right, on, right_value_cols, partition_cols
    )
    order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(order, F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = merged.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: explode each right row into `salt`
    replicas, salt left rows randomly-but-deterministically (hash of the
    whole row), join on (key, salt). Splits one hot key's rows across
    `salt` shuffle partitions at the cost of replicating the right side.

    AQE's skew-join handles most cases at runtime; this is the explicit
    fallback for extreme single-key skew (or non-AQE deployments). Results
    are identical to the plain join (asserted in tests).

    Only inner/left joins are supported: the right side is replicated
    `salt` times, so right/full-outer would surface each unmatched right
    row once per replica."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(right side is replicated per salt value)"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_tag = left.withColumn("__salt", lsalt)
    r_tag = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l_tag.join(
        r_tag,
        # side-qualified refs: F.col(left_key) == F.col(right_key) is
        # AMBIGUOUS_REFERENCE whenever both sides name the key the same
        # (the common case — only prefix-distinct TPC-H keys hid this)
        (l_tag[left_key] == r_tag[right_key])
        & (l_tag["__salt"] == r_tag["__salt"]),
        how,
    )
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Two tables bucketed identically on the key join WITHOUT any exchange
    (and without sorts when sortBy matches) — the co-located join strategy
    for repeated large-fact joins at 100 TB, replacing per-query shuffles
    with a one-time layout cost. Asserted shuffle-free in
    tests/test_scale_plans.py."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS `{table_name}`")
    # A location can outlive its catalog entry (a previous session's
    # warehouse dir whose in-memory metastore died); saveAsTable refuses
    # to reuse it, so clear the orphan through the Hadoop FS API (works
    # for any filesystem, not just file://).
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table_name.lower()}")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def union_all(frames: Sequence[DataFrame]) -> DataFrame:
    """unionByName over homogeneous frames (reference: pd.concat of 5
    weather CSVs, fillMongoDB.ipynb:177-181). Narrow op — no shuffle."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def deterministic_sample(
    df: DataFrame, key_col: str, rate_sixteenths: int = 2
) -> DataFrame:
    """Reproducible sampling by content hash: keep rows whose md5(key)
    starts below a hex threshold (rate ≈ rate_sixteenths/16). Stable
    across runs, engines, partitionings, and data re-orderings — the
    property train/eval splits need (rand()-based sampling gives none of
    these)."""
    if not 1 <= rate_sixteenths <= 15:
        raise ValueError("rate_sixteenths must be in 1..15")
    threshold = format(rate_sixteenths, "x")
    return df.filter(F.md5(F.col(key_col).cast("string")) < threshold)


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling (df.sampleBy): balance classes/languages in a
    training subset. Seeded → reproducible for a fixed partitioning; use
    stratified_sample_deterministic for partition-independent
    reproducibility."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def strata_hex_threshold(rate: float) -> str:
    """4-hex-digit md5-prefix threshold for a sampling rate: keep a row
    when the first 4 hex chars of md5(key) compare below it. Quantized to
    1/65536 steps; identical string comparison on any engine."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return format(min(int(rate * 65536), 65535), "04x") if rate < 1.0 else "zzzz"


def stratified_sample_deterministic(
    df: DataFrame, strata_col: str, key_col: str, rates: "dict[str, float]"
) -> DataFrame:
    """Per-stratum content-hash sampling: row kept iff the first 4 hex
    chars of md5(key) fall below the stratum's threshold
    (strata_hex_threshold). Combines deterministic_sample's properties
    (stable across runs, engines, partitionings, re-orderings) with
    per-stratum rates — the balance-rebalancing step of a training-data
    pipeline (downsample the dominant language, keep the rare ones).
    Strata not in `rates` are dropped. Map-only: the rate map is a
    literal CASE, no join, no shuffle."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 4)
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = (F.col(strata_col) == stratum) & (
            prefix < strata_hex_threshold(rate)
        )
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        raise ValueError("rates must be non-empty")
    return df.filter(expr)


def merge_upsert(
    snapshot: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """SCD-1 MERGE / upsert without a table format: rows from `updates`
    replace same-key rows in `snapshot`; unmatched rows pass through both
    ways. Expressed as a full outer join on the keys with per-column
    COALESCE(update, snapshot) — one shuffle on the merge key, the same
    plan a MERGE INTO compiles to on engines without delta logs.

    Scale: both sides hash-partition on the keys (single co-partitioned
    shuffle each); if the update set is small relative to the snapshot —
    the common daily-increment case — Catalyst broadcasts it and the
    snapshot side never shuffles at all. Columns must match by name."""
    if set(snapshot.columns) != set(updates.columns):
        raise ValueError("merge_upsert requires identical column sets")
    u = updates.select(*[F.col(c).alias(f"__u_{c}") for c in updates.columns])
    cond = None
    for k in keys:
        # eqNullSafe like merge_rollup/snapshot_diff: a NULL-keyed
        # update must REPLACE the NULL-keyed snapshot row, not
        # full-outer into a duplicate pair
        c = snapshot[k].eqNullSafe(u[f"__u_{k}"])
        cond = c if cond is None else (cond & c)
    merged = snapshot.join(u, cond, "full_outer")
    return merged.select(
        *[
            F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
            for c in snapshot.columns
        ]
    )


def global_rank_by_key(
    df: DataFrame,
    key: Column,
    tiebreak: Column,
    n_buckets: int = 256,
    out_key: str = "shuffle_key",
    out_pos: str = "position",
) -> DataFrame:
    """Global 1-based rank over `key` (ties broken by `tiebreak`) WITHOUT
    a single-partition window — the scalable global-row_number pattern:

    1. bucket rows by key prefix (deterministic range bucketing);
    2. rank WITHIN each bucket via a window partitioned by bucket —
       fully parallel, shuffle on bucket only;
    3. collect per-bucket counts (n_buckets rows, bounded regardless of
       data size), cumsum the offsets on the driver, broadcast-join them
       back: global position = bucket offset + local rank.

    A naive row_number() OVER (ORDER BY key) collapses all data onto one
    task; this plan's only data-size shuffle is the bucket hash
    partition. Buckets are key *ranges*, so concatenating buckets in
    bucket order preserves global key order. `n_buckets` must be in
    1..256 (buckets derive from the first two hex chars of the key:
    256 raw values, scaled down monotonically — scaling, not modulo,
    because bucket order must follow key order); non-hex keys raise
    rather than silently vanish from the inner offset join."""
    if not 1 <= n_buckets <= 256:
        raise ValueError(
            f"n_buckets must be in 1..256, got {n_buckets} (buckets "
            "derive from a 2-hex-char prefix: 256 distinguishable values)"
        )
    spark = df.sparkSession
    hexval = F.conv(F.substring(F.col(out_key), 1, 2), 16, 10).cast("int")
    keyed = df.withColumn(out_key, key).withColumn(
        "__bucket",
        # conv() parses partial prefixes and yields 0 for garbage (no
        # NULL to detect), so hexness is validated explicitly — a
        # non-hex key would otherwise bucket out of key order and
        # corrupt the global ranking silently
        F.when(
            # lowercase-only: digits sort before lowercase letters in
            # both string order and hex value, so the bucket is monotone
            # in key order; mixed case would break that ('AF' < 'aa'
            # lexically, but conv says 175 > 170)
            F.col(out_key).rlike("^[0-9a-f]{2}"),
            (hexval * n_buckets / F.lit(256)).cast("int"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "global_rank_by_key: key lacks a lowercase "
                        "2-hex-char prefix: "
                    ),
                    F.col(out_key),
                )
            ).cast("int")
        ),
    )
    counts = {
        r["__bucket"]: r["n"]
        for r in keyed.groupBy("__bucket").count().withColumnRenamed("count", "n").collect()
    }
    offsets, acc = [], 0
    for b in range(n_buckets):
        offsets.append((b, acc))
        acc += counts.get(b, 0)
    off_df = spark.createDataFrame(offsets, "__bucket int, __offset long")
    w = W.partitionBy("__bucket").orderBy(F.col(out_key).asc(), tiebreak.asc())
    return (
        keyed.withColumn("__local", F.row_number().over(w))
        .join(F.broadcast(off_df), "__bucket")
        .withColumn(out_pos, (F.col("__offset") + F.col("__local")).cast("long"))
        .drop("__bucket", "__local", "__offset")
    )


def merge_rollup(
    snapshot: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    add_cols: Sequence[str],
) -> DataFrame:
    """Incremental aggregate maintenance: combine a persisted per-key
    rollup SNAPSHOT with the same-shape rollup of a new DELTA batch.
    Additive accumulators (counts, integer-unit sums, hi/lo split sums)
    merge per key as old + new; keys present on only one side pass
    through (COALESCE with 0).

    This is the 100 TB rollup pattern: the base data is scanned ONCE
    ever; each increment scans only the delta and merges O(keys) rows.
    Works for any aggregate with a commutative+associative accumulator —
    which is exactly why the engine keeps money sums as integer units
    (order-independent, so incremental == full-recompute bit-for-bit;
    a double SUM would drift under re-parenthesization).

    Scale: the merge is a full outer join on the keys — one
    co-partitioned shuffle per side, and a small delta broadcasts so
    the snapshot never shuffles. The snapshot should be stored bucketed
    by the keys to delete even that shuffle."""
    d = delta.select(*[F.col(c).alias(f"__d_{c}") for c in delta.columns])
    cond = None
    for k in keys:
        c = snapshot[k].eqNullSafe(d[f"__d_{k}"])
        cond = c if cond is None else (cond & c)
    merged = snapshot.join(d, cond, "full_outer")
    out = [
        F.coalesce(F.col(k), F.col(f"__d_{k}")).alias(k) for k in keys
    ] + [
        (
            F.coalesce(F.col(c), F.lit(0)) + F.coalesce(F.col(f"__d_{c}"), F.lit(0))
        ).alias(c)
        for c in add_cols
    ]
    return merged.select(*out)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC changelog between two snapshots of the same table: emits one
    row per changed key with op ∈ {'I','U','D'} plus the old/new values
    of the compared columns (old_<c>/new_<c>). Unchanged keys are
    dropped. This is the change-data-capture diff engines derive when
    the source has no log — the inverse of merge_upsert: applying the
    emitted changelog to `old` reproduces `new`.

    Scale: ONE full outer join co-partitioned on the keys; the change
    predicate is a null-safe column compare evaluated post-join (no
    second pass, no driver state). At 100 TB both snapshots shuffle
    once — store them bucketed by key to make the diff exchange-free."""
    # Sentinel presence flags, not key-column IS NOT NULL: the join is
    # eqNullSafe so NULL keys are legal, and a NULL first key would
    # otherwise misclassify a both-sides row as an insert.
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__o_present"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__n_present"),
    )
    cond = None
    for k in keys:
        c = o[f"__o_{k}"].eqNullSafe(n[f"__n_{k}"])
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    old_present = F.col("__o_present").isNotNull()
    new_present = F.col("__n_present").isNotNull()
    changed = None
    for c in compare_cols:
        d = ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        changed = d if changed is None else (changed | d)
    op = (
        F.when(~old_present, F.lit("I"))
        .when(~new_present, F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out = [
        F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k) for k in keys
    ] + [op.alias("op")] + [
        F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols
    ] + [
        F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols
    ]
    return j.select(*out).filter(F.col("op").isNotNull())


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Range (theta) join converted to an equi-join on time buckets —
    the scale path for interval joins when BOTH sides are too large for
    a broadcast nested-loop (same bucketize-then-equi-join pattern as
    LSH): each interval explodes into the day buckets it covers
    (rows × interval-days, bounded by interval length, map-side), facts
    bucket by day (map-side), the join runs as a HASH equi-join on the
    bucket, and a residual range filter restores exact [start, end)
    semantics. Result-identical to the direct theta join; plan-asserted
    (no BroadcastNestedLoopJoin) in tests/test_scale_plans.py."""
    # Empty/inverted intervals (end <= start) contribute zero matches in
    # the direct theta join; sequence() with start > stop THROWS, so
    # guard them out instead of letting one degenerate row kill the job.
    b = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.date_trunc("DAY", F.col(start_col)),
                F.date_trunc(
                    "DAY", F.col(end_col) - F.expr("INTERVAL 1 MICROSECOND")
                ),
                F.expr("INTERVAL 1 DAY"),
            )
        ),
    )
    f = facts.withColumn("__bucket", F.date_trunc("DAY", F.col(ts_col)))
    return (
        f.join(b, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("__bucket")
    )


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    round_to: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    exponential-sort, public algorithm): each row gets a deterministic
    uniform u ∈ (0,1) from the first 12 hex chars of md5(key) and a
    sort key u^(1/w); the k largest keys are the sample. Inclusion
    probability is proportional to weight, and because u comes from a
    content hash (not an RNG) the sample is REPRODUCIBLE across runs,
    engines, partitionings, and data re-orderings — the property a
    training-mix sample must have for the run to be auditable.

    Scale shape: the sort key is a map-side expression; the top-k is a
    TakeOrderedAndProject (per-partition heads, no global sort). The
    rounded key is exposed so a DuckDB oracle computes the identical
    sample from the identical md5 arithmetic."""
    u = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 12), 16, 10)
        .cast("double")
        / F.lit(float(16 ** 12))
    )
    # ln(u)/w is monotone with u^(1/w) and numerically safer.
    # try_divide: weight 0 means inclusion probability 0 — the row is
    # excluded (NULL key filtered), not a DIVIDE_BY_ZERO under ANSI.
    # + 0.0 normalizes IEEE -0.0 to +0.0: with heavy docs a near-zero
    # negative key rounds to zero, and a signed zero renders '-0.0'
    # vs '0.0' across engines (caught by the r9 sf1 sweep — Spark's
    # BigDecimal-backed round emits +0.0, DuckDB's keeps the sign).
    skey = (
        F.round(F.try_divide(F.log(u), weight_col) + F.lit(1e-9), round_to)
        + F.lit(0.0)
    )
    return (
        df.withColumn("sample_key", skey)
        .filter(F.col("sample_key").isNotNull())
        .orderBy(F.col("sample_key").desc(), F.col(key_col).asc())
        .limit(k)
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_value_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof semantics):
    each left row takes the right row with the smallest |right.on −
    left.on|, backward winning ties; `tolerance` (in the units of a
    numeric/date-diff `on`) nulls matches farther than the bound.

    Same union-merge shape as asof_join — ONE shuffle on
    (partition_cols, on) — with BOTH a backward carry
    (last-ignorenulls over ascending order) and a forward carry
    (last-ignorenulls over descending order) evaluated on the merged
    frame; the two specs share the partitioning, so Spark plans one
    Exchange and two in-partition sorts, never a range/cross join.
    Emits `__asof_dist` (distance to the chosen match, NULL when no
    match) alongside the value columns.
    """
    lcols = left.columns
    merged = _asof_tagged_union(
        left, right, on, right_value_cols, partition_cols
    )
    wb = (
        W.partitionBy(*partition_cols)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy(*partition_cols)
        .orderBy(F.col(on).desc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r_on = F.when(F.col("__side") == 0, F.col(on))
    carried = merged.select(
        *lcols,
        "__side",
        F.last(r_on, ignorenulls=True).over(wb).alias("__b_on"),
        F.last(r_on, ignorenulls=True).over(wf).alias("__f_on"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in right_value_cols
        ],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in right_value_cols
        ],
    ).filter(F.col("__side") == 1)
    db = F.abs(F.col(on) - F.col("__b_on"))
    df_ = F.abs(F.col("__f_on") - F.col(on))
    use_b = F.col("__f_on").isNull() | (
        F.col("__b_on").isNotNull() & (db <= df_)
    )
    dist = F.when(use_b, db).otherwise(df_)
    if tolerance is not None:
        in_tol = dist <= F.lit(tolerance)
    else:
        in_tol = F.lit(True)
    picked = [
        F.when(
            in_tol,
            F.when(use_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")),
        ).alias(c)
        for c in right_value_cols
    ]
    return carried.select(
        *lcols,
        *picked,
        F.when(in_tol, dist).alias("__asof_dist"),
    )


def interval_overlap_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_width: int = 16,
) -> DataFrame:
    """Interval×interval OVERLAP join (half-open [start, end)) as a
    bucketized equi-join — the scale path when BOTH interval sets are
    too large to broadcast, completing the family next to
    range_join_bucketed (point-in-interval):

    each side explodes into the fixed-width buckets its interval
    touches (map-side, rows × interval_len/bucket_width), the join
    runs as a HASH equi-join on the bucket id, a residual
    ``a.start < b.end AND b.start < a.end`` restores exact overlap
    semantics, and a CANONICAL-BUCKET predicate (the pair only counts
    in the bucket containing max(starts) — the first bucket where
    both intervals coexist) de-duplicates multi-bucket matches
    WITHOUT a distinct, so input row multiplicity is preserved
    exactly like the theta join. Result-identical to the direct
    theta join (which plans as a broadcast nested loop — O(|L|·|R|)
    compares); here compares are confined to co-bucketed pairs.
    Interval columns may be any numeric (ints, epoch-seconds doubles —
    cast dates to day indexes); empty intervals (end <= start) overlap
    nothing and are filtered out rather than fed to sequence(), which
    throws on inverted bounds.
    """
    def burst(df, s, e, side):
        # Last touched bucket of half-open [s, e): floor(e/w), minus 1
        # when e sits exactly on a bucket boundary. The former
        # floor((e-1)/w) form is only correct on an integer grid — for
        # fractional bounds (e.g. 16.2 with w=16) it skipped the last
        # bucket and silently dropped genuine overlaps.
        lastb = F.floor(F.col(e) / F.lit(bucket_width)) - F.when(
            F.col(e) == F.floor(F.col(e) / F.lit(bucket_width)) * F.lit(bucket_width),
            F.lit(1),
        ).otherwise(F.lit(0))
        return df.filter(F.col(e) > F.col(s)).withColumn(
            f"__bkt_{side}",
            F.explode(
                F.sequence(F.floor(F.col(s) / F.lit(bucket_width)), lastb)
            ),
        )

    l = burst(left, left_start, left_end, "l")
    r = burst(right, right_start, right_end, "r")
    canonical = F.floor(
        F.greatest(F.col(left_start), F.col(right_start)) / F.lit(bucket_width)
    )
    joined = l.join(
        r,
        (F.col("__bkt_l") == F.col("__bkt_r"))
        & (F.col(left_start) < F.col(right_end))
        & (F.col(right_start) < F.col(left_end))
        & (F.col("__bkt_l") == canonical),
    )
    return joined.drop("__bkt_l", "__bkt_r")
