"""Sequence packing for LLM training pipelines (SURVEY.md §2.10
extension family): greedy sequential bin packing of documents into fixed
token-budget context windows.

Pretraining dataloaders concatenate documents into fixed-length windows;
the engine-side version assigns every document a (group, bin_id, offset)
so a downstream writer can materialize packed sequences without a
driver-side loop. The packing rule is the standard greedy sequential
one: walk documents in a deterministic order, keep a running fill, start
a new bin when the next document would overflow the budget (an oversized
document gets a bin of its own — flagged, since it needs truncation or
splitting downstream).

Packing is inherently sequential WITHIN a group, so the group is the
parallelism unit: applyInPandas gives each group one linear scan. At
100 TB the group is a shard key (language, source, or hash(doc_id) mod
N — thousands of groups → thousands of parallel scans, each
memory-bounded by its group's rows); there is no cross-group state, no
shuffle beyond the one groupBy, and no driver involvement. The same
greedy recurrence is exactly expressible as a DuckDB recursive CTE,
which is the parity oracle (parity_llm.llm_pack_sequences).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType(
    [
        T.StructField("group_key", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("offset", T.LongType()),
        T.StructField("oversized", T.BooleanType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Assign (bin_id, offset) per document by greedy sequential packing
    within each group, documents ordered by id.

    bin_id counts bins within the group from 0; offset is the token
    position of the document inside its bin; oversized marks documents
    alone in a bin because n_tokens > budget."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if token_count_col is None:
        toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    else:
        toks = F.col(token_count_col).cast("long")
    # Contentless rows (NULL text → NULL token count) are dropped at
    # ingest: there is nothing to pack, and a NaN token count would
    # poison the greedy fill arithmetic below.
    keyed = docs.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("n_tokens"),
    ).filter(F.col("n_tokens").isNotNull())

    def pack(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Spark 4.1's iterator grouped-map form delivers ONE group as a
        # stream of Arrow batches (default 10k rows each) in arbitrary
        # row order. The greedy fill is a sequential fold over the WHOLE
        # group in doc_id order, so the group must be assembled and
        # sorted once before folding — a per-batch fold silently resets
        # the bin state at every batch boundary (found by the r10 sf1
        # oracle sweep: bin_id restarted mid-group at >10k-row groups).
        # Whole-group memory is this operator's documented contract (the
        # group is the parallelism unit); a corpus whose single group
        # exceeds task memory needs the two-phase prefix-sum shape
        # (operators/windows.py::partitioned_prefix_sum) instead.
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = (
            pd.concat(parts, ignore_index=True)
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        bin_id, fill = 0, 0
        bins, offsets, oversized = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > budget:
                bin_id += 1
                fill = 0
            bins.append(bin_id)
            offsets.append(fill)
            oversized.append(n > budget)
            fill += n
            if fill >= budget:  # full (or oversized) bin: close it
                bin_id += 1
                fill = 0
        out = pd.DataFrame(
            {
                "group_key": pdf["group_key"],
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_tokens": pdf["n_tokens"].astype("int64"),
                "bin_id": pd.Series(bins, dtype="int64"),
                "offset": pd.Series(offsets, dtype="int64"),
                "oversized": pd.Series(oversized, dtype="bool"),
            }
        )
        # stream the result back out in bounded slices
        for lo in range(0, len(out), 65536):
            yield out.iloc[lo : lo + 65536]

    return keyed.groupBy("group_key").applyInPandas(pack, schema=PACK_SCHEMA)


def length_buckets(
    df: DataFrame,
    n_buckets: int = 4,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum length bucketing: equal-frequency token-length buckets
    per group (ntile with a full deterministic tiebreak), the standard
    pre-batching step that keeps same-length documents together so
    padding waste stays bounded.

    Scale: the window partitions by the group key (languages/sources —
    thousands of parallel partitions at 100 TB, not a global sort). If a
    single group outgrows one task, switch to broadcast quantile
    boundaries + map-side binning (approx_percentile) — same contract,
    approximate bucket edges."""
    from .dedup import tokens_col
    from pyspark.sql import Window as W

    n_tok = F.size(tokens_col(text_col))
    # Contentless rows (NULL text → NULL length) are dropped at ingest:
    # there is nothing to batch, and NULL ordering inside the window
    # differs across engines (Spark asc = NULLS FIRST, DuckDB default
    # NULLS LAST), so keeping them would make bucket ids engine-defined.
    return (
        df.select(F.col(id_col), F.col(group_col), n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens").isNotNull())
        .withColumn(
            "bucket",
            F.ntile(n_buckets).over(
                W.partitionBy(group_col).orderBy("n_tokens", id_col)
            ),
        )
    )


def budget_shards(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    order_col: str = "doc_id",
    part_col: str = "lang",
) -> DataFrame:
    """Token-budget shard assignment: walk each language's documents in
    a fixed order and cut a new training shard every `budget_tokens`
    tokens — the step that turns a filtered corpus into
    fixed-token-size dataloader files (a shard holds the docs whose
    running token count falls inside its budget window; shard sizes
    land within one document of the budget).

    shard = floor((cum_tokens - n_tokens) / budget): a document belongs
    to the shard its FIRST token falls in, so every shard except a
    language's last one spans ≥ budget_tokens.

    Scale shape: the running count uses the two-phase distributed
    prefix sum (operators/windows.py::partitioned_prefix_sum), so one
    language never serializes through a single window task — the
    per-task bound is the prefix-sum bucket width, not the corpus; the
    rest is one map-side projection. The default order column doc_id
    is a dense id, which the prefix sum's bucketing requires (see its
    PRECONDITION note); densify or widen bucket_width for sparse
    ordering keys.
    """
    from ..operators.windows import partitioned_prefix_sum

    from .dedup import tokens_col

    toks = df.select(
        order_col,
        part_col,
        F.size(tokens_col(text_col)).alias("n_tokens"),
    )
    cum = partitioned_prefix_sum(
        toks, part_col=part_col, order_col=order_col, value_col="n_tokens"
    ).withColumnRenamed("__cum", "cum_tokens")
    return cum.select(
        order_col,
        part_col,
        "n_tokens",
        "cum_tokens",
        F.floor(
            (F.col("cum_tokens") - F.col("n_tokens")) / F.lit(budget_tokens)
        )
        .cast("int")
        .alias("shard"),
    )
