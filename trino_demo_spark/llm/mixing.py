"""Data mixing by temperature resampling (SURVEY.md §2.10 extension
family): reweight strata (languages, sources) to (n_s/N)^alpha
proportions — the standard multilingual-pretraining mix (alpha < 1
upsamples rare strata, alpha = 1 keeps natural proportions).

Everything is computed in-engine from the stratum counts: each stratum
gets an expected per-row copy weight w_s = N·p_s/n_s with
p_s ∝ (n_s/N)^alpha, realized deterministically per row as
floor(w_s) copies plus one more iff a per-row hash fraction falls below
frac(w_s). No RNG: the same inputs produce the same mixed dataset on
any engine, partitioning, or row order, and the expected stratum sizes
hit the temperature proportions exactly.

Scale shape: counts are one tiny aggregate (|strata| rows, broadcast
back), replication is a map-side explode of sequence(1, n_copies) —
no shuffle beyond the count aggregate, output streams straight to the
sink. The per-row hash stays in a 31-bit-safe integer domain (ANSI-mode
overflow discipline, see PERF.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Knuth multiplicative hash, kept in a reduced domain: doc_id is scaled
# by the golden-ratio constant modulo 2^16 after masking to 31 bits so
# ANSI-mode int64 arithmetic can never overflow.
_HASH_FRAC = "((({id} & 2147483647) * 40503) % 65536) / 65536.0"


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    round_weights_to: int = 6,
) -> DataFrame:
    """Replicate each row n_copies times so stratum totals follow
    (n_s/N)^alpha proportions at the original total size. Output adds
    `copy_idx` (1-based) and `n_copies`. Weights are rounded (with the
    cross-engine tie epsilon) before the floor/frac split so the
    realized copy counts are identical on any engine."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__n_s"))
    totals = counts.agg(
        F.sum("__n_s").alias("__n"),
        F.sum(F.pow(F.col("__n_s").cast("double"), F.lit(alpha))).alias("__z_raw"),
    )
    # p_s = n_s^alpha / Σ n_t^alpha  (the N^alpha factors cancel);
    # w_s = N · p_s / n_s
    weighted = counts.crossJoin(F.broadcast(totals)).select(
        strata_col,
        F.round(
            (F.col("__n").cast("double") * F.pow(F.col("__n_s").cast("double"), F.lit(alpha))
             / F.col("__z_raw") / F.col("__n_s").cast("double"))
            + F.lit(1e-9),
            round_weights_to,
        ).alias("__w"),
    )
    base = F.floor(F.col("__w")).cast("long")
    frac = F.col("__w") - base
    hash_frac = F.expr(_HASH_FRAC.format(id=id_col))
    n_copies = (base + F.when(hash_frac < frac, F.lit(1)).otherwise(F.lit(0))).alias(
        "n_copies"
    )
    out = (
        df.join(F.broadcast(weighted), strata_col)
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .withColumn("copy_idx", F.explode(F.expr("sequence(1, n_copies)")))
        .drop("__w")
    )
    return out


def shuffle_key_expr(id_col: str = "doc_id", seed: int = 1):
    """The epoch-shuffle permutation key as a bare Column (map-side,
    31-bit-safe integer arithmetic) — used by epoch_shuffle() and
    fusable into any pipeline projection without a join."""
    return (
        (F.col(id_col).bitwiseXOR(F.lit(seed)).bitwiseAND(F.lit(2147483647)))
        * F.lit(2654435761)
    ) % F.lit(2147483647)


def epoch_shuffle(
    df: DataFrame,
    seed: int = 1,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch shuffle + shard assignment for training
    dataloaders: a seeded integer permutation key per row (Knuth
    multiplicative hash over id XOR seed, all arithmetic inside the
    31-bit-safe ANSI int64 domain), shard = key mod n_shards, and the
    row's position within its shard. Changing `seed` re-shuffles every
    epoch with zero RNG state — the same (id, seed) gives the same
    placement on any engine, partitioning, or row order.

    Scale: the key/shard columns are map-side expressions; only the
    within-shard position needs ordering. Here it is a rank over a
    window partitioned by shard (n_shards partitions); at 100 TB write
    with repartition(shard).sortWithinPartitions(key) instead and let
    the file order BE the position — the hash does the shuffling, no
    global sort ever runs."""
    key = shuffle_key_expr(id_col, seed)
    out = df.select(F.col(id_col), key.alias("shuffle_key")).withColumn(
        "shard", (F.col("shuffle_key") % n_shards).cast("int")
    )
    from pyspark.sql import Window as W

    return out.withColumn(
        "pos",
        F.row_number().over(
            W.partitionBy("shard").orderBy("shuffle_key", id_col)
        ),
    )


def cap_per_stratum(
    docs: DataFrame,
    cap: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    quality_col: str = "n_chars",
) -> DataFrame:
    """Per-source document cap — the standard crawl-cleaning step that
    stops one domain/dump from dominating the mix (C4 keeps ≤ N pages
    per host; every production corpus card lists a per-source cap):
    keep the `cap` best documents per stratum, best-first by
    (quality desc, id asc) so the kept set is deterministic on any
    engine, partitioning, or row order. Emits kept rows with their
    per-stratum rank and the stratum's pre-cap size (the audit columns
    a dataset card needs).

    Scale shape: ONE shuffle keyed by the stratum — thousands of
    parallel partitions at 100 TB, never a global sort. A pathological
    single stratum larger than one task is the AQE skew-split case
    (plan-gated for the join shape in tests/test_scale_plans.py); the
    rank-then-filter also admits the classic two-phase top-N (partial
    per-partition heads, then final) if a host ever outgrows that."""
    if cap <= 0:
        raise ValueError("cap must be positive")
    from pyspark.sql import Window as W

    w = W.partitionBy(stratum_col).orderBy(
        F.col(quality_col + "_q").desc(), F.col(id_col).asc()
    )
    return (
        docs.select(
            F.col(id_col),
            F.col(stratum_col),
            F.col(quality_col).cast("long").alias(quality_col + "_q"),
        )
        .withColumn("stratum_rank", F.row_number().over(w))
        .withColumn(
            "stratum_size",
            F.count(F.lit(1)).over(W.partitionBy(stratum_col)),
        )
        .filter(F.col("stratum_rank") <= cap)
    )
