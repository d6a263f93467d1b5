"""Document deduplication operators (SURVEY.md §2.10 `llm_dedup_*`).

Four tiers, each a pure DataFrame plan (no Python in the hot path):

1. exact        — hash-groupBy on content. One shuffle on the hash.
2. ngram        — exact n-gram Jaccard on co-shingled candidate pairs.
3. minhash-LSH  — MinHash signatures + banded LSH bucketing; candidate
                  generation is shuffle-bounded (join on band hash), never
                  O(n²). The 100 TB path.
4. simhash      — 64-bit SimHash per doc + banded near-pair search.

Design: all shingling/hashing uses built-in expressions (split, transform,
slice, xxhash64) so everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tie-safe rounding epsilon (see trino_demo_spark.parity.EPS).
EPS = 1e-9


def tokens_col(text_col: str):
    """Whitespace tokenization, mirrored exactly by the DuckDB oracles
    (regexp_split_to_array(trim(text), '\\s+'))."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def ngrams_over_tokens(tokens_ref: str, n: int = 3):
    """n-gram array over an already-materialized tokens column.

    IMPORTANT perf note: the tokens MUST be a bound column reference, not
    an inline split() — an expression inside the transform lambda is
    re-evaluated per element (O(tokens²) regex splits per doc; measured
    6× slowdown on the minhash path). concat_ws of direct element
    accesses keeps the loop O(n)."""
    elems = ", ".join(f"{tokens_ref}[i + {j}]" for j in range(n))
    return F.expr(
        f"CASE WHEN size({tokens_ref}) >= {n} "
        f"THEN transform(sequence(0, size({tokens_ref}) - {n}), i -> concat_ws(' ', {elems})) "
        f"ELSE array() END"
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group identical content, keep the smallest id.

    Groups directly on the text for oracle parity; content_hash (sha2) is
    also emitted — at 100 TB one would group on the 256-bit hash to keep
    shuffle rows narrow (hash collisions are negligible at 2^-128).
    """
    return (
        df.groupBy(text_col)
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select(
            "keep_id",
            "n_copies",
            F.sha2(F.col(text_col), 256).alias("content_hash"),
        )
    )


def ngram_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs; distinct=False skips the dedup shuffle for
    consumers where duplicates are harmless (min-hash)."""
    toks = df.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    out = toks.select("id", F.explode(ngrams_over_tokens("t", n)).alias("g"))
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    |A∩B| from a self-join on the shingle, |A∪B| = |A|+|B|−|A∩B|.
    Integer counts → the Jaccard division is bit-identical across engines.
    Scale: the shingle self-join is the classic inverted-index pattern;
    hot shingles should be frequency-capped upstream (drop shingles with
    document frequency > df_max) — see minhash_lsh_pairs for the
    sub-quadratic path.
    """
    sh = ngram_shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac + F.lit(EPS), 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    n: int = 3, num_perm: int = 32,
) -> DataFrame:
    """MinHash signature per doc: min over shingles of xxhash64(shingle,
    seed) for num_perm seeds. All hashing JVM-side.

    Shuffle plan: ONE exchange total — repartition by id up front, then
    the explode preserves partitioning and the groupBy(id) reuses it (no
    second exchange). Shingle duplicates are kept (min is insensitive),
    skipping the distinct shuffle entirely."""
    pre = df.repartition(F.col(id_col))
    sh = ngram_shingles(pre, id_col, text_col, n, distinct=False)
    aggs = [
        F.min(F.xxhash64(F.col("g"), F.lit(s))).alias(f"mh_{s}") for s in range(num_perm)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH + signature-estimated
    Jaccard. rows_per_band = num_perm // bands; a pair is a candidate iff
    all rows of some band agree (standard S-curve selectivity).

    Scale: candidates come from groupBy on (band, band_hash) — shuffle
    volume is O(n·bands), pair generation only within buckets. This is the
    100 TB near-dedup shape (MinHashLSH as in Lee et al., "Deduplicating
    Training Data Makes Language Models Better").
    """
    r = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    # All bands in ONE pass over the signatures (posexplode of a literal
    # band array), instead of `bands` unioned scans.
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(f"mh_{b * r + i}") for i in range(r)]).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("id", F.explode(band_arr).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = buckets.alias("a")
    b_ = buckets.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(num_perm)])
    sb = sig.select(F.col("id").alias("id_b"), *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(num_perm)])
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0) for i in range(num_perm)
    )
    est = (matches / F.lit(float(num_perm))).alias("est_jaccard")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est + F.lit(EPS), 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document from token hashes: bit j of the
    fingerprint is the sign of the vote sum over tokens (+1 if the token's
    hash has bit j set, else −1). Repartition-by-id first so the explode
    preserves partitioning and the vote groupBy needs no exchange."""
    tok = df.repartition(F.col(id_col)).select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tk")
    )
    h = F.xxhash64("tk")
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(64)
    ]
    voted = tok.groupBy("id").agg(*votes)
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseXOR(term)
    return voted.select("id", fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, candidate-generated by
    16-bit band equality (pigeonhole: distance ≤ 3 guarantees a matching
    band of 4; wider distances are probabilistic)."""
    s = simhash(df, id_col, text_col)
    bands = None
    for b in range(4):
        band = s.select(
            "id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
        )
        bands = band if bands is None else bands.unionByName(band)
    a, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
