"""Vector similarity search over an embedding column (SURVEY.md §2.10
`llm_similarity_topk`).

Two paths:
- brute-force top-k: broadcast the query set against the corpus; exact.
  Cost O(|Q|·N·d) — the correctness baseline and fine whenever |Q| is
  bounded (the common "search" shape).
- sign-LSH (random hyperplanes) bucketed top-k: corpus and queries are
  bucketed by the sign pattern of d·h for a fixed set of hyperplanes;
  candidates only join within a bucket → shuffle-bounded, the 100 TB path
  (IVF-style coarse quantization would slot in the same way with learned
  centroids).

All arithmetic uses built-in higher-order array functions (zip_with /
aggregate) in DOUBLE precision — JVM codegen, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# Tie-safe rounding epsilon (see trino_demo_spark.parity.EPS).
EPS = 1e-9

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
)
NORM = (
    "sqrt(aggregate({a}, CAST(0 AS DOUBLE), "
    "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
)


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(NORM.format(a=vec_col)))


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str):
    return F.expr(DOT.format(a=a, b=b)) / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window row_number.

    Similarities are rounded and ties broken by neighbor id so rankings
    are deterministic and engine-independent.
    """
    q = with_norm(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
        ),
        "q_emb",
        "q_norm",
    )
    c = with_norm(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")),
        "n_emb",
        "n_norm",
    )
    sim = F.round(
        cosine_expr("q_emb", "n_emb", "q_norm", "n_norm") + F.lit(EPS), round_to
    ).alias("sim")
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", sim)
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def _hyperplanes(dim: int, num_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG dependency): a
    hash-mixed lattice mapped into [-1, 1]. Fixed for a given (dim,
    num_planes) so bucketing is stable across runs and engines."""
    planes = []
    for j in range(num_planes):
        row = []
        for d in range(dim):
            h = (j * 2654435761 + d * 40503 + 12345) * 2246822519 % 4294967296
            row.append((h % 2000) / 1000.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: sign-LSH bucket join.

    Bucket id = bit pattern of sign(v·h_j) for num_planes fixed
    hyperplanes; queries and corpus join only within their bucket. Recall
    can be raised by multi-probe (flipping low-margin bits) or repeated
    tables; kept single-table here.
    """
    planes = _hyperplanes(dim, num_planes)
    planes_lit = F.array(
        *[F.array(*[F.lit(x) for x in row]) for row in planes]
    )

    def bucketed(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        out = df.withColumn("__planes", planes_lit)
        sign_bits = F.expr(
            "aggregate(transform(__planes, p -> CASE WHEN "
            + DOT.format(a="p", b=vecc)
            + " >= 0 THEN 1 ELSE 0 END), 0, (acc, b) -> acc * 2 + b)"
        )
        return out.withColumn("bucket", sign_bits).drop("__planes")

    q = bucketed(
        with_norm(
            queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")),
            "q_emb",
            "q_norm",
        ),
        "q_id",
        "q_emb",
    )
    c = bucketed(
        with_norm(
            corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")),
            "n_emb",
            "n_norm",
        ),
        "n_id",
        "n_emb",
    )
    sim = F.round(cosine_expr("q_emb", "n_emb", "q_norm", "n_norm") + F.lit(EPS), round_to).alias("sim")
    pairs = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", sim)
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).
    Brute-force all-pairs — correctness baseline; the LSH bucket join above
    is the scale path (same output contract)."""
    a = with_norm(
        df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a")),
        "emb_a",
        "norm_a",
    )
    b = with_norm(
        df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b")),
        "emb_b",
        "norm_b",
    )
    sim = F.round(cosine_expr("emb_a", "emb_b", "norm_a", "norm_b") + F.lit(EPS), round_to).alias("sim")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim)
        .filter(F.col("sim") >= threshold)
    )
