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

from ..genutil import posexplode_col

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


def finite_vectors(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Ingest guard for every geometric operator (similarity / ANN /
    near-dup / k-means / PCA): drop rows whose vector cannot participate
    in vector arithmetic — NULL cell, wrong dimensionality, or any
    non-finite component. At corpus scale these are routine data
    conditions (failed embedding calls, schema drift, overflowed
    upstream math), and they poison everything downstream: a NaN vector
    ranks ABOVE every real neighbor in a descending cosine sort on both
    Spark and DuckDB (NaN compares greatest), and a NULL/ragged cell
    hard-crashes the Arrow matmul batch. ``x - x = 0`` is false for
    NaN and ±Inf (both yield NaN) — one codegen-friendly predicate, no
    UDF. Oracle mirror: ``embedding IS NOT NULL AND len(list_filter(
    embedding, x -> x IS NULL OR NOT isfinite(x))) = 0`` — the ``x IS
    NULL`` arm matters: the engine's forall yields NULL (row dropped)
    on a NULL component, while DuckDB's bare isfinite(NULL) is NULL and
    list_filter would silently skip the element."""
    col = F.col(vec_col)
    ok = col.isNotNull() & F.forall(col, lambda x: (x - x) == F.lit(0.0))
    if dim is not None:
        ok = ok & (F.size(col) == F.lit(dim))
    return df.filter(ok)


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(NORM.format(a=vec_col)))


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str):
    # Zero-norm vectors (padding rows, failed embedding calls) define
    # cosine as 0.0 rather than a DIVIDE_BY_ZERO under ANSI mode —
    # mirrored by COALESCE(dot / NULLIF(…, 0), 0) in the oracles.
    return F.coalesce(
        F.try_divide(
            F.expr(DOT.format(a=a, b=b)), F.col(norm_a) * F.col(norm_b)
        ),
        F.lit(0.0),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus, window row_number.

    Similarities are rounded and ties broken by neighbor id so rankings
    are deterministic and engine-independent. ``dim`` is the caller's
    declared embedding dimensionality (schema contract): when given,
    ragged vectors are dropped at ingest alongside NULL/non-finite ones
    — a finite wrong-length vector would otherwise NULL-pad the
    zip_with dot product (silent garbage) or crash the Arrow matmul.
    """
    q = with_norm(
        finite_vectors(queries, vec_col, dim).select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
        ),
        "q_emb",
        "q_norm",
    )
    c = with_norm(
        finite_vectors(corpus, vec_col, dim).select(
            F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")
        ),
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


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Exact cosine top-k via Arrow-batched numpy matmul (mapInPandas) —
    the production-throughput version of brute_force_topk, same results.

    brute_force_topk's zip_with/aggregate dot product is an interpreted
    HOF (~64 boxed ops per pair); here each task computes ONE
    (batch × dim) @ (dim × |Q|) float64 matmul and emits only its LOCAL
    top-k per query, so the final exchange carries
    num_partitions × |Q| × k rows into the global top-k window (the
    map-side-combine of similarity search). Measured 21.3s → well under
    a second of compute at sf10-equivalent (200k × 64, 20 queries).

    Parity: float64 matmul vs the fold differs only in summation order
    (~1e-15 relative); the shared EPS-before-round discipline absorbs
    it, so output is row-identical to brute_force_topk and the same
    DuckDB oracle applies. Queries are collected to the driver — by the
    same bounded-query-set contract the broadcast in brute_force_topk
    already assumes.
    """
    import numpy as np

    corpus = finite_vectors(corpus, vec_col, dim)
    qrows = finite_vectors(queries, vec_col, dim).select(id_col, vec_col).collect()
    spark = corpus.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], "q_id long, n_id long, sim double, rank long"
        )
    q_ids = np.asarray([r[0] for r in qrows], dtype=np.int64)
    q_mat = np.asarray([list(r[1]) for r in qrows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))
    eps, kk, rt = EPS, k, round_to

    def local_topk(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n_norm = np.sqrt((m * m).sum(axis=1))
            # zero-norm rows → cosine 0.0 (matches cosine_expr), not
            # a silent inf/nan from the vectorized division
            den = n_norm[:, None] * q_norm[None, :]
            sims = np.round(
                np.divide(
                    m @ q_mat.T, den, out=np.zeros_like(den), where=den != 0
                )
                + eps,
                rt,
            )
            out_q, out_n, out_s = [], [], []
            for j in range(len(q_ids)):
                col = sims[:, j]
                mask = ids != q_ids[j]
                cids, csim = ids[mask], col[mask]
                # top-k by (sim desc, n_id asc): lexsort is stable,
                # last key primary
                order = np.lexsort((cids, -csim))[:kk]
                out_q.extend([q_ids[j]] * len(order))
                out_n.extend(cids[order])
                out_s.extend(csim[order])
            yield pd.DataFrame(
                {"q_id": out_q, "n_id": out_n, "sim": out_s}
            )

    local = corpus.select(id_col, vec_col).mapInPandas(
        local_topk, "q_id long, n_id long, sim double"
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
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

    # dim doubles as the ingest dimensionality contract: a ragged vector
    # would mis-project against the fixed dim-sized hyperplanes.
    q = bucketed(
        with_norm(
            finite_vectors(queries, vec_col, dim).select(
                F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")
            ),
            "q_emb",
            "q_norm",
        ),
        "q_id",
        "q_emb",
    )
    c = bucketed(
        with_norm(
            finite_vectors(corpus, vec_col, dim).select(
                F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")
            ),
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
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ t).
    Brute-force all-pairs — correctness baseline; the LSH bucket join above
    is the scale path (same output contract).

    Identical-vector collapse (r10, exact): all-pairs cosine runs over
    DISTINCT vectors only; identical vectors have bit-identical dot
    products, so within-group pairs are emitted directly at sim 1.0
    (round(cos±ulp + EPS, 4) of a self-cosine is exactly 1.0 — the same
    argument the LSH path's within_group_pairs relies on) and
    cross-group rep pairs expand to member pairs after the threshold
    filter. Output is row-identical to the naive n² form; compute drops
    from corpus² to distinct² (the r9 scaled corpora replicate vectors
    bit-identically, so this is the difference between 4·10⁸ and 2·10⁶
    pair evaluations at sf1). Zero-norm vectors have no cosine (the
    naive form's guarded divide yields 0.0 < any positive threshold),
    so they are excluded from pair generation before the collapse —
    identical zero vectors must not masquerade as sim-1.0 duplicates.
    That exclusion makes threshold <= 0 ill-defined (the pre-r10 guarded
    divide emitted zero-norm pairs at sim 0.0; this form cannot), so
    non-positive thresholds are rejected (ADVICE r10)."""
    if threshold <= 0.0:
        raise ValueError(
            "cosine_near_dup_pairs requires threshold > 0: zero-norm "
            "vectors are excluded from pair generation, so a non-positive "
            "threshold would silently return fewer pairs than the naive "
            "guarded-divide form"
        )
    from .dedup import collapse_identical, expand_cross_pairs, within_group_pairs

    rows = with_norm(
        finite_vectors(df, vec_col, dim).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("emb")
        ),
        "emb",
        "norm",
    ).filter(F.col("emb").isNotNull() & (F.col("norm") > 0))
    groups, mem = collapse_identical(rows.select("id", "emb"), "emb", "id")
    within = within_group_pairs(mem, "sim", 1.0).filter(
        F.lit(1.0) >= F.lit(threshold)
    )

    reps = with_norm(groups.select(F.col("rep"), "emb"), "emb", "norm")
    a = reps.select(
        F.col("rep").alias("rep_a"),
        F.col("emb").alias("emb_a"),
        F.col("norm").alias("norm_a"),
    )
    b = reps.select(
        F.col("rep").alias("rep_b"),
        F.col("emb").alias("emb_b"),
        F.col("norm").alias("norm_b"),
    )
    sim = F.round(
        cosine_expr("emb_a", "emb_b", "norm_a", "norm_b") + F.lit(EPS), round_to
    ).alias("sim")
    rep_pairs = (
        a.crossJoin(b)
        .filter(F.col("rep_a") < F.col("rep_b"))
        .select("rep_a", "rep_b", sim)
        .filter(F.col("sim") >= threshold)
    )
    return within.unionByName(expand_cross_pairs(rep_pairs, mem, "sim"))


def cosine_near_dup_pairs_arrow(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Brute-force near-dup pairs via blocked numpy matmul — row-identical
    to cosine_near_dup_pairs (same EPS-round-then-threshold, id_a < id_b)
    and sharing its oracle, but each task multiplies its Arrow batch
    against the broadcast rep matrix instead of running 64 interpreted
    fold ops per pair. Same QUADRATIC compute contract as the expression
    version (this is the exact baseline the LSH path is recall-checked
    against — at true 100 TB scale use cosine_near_dup_pairs_lsh).

    Identical-vector collapse (r10, exact — same argument as the fold
    version): the matmul runs over DISTINCT vectors only; within-group
    pairs are emitted directly at sim 1.0 and surviving rep pairs expand
    to member pairs through the narrow member frame. The broadcast
    shrinks from corpus×dim to distinct×dim and the matmul from corpus²
    to distinct² (sf10 replicated corpus: 854s → seconds). Zero-norm
    vectors have no cosine (the unconstrained matmul's guarded divide
    yielded 0.0 < any positive threshold) and are excluded before the
    collapse. Bounded-DISTINCT-corpus contract: the rep matrix is
    collected to the driver and broadcast, so the distinct-vector count
    must fit in memory — the declared exact-baseline boundary.
    threshold <= 0 is rejected for the same reason as the fold version
    (zero-norm vectors excluded → sim-0.0 pairs unreachable)."""
    if threshold <= 0.0:
        raise ValueError(
            "cosine_near_dup_pairs_arrow requires threshold > 0: zero-norm "
            "vectors are excluded from pair generation, so a non-positive "
            "threshold would silently return fewer pairs than the naive "
            "guarded-divide form"
        )
    import numpy as np

    from .dedup import collapse_identical, expand_cross_pairs, within_group_pairs

    rows_df = with_norm(
        finite_vectors(df, vec_col, dim).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("emb")
        ),
        "emb",
        "norm",
    ).filter(F.col("emb").isNotNull() & (F.col("norm") > 0))
    groups, mem = collapse_identical(rows_df.select("id", "emb"), "emb", "id")
    within = within_group_pairs(mem, "sim", 1.0).filter(
        F.lit(1.0) >= F.lit(threshold)
    )

    spark = df.sparkSession
    reps = groups.select(F.col("rep"), "emb").collect()
    if not reps:
        return spark.createDataFrame([], "id_a long, id_b long, sim double")
    all_ids = np.asarray([r[0] for r in reps], dtype=np.int64)
    mat = np.asarray([list(r[1]) for r in reps], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    b_ids = spark.sparkContext.broadcast(all_ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)
    eps, rt, thr = EPS, round_to, threshold

    def pairs_gen(batches):
        import pandas as pd

        ids_all, m_all, n_all = b_ids.value, b_mat.value, b_norms.value
        n = len(ids_all)
        chunk = max(16, (64 * 1024 * 1024 // 8) // max(n, 1))
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["rep"].to_numpy(dtype=np.int64)
            m = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
            )
            nn = np.sqrt((m * m).sum(axis=1))
            for lo in range(0, len(ids), chunk):
                hi = lo + chunk
                den = nn[lo:hi, None] * n_all[None, :]
                sims = np.round(
                    np.divide(
                        m[lo:hi] @ m_all.T,
                        den,
                        out=np.zeros_like(den),
                        where=den != 0,
                    )
                    + eps,
                    rt,
                )
                keep = (sims >= thr) & (ids[lo:hi, None] < ids_all[None, :])
                ai, bj = np.nonzero(keep)
                if len(ai):
                    yield pd.DataFrame(
                        {
                            "rep_a": ids[lo:hi][ai],
                            "rep_b": ids_all[bj],
                            "sim": sims[ai, bj],
                        }
                    )

    rep_pairs = groups.select("rep", "emb").mapInPandas(
        pairs_gen, "rep_a long, rep_b long, sim double"
    )
    return within.unionByName(expand_cross_pairs(rep_pairs, mem, "sim"))


def cosine_near_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH — the
    100 TB path with the same (id_a, id_b, sim) contract as
    `cosine_near_dup_pairs` (which stays the test oracle).

    num_planes fixed hyperplanes are split into `bands` bands of
    num_planes/bands sign bits; two vectors are candidates if ANY band's
    bit pattern matches (banding boosts recall exactly like MinHash LSH:
    P(candidate) = 1-(1-p^b)^L for per-plane collision prob
    p = 1-θ/π). Candidates get the exact cosine and the threshold filter,
    so false positives cost only compute — recall is the only
    approximation. For sim ≥ 0.95 (θ ≤ 18.2°, p ≥ 0.899) with b=4, L=4
    the per-pair recall is ≥ 98.5%, → 1 rapidly as sim → 1 (true
    near-dups). Work is bounded by bucket sizes (self-join per (band,
    key)), never O(n²); hyperplanes are deterministic so results are
    stable across runs and engines.

    Each band key is computed directly from the plane slice (single
    aggregate over element vars) — no intermediate bit-array column whose
    defining expression Catalyst would inline per band (see PERF.md on
    projection-collapse fan-out).

    Identical-vector collapse (same shape as minhash_lsh_pairs, same
    measured reason): exact-duplicate docs carry bit-identical
    embeddings, every member of such a cluster lands in every band
    bucket together, and the bucket self-join goes quadratic in cluster
    size — the sf1-equivalent scaling study clocked this as the one
    remaining super-linear query (13.8×/decade). LSH therefore runs
    over DISTINCT vectors only; within-cluster pairs are emitted
    directly (identical vectors ⇒ sim exactly 1.0 after the
    +EPS-round), and cross-cluster rep pairs expand to member pairs
    only after the threshold filter. Output is row-identical; compute
    is linear in corpus size, and only the pair OUTPUT stays quadratic
    in cluster size (inherent to the pair contract —
    `dedup_clusters` is the linear-output representation)."""
    from .dedup import expand_cross_pairs, within_group_pairs

    mem, rep_pairs = _lsh_collapse_rep_pairs(
        df, threshold, id_col, vec_col, dim, num_planes, bands, round_to
    )
    # Identical vectors: cos is 1.0 to the ulp, and round(1±ulp+EPS, 4)
    # is exactly 1.0 — always ≥ any meaningful threshold, no LSH needed.
    within = within_group_pairs(mem, "sim", 1.0)
    return within.unionByName(expand_cross_pairs(rep_pairs, mem, "sim"))


def _lsh_collapse_rep_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str,
    vec_col: str,
    dim: int,
    num_planes: int,
    bands: int,
    round_to: int,
    dedup_pairs: bool = True,
):
    """Shared sign-LSH core: identical-vector collapse, banded bucket
    self-join over the DISTINCT reps, exact-cosine re-check. Returns
    (mem, rep_pairs) where mem is the narrow (rep, mid) member frame
    and rep_pairs is (rep_a, rep_b, sim) above the threshold.

    dedup_pairs=False (r12) skips the final .distinct() — a rep pair
    colliding in k>1 bands is emitted k≤bands times — for consumers
    that dedup downstream anyway (the edges→dedup_clusters path, whose
    edge frame goes straight into a distinct): the pair contract keeps
    the dedup, the connectivity contract drops one full exchange of
    the threshold-surviving pairs."""
    from .dedup import collapse_identical

    planes = _hyperplanes(dim, num_planes)
    planes_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in planes])
    b = num_planes // bands

    rows = with_norm(
        finite_vectors(df, vec_col, dim).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("emb")
        ),
        "emb",
        "norm",
    )
    # NULL embeddings and zero vectors have no cosine (the brute
    # baseline's sim comes out NULL/NaN and never survives its
    # threshold filter) — exclude them BEFORE the collapse so they
    # can't group together and masquerade as sim-1.0 duplicates.
    rows = rows.filter(F.col("emb").isNotNull() & (F.col("norm") > 0))
    groups, mem = collapse_identical(rows.select("id", "emb"), "emb", "id")

    keyed = with_norm(
        groups.select(F.col("rep").alias("id"), "emb"),
        "emb",
        "norm",
    ).withColumn("__planes", planes_lit)
    band_keys = F.expr(
        f"transform(sequence(0, {bands - 1}), k -> "
        f"aggregate(slice(__planes, k * {b} + 1, {b}), 0, (acc, p) -> "
        "acc * 2 + CASE WHEN "
        + DOT.format(a="p", b="emb")
        + " >= 0 THEN 1 ELSE 0 END))"
    )
    # posexplode_col, not posexplode: the inferred Generate pre-filter
    # would re-evaluate band_keys — `bands` hyperplane dot products per
    # row — two more times at the scan (see genutil).
    keyed = posexplode_col(keyed, band_keys, "band", "bkey", "id", "emb", "norm")

    a, c = keyed.alias("a"), keyed.alias("b")
    sim = F.round(
        cosine_expr("a.emb", "b.emb", "a.norm", "b.norm") + F.lit(EPS), round_to
    ).alias("sim")
    rep_pairs = (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("rep_a"), F.col("b.id").alias("rep_b"), sim)
        .filter(F.col("sim") >= threshold)
    )
    if dedup_pairs:
        rep_pairs = rep_pairs.distinct()
    return mem, rep_pairs


def cosine_near_dup_edges_lsh(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    round_to: int = 4,
) -> DataFrame:
    """Connectivity-equivalent edge frame for CLUSTERING (id_a, id_b) —
    the input to dedup_clusters when only components matter, not the
    pair contract.

    cosine_near_dup_pairs_lsh must emit every member pair: C(m,2) rows
    per identical-vector group and |A|·|B| per surviving rep pair —
    inherently quadratic in duplicate multiplicity (at a 1000-replica
    corpus that is 10⁹ rows for 2k groups). Connected components only
    need CONNECTIVITY, and a rep–member star (m-1 edges per group) plus
    the rep-level threshold edges spans exactly the same components:
    within a group every member reaches its rep directly, and any
    cross-group member pair routes through the two reps. This keeps the
    semantic-dedup composition linear in corpus size + distinct² in
    pair generation — the 100 TB shape."""
    mem, rep_pairs = _lsh_collapse_rep_pairs(
        df, threshold, id_col, vec_col, dim, num_planes, bands, round_to,
        # connectivity consumer: dedup_clusters' edge normalization ends
        # in .distinct(), so pre-deduping here would exchange the same
        # (small, threshold-surviving) pair frame twice (r12)
        dedup_pairs=False,
    )
    stars = (
        mem.filter(F.col("mid") != F.col("rep"))
        .select(F.col("rep").alias("id_a"), F.col("mid").alias("id_b"))
    )
    return stars.unionByName(
        rep_pairs.select(
            F.col("rep_a").alias("id_a"), F.col("rep_b").alias("id_b")
        )
    )


def centroid_assign_udf(centroids):
    """Vectorized nearest-centroid (L2) assignment: one Arrow batch →
    one numpy matmul (argmin over ||x||² − 2x·c + ||c||², with the
    per-row ||x||² constant dropped). Replaces the interpreted
    `_argmin_centroid` expression fold (k × dim ops per row) on
    full-corpus assignment passes — measured 70% of ivf_topk at
    sf1-equivalent. Ties break to the lowest index (np.argmin), same as
    the fold's strict `<`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    prof = (-2.0) * C.T
    cc = (C * C).sum(axis=1)

    def assign(v):
        if v.empty:
            return pd.Series([], dtype="int32")
        X = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        return pd.Series((X @ prof + cc[None, :]).argmin(axis=1).astype("int32"))

    # no type hints on purpose: pandas is imported locally, so string
    # annotations would not resolve in the module namespace — the
    # hint-less form defaults to a scalar series→series pandas UDF.
    return pandas_udf(assign, "int")


def _kmeans_moments(df: DataFrame, vec_col: str, centroids) -> DataFrame:
    """One mapInPandas pass over the corpus: blocked-matmul argmin
    assignment AND per-batch partial (cluster, count, sum-vector)
    moments. The shuffle then carries ~partitions × k rows instead of
    rows × dim posexploded values, and the driver only ever sees the
    k×dim reduced sums."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    prof = (-2.0) * C.T
    cc = (C * C).sum(axis=1)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]]
            )
            cl = (X @ prof + cc[None, :]).argmin(axis=1)
            uniq = np.unique(cl)
            yield pd.DataFrame(
                {
                    "cluster": uniq.astype("int32"),
                    "cnt": [int((cl == c).sum()) for c in uniq],
                    "sums": [X[cl == c].sum(axis=0).tolist() for c in uniq],
                }
            )

    return df.select(vec_col).mapInPandas(
        gen, "cluster int, cnt long, sums array<double>"
    )


def _argmin_centroid(vec_col: str, centroids_lit, metric_dot: bool = False):
    """Index of the nearest centroid (L2) for a vector column, computed
    with array expressions against a broadcast literal centroid array.
    Kept for QUERY-side probe computation (a handful of rows); corpus-
    side assignment goes through centroid_assign_udf/_kmeans_moments."""
    dist = (
        "aggregate(zip_with({c}, {v}, (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    )
    # argmin via aggregate over the centroid index sequence
    return F.expr(
        "aggregate(sequence(0, size(__cents) - 1), named_struct('i', -1, 'd', CAST('Infinity' AS DOUBLE)), "
        "(best, i) -> CASE WHEN "
        + dist.format(c="element_at(__cents, i + 1)", v=vec_col)
        + " < best.d THEN named_struct('i', i, 'd', "
        + dist.format(c="element_at(__cents, i + 1)", v=vec_col)
        + ") ELSE best END).i"
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    iters: int = 3,
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means over the embedding column, entirely
    with DataFrame aggregates: init = first k vectors by id; each
    iteration assigns via broadcast centroid literals (array math, no UDF)
    and recomputes centroids with posexplode + (cluster, dim) avg. Only
    the k×dim centroid matrix ever reaches the driver.

    This is the IVF coarse quantizer: at 100 TB, fit on a sample, then a
    single assignment pass partitions the corpus into k inverted lists.
    """
    df = finite_vectors(df, vec_col, dim)
    init = (
        df.orderBy(id_col).limit(k).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[0]] for r in init if r[0] is not None]
    if not centroids:
        # Empty corpus (a legal outcome of an upstream filter at any
        # scale): no centroids to fit. Callers short-circuit on [].
        return []
    for _ in range(iters):
        parts = _kmeans_moments(df, vec_col, centroids)
        counts = {
            r["cluster"]: r["n"]
            for r in parts.groupBy("cluster")
            .agg(F.sum("cnt").alias("n"))
            .collect()
        }
        sums = (
            parts.select("cluster", F.posexplode("sums").alias("pos", "s"))
            .groupBy("cluster", "pos")
            .agg(F.sum("s").alias("s"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in sums:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["s"]
        dim = len(centroids[0])
        centroids = [
            [
                by_cluster[ci][d] / counts[ci]
                if counts.get(ci)
                else centroids[ci][d]
                for d in range(dim)
            ]
            for ci in range(len(centroids))
        ]
    return centroids


def _empty_topk(queries: DataFrame, id_col: str) -> DataFrame:
    """Zero-row (q_id, n_id, sim, rank) frame with id types taken from
    the query side — the graceful result of every ANN path when the
    corpus (hence the fitted quantizer) is empty."""
    return queries.limit(0).select(
        F.col(id_col).alias("q_id"),
        F.col(id_col).alias("n_id"),
        F.lit(0.0).alias("sim"),
        F.lit(0).cast("long").alias("rank"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: k-means coarse quantizer partitions
    the corpus into inverted lists; each query probes its `nprobe`
    nearest lists only. Candidate volume drops from N to ~N·nprobe/k —
    the classic trade against recall, and the scale path when the query
    set is too large to broadcast against the whole corpus (the sign-LSH
    variant is the hash-based alternative with the same contract)."""
    corpus = finite_vectors(corpus, vec_col, dim)
    queries = finite_vectors(queries, vec_col, dim)
    centroids = kmeans_fit(corpus, vec_col, id_col, k=num_centroids, iters=iters)
    if not centroids:
        return _empty_topk(queries, id_col)
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in centroids])

    c = with_norm(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")),
        "n_emb",
        "n_norm",
    ).withColumn("cluster", centroid_assign_udf(centroids)("n_emb"))

    # queries probe the nprobe nearest centroids: compute all distances,
    # keep the nprobe smallest indices (array sort over (dist, idx) structs)
    dist = (
        "aggregate(zip_with(element_at(__cents, i + 1), q_emb, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    )
    probes = F.expr(
        "slice(transform(array_sort(transform(sequence(0, size(__cents) - 1), "
        "i -> named_struct('d', " + dist + ", 'i', i))), s -> s.i), 1, " + str(nprobe) + ")"
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")),
        "q_emb",
        "q_norm",
    ).withColumn("__cents", cents_lit).withColumn("probes", probes).drop("__cents")
    q_exploded = q.select("q_id", "q_emb", "q_norm", F.explode("probes").alias("cluster"))

    sim = F.round(
        cosine_expr("q_emb", "n_emb", "q_norm", "n_norm") + F.lit(EPS), round_to
    ).alias("sim")
    pairs = (
        c.join(F.broadcast(q_exploded), "cluster")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id", sim)
    )
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    dim: int | None = None,
):
    """Distributed PCA fit over an embedding column — the dimensionality
    reducer in front of clustering / visualization / cheap ANN.

    Scale shape: one mapInPandas pass computes per-partition moment
    partials (count, sum vector, d×d Gram matrix flattened) with numpy
    on Arrow batches; only `numPartitions` partial rows — each O(d²)
    floats, data-size-independent — reach the driver, where the d×d
    covariance eigendecomposition runs (d=64 → microseconds). Same
    bounded-collect discipline as kmeans_fit above: the corpus itself
    never leaves the executors, and the fit cost is one full scan.

    Sign convention for determinism: each component is flipped so its
    largest-|weight| coordinate is positive (ties → lowest index wins).
    Returns (mean[d], components[k][d] ordered by descending variance,
    explained_var[k])."""
    import numpy as np
    import pandas as pd

    df = finite_vectors(df, vec_col, dim)

    def partials(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "s": [m.sum(axis=0).tolist()],
                    "g": [(m.T @ m).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()
    if not rows:
        # Empty corpus: nothing to fit. ([], [], []) — pca_project on an
        # empty component list degrades to the id column alone.
        return [], [], []
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v.tolist())
    return mu.tolist(), comps, [float(evals[i]) for i in order]


def pca_project(
    df: DataFrame,
    mean,
    components,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Project embeddings onto fitted principal components: the mean and
    the k×d component matrix ride along as broadcast array literals and
    each score is a zip_with/aggregate dot product — JVM-side array
    math, no UDF, map-only (zero shuffle at any scale)."""
    df = finite_vectors(df, vec_col, dim)
    if not components:
        # Empty fit (empty corpus): no projection columns to compute.
        return df.limit(0).select(F.col(id_col))
    mu_lit = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mu_lit, lambda x, m: x - m)
    out = df.withColumn("__c", centered)
    cols = [F.col(id_col)]
    for j, comp in enumerate(components, start=1):
        w_lit = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col("__c"), w_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(dot + F.lit(1e-9), round_to).alias(f"pc{j}"))
    return out.select(*cols)


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: split the vector into m subspaces
    of dim/m and fit an independent deterministic k-means (ksub
    centroids) per subspace via the existing DataFrame-aggregate
    kmeans_fit. Only m·ksub·(dim/m) = ksub·dim floats reach the driver —
    the codebook is tiny at any corpus scale; at 100 TB fit on a sample,
    like the IVF coarse quantizer."""
    dsub = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col).alias("vec_id"),
            F.slice(F.col(vec_col), j * dsub + 1, dsub).alias("embedding"),
        )
        books.append(kmeans_fit(sub, "embedding", "vec_id", k=ksub, iters=iters))
    return books


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    ksub: int = 16,
    iters: int = 2,
    refine: int = 32,
    round_to: int = 4,
) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank — the third ANN path
    next to sign-LSH and IVF, composable with both (encode each IVF list
    with PQ for the classic IVF-PQ).

    1. ENCODE (map-only): each corpus vector → m small codes, the
       argmin-centroid per subspace against the broadcast codebook
       literal. The corpus never shuffles; an encoded row is m bytes of
       code instead of dim floats — the memory/IO compression that makes
       100 TB ANN feasible.
    2. ADC scan: each query precomputes its m×ksub lookup table (dot of
       its subvector with every centroid) ONCE; scoring a pair is then m
       table lookups instead of a dim-length dot product — the
       asymmetric-distance trick from the PQ paper (Jégou et al., 2011,
       public). Queries+LUTs broadcast against the encoded corpus.
    3. REFINE: top-`refine` candidates per query by ADC score are
       re-ranked by EXACT cosine; top-k of that is returned with the
       same (q_id, n_id, sim, rank) contract as the other ANN paths, so
       recall is the only approximation (measured in tests vs brute
       force).
    """
    corpus = finite_vectors(corpus, vec_col, dim)
    queries = finite_vectors(queries, vec_col, dim)
    dsub = dim // m
    books = pq_codebooks(corpus, vec_col, id_col, dim, m, ksub, iters)
    if not books or not books[0]:
        return _empty_topk(queries, id_col)
    # A corpus smaller than ksub fits fewer centroids than requested —
    # the code/LUT expressions must iterate the FITTED size or
    # element_at walks off the codebook.
    ksub = min(len(b) for b in books)
    books_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cent]) for cent in book])
        for book in books
    ])

    sub_dist = (
        "aggregate(zip_with(element_at(element_at(__pq, j + 1), c + 1), "
        "slice(n_emb, j * {dsub} + 1, {dsub}), "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    ).format(dsub=dsub)
    codes_expr = F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"element_at(array_sort(transform(sequence(0, {ksub - 1}), c -> "
        f"named_struct('d', {sub_dist}, 'i', c))), 1).i)"
    )
    enc = with_norm(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")),
        "n_emb",
        "n_norm",
    ).withColumn("__pq", books_lit).withColumn("codes", codes_expr).drop("__pq")

    sub_dot = (
        "aggregate(zip_with(element_at(element_at(__pq, j + 1), c + 1), "
        "slice(q_emb, j * {dsub} + 1, {dsub}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    ).format(dsub=dsub)
    lut_expr = F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {ksub - 1}), c -> {sub_dot}))"
    )
    q = with_norm(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")),
        "q_emb",
        "q_norm",
    ).withColumn("__pq", books_lit).withColumn("lut", lut_expr).drop("__pq")

    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE), (acc, j) -> "
        "acc + element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1))"
    )
    pairs = (
        enc.join(F.broadcast(q), F.col("n_id") != F.col("q_id"))
        .withColumn(
            "adc_sim",
            F.coalesce(
                F.try_divide(adc, F.col("q_norm") * F.col("n_norm")), F.lit(0.0)
            ),
        )
    )
    w_adc = W.partitionBy("q_id").orderBy(F.col("adc_sim").desc(), F.col("n_id"))
    cands = pairs.withColumn("cr", F.row_number().over(w_adc)).filter(
        F.col("cr") <= refine
    )

    sim = F.round(
        cosine_expr("q_emb", "n_emb", "q_norm", "n_norm") + F.lit(EPS), round_to
    ).alias("sim")
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        cands.select("q_id", "n_id", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_centroids: int = 8,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    refine: int = 32,
    round_to: int = 4,
) -> DataFrame:
    """IVF-PQ: the two ANN stages composed the way a production index
    does it (coarse quantizer prunes the candidate set, PQ codes make
    scanning the survivors cheap). Corpus rows carry (cluster, codes,
    norm) — cluster from the IVF coarse quantizer, codes from the PQ
    codebooks; queries probe their nprobe nearest lists and ADC-score
    only rows in probed lists (candidate volume ~N·nprobe/k_coarse,
    per-pair cost m lookups), then the top-refine survivors are
    re-ranked by exact cosine. At 100 TB: the corpus is encoded ONCE
    (map-only, m bytes + 4 bytes per vector), the scan touches only
    probed lists, and nothing but the k×dim centroid matrix and the
    ksub·dim codebook ever leaves the executors."""
    corpus = finite_vectors(corpus, vec_col, dim)
    queries = finite_vectors(queries, vec_col, dim)
    coarse = kmeans_fit(corpus, vec_col, id_col, k=num_centroids, iters=iters)
    if not coarse:
        return _empty_topk(queries, id_col)
    cents_lit = F.array(*[F.array(*[F.lit(x) for x in row]) for row in coarse])
    books = pq_codebooks(corpus, vec_col, id_col, dim, m, ksub, iters)
    if not books or not books[0]:
        return _empty_topk(queries, id_col)
    ksub = min(len(b) for b in books)  # fitted size, see pq_topk
    books_lit = F.array(*[
        F.array(*[F.array(*[F.lit(float(x)) for x in cent]) for cent in book])
        for book in books
    ])
    dsub = dim // m

    sub_dist = (
        "aggregate(zip_with(element_at(element_at(__pq, j + 1), c + 1), "
        "slice(n_emb, j * {dsub} + 1, {dsub}), "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    ).format(dsub=dsub)
    codes_expr = F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"element_at(array_sort(transform(sequence(0, {ksub - 1}), c -> "
        f"named_struct('d', {sub_dist}, 'i', c))), 1).i)"
    )
    enc = (
        with_norm(
            corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_emb")),
            "n_emb",
            "n_norm",
        )
        .withColumn("cluster", centroid_assign_udf(coarse)("n_emb"))
        .withColumn("__pq", books_lit)
        .withColumn("codes", codes_expr)
        .drop("__pq")
    )

    cdist = (
        "aggregate(zip_with(element_at(__cents, i + 1), q_emb, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    )
    probes = F.expr(
        "slice(transform(array_sort(transform(sequence(0, size(__cents) - 1), "
        "i -> named_struct('d', " + cdist + ", 'i', i))), s -> s.i), 1, "
        + str(nprobe) + ")"
    )
    sub_dot = (
        "aggregate(zip_with(element_at(element_at(__pq, j + 1), c + 1), "
        "slice(q_emb, j * {dsub} + 1, {dsub}), "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0 AS DOUBLE), (acc, d) -> acc + d)"
    ).format(dsub=dsub)
    lut_expr = F.expr(
        f"transform(sequence(0, {m - 1}), j -> "
        f"transform(sequence(0, {ksub - 1}), c -> {sub_dot}))"
    )
    q = (
        with_norm(
            queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_emb")),
            "q_emb",
            "q_norm",
        )
        .withColumn("__cents", cents_lit)
        .withColumn("probes", probes)
        .drop("__cents")
        .withColumn("__pq", books_lit)
        .withColumn("lut", lut_expr)
        .drop("__pq")
    )
    q_exploded = q.select(
        "q_id", "q_emb", "q_norm", "lut", F.explode("probes").alias("cluster")
    )

    adc = F.expr(
        f"aggregate(sequence(0, {m - 1}), CAST(0 AS DOUBLE), (acc, j) -> "
        "acc + element_at(element_at(lut, j + 1), element_at(codes, j + 1) + 1))"
    )
    pairs = (
        enc.join(F.broadcast(q_exploded), "cluster")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn(
            "adc_sim",
            F.coalesce(
                F.try_divide(adc, F.col("q_norm") * F.col("n_norm")), F.lit(0.0)
            ),
        )
    )
    w_adc = W.partitionBy("q_id").orderBy(F.col("adc_sim").desc(), F.col("n_id"))
    cands = pairs.withColumn("cr", F.row_number().over(w_adc)).filter(
        F.col("cr") <= refine
    )
    sim = F.round(
        cosine_expr("q_emb", "n_emb", "q_norm", "n_norm") + F.lit(EPS), round_to
    ).alias("sim")
    w = W.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        cands.select("q_id", "n_id", sim)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    topk: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009, public) of
    a lexical and a vector retrieval leg: rrf(d) = Σ_legs 1/(k + rank_d),
    the standard score-free hybrid-search combiner (BM25 ⊕ ANN) of a
    RAG/retrieval pipeline.

    Inputs are (id, rank) frames — each leg's top-k, already bounded —
    so the fusion is a full outer join of two ≤k-row frames followed by
    a ≤2k-row top-k: trivially broadcastable at any corpus scale; all
    the heavy lifting stays in the legs. Ranks surface COALESCE-0 (never
    NULL) so the int columns hash identically across engines, and the
    fused score is rounded with the repo EPS before the deterministic
    (score desc, id) tie-break."""
    l = lex.select(F.col(id_col), F.col("rank").alias("lex_rank"))
    v = vec.select(F.col(id_col), F.col("rank").alias("vec_rank"))
    fused = l.join(v, [id_col], "outer")

    def contrib(c: str):
        return F.coalesce(
            F.lit(1.0) / (F.lit(k_rrf) + F.col(c)), F.lit(0.0)
        )

    scored = fused.select(
        F.col(id_col),
        F.coalesce("lex_rank", F.lit(0)).cast("long").alias("lex_rank"),
        F.coalesce("vec_rank", F.lit(0)).cast("long").alias("vec_rank"),
        F.round(
            contrib("lex_rank") + contrib("vec_rank") + F.lit(EPS), round_to
        ).alias("rrf_score"),
    )
    return (
        scored.orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(topk)
        .withColumn(
            "rank",
            F.row_number()
            .over(W.orderBy(F.col("rrf_score").desc(), F.col(id_col)))
            .cast("long"),
        )
    )
