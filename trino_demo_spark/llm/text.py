"""Text analysis operators (SURVEY.md §2.10 `llm_text_*`): token stats,
quality scoring, language-ID heuristic, fingerprinting. All built-in
string/array expressions — codegen'd, no UDFs — and each mirrored exactly
by a DuckDB oracle in parity_llm.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..genutil import explode_col
from .dedup import ngrams_over_tokens, ngrams_sql, tokens_col

# Tie-safe rounding epsilon (see trino_demo_spark.parity.EPS).
EPS = 1e-9

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and mirrored in SQL.
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens, chars, chars-per-token, and a
    BPE-ish size estimate (chars/4 is the common rule of thumb)."""
    t = tokens_col(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(text_col)
    compact = F.length(F.regexp_replace(F.col(text_col), r"\s+", ""))
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_txt"),
        F.round(
            F.coalesce(F.try_divide(compact, n_tokens), F.lit(0.0)) + F.lit(EPS), 4
        ).alias("avg_token_len"),
        F.ceil(n_chars / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
    )


def quality_exprs(text_col: str = "text"):
    """The quality-score component Columns (punct/digit/stop ratios +
    composite score), exposed bare so pipelines can fuse them into an
    existing projection (one scan, no self-join)."""
    t = tokens_col(text_col)
    n_tokens = F.size(t)
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[.!?,;:]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    sw = STOPWORDS["en"]
    sw_list = ", ".join(f"'{w}'" for w in sw)
    n_stop = F.size(
        F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({sw_list}))")
    )
    # Empty text (n_chars 0) scores ratio 0, not DIVIDE_BY_ZERO under
    # ANSI — COALESCE(x / NULLIF(n, 0), 0) on the oracle side.
    punct_ratio = F.round(
        F.coalesce(F.try_divide(n_punct, n_chars), F.lit(0.0)) + F.lit(EPS), 4
    )
    digit_ratio = F.round(
        F.coalesce(F.try_divide(n_digit, n_chars), F.lit(0.0)) + F.lit(EPS), 4
    )
    stop_ratio = F.round(
        F.coalesce(F.try_divide(n_stop, n_tokens), F.lit(0.0)) + F.lit(EPS), 4
    )
    # Deliberately NOT folded into a single aggregate() pass: an
    # aggregate HOF allocates a struct per token and measured ~2× slower
    # than this shape (one interpreted filter scan + codegen splits) at
    # sf10-equivalent. The expensive member is the single filter HOF.
    score = F.round(
        F.lit(0.4) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
        + F.lit(EPS),
        4,
    )
    return punct_ratio, digit_ratio, stop_ratio, score


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, punctuation/digit density,
    stopword ratio (the classic C4/Gopher-style filters, simplified)."""
    punct_ratio, digit_ratio, stop_ratio, score = quality_exprs(text_col)
    return df.select(
        F.col(id_col),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_pred_expr(text_col: str = "text"):
    """The language-ID prediction as a bare Column, so pipelines can fuse
    it into an existing projection (one scan, no self-join) — used by
    both lang_id() and the e2e data-prep plan."""
    hits = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.size(
            F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({lst}))")
        )
    n_cjk = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[一-鿿]", "")
    )
    # The argmax-with-precedence CASE references every hit count several
    # times, and interpreted HOFs get no codegen subexpression
    # elimination — the original when-chain re-split and re-scanned the
    # tokens ~15× per row (42s of the 99s e2e stage at sf10-equivalent).
    # Instead: ONE aggregate pass counts all four languages into a
    # struct, and a single-element transform() binds it to a lambda
    # variable whose field reads are free ("let via lambda"). Identical
    # precedence semantics (en > es > de > fr, 'und' on zero hits).
    in_lists = {
        lang: ", ".join(f"'{w}'" for w in words)
        for lang, words in STOPWORDS.items()
    }
    hits_struct = (
        f"aggregate(split(trim({text_col}), '\\\\s+'), "
        "named_struct('en', 0, 'es', 0, 'de', 0, 'fr', 0), "
        "(acc, x) -> named_struct("
        f"'en', acc.en + IF(x IN ({in_lists['en']}), 1, 0), "
        f"'es', acc.es + IF(x IN ({in_lists['es']}), 1, 0), "
        f"'de', acc.de + IF(x IN ({in_lists['de']}), 1, 0), "
        f"'fr', acc.fr + IF(x IN ({in_lists['fr']}), 1, 0)))"
    )
    pred_nocjk = F.element_at(
        F.expr(
            f"transform(array({hits_struct}), h -> CASE "
            "WHEN greatest(h.en, h.es, h.de, h.fr) <= 0 THEN 'und' "
            "WHEN h.en = greatest(h.en, h.es, h.de, h.fr) THEN 'en' "
            "WHEN h.es = greatest(h.en, h.es, h.de, h.fr) THEN 'es' "
            "WHEN h.de = greatest(h.en, h.es, h.de, h.fr) THEN 'de' "
            "ELSE 'fr' END)"
        ),
        F.lit(1),
    )
    pred = F.when(n_cjk > 0, "zh").otherwise(pred_nocjk)
    return pred, hits


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count hits per language list, plus a CJK
    character check; argmax with a fixed precedence order (en > es > de >
    fr) for determinism. 'und' when nothing hits."""
    pred, hits = lang_pred_expr(text_col)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        hits["en"].cast("long").alias("hits_en"),
        hits["es"].cast("long").alias("hits_es"),
        hits["de"].cast("long").alias("hits_de"),
        hits["fr"].cast("long").alias("hits_fr"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (stable across engines), plus a 64-bit xxhash for compact joins."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fp_md5"),
        F.xxhash64(norm).alias("fp_xx64"),
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 120,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size character chunking with overlap — the pretraining
    "split long documents into training windows" op. Chunk starts are a
    `sequence(0, n_chars-1, step)` array posexploded per doc; the chunk
    itself is a substr. Everything stays in whole-stage codegen
    (sequence/explode/substring), no UDF, and the op is map-side only —
    one input row fans out to ceil(n_chars/step) rows with NO shuffle,
    so it scales linearly with corpus bytes at 100 TB."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    step = chunk_size - overlap
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(text_col) - 1, F.lit(0)), F.lit(step)
    )
    ex = df.select(
        F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_id", "start")
    )
    chunk = F.col(text_col).substr(F.col("start") + 1, F.lit(chunk_size))
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk"),
    )


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition (the Gopher-style duplicate-word
    filter): unique-word count vs total words, dup ratio = 1 − unique /
    total. Pure array expressions (split / array_distinct / size) — no
    explode, no shuffle, fully codegen; map-side at any scale."""
    t = tokens_col(text_col)
    n = F.size(t)
    u = F.size(F.array_distinct(t))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_words"),
        u.cast("long").alias("n_unique_words"),
        F.round(F.lit(1.0) - u / n + F.lit(EPS), 4).alias("dup_word_ratio"),
    )


def gopher_ngram_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style n-gram repetition quality signals — the shipped
    r12 formulation: a `mapInArrow` counting kernel + Catalyst-side
    arithmetic. Signal definitions, published thresholds, and the two
    documented adaptations are in `gopher_ngram_repetition_fold` (the
    retained reference implementation, pinned row-identical by
    tests/test_llm.py::test_gopher_arrow_matches_fold and the DuckDB
    oracle).

    Why (guide §4.2, measured): the fold formulation runs three
    interpreted `aggregate` HOFs per doc — array HOFs do not get
    whole-stage codegen, and at sf0.1 the entry spent 2.55–2.83 s on a
    5000-doc × 54-token corpus (~1M interpreted element steps). The
    kernel counts the same grams with a per-doc Counter in the Python
    worker: interleaved same-session A/B 2.55–2.83 s → **0.67–0.74 s**
    (3.7×), result-identical on the full corpus. Scale shape is
    unchanged — per-doc map-side, no shuffle (plus the few-split
    spread), and ONLY the (id, tokens) columns cross the Arrow
    boundary, so column pruning at the scan is preserved.

    Numeric identity by construction: the kernel emits INTEGER counts
    only (covered chars, gram counts); every division and ROUND stays
    in Catalyst, so float semantics are bit-identical to the fold's.
    Tokens are computed by Spark (`tokens_col`) BEFORE the boundary, so
    there is no tokenizer-regex divergence; Python's min() tie-break on
    the joined gram string equals Spark's string ordering (both
    code-point order; UTF-8 byte order preserves it)."""
    from .dedup import _spread_few_splits

    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    )
    base = _spread_few_splits(base)

    def kernel(batches):
        import pyarrow as pa
        from collections import Counter

        for b in batches:
            ids = b.column("doc_id").to_pylist()
            toks = b.column("t").to_pylist()
            out_nc = []
            covs = {2: [], 3: [], 4: []}
            n5s, d5s = [], []
            for t in toks:
                out_nc.append(len(t) - 1 + sum(len(x) for x in t))
                for n in (2, 3, 4):
                    if len(t) >= n:
                        c = Counter(
                            " ".join(t[i:i + n])
                            for i in range(len(t) - n + 1)
                        )
                        m = max(c.values())
                        g = min(k for k, v in c.items() if v == m)
                        covs[n].append(m * len(g))
                    else:
                        covs[n].append(0)
                if len(t) >= 5:
                    g5 = [" ".join(t[i:i + 5]) for i in range(len(t) - 4)]
                    n5s.append(len(g5))
                    d5s.append(len(set(g5)))
                else:
                    n5s.append(0)
                    d5s.append(0)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(out_nc, pa.int64()),
                    pa.array(covs[2], pa.int64()),
                    pa.array(covs[3], pa.int64()),
                    pa.array(covs[4], pa.int64()),
                    pa.array(n5s, pa.int64()),
                    pa.array(d5s, pa.int64()),
                ],
                names=["doc_id", "n_chars", "cov2", "cov3", "cov4", "n5", "d5"],
            )

    stats = base.mapInArrow(
        kernel,
        "doc_id long, n_chars long, cov2 long, cov3 long, cov4 long, "
        "n5 long, d5 long",
    )

    def frac(col):
        return F.when(
            (F.col("n_chars") > 0) & (F.col(col) > 0),
            F.round(F.col(col) / F.col("n_chars") + F.lit(EPS), 4),
        ).otherwise(F.lit(0.0))

    dup5 = F.when(
        F.col("n5") > 0,
        F.round((F.col("n5") - F.col("d5")) / F.col("n5") + F.lit(EPS), 4),
    ).otherwise(F.lit(0.0))
    out = stats.select(
        "doc_id",
        "n_chars",
        frac("cov2").alias("top2_char_frac"),
        frac("cov3").alias("top3_char_frac"),
        frac("cov4").alias("top4_char_frac"),
        dup5.alias("dup_5gram_frac"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("top2_char_frac") <= 0.20)
        & (F.col("top3_char_frac") <= 0.18)
        & (F.col("top4_char_frac") <= 0.16)
        & (F.col("dup_5gram_frac") <= 0.15),
    )


def gopher_ngram_repetition_fold(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """REFERENCE implementation (pure-JVM sorted-run fold) of
    `gopher_ngram_repetition`, retained for the r12 differential test —
    the shipped entry is the mapInArrow counting kernel above, which
    must stay row-identical to this.

    Gopher-style n-gram repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", table A1's repetition
    filters) — the n-gram half of the rule set; the duplicate-word half
    is `repetition_score`. Two families, adapted where the published
    definition needs it and documented here:

    - top-{2,3,4}-gram CHAR fraction (Gopher thresholds 0.20/0.18/0.16):
      count(top gram) × len(gram) / chars of the whitespace-normalized
      text (strlen(array_join(tokens, ' ')) — the raw-text denominator
      would mix tokenizer normalizations into the ratio). ADAPTATION
      (ADVICE r7, documented like the dup-5-gram proxy below): the
      numerator counts each occurrence's characters independently, so
      characters shared by OVERLAPPING occurrences are double-counted
      and the fraction can exceed 1.0 on degenerate repetition
      ('a a a a': 3 bigram occurrences × 3 chars = 9 over 7 chars);
      the paper's bounded positional-coverage attribution is not
      cross-engine-exactly expressible. The proxy is monotone in
      repetition, so the thresholds fire at least as aggressively as
      Gopher's — conservative for a QUALITY filter (never under-flags).
      Deterministic tie-break: highest count, then lexicographically
      smallest gram.
    - duplicate-5-gram fraction (Gopher checks n=5..10 by character
      attribution with positional overlap, thresholds 0.15..0.10; the
      occurrence-overlap attribution is not cross-engine-exactly
      expressible, so this uses the occurrence fraction instead —
      (n_grams − n_distinct_grams) / n_grams — a monotone proxy at the
      published n=5 threshold 0.15).

    gopher_pass applies all four thresholds to the rounded values.

    Scale shape: the whole operator is ONE narrow projection — no
    explode, no join, no shuffle, embarrassingly parallel at any SF.
    The dup-5-gram stat is size/array_distinct; each top-n stat sorts
    the per-doc gram array and folds it in a single `aggregate` pass
    (run-length over the sorted array; strictly-greater replacement
    makes the FIRST maximal run win, i.e. the count-desc/gram-asc
    tie-break the oracle's row_number mirrors). O(k log k) per doc in
    doc length — linear in corpus size, vs the explode+groupBy+window
    formulation this replaced (measured 5.3 s → see bench pin; the
    18M-row (doc, n, gram) shuffle was 90% of the cost).
    """

    def top_gram(n: int):
        # struct(cnt BIGINT, g STRING) of the most frequent n-gram,
        # count-desc / gram-asc tie-break, via a sorted-run fold. Only
        # acc/element vars appear inside the lambdas (the dedup.py
        # perf rule: outer-column refs re-evaluate per element).
        return F.expr(
            f"""
            aggregate(
              array_sort({ngrams_sql('t', n)}),
              named_struct(
                'prev', CAST(NULL AS STRING), 'run', CAST(0 AS BIGINT),
                'bc', CAST(0 AS BIGINT), 'bg', CAST(NULL AS STRING)),
              (a, x) -> named_struct(
                'prev', x,
                'run', IF(a.prev <=> x, a.run + 1, CAST(1 AS BIGINT)),
                'bc', GREATEST(
                  IF(a.prev <=> x, a.run + 1, CAST(1 AS BIGINT)), a.bc),
                'bg', IF(
                  IF(a.prev <=> x, a.run + 1, CAST(1 AS BIGINT)) > a.bc,
                  x, a.bg)),
              a -> named_struct('cnt', a.bc, 'g', a.bg))
            """
        )

    base = (
        # NULL text carries no signal and would NULL-poison every array
        # expr — drop at ingest, mirrored by the oracle's WHERE
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("t"))
    )
    n_chars = F.length(F.array_join("t", " "))
    g5 = ngrams_over_tokens("t", 5)
    dup5 = F.when(
        F.size(g5) > 0,
        F.round(
            (F.size(g5) - F.size(F.array_distinct(g5))) / F.size(g5)
            + F.lit(EPS),
            4,
        ),
    ).otherwise(F.lit(0.0))
    stats = base.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        dup5.alias("dup_5gram_frac"),
        *[top_gram(n).alias(f"top{n}") for n in (2, 3, 4)],
    )

    def frac(n):
        s = F.col(f"top{n}")
        covered = s["cnt"] * F.length(s["g"])
        return F.when(
            (F.col("n_chars") > 0) & (s["cnt"] > 0),
            F.round(covered / F.col("n_chars") + F.lit(EPS), 4),
        ).otherwise(F.lit(0.0))

    out = stats.select(
        "doc_id",
        "n_chars",
        frac(2).alias("top2_char_frac"),
        frac(3).alias("top3_char_frac"),
        frac(4).alias("top4_char_frac"),
        "dup_5gram_frac",
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("top2_char_frac") <= 0.20)
        & (F.col("top3_char_frac") <= 0.18)
        & (F.col("top4_char_frac") <= 0.16)
        & (F.col("dup_5gram_frac") <= 0.15),
    )


GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The NON-repetition half of Gopher's quality rules (Rae et al.
    2021 table A1; the repetition half is gopher_ngram_repetition, the
    simplified composite is quality_score):

    - word count in [50, 100000]
    - mean word length in [3, 10] (sum of token code-point lengths /
      token count — length(array_join(t, '')) evaluates the sum without
      a per-token HOF)
    - symbol-to-word ratio ≤ 0.1 (symbols = '#' occurrences + '...'
      occurrences + '…' occurrences, counted by literal-replace length
      deltas; both engines replace left-to-right non-overlapping, so
      '.....' counts one ellipsis on both)
    - fraction of words containing ≥1 alphabetic char ≥ 0.80
    - ≥ 2 distinct words from Gopher's required list (the, be, to, of,
      and, that, have, with)

    The paper's per-LINE rules (bullet-start / ellipsis-end fractions)
    are omitted: this corpus carries no newlines, so they would be
    vacuous constants rather than signals.

    Scale shape: one narrow projection — array/regex/replace
    expressions only, no explode, no join, no shuffle. NULL text
    dropped at ingest (oracle-mirrored). Tokenization yields at least
    [''] for any non-NULL text, so the per-doc divisions never see a
    zero denominator on either engine.
    """
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("__text"),
            tokens_col(text_col).alias("t"),
        )
    )
    n = F.size("t")
    mean_len = F.round(
        F.length(F.array_join("t", "")) / n + F.lit(EPS), 4
    )
    n_hash = F.length("__text") - F.length(F.expr("replace(__text, '#', '')"))
    n_dots = (
        F.length("__text") - F.length(F.expr("replace(__text, '...', '')"))
    ) / F.lit(3)
    n_uni = F.length("__text") - F.length(F.expr("replace(__text, '…', '')"))
    symbol_ratio = F.round(
        (n_hash + n_dots + n_uni) / n + F.lit(EPS), 4
    )
    alpha_frac = F.round(
        F.size(F.expr("filter(t, x -> x RLIKE '[A-Za-z]')")) / n
        + F.lit(EPS),
        4,
    )
    n_req = F.size(
        F.array_intersect(
            F.array_distinct("t"),
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED_WORDS]),
        )
    )
    out = base.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_req.cast("long").alias("n_required_words"),
    )
    return out.withColumn(
        "gopher_quality_pass",
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_required_words") >= 2),
    )


def vocab_topk(
    df: DataFrame, k: int = 25, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k vocabulary: explode words → keyed count →
    top-k with deterministic (count desc, word asc) ordering. The count
    is a partial+final HashAggregate (map-side combine bounds the
    shuffle to distinct-words-per-partition, not corpus tokens) and the
    top-k compiles to TakeOrderedAndProject — no global sort."""
    t = tokens_col(text_col)
    return (
        df.select(F.explode(t).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(k)
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection: for each corpus document, the
    fraction of its word-n-gram shingles that appear anywhere in a
    benchmark/eval set — the standard pretraining decontamination check.

    Scale shape: the benchmark is tiny relative to the corpus at any
    scale, so its distinct shingle set is BROADCAST and the corpus-side
    probe is map-side; the only shuffles are the per-doc shingle
    distinct + count — both keyed on doc_id, never on the shingle, so a
    boilerplate shingle cannot skew the plan. Docs shorter than n words
    have no shingles and are excluded (mirrored by the oracle)."""
    from .dedup import ngram_shingles

    corpus_sh = ngram_shingles(df, id_col, text_col, n)
    bench_sh = ngram_shingles(benchmark, id_col, text_col, n).select("g").distinct()
    sizes = corpus_sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("long").alias("n_shingles"),
            n_hits.cast("long").alias("n_hits"),
            F.round(n_hits / F.col("n_shingles") + F.lit(EPS), 4).alias(
                "contamination"
            ),
        )
    )


def tfidf_topk(
    df: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword-extraction /
    document-representation op over a corpus.

    tf  = term count within the document (lowercased whitespace tokens);
    df  = number of documents containing the term;
    idf = ln((N + 1) / (df + 1)) + 1  (smoothed, sklearn-style);
    score = tf * idf.

    Scale shape: one explode → (doc, word) keyed count (partial+final
    HashAggregate, map-side combine bounds the shuffle), one word-keyed
    distinct-doc count for df, then a word-keyed join to attach idf and a
    doc-keyed window for top-k. N reaches every row via a broadcast
    1-row aggregate — no driver round trip. The top-k RANKING uses only
    integer columns (tf desc, df asc, term asc) so the ordering is
    bit-identical across engines; the float score is presentation-only
    (rounded, tie-safe). At 100 TB the dominant cost is the two
    word-keyed exchanges; a hot word ("the") is ONE reduce key in df and
    never explodes the join because df-per-word is a single row."""
    t = tokens_col(text_col)
    tf = (
        df.select(F.col(id_col), F.explode(t).alias("w"))
        .select(id_col, F.lower("w").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "w")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0)
                + F.lit(EPS),
                4,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("w").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col(id_col),
            F.col("w").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("tfidf"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def quality_filter_pct(
    df: DataFrame,
    keep_frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-group quality-percentile retention: keep the top `keep_frac`
    of documents per language by heuristic quality score — the standard
    'filter to the best X% per language' pretraining curation step (a
    per-group variant that a global threshold would get wrong: a global
    cutoff starves low-resource languages).

    Determinism: ranking orders by the ROUNDED score (stable across
    engines) with doc_id as the tie-breaker, and the cutoff is an
    integer ceil(n_group * keep_frac) — no float comparisons at the
    boundary. Scale shape: quality scoring is map-side; the only
    shuffle is the per-language window. Languages are few → per-group
    partitions are huge but the window needs no global sort (hash
    partition by lang, sort within partition); for true skew, pre-agg
    count-per-lang is broadcast, not windowed."""
    scores = quality_score(df, id_col, text_col).select(id_col, "quality")
    base = df.select(id_col, group_col).join(scores, id_col)
    counts = base.groupBy(group_col).agg(F.count("*").alias("n_grp"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("quality").desc(), F.col(id_col).asc()
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(counts), group_col)
        .filter(F.col("rn") <= F.ceil(F.col("n_grp") * F.lit(keep_frac)))
        .select(
            F.col(group_col),
            F.col(id_col),
            F.col("quality"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over the corpus for one bag-of-terms query — the
    standard lexical ranking (Robertson/Okapi, public) used in a
    training pipeline for contamination lookups, eval-set retrieval,
    and quality probes.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: tokens explode once, but rows are FILTERED to the query
    terms before the (doc, term) count — the aggregate and everything
    after it is proportional to documents containing query terms, not
    corpus size. Document length dl comes from a map-side size() (no
    second explode); N and avgdl reach rows via a broadcast 1-row
    aggregate; df-per-term is a |terms|-row broadcast. Final top-k is a
    TakeOrderedAndProject on (rounded score desc, id) — deterministic
    across engines, no global sort."""
    terms = [t.lower() for t in query_terms]
    t = tokens_col(text_col)
    dl = df.select(
        F.col(id_col), F.size(t).alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        df.select(F.col(id_col), F.explode(t).alias("w"))
        .select(id_col, F.lower("w").alias("w"))
        .filter(F.col("w").isin(terms))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .join(dl, id_col)
        .join(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.round(F.sum("contrib") + F.lit(1e-9), 4).alias("score"),
        F.count("*").alias("n_terms_matched"),
    )
    return (
        agg.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), F.col(id_col)))
            .cast("long"),
        )
    )


def perplexity_filter(
    df: DataFrame,
    keep_below: float | None = None,
    alpha: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style perplexity scoring/filtering with a corpus-trained
    bigram LM (the public wiki-LM + KenLM recipe, with the LM itself
    computed in-engine): P(w2|w1) from add-alpha-smoothed bigram counts,
    per-doc score = exp(mean negative log prob over its bigrams). High
    perplexity ⇒ text unlike the corpus ⇒ drop candidate.

    Scale shape: the LM is two keyed aggregates over one token explode
    (bigram counts via zip_with of the token array with itself shifted —
    map-side, no second explode); vocab size V is a 1-row broadcast.
    Scoring joins each document bigram against the LM table — a plain
    equi-join on the bigram key that co-partitions at any scale (the LM
    is itself corpus-sized data, NOT driver state; nothing but V and the
    doc count ever leaves the executors). Per-doc mean is one keyed
    aggregate. With keep_below set, docs at or above the threshold are
    filtered out."""
    # tokens lowered once; bigrams = zip(tokens, tokens[2:])
    low = df.select(
        F.col(id_col),
        F.transform(tokens_col(text_col), lambda x: F.lower(x)).alias("tk"),
    )
    bigrams = explode_col(
        low,
        F.expr(
            "zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1), "
            "(a, b) -> named_struct('w1', a, 'w2', b))"
        ),
        "b",
        id_col,
    ).select(
        id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    big_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni_counts = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = bigrams.select(F.col("w2").alias("w")).union(
        bigrams.select("w1")
    ).distinct().agg(F.count("*").alias("v"))
    lm = (
        big_counts.join(uni_counts, "w1")
        .join(F.broadcast(vocab))
        .withColumn(
            "nlp",
            -F.log(
                (F.col("c12") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ),
        )
        .select("w1", "w2", "nlp")
    )
    scored = (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.exp(F.avg("nlp")) + F.lit(EPS), 4).alias("ppl"),
            F.count("*").alias("n_bigrams"),
        )
    )
    if keep_below is not None:
        scored = scored.filter(F.col("ppl") < keep_below)
    return scored
