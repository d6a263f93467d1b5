"""Distributed BPE vocabulary induction (Sennrich et al. 2016, public
algorithm) — the tokenizer-training step of a training-data pipeline,
run as an iterative DataFrame computation.

Shape per merge round (the only scale-relevant part):

* pair counting is ONE map-side zip_with over each word's symbol array
  followed by a keyed partial+final aggregate weighted by word
  frequency — the corpus text itself is touched ONCE ever (word
  frequencies are a one-time aggregate; every round after operates on
  the distinct-word frame, which is vocabulary-sized, not corpus-sized);
* the argmax pair travels to the driver as ONE row per round
  (count desc, pair lexicographic — deterministic across engines and
  partitionings);
* applying the merge is a per-row sequential fold over the symbol
  array (aggregate() with a carry — pure codegen, no UDF), exactly the
  left-to-right non-overlapping semantics of reference BPE.

At 100 TB: distinct words ≪ corpus tokens (Heaps' law), so the
per-round cost is a keyed aggregate over the word list; rounds are
sequential by definition of the algorithm. Driver state = the merge
table (n_merges rows).

Reference parity: tests/test_llm.py cross-checks the full merge
sequence against an independent pure-Python BPE on the same word-freq
dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-time corpus pass: lowercased whitespace words → frequencies.

    Empty tokens are not words: `\\s+` splitting of whitespace-only /
    separator-trailing text yields '' entries (regex-whitespace like
    \\f survives the space-only trim), and an empty word would carry
    one subtoken but zero characters — poisoning both the vocabulary
    and every token-count bound."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .select(F.lower("w").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(x: str, y: str):
    """Left-to-right non-overlapping merge of adjacent (x, y) in the
    symbol array — a sequential fold with a one-symbol carry."""
    # Escape backslashes BEFORE quotes: a corpus symbol ending in '\'
    # would otherwise escape the closing quote of the SQL literal.
    xq = x.replace("\\", "\\\\").replace("'", "\\'")
    yq = y.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(
        "aggregate(syms, "
        "named_struct('out', CAST(array() AS ARRAY<STRING>), 'pend', CAST(NULL AS STRING)), "
        "(acc, s) -> CASE "
        "  WHEN acc.pend IS NULL THEN named_struct('out', acc.out, 'pend', s) "
        f" WHEN acc.pend = '{xq}' AND s = '{yq}' THEN "
        f"   named_struct('out', concat(acc.out, array('{xq}{yq}')), 'pend', CAST(NULL AS STRING)) "
        "  ELSE named_struct('out', concat(acc.out, array(acc.pend)), 'pend', s) END, "
        "acc -> CASE WHEN acc.pend IS NULL THEN acc.out "
        "       ELSE concat(acc.out, array(acc.pend)) END)"
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges from the corpus; returns
    [(left, right, weighted_count), ...] in merge order."""
    return bpe_train_words(word_freqs(df, text_col), n_merges)


def bpe_train_words(
    words: DataFrame, n_merges: int = 10
) -> list[tuple[str, str, int]]:
    """Merge loop over an explicit (w, freq) vocabulary frame — the
    train step proper, split out so callers can train on a capped or
    re-weighted vocabulary (e.g. the parity surface's deterministic
    top-N sub-vocabulary that an in-process reference BPE re-derives)."""
    words = words.withColumn(
        "syms", F.expr("transform(split(w, ''), c -> c)")
    )
    # distinct-word frame is vocabulary-sized: cache it and iterate on it
    words = words.select("w", "freq", "syms").persist()
    words.count()
    merges: list[tuple[str, str, int]] = []
    cur = words
    for _ in range(n_merges):
        pairs = cur.select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1), "
                    "slice(syms, 2, size(syms) - 1), "
                    "(a, b) -> named_struct('x', a, 'y', b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.x").asc(), F.col("p.y").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        x, y, cnt = top[0]["p"]["x"], top[0]["p"]["y"], int(top[0]["cnt"])
        merges.append((x, y, cnt))
        nxt = cur.withColumn("syms", _merge_fold(x, y)).persist()
        nxt.count()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def bpe_merge_table(
    df: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> DataFrame:
    """The learned merges as a DataFrame (rank, left, right, merged,
    weighted_count) — the artifact a tokenizer ships."""
    spark = df.sparkSession
    merges = bpe_train(df, n_merges, text_col)
    rows = [
        (i + 1, x, y, x + y, c) for i, (x, y, c) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank INT, left STRING, right STRING, merged STRING, weighted_count BIGINT"
    )


def bpe_reference(word_freq: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Independent pure-Python reference BPE (test oracle only)."""
    vocab = {w: list(w) for w in word_freq}
    out = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freq[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (x, y), _ = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((x, y))
        for w, syms in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    new.append(x + y)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            vocab[w] = new
    return out


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to the corpus: every word becomes its
    BPE segmentation (the same greedy left-to-right fold as training,
    chained once per merge in rank order — pure codegen, no UDF), and
    per-document token statistics come out of one aggregate. This is
    the train→apply handoff of a real tokenizer: merges are a tiny
    driver-side list compiled INTO the expression tree, so application
    is embarrassingly parallel at any corpus size.

    The fold chain runs over the DISTINCT-word frame, not per word
    instance — the same Heaps'-law collapse the training loop already
    exploits: the chained merge folds are interpreted HOFs (the
    dominant cost; n_merges sequential passes over each symbol array),
    so segmenting each distinct word once and joining the subtoken
    count back to the (doc, word, count) frame cuts the fold work from
    corpus-sized to vocabulary-sized (sf1-equivalent: 97s → the join
    plus a vocabulary-sized fold pass). The join key is the word; the
    segmented vocabulary is small next to the corpus, so AQE broadcasts
    it when it fits and shuffle-joins otherwise."""
    wc = (
        df.select(
            F.col(id_col),
            F.explode(tokens_col(text_col)).alias("w"),
        )
        # empty tokens are not words (see word_freqs)
        .filter(F.col("w") != "")
        .select(id_col, F.lower("w").alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = (
        wc.select("w")
        .distinct()
        .withColumn("syms", F.expr("transform(split(w, ''), c -> c)"))
    )
    for x, y in merges:
        vocab = vocab.withColumn("syms", _merge_fold(x, y))
    seg = vocab.select("w", F.size("syms").alias("n_subtokens"))
    return (
        wc.join(seg, "w")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_subtokens")).cast("long").alias("n_bpe_tokens"),
        )
    )
