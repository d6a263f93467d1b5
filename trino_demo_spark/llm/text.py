"""Text analysis operators (SURVEY.md §2.10 `llm_text_*`): token stats,
quality scoring, language-ID heuristic, fingerprinting. All built-in
string/array expressions — codegen'd, no UDFs — and each mirrored exactly
by a DuckDB oracle in parity_llm.py."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col

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
        F.round(compact / n_tokens + F.lit(EPS), 4).alias("avg_token_len"),
        F.ceil(n_chars / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring: length, punctuation/digit density,
    stopword ratio (the classic C4/Gopher-style filters, simplified)."""
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
    punct_ratio = F.round(n_punct / n_chars + F.lit(EPS), 4)
    digit_ratio = F.round(n_digit / n_chars + F.lit(EPS), 4)
    stop_ratio = F.round(n_stop / n_tokens + F.lit(EPS), 4)
    score = F.round(
        F.lit(0.4) * F.least(n_tokens / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.3) * stop_ratio
        + F.lit(EPS),
        4,
    )
    return df.select(
        F.col(id_col),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count hits per language list, plus a CJK
    character check; argmax with a fixed precedence order (en > es > de >
    fr) for determinism. 'und' when nothing hits."""
    hits = {}
    for lang, words in STOPWORDS.items():
        lst = ", ".join(f"'{w}'" for w in words)
        hits[lang] = F.size(
            F.expr(f"filter(split(trim({text_col}), '\\\\s+'), x -> x IN ({lst}))")
        )
    n_cjk = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[一-鿿]", "")
    )
    best = F.greatest(*hits.values())
    pred = (
        F.when(n_cjk > 0, "zh")
        .when(best <= 0, "und")
        .when(hits["en"] == best, "en")
        .when(hits["es"] == best, "es")
        .when(hits["de"] == best, "de")
        .otherwise("fr")
    )
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
