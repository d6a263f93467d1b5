"""Python UDTF surface (Spark 4): a table function expanding one text row
into (pos, word) rows, registered for SQL `LATERAL` use.

This is the declared UDTF API surface from SURVEY.md §2.10 — the engine's
built-in equivalent (posexplode(split(...)), fully codegen'd) is the hot
path and is what llm.text/vocab use; the UDTF exists so user-supplied
row-generating Python (custom tokenizers, parsers) has a first-class,
SQL-addressable home. Row-at-a-time Python: keep it off large fact
tables, or convert the inner loop to mapInPandas (see
llm.multimodal.extract_features for the Arrow-batched pattern).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

# Exact mirror of llm.dedup.tokens_col = split(trim(text), '\\s+'):
# Spark trim strips ONLY ASCII space (not \n/\t/NBSP), and Java's \s is
# ASCII-only — so strip(' ') + re.ASCII here. Python's str.split() is
# unicode-aware AND drops empty tokens, which diverges on NBSP and on
# trailing \n/\t (Spark's split keeps the trailing empty token).
_WS = re.compile(r"\s+", re.ASCII)


@udtf(returnType="pos bigint, word string")
class WordsUDTF:
    """Emit (pos, word) for each whitespace token of the input text —
    deterministic, mirrors llm.dedup.tokens_col's split semantics."""

    def eval(self, text: str):  # noqa: D102  (contract documented above)
        if text is None:
            return
        for i, w in enumerate(_WS.split(text.strip(" "))):
            yield i, w


def register(spark, name: str = "words_udtf"):
    """Register for SQL: SELECT d.doc_id, w.pos, w.word
    FROM docs d, LATERAL words_udtf(d.text) w."""
    spark.udtf.register(name, WordsUDTF)
    return name
