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

from pyspark.sql.functions import udtf


@udtf(returnType="pos bigint, word string")
class WordsUDTF:
    """Emit (pos, word) for each whitespace token of the input text —
    deterministic, mirrors llm.dedup.tokens_col's split semantics."""

    def eval(self, text: str):  # noqa: D102  (contract documented above)
        if text is None:
            return
        for i, w in enumerate(text.strip().split()):
            yield i, w


def register(spark, name: str = "words_udtf"):
    """Register for SQL: SELECT d.doc_id, w.pos, w.word
    FROM docs d, LATERAL words_udtf(d.text) w."""
    spark.udtf.register(name, WordsUDTF)
    return name
