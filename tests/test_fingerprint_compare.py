"""Mutation battery for the sf10 fingerprint compare mode.

20 of the 311 sf10 sweep rows now rest on scripts/preflight.py's
order-independent fingerprint (COUNT + BIT_XOR + HUGEINT-SUM of a
per-row hash) instead of the stringify-sort compare, so this file
proves the compare is not vacuously green: every mutation class a
full-table entry could realistically regress into — a changed value, a
dropped row, a compensating duplicate-for-drop swap, an XOR-cancelling
even-multiplicity injection, a reordered column rename — must flip the
verdict, and the one legitimate divergence class (engine-specific
numeric WIDTH with equal values) must not. Pure DuckDB, no Spark: the
compare itself runs entirely inside one DuckDB process in production
too (the parquet side is only a relation source).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)
from preflight import fingerprint_compare  # noqa: E402


@pytest.fixture()
def con(tmp_path):
    c = duckdb.connect()
    c.sql(
        "CREATE TABLE base AS "
        "SELECT r AS id, r * 1.5 AS value, 'name_' || r AS name "
        "FROM range(10000) t(r)"
    )
    c.sql(f"COPY base TO '{tmp_path}/base.parquet' (FORMAT PARQUET)")
    src = f"read_parquet('{tmp_path}/base.parquet')"
    yield c, src
    c.close()


def test_identical_relations_match(con):
    con, src = con
    s, o, tag = fingerprint_compare(con, src, "SELECT * FROM base")
    assert tag == "OK(fp)" and s == o
    assert s[0] == 10000


def test_identical_relations_match_under_reordered_oracle(con):
    con, src = con
    # ORDER BY must not matter (the whole point of the fingerprint)
    s, o, tag = fingerprint_compare(
        con, src, "SELECT * FROM base ORDER BY id DESC"
    )
    assert tag == "OK(fp)" and s == o


def test_single_value_mutation_caught(con):
    con, src = con
    s, o, tag = fingerprint_compare(
        con,
        src,
        "SELECT id, CASE WHEN id = 4321 THEN value + 1 ELSE value END AS value,"
        " name FROM base",
    )
    assert tag == "VALUES"
    assert s[0] == o[0]  # same count — the hash components caught it


def test_dropped_row_caught(con):
    con, src = con
    s, o, tag = fingerprint_compare(
        con, src, "SELECT * FROM base WHERE id <> 77"
    )
    assert tag == "VALUES" and s[0] != o[0]


def test_duplicate_for_drop_swap_caught(con):
    con, src = con
    # Same COUNT as base: row 88 duplicated, row 77 dropped. COUNT alone
    # is blind to this; XOR/SUM must catch it.
    s, o, tag = fingerprint_compare(
        con,
        src,
        "SELECT * FROM base WHERE id <> 77 "
        "UNION ALL SELECT * FROM base WHERE id = 88",
    )
    assert s[0] == o[0]
    assert tag == "VALUES"


def test_xor_cancelling_even_multiplicity_caught(con):
    con, src = con
    # Adversarial for BIT_XOR: each side gains a DIFFERENT row twice.
    # Identical pairs XOR to zero, so the XOR components agree and the
    # counts agree — only the HUGEINT SUM separates the relations. This
    # is the mutation class that makes SUM load-bearing.
    con.sql(
        "CREATE TABLE spark_twin AS SELECT * FROM base "
        "UNION ALL SELECT * FROM base WHERE id = 11 "
        "UNION ALL SELECT * FROM base WHERE id = 11"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        con.sql(f"COPY spark_twin TO '{d}/twin.parquet' (FORMAT PARQUET)")
        s, o, tag = fingerprint_compare(
            con,
            f"read_parquet('{d}/twin.parquet')",
            "SELECT * FROM base "
            "UNION ALL SELECT * FROM base WHERE id = 22 "
            "UNION ALL SELECT * FROM base WHERE id = 22",
        )
    assert s[0] == o[0], "counts must tie"
    assert s[1] == o[1], "XOR must cancel (that's the attack)"
    assert s[2] != o[2] and tag == "VALUES", "HUGEINT SUM must catch it"


def test_column_name_mismatch_is_cols(con):
    con, src = con
    s, o, tag = fingerprint_compare(
        con, src, "SELECT id, value, name AS label FROM base"
    )
    assert tag == "COLS" and s is None


def test_numeric_width_divergence_not_flagged(con):
    con, src = con
    # DuckDB integer SUM yields HUGEINT where Spark writes BIGINT/DOUBLE
    # parquet; equal VALUES across widths must compare equal (the
    # DESCRIBE-derived cast alignment). 128-bit literal path included.
    con.sql(
        "CREATE TABLE agg AS SELECT id % 10 AS k, SUM(id)::BIGINT AS s "
        "FROM base GROUP BY 1"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        con.sql(f"COPY agg TO '{d}/agg.parquet' (FORMAT PARQUET)")
        s, o, tag = fingerprint_compare(
            con,
            f"read_parquet('{d}/agg.parquet')",
            # un-cast SUM -> HUGEINT on the oracle side
            "SELECT id % 10 AS k, SUM(id) AS s FROM base GROUP BY 1",
        )
    assert tag == "OK(fp)" and s == o


def test_null_vs_value_caught(con):
    con, src = con
    s, o, tag = fingerprint_compare(
        con,
        src,
        "SELECT id, CASE WHEN id = 500 THEN NULL ELSE value END AS value,"
        " name FROM base",
    )
    assert tag == "VALUES"
