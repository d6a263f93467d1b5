"""Hostile-dims differential gate: string/collation and text-boundary
semantics over adversarial dimension tables joined to clean facts —
unicode case-folding traps (ß, Turkish İ/ı, combining diacritics),
embedded newlines/tabs/quotes/backslashes, padded and 500-char names,
NULL keys/names/balances (corpus in
tests/hostile_corpora.py::build_hostile_dims).

The round-4 sweep over all 135 relational queries found 2 defects,
both at the CSV text boundary and the NULL-string seam:

- scan_csv_header: a name with an embedded newline silently became two
  half-rows (the writer quotes record separators but the default
  reader still splits on every newline — multiLine=true required), the
  writer's DEFAULT ignoreLeading/TrailingWhiteSpace=true silently
  TRIMMED padded names, and the default ''/NULL rendering conflated
  empty strings with NULLs on read-back (explicit nullValue marker).
- f_str_funcs: concat_ws silently SKIPS NULL operands, turning a
  nameless customer's name/segment concat into just the segment, where
  `x || '/' || y` propagates NULL on both engines — swapped to F.concat.

Everything else — case-insensitive joins, levenshtein over non-ASCII,
hash functions, set ops, recursive CTE, every broadcast dim-join chain
including the full TPC-H suite — was bit-exact without changes.

The full sweep re-runs via scripts/hostile_sweep.py
--tables dims; this gate pins the defect set plus the string-heaviest
surfaces.
"""

from __future__ import annotations

import pytest

from trino_demo_spark import parity_llm  # noqa: F401  (registers entries)
from trino_demo_spark import parity_ml  # noqa: F401  (registers entries)
from trino_demo_spark.parity import PARITY

from .hostile_corpora import TABLES, build_hostile_dims
from .test_parity import _canon

HOSTILE_GATED = [
    # ADVICE r5 (round-6 fix): q10 ranks top-20 BEFORE touching customer,
    # so its pre-top-k guard must mirror BOTH of the oracle's pre-ranking
    # inner joins — custkey IN customer AND c_nationkey IN nation. This
    # corpus has customers with dangling nationkeys 14-24 (nation stops
    # at 13) holding real smoke-fact revenue: without the nation probe a
    # dangling-dim customer keeps a top-20 slot the oracle gives to rank
    # 21. q18 gated alongside (same top-k-before-dim-join shape).
    "tpch_q10",
    "tpch_q18",
    "scan_csv_header",
    "f_str_funcs",
    "f_str_levenshtein",
    "f_hash_funcs",
    "filter_str_eq",
    "join_ci_keys",
    "join_full",
    "setop_intersect",
    "sql_recursive_cte",
    "sink_kafka_json",
]


@pytest.fixture(scope="module")
def hostile_dim_sf(tmp_path_factory):
    return build_hostile_dims(str(tmp_path_factory.mktemp("hostile_dim")))


@pytest.fixture(scope="module")
def hostile_dim_duck(hostile_dim_sf):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{hostile_dim_sf}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", HOSTILE_GATED)
def test_hostile_dims_parity(name, spark, hostile_dim_sf, hostile_dim_duck):
    p = PARITY[name]
    spdf = p.fn(spark, hostile_dim_sf).toPandas()
    dpdf = hostile_dim_duck.sql(p.sql).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    assert len(spdf) == len(dpdf), f"{name}: {len(spdf)} vs {len(dpdf)} rows"
    _, rows_s = _canon(spdf)
    _, rows_d = _canon(dpdf)
    mismatches = [(rs, rd) for rs, rd in zip(rows_s, rows_d) if rs != rd]
    assert not mismatches, (
        f"{name}: {len(mismatches)} canonical-row mismatches on hostile "
        f"dims; first: {mismatches[:2]}"
    )
