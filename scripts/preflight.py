"""Whole-inventory plain-session pre-flight: drive EVERY registered
query through the driver contract (`__spark_entry__.queries()` /
`oracle_sql()`) in a fresh PLAIN SparkSession — no engine confs, the
exact runtime the round driver uses — and compare against DuckDB with
the driver-faithful string canonicalizer (tests/test_parity.py::_canon).

This is the configuration-regression check pytest cannot provide (the
local gate's session carries engine confs; round 3 lost a day to
exactly such a conf-only divergence), run over the full inventory
rather than the driver's ~50-query sample.

Usage:
    python scripts/preflight.py [--sf /root/testdata/sf0.01] [--only a,b]
    python scripts/preflight.py --start 56 --count 60   # queue slice
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--count", type=int, default=None)
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.test_parity import _canon

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]
    else:
        end = len(names) if args.count is None else args.start + args.count
        names = names[args.start : end]

    bad: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, args.sf).toPandas()
            if name in osql:
                dpdf = con.sql(osql[name]).df()
                cs, rs = _canon(spdf)
                cd, rd = _canon(dpdf)
                ok = cs == cd and rs == rd
                tag = "OK" if ok else ("COLS" if cs != cd else "VALUES")
            else:
                ok, tag = True, f"rows_only({len(spdf)})"
            if not ok:
                bad.append(name)
            print(f"{name:38s} {tag:14s} {time.time() - t0:5.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            bad.append(name)
            print(f"{name:38s} ERROR {str(ex)[:160]}", flush=True)
    print(f"PREFLIGHT SUMMARY: {len(names) - len(bad)}/{len(names)} green; bad={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
