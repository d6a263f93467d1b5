"""Whole-inventory physical-plan lint: build every registered entry's
plan at a small SF and flag the scale anti-patterns the brief's
".explain every operator" mandate is about — before they cost anything
at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin (all-pairs blowups)
- Exchange SinglePartition (a global funnel: one task owns all rows)
- BatchEvalPython (row-at-a-time Python UDF in the plan — the slow
  path; ArrowEvalPython/mapInPandas are the sanctioned Python routes)
- Exchange rangepartitioning (a global sort — legitimate only for the
  declared order-producing entries)

Every flag must either be FIXED or carried by the ALLOW map below with
a reason that names the contract making it legitimate (declared
quadratic oracle twin, 1-row fit broadcast, orderBy entry, bounded
driver-side head, ...). Unclassified flags fail the lint — the same
discipline as the skip-file for the sf1 sweep: nothing silently
dropped.

Usage: python scripts/plan_lint.py [--sf /root/testdata/sf0.01]
                                   [--json PLANLINT.json] [--only a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

PATTERNS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "bnl_join": re.compile(r"BroadcastNestedLoopJoin"),
    "py_udf_row": re.compile(r"BatchEvalPython"),
}
# Exchange rangepartitioning (global sort) is deliberately NOT a flag:
# it is the scalable TeraSort shape — sampled range boundaries, then
# PARALLEL per-range sorts — not a funnel. Entries producing ordered
# output are supposed to carry it.


def _single_partition_funnels(plan: str) -> int:
    """Count Exchange SinglePartition nodes that are NOT the benign
    two-phase global-aggregate funnel. A final global aggregate prints

        HashAggregate(functions=[max(x)])
        +- Exchange SinglePartition
           +- HashAggregate(functions=[partial_max(x)])

    — the exchange moves ONE partial-state row per upstream partition,
    bounded at any data size. What the flag is for is the other shape:
    a SinglePartition exchange feeding a Window/Sort/map with the FULL
    row stream (one task owns all rows)."""
    lines = plan.splitlines()
    bad = 0
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        child = " ".join(lines[i + 1 : i + 3])
        if re.search(r"partial_\w+", child) or "AggregateInPandas" in child:
            continue
        bad += 1
    return bad

# entry -> {flag: reason}. A reason must name the contract, not wave at
# it. Populated by reading each flagged entry (r9); additions require
# the same.
ALLOW: dict[str, dict[str, str]] = {}
_ALLOW_PATH = os.path.join(_ROOT, "scripts", "plan_lint_allow.json")
if os.path.exists(_ALLOW_PATH):
    ALLOW = json.load(open(_ALLOW_PATH))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    names = list(qs)
    if args.only:
        names = [n for n in args.only.split(",") if n in qs]

    record: dict[str, dict] = {}
    unexplained: list[str] = []
    for name in names:
        try:
            df = qs[name](spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # noqa: BLE001 — lint must cover the rest
            record[name] = {"status": "build_error", "err": str(ex)[:160]}
            unexplained.append(name)
            print(f"{name:38s} BUILD_ERROR {str(ex)[:80]}", flush=True)
            continue
        flags = sorted(k for k, rx in PATTERNS.items() if rx.search(plan))
        if _single_partition_funnels(plan):
            flags.append("single_partition")
        if not flags:
            record[name] = {"status": "clean"}
            continue
        allowed = ALLOW.get(name, {})
        bad = [f for f in flags if f not in allowed]
        record[name] = {
            "status": "allowed" if not bad else "FLAGGED",
            "flags": flags,
            "allowed": {f: allowed[f] for f in flags if f in allowed},
        }
        if bad:
            unexplained.append(name)
            print(f"{name:38s} FLAGGED {bad}", flush=True)
        else:
            print(f"{name:38s} allowed {flags}", flush=True)

    counts: dict[str, int] = {}
    for row in record.values():
        counts[row["status"]] = counts.get(row["status"], 0) + 1
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"summary": counts, "entries": record}, f, indent=1, sort_keys=True)
    print(f"PLAN LINT: {counts}; unexplained={unexplained}")
    sys.exit(1 if unexplained else 0)


if __name__ == "__main__":
    main()
