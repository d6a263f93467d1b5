"""Three-decade engine span for the text-dedup cluster path (VERDICT
r10 item 7): llm_dedup_clusters_edges' workload — identical-text
collapse → rep-level exact-Jaccard pairs → connectivity-equivalent
star edges → large-star/small-star CC — at sf0.1 (50k docs), sf10
(500k docs, multiplicity 100), and sf100 (5M docs, multiplicity 1000).

Reports wall seconds, output rows, non-canonical (dropped) rows, and
the measured CC ROUND COUNT per decade (the O(log² n) claim with the
number attached). The edge frame is what makes the third decade
tractable at all: the pair contract would materialize C(1000,2) ≈
500k rows PER distinct dup group there (~2.5e9 total).

Usage: python scripts/span_clusters.py [--cpus 12] [--driver-mem 20g]
Emits one JSON line per decade to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

DECADES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf10", os.path.join(_ROOT, ".scratch", "sf10")),
    ("sf100", os.path.join(_ROOT, ".scratch", "sf100_docs")),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=12)
    ap.add_argument("--driver-mem", default="20g")
    ap.add_argument("--decades", default=None, help="comma subset of sf names")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from trino_demo_spark.llm import dedup
    from trino_demo_spark.registry import load_table
    from trino_demo_spark.session import apply_runtime_confs

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.shuffle.partitions", str(4 * args.cpus))
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    wanted = args.decades.split(",") if args.decades else None
    for name, sf_dir in DECADES:
        if wanted and name not in wanted:
            continue
        docs = load_table(spark, "documents", sf_dir)
        stats: dict = {}
        t0 = time.time()
        edges = dedup.ngram_jaccard_edges(docs, threshold=0.5)
        out = dedup.dedup_clusters(docs, edges, stats=stats)
        row = out.selectExpr(
            "count(*) AS n", "count_if(NOT is_canonical) AS dropped"
        ).collect()[0]
        wall = round(time.time() - t0, 1)
        print(
            json.dumps(
                {
                    "decade": name,
                    "rows": row["n"],
                    "dropped": row["dropped"],
                    "cc_rounds": stats.get("rounds"),
                    "wall_sec": wall,
                }
            ),
            flush=True,
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
