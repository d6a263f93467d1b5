#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a noop sink (no driver
collect overhead in the measurement). Heavy analytics (Q1/Q3/Q5 shapes),
the flagship date join, stream dedup, and the LLM-pipeline operators
(MinHash-LSH dedup, vector top-k) are all included — the mix the engine
is optimized for.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trino_demo_spark.parity import PARITY  # noqa: E402
import trino_demo_spark.parity_llm  # noqa: E402,F401  (registers llm entries)
from trino_demo_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "agg_groupby_key",     # TPC-H Q1 shape: full-scan keyed aggregate
    "tpch_q3",             # selective dim filter + fact join + top-k
    "tpch_q5",             # 6-table star join
    "tpch_q6",             # pure-predicate global agg (pushdown showcase)
    "tpch_q18",            # agg+HAVING pre-join shrink + top-k
    "join_inner_eq",       # flagship date-key join (pre-aggregated sides)
    "win_dedup_keeplast",  # keep-last window dedup over the stream table
    "win_sliding_seq",     # sliding sequence windows per entity
    "llm_dedup_minhash",   # MinHash-LSH near-dup over documents
    "llm_similarity_topk", # brute-force cosine top-k over embeddings
    "llm_text_quality",    # text quality scoring sweep
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark(app_name="trino_demo_spark_bench")
    # Warm the JVM, codegen, and parquet-reader paths on the tiny dim
    # tables so the first measured query doesn't pay one-time startup
    # (measured ~1.4s of JIT/footer-reader warmup on the first real scan).
    from trino_demo_spark.registry import load_table

    spark.range(1000).count()
    load_table(spark, "region", sf_dir).count()
    load_table(spark, "nation", sf_dir).groupBy("n_regionkey").count().count()

    # Best-of-2 per query: local-mode timings carry JIT and ambient-load
    # noise on the first execution (~±50% observed on the heaviest query);
    # min-of-2 reports the engine's steady-state cost (see PERF.md).
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = PARITY[name].fn
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
