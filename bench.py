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
    "agg_groupby_key",       # TPC-H Q1 shape: full-scan keyed aggregate
    "tpch_q3",               # selective dim filter + fact join + top-k
    "tpch_q5",               # 6-table star join
    "tpch_q6",               # pure-predicate global agg (pushdown showcase)
    "tpch_q18",              # agg+HAVING pre-join shrink + top-k
    "join_inner_eq",         # flagship date-key join (pre-aggregated sides)
    "join_fact_fact_merge",  # full fact-fact SortMergeJoin (shuffle-heavy path)
    "win_dedup_keeplast",    # keep-last window dedup over the stream table
    "win_sliding_seq",       # sliding sequence windows per entity
    "llm_dedup_minhash",     # MinHash-LSH near-dup over documents
    "llm_similarity_topk",   # brute-force cosine top-k over embeddings
    "llm_text_quality",      # text quality scoring sweep
]

# Pinned per-query baselines: the round-1 driver bench (BENCH_r01.json,
# sf0.1, local[32], best-of-2). The "within 2×" contract is measured
# against these; queries added after the pin get a baseline the first
# round they run and are excluded from the ratio until then.
BASELINE_SEC = {
    "agg_groupby_key": 0.821,
    "tpch_q3": 0.893,
    "tpch_q5": 1.211,
    "tpch_q6": 0.261,
    "tpch_q18": 0.729,
    "join_inner_eq": 0.541,
    "join_fact_fact_merge": None,  # new in round 2 — pin from BENCH_r02
    "win_dedup_keeplast": 0.355,
    "win_sliding_seq": 0.405,
    "llm_dedup_minhash": 1.567,
    "llm_similarity_topk": 0.668,
    "llm_text_quality": 0.371,
}


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
    # Fail-soft ratio vs the pinned baseline (only meaningful at the
    # pinned SF/config, sf0.1 on local[32]; reported regardless so any
    # config can eyeball drift). Ratio covers the pinned subset only.
    pinned = {q: b for q, b in BASELINE_SEC.items() if b is not None and q in timings}
    ratio = None
    if pinned:
        ratio = round(
            sum(timings[q] for q in pinned) / sum(pinned.values()), 3
        )
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "baseline_total_sec": round(sum(pinned.values()), 3) if pinned else None,
                "ratio_vs_baseline": ratio,
                "per_query_ratio": {
                    q: round(timings[q] / b, 2) for q, b in pinned.items()
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
