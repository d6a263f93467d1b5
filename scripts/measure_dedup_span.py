"""Measure the 10x wall-time span of the two heaviest LLM dedup queries
(llm_dedup_clusters, llm_dedup_semantic_lsh) plus the CC round-count
trajectory — VERDICT r5 §next-round-5.

Method mirrors the q18/q10 span study (PERF.md): best-of-2 noop-sink
wall time on a warm local[32] session, ONE FRESH SESSION PER SF (so a
larger SF never rides the previous SF's cache/scratch warmth), at
sf0.1 and the key-offset replicated sf1/sf10 equivalents
(scripts/make_scaled_sf.py; missing dirs are skipped with a warning).
The large-star/small-star round count is observed by counting
_edge_fingerprint calls (1 initial + 1 per round), giving the
convergence trajectory the O(log^2 n) bound predicts.

Usage: python scripts/measure_dedup_span.py [--sfs label:dir,label:dir,...]
Prints one JSON line per (query, sf).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

QUERIES = ["llm_dedup_clusters", "llm_dedup_semantic_lsh"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfs",
        default=(
            f"sf0.1:/root/testdata/sf0.1,sf1:{_ROOT}/.scratch/sf1,"
            f"sf10:{_ROOT}/.scratch/sf10"
        ),
    )
    ap.add_argument(
        "--queries",
        default=",".join(QUERIES),
        help="comma-separated PARITY names (default: the two CC dedup heavies)",
    )
    args = ap.parse_args()

    import trino_demo_spark.parity_llm  # noqa: F401  (registers entries)
    import trino_demo_spark.parity_ml  # noqa: F401  (registers entries)
    from trino_demo_spark.llm import dedup
    from trino_demo_spark.parity import PARITY
    from trino_demo_spark.session import get_spark

    real_fp = dedup._edge_fingerprint
    counter = {"n": 0}

    def counting_fp(df):
        counter["n"] += 1
        return real_fp(df)

    dedup._edge_fingerprint = counting_fp

    for label_dir in args.sfs.split(","):
        label, sf_dir = label_dir.split(":", 1)
        if not os.path.isdir(sf_dir):
            print(
                f"skipping {label}: {sf_dir} missing "
                "(build with scripts/make_scaled_sf.py)",
                file=sys.stderr,
            )
            continue
        # Fresh session per SF: a shared session lets the larger SF ride
        # the smaller one's JIT/cache warmth and mixes persist() state.
        spark = get_spark(app_name=f"dedup_span_{label}")
        spark.range(1000).count()  # JVM warmup
        for name in args.queries.split(","):
            fn = PARITY[name].fn
            samples, rounds = [], None
            for _ in range(2):
                counter["n"] = 0
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
                rounds = counter["n"] - 1  # 1 initial fingerprint + 1/round
            print(
                json.dumps(
                    {
                        "query": name,
                        "sf": label,
                        "best_sec": min(samples),
                        "samples": samples,
                        "cc_rounds": rounds,
                    }
                ),
                flush=True,
            )
        spark.stop()


if __name__ == "__main__":
    main()
