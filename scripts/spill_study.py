"""Memory-bounded spill study — VERDICT r9 §next-round-4.

The 100 TB claim needs demonstrated SPILL behavior, not just plans:
run the heaviest shuffle queries at sf10 under a deliberately small
executor budget (local[8] + 4g JVM ≈ 500 MB/task-slot) and record that
the sort/agg/join spill paths complete with results bit-identical to an
unconstrained run.

Per (query, config) this prints one JSON line with wall time, the
Spark-metrics spill totals (memoryBytesSpilled / diskBytesSpilled /
shuffle bytes, summed over the query's stages via the UI REST API), and
an order-independent exact result fingerprint (COUNT + BIT_XOR + SUM of
xxhash64 over every column, computed engine-side — no driver collect),
so constrained-vs-unconstrained equality is provable from the records.

Driver memory is a static JVM conf, so each config needs its own
process — invoke once per config:

    python scripts/spill_study.py --master 'local[32]' --driver-mem 48g \
        --label unconstrained --json .scratch/spill_uncon.json
    python scripts/spill_study.py --master 'local[8]' --driver-mem 4g \
        --label constrained --json .scratch/spill_con.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

QUERIES = ["tpch_q9_full", "llm_dedup_semantic_lsh", "llm_dedup_clusters"]


def _stage_totals(ui: str) -> dict[str, int]:
    """Cumulative task-metric totals across all completed stages."""
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    tot = {
        "memoryBytesSpilled": 0,
        "diskBytesSpilled": 0,
        "shuffleWriteBytes": 0,
        "shuffleReadBytes": 0,
    }
    for s in stages:
        if s.get("status") not in ("COMPLETE", "SKIPPED"):
            continue
        tot["memoryBytesSpilled"] += s.get("memoryBytesSpilled", 0)
        tot["diskBytesSpilled"] += s.get("diskBytesSpilled", 0)
        tot["shuffleWriteBytes"] += s.get("shuffleWriteBytes", 0)
        tot["shuffleReadBytes"] += s.get("shuffleReadBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=f"{_ROOT}/.scratch/sf10")
    ap.add_argument("--master", required=True)
    ap.add_argument("--driver-mem", required=True)
    ap.add_argument("--label", required=True)
    ap.add_argument("--queries", default=",".join(QUERIES))
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = args.driver_mem

    import trino_demo_spark.parity_llm  # noqa: F401  (registers entries)
    import trino_demo_spark.parity_ml  # noqa: F401  (registers entries)
    from pyspark.sql import functions as F
    from trino_demo_spark.parity import PARITY
    from trino_demo_spark.session import get_spark

    spark = get_spark(
        app_name=f"spill_study_{args.label}",
        master=args.master,
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    spark.range(1000).count()  # JVM warmup

    records = []
    for name in args.queries.split(","):
        before = _stage_totals(ui)
        t0 = time.perf_counter()
        df = PARITY[name].fn(spark, args.sf)
        # order-independent exact fingerprint, computed distributed
        h = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        hx = F.expr(
            "bit_xor(xxhash64("
            + ", ".join(f"cast(`{c}` as string)" for c in df.columns)
            + "))"
        )
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            hx.alias("hx"),
            # decimal(38,0) sum: ~10M rows x 2^63 fits in 38 digits,
            # where a long sum overflows under ANSI mode
            F.sum(h.cast("decimal(38,0)")).alias("hs"),
        ).collect()[0]
        wall = round(time.perf_counter() - t0, 2)
        after = _stage_totals(ui)
        rec = {
            "query": name,
            "label": args.label,
            "master": args.master,
            "driver_mem": args.driver_mem,
            "sf": args.sf,
            "wall_sec": wall,
            "rows": row["n"],
            "fingerprint_xor": row["hx"],
            "fingerprint_sum": int(row["hs"]) if row["hs"] is not None else None,
            "spill": {k: after[k] - before[k] for k in after},
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(records, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
