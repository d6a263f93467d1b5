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
import trino_demo_spark.parity_ml  # noqa: E402,F401  (registers ml entries)
from trino_demo_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "agg_groupby_key",       # TPC-H Q1 shape: full-scan keyed aggregate
    "tpch_q1",               # full Q1: 8 exact-unit aggregates, 1 shuffle
    "tpch_q3",               # selective dim filter + fact join + top-k
    "tpch_q5",               # 6-table star join
    "tpch_q6",               # pure-predicate global agg (pushdown showcase)
    "tpch_q9",               # heaviest star join: 7-way, dual fact use
    "tpch_q18",              # agg+HAVING pre-join shrink + top-k
    "tpch_q21",              # correlated EXISTS/NOT EXISTS via window collapse
    "tpch_q9_full",          # CANONICAL q9: two-sided partsupp composite-key probe
    "tpch_q21_full",         # CANONICAL q21: receipt>commit lateness, 1-shuffle window
    "join_inner_eq",         # flagship date-key join (pre-aggregated sides)
    "join_fact_fact_merge",  # full fact-fact SortMergeJoin (shuffle-heavy path)
    "win_dedup_keeplast",    # keep-last window dedup over the stream table
    "win_sliding_seq",       # sliding sequence windows per entity
    "stream_join_attrib_outer",  # stream-stream LEFT OUTER interval join (batch twin)
    "llm_dedup_minhash",     # MinHash-LSH near-dup over documents
    "llm_dedup_minhash_pr",  # two-stage LSH + exact verification (production op)
    "llm_dedup_span",        # C4-style span-level dedup + doc re-assembly
    "llm_similarity_topk",   # brute-force cosine top-k over embeddings
    "llm_similarity_topk_arrow",  # same, Arrow/numpy matmul production shape
    "llm_text_quality",      # text quality scoring sweep
    "llm_gopher_repetition", # Gopher n-gram repetition signals (shuffle-free fold)
    "llm_gopher_quality",    # Gopher non-repetition quality rules (one projection)
    "llm_dedup_clusters",    # exact pairs → large-star/small-star CC
    "llm_dedup_semantic_lsh",  # sign-LSH pairs → star CC (100 TB shape)
    "e2e_llm_data_pipeline", # fused quality→langid→dedup→buckets→shards
    # r11 (VERDICT r10 item 5): the r8–r10 heavy families had no bench
    # presence, so a perf regression there was invisible round-over-
    # round. One representative per family:
    "llm_tokenizer_apply",   # BPE merges applied corpus-wide (tokenizer family)
    "llm_pack_sequences",    # per-group greedy packing fold (grouped-map family)
    "ml_als_recommend_dist", # fully distributed ALS (iterative-ML family)
    "llm_multimodal_flac",   # FLAC encode+decode kernels (audio codec family)
    "llm_multimodal_mp4_demux",  # ISO-BMFF box-walk demux (video demux family)
    "llm_multimodal_webm_demux",  # EBML/Matroska walk (video demux family)
    "scan_warc_gz",          # WARC.gz member walk (crawl-shard ingest family)
    "scan_zip_shard",        # ZIP central-directory walk (crawl-shard ingest family)
]

# Pinned per-query baselines: the round-1 driver bench (BENCH_r01.json,
# sf0.1, local[32], best-of-2). The "within 2×" contract is measured
# against these; queries added after the pin get a baseline the first
# round they run and are excluded from the ratio until then.
# join_fact_fact_merge / tpch_q1 pinned in round 3 (best-of-3, idle
# local[32], canary_ratio 0.83 — machine comparable to the r01 pins).
BASELINE_SEC = {
    "agg_groupby_key": 0.821,
    "tpch_q1": 0.783,
    "tpch_q3": 0.893,
    "tpch_q5": 1.211,
    "tpch_q9": 1.757,
    "tpch_q6": 0.261,
    # re-pinned round 7 (VERDICT r6 §next-round-2): the r01 pin (0.729)
    # was taken WITH the broadcast(big) hint that the shipped plan
    # correctly no longer carries (linear-in-SF side — OOM at 100 TB),
    # manufacturing a 1.56× headline for a plan the repo deliberately
    # doesn't ship. New pin = quiet-host best-of-3 of the shipped
    # unhinted plan (canary 0.59 / scan 0.90 of their pins — fast host,
    # so the pin is conservative); the SPARK_GRAFT_LOCAL_HINTS flag is
    # retired with it.
    "tpch_q18": 1.069,
    "tpch_q21": 1.105,
    "join_inner_eq": 0.541,
    "join_fact_fact_merge": 0.848,
    "win_dedup_keeplast": 0.355,
    "win_sliding_seq": 0.405,
    # pinned round 7 at entry creation (best-of-3, quiet host)
    "stream_join_attrib_outer": 0.584,
    # re-pinned r12 (VERDICT r11 item 2): the r7 pin (1.567) was a
    # best-of-N whose 2nd+ samples re-read the previous sample's leaked
    # lazy collapse_identical cache — with clearCache() between samples
    # (added this round) every sample honestly recomputes. New pin =
    # old pin × median(cleared/warm) over 6 same-session interleaved
    # measurements (1.61/1.77/1.21/1.63/1.87/2.11 → 1.70); full record
    # in OPTIMIZATION_r12.md. Same rationale for minhash_pr below
    # (median 1.58 of 6). The other two collapse-cache entries
    # (clusters 1.33, semantic_lsh 1.12 medians) are NOT re-pinned:
    # this round's engine changes bring their honest cleared readings
    # to ≤1.05× of the existing pins, so the stricter pin stands.
    "llm_dedup_minhash": 2.66,
    # pinned round 7 at entry creation (best-of-3, quiet host): the
    # production two-stage op (LSH candidates + exact verification),
    # benched via the override below — the PARITY entry is the verdict
    # wrapper that also recomputes full-corpus exact truth.
    # (old pin 2.164; re-pinned r12 × 1.58 — see llm_dedup_minhash note)
    "llm_dedup_minhash_pr": 3.41,
    # pinned round-4 continuation: best-of-3, canary 0.50 / scan 0.66
    # (fast host — interpret future ratios against the canaries)
    "llm_dedup_span": 1.569,
    # re-pinned round-4 continuation (best-of-3 0.812, canary 0.58 —
    # fast host) after the hostile-embeddings ingest guard landed: every
    # geometric op now drops NULL/ragged/non-finite vectors before the
    # join (similarity.finite_vectors), a semantic hardening worth its
    # ~0.13 s fixed HOF-codegen overhead at this toy SF (the guard is
    # O(N) against the join's O(N·Q), so it amortizes to zero at scale).
    "llm_similarity_topk": 0.812,
    # pinned round-4 continuation (idle host, best-of-3, canary ~0.6-0.7)
    "llm_similarity_topk_arrow": 0.621,
    "llm_text_quality": 0.371,
    # pinned round 7 at entry creation (best-of-3, quiet host) — the
    # shuffle-free sorted-run-fold formulation (the first
    # explode+groupBy+window draft measured 5.26 s on the same host;
    # the fold version is one narrow projection, no exchange at all)
    "llm_gopher_repetition": 3.193,
    # pinned round 7 at entry creation (best-of-3, quiet host)
    "llm_gopher_quality": 0.77,
    # pinned round-4 continuation, after the star-CC rewrite + collapse
    # fixes (idle host, best-of-3, canary ~0.7/1.1): the iterative CC
    # rounds dominate both — mostly fixed per-round cost at this SF
    "llm_dedup_clusters": 4.737,
    "llm_dedup_semantic_lsh": 4.258,
    # pinned round-4 continuation (best-of-3 0.75 s, canary 0.67 —
    # fast host; the fused scalar stages amortize into one scan)
    "e2e_llm_data_pipeline": 0.75,
    # pinned round 8 at entry creation (best-of-4, quiet host, canary
    # 0.93): the canonical partsupp-probe q9 and the single-fact-shuffle
    # q21 with the real receipt>commit lateness (PERF.md r8 span rows)
    "tpch_q9_full": 2.768,
    "tpch_q21_full": 1.172,
    # pinned round 11 (VERDICT r10 item 5): quiet-host best-of-3,
    # canary 0.63 / scan 0.98 of their pins — fast host, conservative
    # pins. One representative per r8–r10 heavy family so regressions
    # there stop being invisible round-over-round.
    "llm_tokenizer_apply": 10.956,
    "llm_pack_sequences": 0.426,
    "ml_als_recommend_dist": 6.19,
    "llm_multimodal_flac": 0.785,
    "llm_multimodal_mp4_demux": 0.475,
    "llm_multimodal_webm_demux": 0.401,
    "scan_warc_gz": 0.215,
    "scan_zip_shard": 0.225,
}

# Canary pin: first clean-machine measurement (round 2, idle local[32],
# best-of-3: 0.271 s). The round-1 bench predates the canary, so
# cross-round interpretation starts with BENCH_r02; if canary_ratio and
# ratio_vs_baseline drift together, the host changed speed, not the
# engine.
CANARY_BASELINE_SEC: float | None = 0.271

# Scan canary pin: same-session best-of-3 full-lineitem scan+sum at
# sf0.1 (round 2, idle local[32]). Fixed per-job overhead (~0.2-0.3 s
# in local mode) dominates at this SF and varies up to ~2x across
# sessions/hosts — which is exactly what this pin makes visible.
CANARY_SCAN_BASELINE_SEC: float | None = 0.3

# Which canary a pinned query's ambient drift tracks (VERDICT r8
# §next-round-4: r8's per-query drift table showed q6 moving with the
# scan canary, the join/CC families with the ALU canary). "scan" =
# wall time dominated by parquet scan/decode of the fact table;
# everything else defaults to "alu" (shuffle/join/compute). Used only
# for the *normalized* ratios — the raw per-query ratios are always
# reported unchanged.
CANARY_KIND: dict[str, str] = {
    "tpch_q6": "scan",
    "tpch_q1": "scan",
    "agg_groupby_key": "scan",
    "llm_text_quality": "scan",
    "llm_gopher_quality": "scan",
}


def _ambient(kind: str, alu_ratio: float | None, scan_ratio: float | None) -> float:
    """Ambient host-slowdown normalizer for one query.

    Floored at 1.0: a fast host never *inflates* a query's normalized
    ratio (we only ever explain away slowness that the matching canary
    independently measured, never manufacture headroom).
    """
    r = scan_ratio if kind == "scan" else alu_ratio
    if r is None:
        return 1.0
    return max(1.0, r)


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

    # Machine-speed canary: a fixed, data-independent CPU-bound job
    # (hash + aggregate over a generated range — no I/O, no shuffle
    # variance). Its round-1 pin makes cross-round ratio drift
    # attributable: if canary_ratio and ratio_vs_baseline move together,
    # the host is slower, not the engine (observed in round 2: untouched
    # queries read a uniform 1.2-1.6x of their pins at steady state with
    # canary drift to match).
    canary_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            # 32-bit mask keeps the ANSI-mode sum inside int64
            # (2e8 rows x 2^32 ~= 8.6e17 < 2^63).
            "sum(xxhash64(id) & 4294967295) AS s"
        ).write.format("noop").mode("overwrite").save()
        canary_best = min(canary_best, time.perf_counter() - t0)
    canary_sec = round(canary_best, 3)
    # Second canary: parquet scan + decode of the full lineitem table —
    # isolates the I/O / decompress / columnar-decode path the ALU canary
    # doesn't touch (round-2 finding: identical code and warm cache read
    # 1.4-1.7x of round-1 pins at sf0.1 while the ALU canary read 1.0x,
    # i.e. the hosts differ in the scan/memory path, not compute).
    scan_best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        load_table(spark, "lineitem", sf_dir).selectExpr(
            "sum(l_quantity) AS s", "count(*) AS n"
        ).write.format("noop").mode("overwrite").save()
        scan_best = min(scan_best, time.perf_counter() - t0)
    canary_scan_sec = round(scan_best, 3)

    alu_ratio = (
        round(canary_sec / CANARY_BASELINE_SEC, 2) if CANARY_BASELINE_SEC else None
    )
    scan_ratio = (
        round(canary_scan_sec / CANARY_SCAN_BASELINE_SEC, 2)
        if CANARY_SCAN_BASELINE_SEC
        else None
    )

    # Workload overrides: entries whose PARITY surface later became a
    # driver-verdict wrapper (round 4: llm_dedup_minhash's parity entry
    # now also recomputes the exact-Jaccard truth set for its recall
    # verdict). The BENCH pin measures the production op itself, so keep
    # benching the identical workload the pin was taken on.
    from trino_demo_spark.llm import dedup as _dedup
    from trino_demo_spark.registry import load_table as _lt

    overrides = {
        "llm_dedup_minhash": lambda spark, d: _dedup.minhash_lsh_pairs(
            _lt(spark, "documents", d), num_perm=32, bands=8, threshold=0.5
        ),
        # the PARITY entry is a PR verdict that also recomputes the exact
        # full-corpus truth set; the pin measures the production op
        # (two-stage LSH + exact verification on candidates only)
        "llm_dedup_minhash_pr": lambda spark, d: _dedup.minhash_verified_pairs(
            _lt(spark, "documents", d), threshold=0.5, candidate_threshold=0.35
        ),
    }

    # Best-of-2 per query: local-mode timings carry JIT and ambient-load
    # noise on the first execution (~±50% observed on the heaviest query);
    # min-of-2 reports the engine's steady-state cost (see PERF.md).
    # Noise escape hatches — a third sample is forced when either fires:
    #   spread  — the two samples disagree by >1.4× (the run clearly hit
    #             ambient load: a just-exited JVM, page-cache churn — the
    #             r4 driver session measured q18 at 2.7× its quiet-host
    #             cost this way);
    #   vs-pin  — the best-of-2 still reads >1.5× the query's PIN
    #             (VERDICT r6 §next-round-5: the r6 local session saw the
    #             flagship's first pair agree at 2.02× of pin while a
    #             settled third read 1.31× — agreement alone doesn't
    #             prove steady state when both samples landed in the
    #             same cold window; only the pin can flag that).
    # Both trigger at most one extra sample each, and only on evidence of
    # noise, keeping the estimator honest vs the best-of-2 pins (PERF.md
    # round-5 note).
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        # Progress marker on stderr (stdout stays the one-JSON-line
        # contract) so a crash mid-suite is attributable to a query.
        print(f"bench: {name} ...", file=sys.stderr, flush=True)
        fn = overrides.get(name) or PARITY[name].fn

        def sample() -> float:
            # Measurement hygiene (r12, VERDICT r11 item 2): Spark's
            # CacheManager matches analyzed plans, so a lazy .cache()
            # leaked by sample 1 (collapse_identical's groups frame)
            # could serve sample 2 of the same query warm — min(samples)
            # then kept the warm reading. Clear it so EVERY sample
            # computes from the parquet inputs. Outside the timed
            # region; entries whose reading shifted >10% were re-pinned
            # (see OPTIMIZATION_r12.md, old pins kept in the comments).
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        samples = [sample(), sample()]
        if max(samples) > 1.4 * min(samples):
            samples.append(sample())
        pin = BASELINE_SEC.get(name)
        # independent of the spread hatch: samples in the same cold
        # window can agree AND read far off the pin, so the vs-pin
        # hatch keeps sampling while the best still reads >1.2x of pin
        # (VERDICT r7 §next-round-4: the r7 driver read q1 at 1.25x
        # from a best-of-2 whose samples were both inside the JIT
        # warmup ramp — a quiet-host best-of-6 read 1.07x, with the
        # ramp still descending at sample 3: 2.59/1.09/0.99/0.92/0.85/
        # 0.84 s). Capped at 3 extra samples (worst case 6 total incl.
        # the spread hatch), and only ever on evidence of being off-pin,
        # keeping the estimator honest vs the best-of-2/3 pins.
        # The hatch keys off the CANARY-NORMALIZED reading (VERDICT r8
        # §next-round-4): on a host whose matching canary already reads
        # 1.4x, a query at 1.3x of pin is ambient, and three forced
        # re-samples can't beat the host — they just burn bench time.
        if pin:
            amb = _ambient(CANARY_KIND.get(name, "alu"), alu_ratio, scan_ratio)
            for _ in range(3):
                if min(samples) <= 1.2 * pin * amb:
                    break
                samples.append(sample())
        timings[name] = round(min(samples), 3)
        print(f"bench: {name} {timings[name]}s", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)

    # Opt-in core-scaling subset (r12, VERDICT r11 item 3): at sf0.1 the
    # bench is latency/fixed-overhead-bound — the r11 driver measured
    # 8-core total 45.45s vs 32-core 45.16s — so the driver's low-core
    # ratio cannot distinguish a serial implementation from a small
    # workload. When $SPARK_GRAFT_SCALE_DIR points at a larger
    # (sf1-shaped) data directory, the heaviest entries run against it
    # too and are reported as ADDITIONAL "scale1_<name>" queries:
    # additions only (the primary pinned set above is untouched and
    # `value` stays the primary-set total), no pins (excluded from the
    # ratio), best-of-2 with the same spread hatch, and off by default
    # so the one-line-JSON / $SPARK_GRAFT_CPUS / $SPARK_GRAFT_SF_DIR
    # contract is byte-identical when the flag is absent. Demonstrated
    # scaling ratios (32 vs 8 cores, sf1): see OPTIMIZATION_r12.md.
    scale_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR")
    if scale_dir and os.path.isdir(scale_dir):
        scaling_subset = [
            "llm_dedup_semantic_lsh",
            "llm_dedup_clusters",
            "ml_als_recommend_dist",
            "llm_tokenizer_apply",
            "llm_gopher_repetition",
        ]
        for name in scaling_subset:
            print(f"bench: scale1_{name} ...", file=sys.stderr, flush=True)
            fn = overrides.get(name) or PARITY[name].fn

            def scale_sample() -> float:
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, scale_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                return time.perf_counter() - t0

            s_samples = [scale_sample(), scale_sample()]
            if max(s_samples) > 1.4 * min(s_samples):
                s_samples.append(scale_sample())
            timings[f"scale1_{name}"] = round(min(s_samples), 3)
            print(
                f"bench: scale1_{name} {timings[f'scale1_{name}']}s",
                file=sys.stderr,
                flush=True,
            )
    # Fail-soft ratio vs the pinned baseline (only meaningful at the
    # pinned SF/config, sf0.1 on local[32]; reported regardless so any
    # config can eyeball drift). Ratio covers the pinned subset only.
    pinned = {q: b for q, b in BASELINE_SEC.items() if b is not None and q in timings}
    ratio = None
    ratio_norm = None
    per_query_norm = {}
    if pinned:
        ratio = round(
            sum(timings[q] for q in pinned) / sum(pinned.values()), 3
        )
        # Canary-normalized ratios: raw ratio ÷ the matching canary's
        # ambient drift (floored at 1.0 — see _ambient). An ambient
        # round (r8: canaries 1.34/1.67, raw 1.09x) self-documents as
        # ~1.0x normalized instead of needing manual PERF.md
        # adjudication; an engine regression moves the normalized
        # number because the canaries don't.
        per_query_norm = {
            q: round(
                timings[q]
                / b
                / _ambient(CANARY_KIND.get(q, "alu"), alu_ratio, scan_ratio),
                2,
            )
            for q, b in pinned.items()
        }
        ratio_norm = round(
            sum(
                timings[q]
                / _ambient(CANARY_KIND.get(q, "alu"), alu_ratio, scan_ratio)
                for q in pinned
            )
            / sum(pinned.values()),
            3,
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
                "ratio_vs_baseline_normalized": ratio_norm,
                "per_query_ratio": {
                    q: round(timings[q] / b, 2) for q, b in pinned.items()
                },
                "per_query_ratio_normalized": per_query_norm,
                "canary_sec": canary_sec,
                "canary_baseline_sec": CANARY_BASELINE_SEC,
                "canary_ratio": alu_ratio,
                "canary_scan_sec": canary_scan_sec,
                "canary_scan_baseline_sec": CANARY_SCAN_BASELINE_SEC,
                "canary_scan_ratio": scan_ratio,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
