"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query runs once warm-up-free per round; timing is end-to-end
(plan + execute + collect to the driver), matching how a user feels it.
Heavy quadratic demos (jaccard all-pairs, ml-LSH joins) are excluded —
they're correctness items, not the hot path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference-parity read path
    "read_range",
    "read_tail",
    "read_tail_per_container",
    "count_per_container",
    "retention_combined",
    "logparse_json",
    "events_window_agg",
    # engine health
    "tpch_q1_pricing",
    "tpch_q3_top_orders",
    # LLM-pipeline operators
    "dedup_exact_groups",
    "dedup_simhash",
    "text_quality",
    "token_freq",
    "ann_cosine_topk",
]

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logsqlite_spark.session import get_spark
    from logsqlite_spark import registry

    spark = get_spark("logsqlite-spark-bench")
    qs = registry.queries()

    # JVM/codegen warm-up so timings measure the engine, not startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.perf_counter()
        n = len(fn(spark, sf_dir).collect())
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "suite_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))

if __name__ == "__main__":
    main()
