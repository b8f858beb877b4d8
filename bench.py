"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing is end-to-end (plan + execute + collect to the driver),
matching how a user feels it. The whole suite runs TWICE and the
reported per-query number is the min of the two runs — this machine
shows a 1.5-2x run-to-run variance band under load (round-1 notes),
and min-of-2 keeps the round gate from being noise-gated; both raw
runs are included under "runs". Startup costs that amortize away in
any real deployment (JVM codegen, Python worker spawn for
mapInArrow/pandas-UDF paths) are warmed up before timing, per the
suite's stated goal of measuring the engine, not process startup.
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
    "tpch_q5_local_volume",
    "tpch_q8_market_share",
    "tpch_q18_large_orders",
    "tpch_q13_order_distribution",
    "tpch_q21_sole_blame",
    # LLM-pipeline operators
    "dedup_exact_groups",
    "dedup_simhash",
    "text_quality",
    "token_freq",
    "repetition_signals",
    "contamination_check",
    "quality_gate",
    "events_funnel",
    "clean_text",
    "split_assign",
    "pack_sequences",
    "ann_cosine_topk",
    "ann_lsh_portable",
]

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from logsqlite_spark.session import get_spark
    from logsqlite_spark import registry

    spark = get_spark("logsqlite-spark-bench")
    qs = registry.queries()

    # Warm-up: JVM codegen, parquet reader, and the Python workers that
    # mapInArrow decode paths use (spawned once per executor, reused
    # for the session — startup, not engine cost).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()

    def _noop_arrow(batches):
        yield from batches

    spark.range(64, numPartitions=32).mapInArrow(_noop_arrow, "id long").count()

    # Warm the ingest pipeline itself (window codegen, parquet writer,
    # shuffle) with a tiny throwaway run per format — whichever format
    # is timed first otherwise absorbs the one-time JVM setup and the
    # plog/jsonl comparison is skewed by ordering, not by decode cost.
    import tempfile

    from logsqlite_spark.config import EngineConfig
    from logsqlite_spark.sources.frames import LogEntry
    from logsqlite_spark.sources.jsonl import JsonlSpoolWriter
    from logsqlite_spark.sources.spool import SpoolWriter
    from logsqlite_spark.streaming.ingest import ingest_spool_once

    base_ts = 1_704_067_200_000_000_000
    wcfg = EngineConfig(warehouse_dir=tempfile.mkdtemp(prefix="bench-warm-"))
    SpoolWriter(wcfg.spool_dir, "w0").write_burst(
        LogEntry(source="stdout", time_nano=base_ts + j, line=b"warm")
        for j in range(500))
    ingest_spool_once(spark, wcfg.spool_dir, wcfg.logs_dir, wcfg.state_dir)
    wcfg2 = EngineConfig(warehouse_dir=tempfile.mkdtemp(prefix="bench-warmj-"))
    JsonlSpoolWriter(wcfg2.spool_dir, "w0").write_burst(
        {"source": "stdout", "time_nano": base_ts + j, "line": "warm"}
        for j in range(500))
    ingest_spool_once(spark, wcfg2.spool_dir, wcfg2.logs_dir, wcfg2.state_dir,
                      fmt="jsonl")

    def run_suite(run_tag: str) -> dict[str, float]:
        timings: dict[str, float] = {}
        for name in BENCH_QUERIES:
            fn = qs[name]
            t0 = time.perf_counter()
            n = len(fn(spark, sf_dir).collect())
            dt = time.perf_counter() - t0
            timings[name] = round(dt, 3)
            print(f"# [{run_tag}] {name}: {dt:.3f}s ({n} rows)",
                  file=sys.stderr)

        # ingest throughput: spool -> decode -> seq -> partitioned
        # parquet (the reference's headline capability; it logs lines/s
        # per tx). Fresh warehouse per run.
        n_lines, n_containers, burst = 100_000, 8, 5_000
        base_ts = 1_704_067_200_000_000_000
        per = n_lines // n_containers

        cfg = EngineConfig(warehouse_dir=tempfile.mkdtemp(prefix="bench-ingest-"))
        for ci in range(n_containers):
            w = SpoolWriter(cfg.spool_dir, f"c{ci}")
            for b0 in range(0, per, burst):
                w.write_burst(
                    LogEntry(source="stdout",
                             time_nano=base_ts + (b0 + j) * 1_000_000,
                             line=b"level=info msg=request handled bytes=1234")
                    for j in range(min(burst, per - b0))
                )
        t0 = time.perf_counter()
        res = ingest_spool_once(spark, cfg.spool_dir, cfg.logs_dir,
                                cfg.state_dir)
        dt = time.perf_counter() - t0
        assert res["rows"] == n_lines, res
        timings["ingest_100k_lines"] = round(dt, 3)
        print(f"# [{run_tag}] ingest_100k_lines: {dt:.3f}s "
              f"({n_lines / dt:,.0f} lines/s)", file=sys.stderr)

        cfg2 = EngineConfig(warehouse_dir=tempfile.mkdtemp(prefix="bench-jsonl-"))
        for ci in range(n_containers):
            w = JsonlSpoolWriter(cfg2.spool_dir, f"c{ci}")
            for b0 in range(0, per, burst):
                w.write_burst(
                    {"source": "stdout",
                     "time_nano": base_ts + (b0 + j) * 1_000_000,
                     "line": "level=info msg=request handled bytes=1234"}
                    for j in range(min(burst, per - b0))
                )
        t0 = time.perf_counter()
        res = ingest_spool_once(spark, cfg2.spool_dir, cfg2.logs_dir,
                                cfg2.state_dir, fmt="jsonl")
        dt = time.perf_counter() - t0
        assert res["rows"] == n_lines, res
        timings["ingest_100k_jsonl"] = round(dt, 3)
        print(f"# [{run_tag}] ingest_100k_jsonl: {dt:.3f}s "
              f"({n_lines / dt:,.0f} lines/s)", file=sys.stderr)
        return timings

    run1 = run_suite("run1")
    run2 = run_suite("run2")
    timings = {k: min(run1[k], run2[k]) for k in run1}
    total = round(sum(timings.values()), 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # Per-run detail goes on its own (earlier) line: the driver tails
    # stdout and json-parses the FINAL line, which must stay short —
    # round-2's inlined two-run detail overflowed the tail capture and
    # the headline was never recorded (VERDICT r2, bench defect).
    print("# runs " + json.dumps({"run1": run1, "run2": run2}))
    print(json.dumps({
        "metric": "suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))

if __name__ == "__main__":
    main()
