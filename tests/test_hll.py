"""HLL distinct-count rollup (analytics.distinct_users_hll_rollup).

No DuckDB oracle exists (Datasketches estimates are engine-specific),
so this test is the correctness evidence: accuracy against exact
distinct counts, merge self-consistency, and determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.operators.analytics import (
    _events, daily_user_sketches, distinct_users_hll_rollup,
    merge_daily_sketches)


def _exact(events):
    day = F.to_date(F.timestamp_micros(F.col("ts_us"))).alias("day")
    per_day = (events.select(day, "user_id").groupBy("day")
               .agg(F.countDistinct("user_id").alias("n"))
               .select(F.col("day").cast("string").alias("day"), "n"))
    total = events.agg(
        F.countDistinct("user_id").alias("n")).select(
        F.lit("ALL").alias("day"), "n")
    return {r["day"]: r["n"] for r in per_day.unionAll(total).collect()}


def test_hll_rollup_accuracy_and_consistency(spark, sf_dir):
    ev = _events(spark, sf_dir)
    est = {r["day"]: r["est_users"]
           for r in distinct_users_hll_rollup(ev).collect()}
    exact = _exact(ev)

    assert set(est) == set(exact)
    assert "ALL" in est
    # lg_k=12 -> ~1.6% relative standard error; 2% is ~1.3 sigma on
    # every day of this table plus the union row
    for day, n in exact.items():
        assert abs(est[day] - n) <= max(1, 0.02 * n), (day, est[day], n)

    # merging the materialized DAILY sketches (hll_union_agg, no
    # raw re-scan) must estimate identically to the rollup's ALL row
    # (register-max merging is exact, not approximate)
    merged = merge_daily_sketches(
        daily_user_sketches(ev)).collect()[0]["est_users"]
    assert est["ALL"] == merged

    # deterministic across evaluations (no RNG, order-independent)
    again = {r["day"]: r["est_users"]
             for r in distinct_users_hll_rollup(ev).collect()}
    assert again == est


def test_hll_rollup_single_scan_with_partial_agg(spark, sf_dir):
    """Both grains must come from ONE scan (rollup/Expand), with the
    sketch aggregation partially applied map-side."""
    plan = distinct_users_hll_rollup(
        _events(spark, sf_dir))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "partial_hll_sketch_agg" in plan, plan
    assert "Expand" in plan, plan


def test_incremental_update_equals_full_recompute(spark, sf_dir):
    """update_daily_sketches(daily(h1), h2) must estimate identically
    to daily(full) — register-max merge makes incremental maintenance
    exact, even for days split across the old table and the batch."""
    from logsqlite_spark.operators.analytics import update_daily_sketches

    ev = _events(spark, sf_dir)
    h1 = ev.filter("event_id % 2 = 0")   # arbitrary split: days overlap
    h2 = ev.filter("event_id % 2 = 1")
    updated = update_daily_sketches(daily_user_sketches(h1), h2)
    full = daily_user_sketches(ev)

    def ests(daily):
        return {str(r["day"]): r["est"] for r in daily.select(
            "day", F.hll_sketch_estimate("sketch").cast("long")
            .alias("est")).collect()}

    assert ests(updated) == ests(full)
