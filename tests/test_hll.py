"""HLL distinct-count rollup (analytics.distinct_users_hll_rollup).

No DuckDB oracle exists (Datasketches estimates are engine-specific),
so this test is the correctness evidence: accuracy against exact
distinct counts, merge self-consistency, and determinism.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.operators.analytics import (
    _events, distinct_users_hll_rollup)


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

    # the ALL row merges the DAILY sketches; a sketch built over the
    # raw rows in one pass must estimate identically (register-max
    # merging is exact, not approximate)
    one_pass = (
        ev.agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("s"))
        .select(F.hll_sketch_estimate("s").cast("long").alias("e"))
        .collect()[0]["e"])
    assert est["ALL"] == one_pass

    # deterministic across evaluations (no RNG, order-independent)
    again = {r["day"]: r["est_users"]
             for r in distinct_users_hll_rollup(ev).collect()}
    assert again == est
