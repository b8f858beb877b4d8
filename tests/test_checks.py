"""Data-quality constraint verification (operators/checks.py).

The registry suites are value-checked by the DuckDB oracle; here we
pin the one-scan execution shape and that violations are actually
detected (the oracle only ever sees passing suites)."""

from __future__ import annotations

from logsqlite_spark.operators.checks import (
    EVENTS_CHECKS, bound_metric, completeness, in_set, run_checks,
    uniqueness, _q_events_checks)


def test_suite_runs_in_one_scan(spark, sf_dir):
    df = _q_events_checks(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one pass over events even with the distinct-count constraint
    # (it rides the same scan via Expand)
    assert plan.count("FileScan") == 1, plan
    rows = {r["check_name"]: r for r in df.collect()}
    assert set(rows) == {c.name for c in EVENTS_CHECKS}
    assert all(r["passed"] for r in rows.values()), rows


def test_violations_detected(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (1, "b", 5.0), (2, "zzz", -3.0)],
        "id long, kind string, v double")
    suite = (
        uniqueness("id_unique", "id"),                      # dup id
        completeness("v_complete", "v"),                    # null v
        in_set("kind_known", "kind", ("a", "b")),           # 'zzz'
        bound_metric("v_non_negative", "min(v)", ">=", 0.0),  # -3
        bound_metric("rows_min", "count(*)", ">=", 1.0),    # passes
    )
    got = {r["check_name"]: r for r in run_checks(df, suite).collect()}
    assert not got["id_unique"]["passed"]
    assert got["id_unique"]["metric"] == round(2 / 3, 6)
    assert not got["v_complete"]["passed"]
    assert got["v_complete"]["metric"] == round(2 / 3, 6)
    assert not got["kind_known"]["passed"]
    assert not got["v_non_negative"]["passed"]
    assert got["v_non_negative"]["metric"] == -3.0
    assert got["rows_min"]["passed"]


def test_metric_drift_flags_volume_collapse(spark):
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.checks import metric_drift

    # day1: 100 rows / 10 users; day2: 10 rows (90% collapse)
    base = 1_704_067_200 * 1_000_000_000
    day = 86_400 * 1_000_000_000
    rows = [(base + i, i % 10, 1.0) for i in range(100)] + \
        [(base + day + i, i % 10, 1.0) for i in range(10)]
    ev = spark.createDataFrame(rows, "ts long, user_id long, value double")
    got = {r["day"]: r for r in metric_drift(ev).collect()}
    assert len(got) == 2
    first = got["2024-01-01"]
    assert not first["drift"] and first["rel_n"] is None
    second = got["2024-01-02"]
    assert second["drift"] and second["rel_n"] == 0.9
    assert second["n"] == 10 and second["n_users"] == 10


def test_empty_table_fails_closed(spark):
    """Review r5: a NULL metric (empty snapshot) must be a FAILED
    constraint, not passed=NULL that filter(~passed) gates miss."""
    from logsqlite_spark.operators.checks import completeness, uniqueness

    df = spark.createDataFrame([], "id long, v double")
    got = {r["check_name"]: r for r in run_checks(df, (
        completeness("v_complete", "v"),
        uniqueness("id_unique", "id"),
        bound_metric("rows_min", "count(*)", ">=", 1.0),
    )).collect()}
    for name, r in got.items():
        assert r["passed"] is False, (name, r)


def test_verdict_on_unrounded_metric(spark):
    """One duplicate in 3M rows must NOT round up to a passing 1.0."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.checks import uniqueness

    n = 3_000_000
    df = spark.range(n).select(
        F.when(F.col("id") == 0, F.lit(1)).otherwise(F.col("id"))
        .alias("k"))
    got = run_checks(df, (uniqueness("k_unique", "k"),)).collect()[0]
    assert got["passed"] is False
    assert got["metric"] == 1.0  # display rounding unchanged


def test_grouped_checks_isolate_bad_source(spark):
    """The per-group suite flags the one broken feed that the global
    ratios dilute past its bound."""
    from logsqlite_spark.operators.checks import run_checks_grouped

    rows = [("good", float(i), i) for i in range(90)] + \
        [("bad", None, 100 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "src string, v double, id long")
    suite = (completeness("v_complete", "v", 0.5),)

    glob = run_checks(df, suite).collect()[0]
    assert glob["passed"]  # 90% complete globally

    per = {r["src"]: r for r in
           run_checks_grouped(df, suite, ["src"]).collect()}
    assert per["good"]["passed"]
    assert per["bad"]["passed"] is False
    assert per["bad"]["metric"] == 0.0

    # still ONE aggregation pass
    plan = run_checks_grouped(df, suite, ["src"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") <= 2 or "Aggregate" in plan


def test_metric_drift_zero_mass_day(spark):
    """A previous day with zero value mass must yield rel_value=NULL
    (drift decided by the other metrics), not an ANSI DIVIDE_BY_ZERO
    that kills the query — mirrors the DuckDB oracle's nullif."""
    from logsqlite_spark.operators.checks import metric_drift

    base = 1_704_067_200 * 1_000_000_000
    day = 86_400 * 1_000_000_000
    rows = [(base + i, i, 0.0) for i in range(10)] + \
        [(base + day + i, i, 5.0) for i in range(10)]
    ev = spark.createDataFrame(rows, "ts long, user_id long, value double")
    got = {r["day"]: r for r in metric_drift(ev).collect()}
    d2 = got["2024-01-02"]
    assert d2["rel_value"] is None
    assert d2["rel_n"] == 0.0 and d2["rel_users"] == 0.0
    assert d2["drift"] is False


def test_check_names_and_in_set_values_with_quotes(spark):
    """Single quotes in check names / in_set values must be escaped,
    not produce malformed stack()/IN expressions."""
    from logsqlite_spark.operators.checks import in_set, run_checks

    df = spark.createDataFrame(
        [("it's",), ("other",)], "kind string")
    suite = (in_set("kind's check", "kind", ("it's", "other")),)
    got = run_checks(df, suite).collect()
    assert got[0]["check_name"] == "kind's check"
    assert got[0]["passed"] is True
