"""Single-scan column profiler (operators/profile.py). Values are
oracle-checked by the driver; here we pin the one-scan plan and the
null/distinct accounting on a frame with known defects."""

from __future__ import annotations

from logsqlite_spark.operators.profile import _q_profile_events, profile_table


def test_profile_single_scan(spark, sf_dir):
    df = _q_profile_events(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "Expand" in plan, plan  # the distinct counts share the scan


def test_profile_accounting(spark):
    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, None, "b"), (2, 4.5, None)],
        "id long, v double, s string")
    rows = {r["column"]: r
            for r in profile_table(df, ("id", "v"), ("s",)).collect()}
    assert rows["id"]["n"] == 3 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 2
    assert rows["id"]["min_num"] == 1.0 and rows["id"]["max_num"] == 2.0
    assert rows["id"]["min_str"] is None
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 2
    assert rows["s"]["n_null"] == 1 and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None


def test_profile_approx_mode_no_expand(spark, sf_dir):
    """The 100 TB mode: approx distincts keep the aggregation a
    single no-Expand pass with error-bounded counts."""
    from logsqlite_spark.operators.profile import (
        _EVENTS_NUM, _EVENTS_STR)
    from logsqlite_spark.tables import table

    ev = table(spark, sf_dir, "events")
    df = profile_table(ev, _EVENTS_NUM, _EVENTS_STR,
                       exact_distinct=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "Expand" not in plan, plan
    approx = {r["column"]: r for r in df.collect()}
    exact = {r["column"]: r
             for r in profile_table(ev, _EVENTS_NUM, _EVENTS_STR)
             .collect()}
    for c, r in exact.items():
        a = approx[c]
        assert (a["n"], a["n_null"]) == (r["n"], r["n_null"])
        assert abs(a["n_distinct"] - r["n_distinct"]) <= \
            max(1, 0.05 * r["n_distinct"]), c
