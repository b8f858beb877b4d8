"""KLL quantile + Theta set-operation sketch tier (operators/sketches.py).

Policy mirrors test_hll.py: the KLL quantile path has no DuckDB twin
(randomized compaction), so these tests ARE its correctness evidence —
normalized rank error against exact quantiles, and merge
self-consistency. The Theta paths carry full driver oracles in exact
mode; here we additionally pin the approximate regime (cardinality
above 2^lg_k) against known ground truth, which the driver can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.operators.sketches import (
    _events, daily_value_sketches, merge_daily_value_sketches,
    retention_overlap, segment_overlap, value_quantile_rollup)

# KLL k=200 gives ~1.65% one-sided normalized rank error at 99%
# confidence; 4% is a comfortable margin on every per-day group.
_RANK_EPS = 0.04


def _rank_of(values: list[int], x: int) -> float:
    return sum(1 for v in values if v <= x) / len(values)


def test_kll_rollup_rank_error_and_single_scan(spark, sf_dir):
    ev = _events(spark, sf_dir)
    exact = {}
    for r in ev.where(F.col("day").isNotNull()).select(
            F.col("day").cast("string").alias("day"), "value_c").collect():
        exact.setdefault(r["day"], []).append(r["value_c"])
    exact["ALL"] = [v for vs in exact.values() for v in vs]

    rows = value_quantile_rollup(ev).collect()
    assert {r["day"] for r in rows} == set(exact)
    for r in rows:
        vals = sorted(exact[r["day"]])
        assert r["n"] == len(vals)
        for q in (0.5, 0.9, 0.99):
            est = r[f"p{int(q * 100)}_c"]
            # the estimate must be an item actually in the stream, at
            # a normalized rank within epsilon of the target
            assert est in exact[r["day"]], (r["day"], q, est)
            assert abs(_rank_of(vals, est) - q) <= _RANK_EPS, \
                (r["day"], q, est)

    # one scan for both grains: rollup/Expand with map-side partial
    # sketch aggregation (the HLL-rollup plan contract)
    plan = value_quantile_rollup(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "partial_kll_sketch_agg_bigint" in plan, plan
    assert "Expand" in plan, plan


def test_kll_daily_merge_consistency(spark, sf_dir):
    """Merging the materialized daily sketches must agree with the
    direct overall sketch within the same rank-error budget — this is
    what lets a pipeline serve any coarser grain without re-scanning."""
    ev = _events(spark, sf_dir).where(F.col("day").isNotNull())
    merged = merge_daily_value_sketches(daily_value_sketches(ev)).collect()[0]
    vals = sorted(r["value_c"] for r in ev.select("value_c").collect())
    assert merged["n"] == len(vals)
    for q in (0.5, 0.9, 0.99):
        est = merged[f"p{int(q * 100)}_c"]
        assert abs(_rank_of(vals, est) - q) <= _RANK_EPS, (q, est)


def test_theta_retention_exact_mode(spark, sf_dir):
    """Below 2^lg_k distinct users/day the theta estimates are the
    TRUE cardinalities (this is what makes the driver oracle valid)."""
    ev = _events(spark, sf_dir)
    got = {r["day"]: r for r in retention_overlap(ev).collect()}

    act = (ev.where(F.col("day").isNotNull())
           .select("day", "user_id").distinct().collect())
    by_day: dict = {}
    for r in act:
        by_day.setdefault(r["day"], set()).add(r["user_id"])
    days = sorted(by_day)
    expected = {}
    for prev_d, d in zip(days, days[1:]):
        if (d - prev_d).days != 1:
            continue
        today, prev = by_day[d], by_day[prev_d]
        expected[str(d)] = (len(today), len(today & prev),
                            len(today - prev), len(prev - today))
    assert set(got) == set(expected)
    for day, (active, ret, new, churn) in expected.items():
        r = got[day]
        assert (r["active"], r["returning"], r["new_users"],
                r["churned"]) == (active, ret, new, churn), day

    # scale-shape pin: ONE scan, no self-join — the Expand emits each
    # row under its own day and day+1, one grouped sketch aggregation
    plan = retention_overlap(ev)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("FileScan") == 1, plan
    assert "partial_theta_sketch_agg" in plan, plan
    assert "Generate" in plan or "Expand" in plan, plan


def test_theta_segment_overlap_exact_and_reused(spark, sf_dir):
    ev = _events(spark, sf_dir)
    df = segment_overlap(ev)
    got = {(r["type_a"], r["type_b"]): r["est_both"] for r in df.collect()}

    seg = ev.select("event_type", "user_id").distinct().collect()
    users: dict = {}
    for r in seg:
        users.setdefault(r["event_type"], set()).add(r["user_id"])
    types = sorted(users)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            assert got[(a, b)] == len(users[a] & users[b]), (a, b)

    # the per-segment sketch aggregate feeds both join sides; AQE must
    # reuse the exchange stage at runtime so events are scanned once
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final


def test_theta_approximate_regime_error_bounded(spark):
    """Above 2^lg_k the sketches degrade to estimates; pin the error
    on a synthetic 2-day corpus with known overlap (the regime the
    exact-mode driver oracle can never exercise)."""
    n, overlap = 20_000, 8_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        F.lit("2024-01-01").cast("date").alias("day"),
    ).unionAll(spark.range(n - overlap, 2 * n - overlap).select(
        F.concat(F.lit("u"), F.col("id")).alias("user_id"),
        F.lit("2024-01-02").cast("date").alias("day"),
    )).withColumn("value_c", F.lit(0).cast("long")) \
     .withColumn("event_type", F.lit("x"))

    rows = retention_overlap(df, lg_k=12).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["day"] == "2024-01-02"
    # intersection/difference compound two sketches' error; 10% is
    # ~3x the nominal relative error at lg_k=12
    for col, truth in (("active", n), ("returning", overlap),
                       ("new_users", n - overlap),
                       ("churned", n - overlap)):
        assert abs(r[col] - truth) <= 0.10 * truth, (col, r[col], truth)


def test_kll_incremental_update_rank_error(spark, sf_dir):
    """Incrementally maintained daily quantile sketches keep the
    rank-error guarantee vs exact quantiles over the full data."""
    from logsqlite_spark.operators.sketches import (
        update_daily_value_sketches)

    ev = _events(spark, sf_dir).where(F.col("day").isNotNull())
    ev = ev.withColumn("_r", F.crc32(F.col("user_id").cast("string")))
    h1, h2 = ev.filter("_r % 2 = 0"), ev.filter("_r % 2 = 1")
    updated = update_daily_value_sketches(daily_value_sketches(h1), h2)
    merged = merge_daily_value_sketches(updated).collect()[0]

    vals = sorted(r["value_c"] for r in ev.select("value_c").collect())
    assert merged["n"] == len(vals)
    for q in (0.5, 0.9, 0.99):
        est = merged[f"p{int(q * 100)}_c"]
        assert abs(_rank_of(vals, est) - q) <= _RANK_EPS, (q, est)


def test_type_topk_exact_below_capacity_and_bounded_above(spark):
    """Below max_tracked the frequent-items sketch never evicts —
    counts are exact and complete; above capacity the dominant item
    still surfaces with estimate >= true count (ItemsSketch
    guarantee) and <= true count + stream length of evicted mass."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.sketches import type_topk_rollup

    rows = ([("a",)] * 50 + [("b",)] * 30 + [("c",)] * 5)
    events = spark.createDataFrame(rows, "event_type string") \
        .select(F.lit("2024-01-01").cast("date").alias("day"),
                "event_type")
    got = {(r["day"], r["item"]): r["n"]
           for r in type_topk_rollup(events).collect()}
    assert got == {("2024-01-01", "a"): 50, ("2024-01-01", "b"): 30,
                   ("2024-01-01", "c"): 5,
                   ("ALL", "a"): 50, ("ALL", "b"): 30, ("ALL", "c"): 5}

    # above capacity: 40 long-tail singletons force eviction at
    # max_tracked=8; the heavy hitter must survive with
    # true <= est <= true + evicted mass
    tail = [(f"t{i}",) for i in range(40)]
    skew = spark.createDataFrame([("hot",)] * 100 + tail,
                                 "event_type string") \
        .select(F.lit("2024-01-02").cast("date").alias("day"),
                "event_type")
    est = {r["item"]: r["n"]
           for r in type_topk_rollup(skew, k=3, max_tracked=8)
           .filter(F.col("day") == "ALL").collect()}
    assert "hot" in est
    assert 100 <= est["hot"] <= 140


# ---------------------------------------------------------------------------
# portable sketches (events_distinct_hll_portable /
# events_value_quantiles_portable carry full DuckDB oracles; these
# tests pin the properties the oracle can't see: merge laws and
# error bounds at cardinalities beyond the driver's gate)


def test_hll_portable_registers_merge_law(spark):
    """Registers of a union == max-merge of per-part registers, and
    the merged estimate tracks true cardinality within the m=4096
    error bound even above the linear-counting regime."""
    from logsqlite_spark.operators.sketches import (
        hll_portable_estimate, hll_portable_registers)

    a = spark.range(0, 30_000).select(
        F.lit("a").alias("day"), F.col("id").alias("user_id"))
    b = spark.range(20_000, 50_000).select(
        F.lit("b").alias("day"), F.col("id").alias("user_id"))
    both = a.unionByName(b).select(F.lit("u").alias("day"), "user_id")

    ra = hll_portable_registers(a)
    rb = hll_portable_registers(b)
    merged = (ra.unionByName(rb).groupBy("j")
              .agg(F.max("m_j").alias("m_j"))
              .select(F.lit("u").alias("day"), "j", "m_j"))
    direct = hll_portable_registers(both)
    assert (merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0)

    est = hll_portable_estimate(direct).collect()[0]
    # 50k distinct >> 2.5m: raw HLL regime; 1.04/sqrt(4096) ~ 1.6%,
    # allow 3 sigma
    assert abs(est["est_r4"] - 50_000) / 50_000 < 0.05


def test_hll_portable_rollup_matches_exact_at_sf(spark, sf_dir):
    from logsqlite_spark.operators.sketches import (
        _events, distinct_users_hll_portable)

    ev = _events(spark, sf_dir)
    got = {r["day"]: r for r in distinct_users_hll_portable(ev).collect()}
    exact_all = ev.select("user_id").distinct().count()
    # linear-counting regime (distinct users << m): near-exact
    assert abs(got["ALL"]["est_r4"] - exact_all) / exact_all < 0.03
    # register count can never exceed the distinct-key count
    assert got["ALL"]["regs"] <= exact_all


def test_kmv_bottom_k_merge_law_and_quantiles(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)), and
    sample quantiles stay within the ~1/sqrt(k) rank-error bound on a
    stream much larger than k."""
    from logsqlite_spark.operators.sketches import (
        kmv_bottom_k, kmv_value_quantiles)

    k = 64
    a = spark.range(0, 5_000).select(
        F.lit("d1").alias("day"), F.col("id").alias("event_id"),
        (F.col("id") * 3 % 10_000).alias("value_c"))
    b = spark.range(5_000, 12_000).select(
        F.lit("d1").alias("day"), F.col("id").alias("event_id"),
        (F.col("id") * 3 % 10_000).alias("value_c"))
    both = a.unionByName(b)

    merged = kmv_bottom_k(kmv_bottom_k(a, k).unionByName(
        kmv_bottom_k(b, k)), k)
    direct = kmv_bottom_k(both, k)
    assert (merged.exceptAll(direct).count() == 0
            and direct.exceptAll(merged).count() == 0)

    rows = {r["day"]: r for r in kmv_value_quantiles(both, k).collect()}
    vals = sorted(r["value_c"] for r in both.collect())
    assert rows["d1"]["n"] == len(vals)
    for q in (0.5, 0.9):
        est = rows["d1"][f"p{int(q * 100)}_c"]
        rank = sum(1 for v in vals if v <= est) / len(vals)
        # k=64 -> rank sd ~ sqrt(q(1-q)/k) ~ 0.06; allow 3 sigma
        assert abs(rank - q) <= 0.20, (q, est, rank)


def test_kmv_quantiles_exact_when_day_fits_in_k(spark, sf_dir):
    """Every sf0.001 day has <= 40 events << k=256, so per-day
    percentiles must EQUAL the exact lower-nearest-rank values."""
    from logsqlite_spark.operators.sketches import (
        _events_id, kmv_value_quantiles)

    ev = _events_id(spark, sf_dir)
    exact: dict[str, list[int]] = {}
    for r in ev.select(F.col("day").cast("string").alias("day"),
                       "value_c", "event_id").collect():
        exact.setdefault(r["day"], []).append((r["value_c"], r["event_id"]))
    rows = {r["day"]: r for r in kmv_value_quantiles(ev).collect()}
    for day, pairs in exact.items():
        vals = [v for v, _ in sorted(pairs)]
        assert rows[day]["n"] == len(vals)
        for q in (0.5, 0.9, 0.99):
            want = vals[int(q * (len(vals) - 1))]
            assert rows[day][f"p{int(q * 100)}_c"] == want, (day, q)


def test_portable_inc_twins_equal_full(spark, sf_dir):
    """The %4-split incremental twins must EQUAL the full rollups
    (register max-merge / bottom-k merge laws) — the property the
    shared oracle certifies at the driver, pinned here directly."""
    from logsqlite_spark.operators.sketches import (
        _q_hll_portable, _q_hll_portable_inc, _q_kmv_quantiles,
        _q_kmv_quantiles_inc)

    for full_q, inc_q in ((_q_hll_portable, _q_hll_portable_inc),
                          (_q_kmv_quantiles, _q_kmv_quantiles_inc)):
        full = sorted(map(tuple, full_q(spark, sf_dir).collect()))
        inc = sorted(map(tuple, inc_q(spark, sf_dir).collect()))
        assert full == inc and len(full) > 0


def test_kmv_sampler_plan_uses_window_group_limit(spark, sf_dir):
    """rn<=k over the per-day hash order must compile to
    WindowGroupLimit with the partial limit BEFORE the exchange — each
    map task forwards at most k rows per day, so the shuffle carries
    O(days*k), not the full scan (the 100 TB sampling contract)."""
    from logsqlite_spark.operators.sketches import (
        _events_id, kmv_bottom_k)

    e = _events_id(spark, sf_dir).select(
        F.col("day").cast("string").alias("day"), "value_c", "event_id")
    plan = (kmv_bottom_k(e)._jdf.queryExecution()
            .executedPlan().toString())
    assert "WindowGroupLimit" in plan
    assert plan.index("WindowGroupLimit") < plan.index("Exchange")
