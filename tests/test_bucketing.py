"""Bucketed-table joins: the pay-the-shuffle-once-at-write-time tier.

Pins the property the layout exists for: a join of two tables bucketed
on the same key/count has NO Exchange on either side, and the result
is identical to the plain join.
"""

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.bucketing import bucketed, write_bucketed
from logsqlite_spark.plans import explain_str


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed-wh")
    left = spark.range(0, 10_000).select(
        (F.col("id") % 64).alias("k"), F.col("id").alias("v"))
    right = spark.range(0, 2_000).select(
        (F.col("id") % 64).alias("k"), (F.col("id") * 10).alias("w"))
    write_bucketed(left, "b_left", "k", n_buckets=8,
                   path=str(wh / "b_left"))
    write_bucketed(right, "b_right", "k", n_buckets=8,
                   path=str(wh / "b_right"))
    yield "b_left", "b_right"
    spark.sql("DROP TABLE IF EXISTS b_left")
    spark.sql("DROP TABLE IF EXISTS b_right")


def test_same_bucket_join_has_no_exchange(spark, bucketed_pair):
    lname, rname = bucketed_pair
    # force the sort-merge path so bucketing (not broadcast) is on trial
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed(spark, lname).join(bucketed(spark, rname), "k")
        plan = explain_str(j)
        assert "Exchange (" not in plan
        # and it is still a real join over co-located buckets
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain_join(spark, bucketed_pair):
    lname, rname = bucketed_pair
    got = (bucketed(spark, lname).join(bucketed(spark, rname), "k")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0])
    left = spark.range(0, 10_000).select(
        (F.col("id") % 64).alias("k"), F.col("id").alias("v"))
    right = spark.range(0, 2_000).select(
        (F.col("id") % 64).alias("k"), (F.col("id") * 10).alias("w"))
    exp = (left.join(right, "k")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0])
    assert (got["n"], got["s"]) == (exp["n"], exp["s"])


def test_aqe_coalesces_small_shuffle(spark):
    # AQE is on engine-wide; after execution the exchange reads back
    # coalesced partitions (AQEShuffleRead) instead of the static 32
    df = (spark.range(0, 1000)
          .groupBy((F.col("id") % 3).alias("k"))
          .agg(F.count(F.lit(1)).alias("n")))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan


def test_zorder_layout_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The layout claim itself: under a linear (user, minute) sort a
    minute-range predicate overlaps EVERY file's min/max; under the
    Z-order curve each file covers a rectangle, so both dimensions
    prune. Footer min/max is exactly what the parquet reader uses."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.bucketing import write_zordered
    from logsqlite_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id",
        F.expr("(ts - 1704067200000000000) div 60000000000")
        .alias("minute"))
    lin = str(tmp_path / "linear")
    zo = str(tmp_path / "zorder")
    (ev.repartitionByRange(8, "user_id", "minute")
     .sortWithinPartitions("user_id", "minute")
     .write.parquet(lin))
    write_zordered(ev, zo, "user_id", "minute", n_files=8)

    def candidates(path, col, lo, hi):
        rows = (spark.read.parquet(path)
                .groupBy(F.input_file_name().alias("f"))
                .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
                .collect())
        cand = sum(1 for r in rows if r["hi"] >= lo and r["lo"] <= hi)
        return cand, len(rows)

    stats = ev.agg(F.min("minute"), F.max("minute"),
                   F.min("user_id"), F.max("user_id")).collect()[0]
    m0, m1, u0, u1 = stats
    span = m1 - m0
    mlo, mhi = m0 + int(span * 0.45), m0 + int(span * 0.50)

    c_lin, n_lin = candidates(lin, "minute", mlo, mhi)
    c_zo, n_zo = candidates(zo, "minute", mlo, mhi)
    assert n_lin == n_zo == 8
    # linear user-first sort: every file spans ~the full minute range
    assert c_lin == n_lin
    # z-order: a 5% minute band touches a strict subset of files
    assert c_zo < n_zo

    # and the first dimension still prunes under z-order
    uspan = u1 - u0
    c_zo_u, _ = candidates(zo, "user_id", u0, u0 + max(uspan // 8, 0))
    assert c_zo_u < n_zo
