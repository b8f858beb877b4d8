"""Retention semantics + physical cleanup (reference cleaner.rs:40-131)."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from logsqlite_spark.config import LogConfig
from logsqlite_spark.operators.retention import (
    apply_retention,
    drop_container,
    retention_survivors,
)
from logsqlite_spark.table import ManifestTable

def seqs(df):
    return sorted(r["seq"] for r in df.select("seq").collect())

def test_keep_last_n_boundary_survives(logs_df):
    # strict ROWID < boundary: the row AT the boundary (rank N from end)
    # survives — keep exactly N
    out = retention_survivors(logs_df, cleanup_max_lines=3)
    per = {(r["container_id"], r["seq"]) for r in out.collect()}
    assert per == {("c1", 3), ("c1", 4), ("c1", 5), ("c2", 1), ("c2", 2)}

def test_keep_last_more_than_count_keeps_all(logs_df):
    out = retention_survivors(logs_df, cleanup_max_lines=100)
    assert out.count() == 7

def test_age_cutoff_strict_less_than(logs_df):
    # delete ts < cutoff; row with ts == cutoff survives
    now = 3_000_000_000_000
    age_s = 1000  # cutoff = 2_000_000_000_000
    out = retention_survivors(logs_df, now_nanos=now, cleanup_age_s=age_s)
    got = {(r["container_id"], r["seq"]) for r in out.collect()}
    assert got == {("c1", 2), ("c1", 4), ("c1", 5), ("c2", 1), ("c2", 2)}

def test_combined_or_delete(logs_df):
    # delete (ts < cutoff) OR (beyond last N)  ==  survive AND
    out = retention_survivors(
        logs_df, now_nanos=3_000_000_000_000, cleanup_age_s=1000,
        cleanup_max_lines=2)
    got = {(r["container_id"], r["seq"]) for r in out.collect()}
    assert got == {("c1", 4), ("c1", 5), ("c2", 1), ("c2", 2)}

def _write_logs_table(spark, tmp_path):
    rows = []
    base = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1e9)
    day = 86400 * 1_000_000_000
    for c in ("c1", "c2"):
        for i in range(100):
            ts = base + (i // 34) * day + i * 1_000_000
            rows.append((i + 1, ts, "stdout", f"line{i}\n", c))
    df = spark.createDataFrame(
        rows, "seq long, ts_nanos long, source string, line string, container_id string"
    ).withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000"))) \
     .withColumn("date", F.to_date("ts"))
    out = str(tmp_path / "logs")
    df.write.partitionBy("container_id", "date").parquet(out)
    return out

def test_apply_retention_age_drops_partitions(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    base = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1e9)
    # now = start of day 3; age = 1 day → cutoff = start of day 2:
    # day-1 partition drops wholly; day-2 stays; no boundary rewrite needed
    now = base + 2 * 86400 * 1_000_000_000
    conf = LogConfig(cleanup_age_s=86400, cleanup_max_lines=None)
    stats = apply_retention(spark, logs_dir, "c1", conf, now_nanos=now)
    assert stats["dropped_partitions"] >= 1
    left = ManifestTable(logs_dir).read_df(spark)
    c1 = left.filter("container_id = 'c1'")
    assert c1.count() == 100 - 34  # first day (rows 0..33) gone
    # untouched container:
    assert left.filter("container_id = 'c2'").count() == 100

def test_apply_retention_keep_last(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    conf = LogConfig(cleanup_age_s=None, cleanup_max_lines=10)
    stats = apply_retention(spark, logs_dir, "c1", conf)
    table = ManifestTable(logs_dir)
    left = table.read_df(spark).filter("container_id = 'c1'")
    assert sorted(r["seq"] for r in left.select("seq").collect()) == list(range(91, 101))
    assert stats["deleted_rows"] == 90
    # retired files linger for in-flight readers, then gc reclaims them:
    # after gc with keep=1 the physical tree equals the live snapshot
    table.gc(keep_generations=1, grace_s=0)
    assert spark.read.parquet(logs_dir).filter("container_id = 'c1'") \
        .count() == 10

def test_apply_retention_noop_without_limits(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    conf = LogConfig(cleanup_age_s=None, cleanup_max_lines=None)
    stats = apply_retention(spark, logs_dir, "c1", conf)
    assert stats == {"dropped_partitions": 0, "rewritten_partitions": 0,
                     "deleted_rows": 0}
    assert spark.read.parquet(logs_dir).count() == 200

def test_drop_container(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    assert drop_container(logs_dir, "c1") is True
    assert drop_container(logs_dir, "c1") is False
    left = ManifestTable(logs_dir).read_df(spark)
    assert left.select("container_id").distinct().collect()[0][0] == "c2"

def test_reader_loop_during_maintenance_never_fails(spark, tmp_path):
    """Readers in a tight loop while retention + compaction + gc churn
    the table: zero read failures, and every observed count is a state
    the table legally passed through (the manifest commit contract)."""
    import threading

    from logsqlite_spark.operators.compact import compact_container

    logs_dir = _write_logs_table(spark, tmp_path)
    table = ManifestTable(logs_dir)
    table.import_existing()

    errors: list[Exception] = []
    counts: set[int] = set()
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                counts.add(
                    table.read_df(spark).filter("container_id = 'c1'").count())
            except Exception as e:  # noqa: BLE001 - the test IS the catch
                errors.append(e)
                return

    threads = [threading.Thread(target=reader) for _ in range(2)]
    for t in threads:
        t.start()
    try:
        for keep in (60, 30, 10):
            apply_retention(spark, logs_dir, "c1",
                            LogConfig(cleanup_age_s=None,
                                      cleanup_max_lines=keep))
            compact_container(spark, logs_dir, "c1", min_files=1)
            table.gc(keep_generations=2, grace_s=0)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=60)
    assert not errors, errors[:1]
    assert counts <= {100, 60, 30, 10}, counts

def test_reader_snapshot_survives_retention_and_gc(spark, tmp_path):
    """The round-1 gap: a reader mid-query while retention rewrites.

    A DataFrame planned on the pre-retention snapshot must keep
    collecting correctly after retention commits (its files are
    retired, not deleted); gc with keep_generations=2 must also spare
    them. Only gc(keep=1) may invalidate that snapshot.
    """
    logs_dir = _write_logs_table(spark, tmp_path)
    table = ManifestTable(logs_dir)
    table.import_existing()
    before = table.read_df(spark).filter("container_id = 'c1'")
    assert before.count() == 100  # plan + execute once

    conf = LogConfig(cleanup_age_s=None, cleanup_max_lines=10)
    apply_retention(spark, logs_dir, "c1", conf)
    # old snapshot still fully readable after the commit...
    assert before.count() == 100
    # ...and after a gc that keeps 2 generations
    table.gc(keep_generations=2, grace_s=0)
    assert before.count() == 100
    # new snapshot sees the retained view
    assert table.read_df(spark).filter("container_id = 'c1'").count() == 10
