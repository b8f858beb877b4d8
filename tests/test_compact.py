"""Small-file compaction for the streaming-ingested logs table."""

from pathlib import Path

from pyspark.sql import functions as F

from logsqlite_spark.operators.compact import compact_container
from logsqlite_spark.table import ManifestTable

def _fragmented_logs(spark, tmp_path, n_appends=8, rows_per=25):
    out = str(tmp_path / "logs")
    base = 1_704_067_200_000_000_000
    for a in range(n_appends):
        rows = [(a * rows_per + i + 1, base + (a * rows_per + i) * 10**9, "x\n")
                for i in range(rows_per)]
        df = spark.createDataFrame(rows, "seq long, ts_nanos long, line string") \
            .withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000"))) \
            .withColumn("container_id", F.lit("c1")) \
            .withColumn("date", F.to_date("ts"))
        df.coalesce(2).write.mode("append") \
            .partitionBy("container_id", "date").parquet(out)
    return out

def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    logs_dir = _fragmented_logs(spark, tmp_path)
    part = Path(logs_dir) / "container_id=c1" / "date=2024-01-01"
    before = len(list(part.glob("*.parquet")))
    assert before >= 8  # genuinely fragmented

    table = ManifestTable(logs_dir)
    pre = spark.read.parquet(logs_dir).orderBy("seq").collect()
    stats = compact_container(spark, logs_dir, "c1")
    assert stats["compacted_partitions"] == 1
    assert stats["files_after"] < stats["files_before"]
    post = table.read_df(spark).orderBy("seq").collect()
    assert [r["seq"] for r in post] == [r["seq"] for r in pre]
    assert [r["line"] for r in post] == [r["line"] for r in pre]
    # physical small files disappear once gc retires the old snapshot
    table.gc(keep_generations=1, grace_s=0)
    after = len(list(part.glob("*.parquet")))
    assert after < before
    assert spark.read.parquet(logs_dir).count() == len(pre)

def test_compact_skips_already_compact(spark, tmp_path):
    logs_dir = _fragmented_logs(spark, tmp_path, n_appends=1)
    stats = compact_container(spark, logs_dir, "c1", min_files=4)
    assert stats["compacted_partitions"] == 0

def test_compact_missing_container_noop(spark, tmp_path):
    logs_dir = _fragmented_logs(spark, tmp_path)
    stats = compact_container(spark, logs_dir, "ghost")
    assert stats["compacted_partitions"] == 0
