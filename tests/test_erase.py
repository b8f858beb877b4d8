"""Targeted erasure (operators/retention.py::erase_matching) — the
right-to-be-forgotten path over the manifest table."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from logsqlite_spark.operators.retention import erase_matching
from logsqlite_spark.table import ManifestTable


def _write_logs_table(spark, tmp_path):
    rows = []
    base = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1e9)
    day = 86400 * 1_000_000_000
    for c in ("c1", "c2"):
        for i in range(100):
            ts = base + (i // 34) * day + i * 1_000_000
            src = "stderr" if (c == "c1" and i < 34) else "stdout"
            rows.append((i + 1, ts, src, f"user={i % 5} msg{i}\n", c))
    df = spark.createDataFrame(
        rows, "seq long, ts_nanos long, source string, line string, "
        "container_id string"
    ).withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000"))) \
     .withColumn("date", F.to_date("ts"))
    out = str(tmp_path / "logs")
    df.write.partitionBy("container_id", "date").parquet(out)
    return out


def test_erase_mixed_partitions_rewrite_only_affected(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    t = ManifestTable(logs_dir)
    t.import_existing()
    before_files = set(t.data_files())

    res = erase_matching(spark, logs_dir, "line LIKE 'user=3 %'")
    # user=3 appears in every (container, date) partition -> all 6
    # partitions are mixed: rewritten, none dropped
    assert res["rewritten_partitions"] == 6
    assert res["dropped_partitions"] == 0
    assert res["deleted_rows"] == 40  # 20 per container

    left = t.read_df(spark)
    assert left.count() == 160
    assert left.filter("line LIKE 'user=3 %'").count() == 0
    # untouched rows survive byte-identical reads
    assert left.filter("line LIKE 'user=1 %'").count() == 40


def test_erase_full_partition_is_metadata_only(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    t = ManifestTable(logs_dir)
    t.import_existing()
    before = set(t.data_files())

    # c1's first date partition is entirely stderr -> metadata drop
    res = erase_matching(spark, logs_dir, "source = 'stderr'",
                         container_id="c1")
    assert res["dropped_partitions"] == 1
    assert res["rewritten_partitions"] == 0
    assert res["deleted_rows"] == 34

    after = set(t.data_files())
    # no new files were written; c2 and c1's other dates untouched
    assert after < before
    left = t.read_df(spark)
    assert left.count() == 166
    assert left.filter("source = 'stderr'").count() == 0


def test_erase_no_match_is_noop(spark, tmp_path):
    logs_dir = _write_logs_table(spark, tmp_path)
    t = ManifestTable(logs_dir)
    t.import_existing()
    before = set(t.data_files())
    gen = t.manifest()["generation"]
    res = erase_matching(spark, logs_dir, "line LIKE 'nobody %'")
    assert res == {"dropped_partitions": 0, "rewritten_partitions": 0,
                   "deleted_rows": 0}
    assert set(t.data_files()) == before
    assert t.manifest()["generation"] == gen


def test_engine_erase_surface(spark, tmp_path):
    """Engine.erase routes through erase_matching against the
    engine's own logs_dir."""
    from logsqlite_spark.api import Engine
    from logsqlite_spark.config import EngineConfig

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    logs_dir = eng.config.logs_dir
    import shutil
    from pathlib import Path
    src = _write_logs_table(spark, tmp_path)
    Path(logs_dir).parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(src, logs_dir, dirs_exist_ok=True)

    res = eng.erase("line LIKE 'user=0 %'", container_id="c2")
    assert res["deleted_rows"] == 20
    t = ManifestTable(logs_dir)
    left = t.read_df(spark)
    assert left.filter("container_id = 'c2' AND line LIKE 'user=0 %'") \
        .count() == 0
    assert left.filter("container_id = 'c1' AND line LIKE 'user=0 %'") \
        .count() == 20


def test_time_travel_and_gc_complete_erasure(spark, tmp_path):
    """manifest_at reads the pre-erasure snapshot (time travel); gc
    ages it out, which is when the erasure is physically complete."""
    logs_dir = _write_logs_table(spark, tmp_path)
    t = ManifestTable(logs_dir)
    t.import_existing()
    g0 = t.manifest()["generation"]

    erase_matching(spark, logs_dir, "line LIKE 'user=3 %'")
    g1 = t.manifest()["generation"]
    assert g1 > g0 and g0 in t.generations()

    # time travel: the old snapshot still shows the erased rows
    old = t.read_df(spark, t.manifest_at(g0))
    assert old.filter("line LIKE 'user=3 %'").count() == 40
    now = t.read_df(spark)
    assert now.filter("line LIKE 'user=3 %'").count() == 0

    # gc with keep_generations=1 retires the pre-erasure snapshot
    res = t.gc(keep_generations=1, grace_s=0)
    assert res["deleted_manifests"] >= 1 and res["deleted_files"] > 0
    assert g0 not in t.generations()
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        t.manifest_at(g0)
    # the live snapshot is untouched
    assert t.read_df(spark).count() == 160


def test_erase_null_predicate_rows_survive(spark, tmp_path):
    """Review r5: SQL DELETE semantics — rows where the predicate is
    NULL are kept, and deleted_rows counts only TRUE matches."""
    from pyspark.sql import functions as F

    rows = [(1, 10**15, "stdout", "keep\n", "c1"),
            (2, 10**15 + 1, None, "nullsrc\n", "c1"),
            (3, 10**15 + 2, "stderr", "drop\n", "c1")]
    df = (spark.createDataFrame(
        rows, "seq long, ts_nanos long, source string, line string, "
        "container_id string")
        .withColumn("ts", F.timestamp_micros(F.expr("ts_nanos div 1000")))
        .withColumn("date", F.to_date("ts")))
    logs_dir = str(tmp_path / "logs")
    df.write.partitionBy("container_id", "date").parquet(logs_dir)

    res = erase_matching(spark, logs_dir, "source = 'stderr'")
    assert res["deleted_rows"] == 1
    left = ManifestTable(logs_dir).read_df(spark)
    assert sorted(r["seq"] for r in left.collect()) == [1, 2]


def test_engine_logs_df_at_time_travel(spark, tmp_path):
    from logsqlite_spark.api import Engine
    from logsqlite_spark.config import EngineConfig

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    import shutil
    from pathlib import Path
    src = _write_logs_table(spark, tmp_path)
    Path(eng.config.logs_dir).parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(src, eng.config.logs_dir, dirs_exist_ok=True)

    n0 = eng.logs_df().count()
    g0 = eng.table.manifest()["generation"]
    eng.erase("line LIKE 'user=4 %'")
    assert eng.logs_df().count() == n0 - 40
    assert eng.logs_df_at(g0).count() == n0


def test_engine_erase_then_gc_makes_old_generations_unreadable(
        spark, tmp_path):
    """VERDICT r5 #8 — the "erasure physically complete after gc"
    corollary at the Engine surface: after erase + gc, a pre-erasure
    generation is unreadable BOTH by number (manifest gone) and
    through a pre-captured manifest handle (data files gone), so no
    path resurrects erased rows."""
    import shutil
    from pathlib import Path

    import pytest as _pytest

    from logsqlite_spark.api import Engine
    from logsqlite_spark.config import EngineConfig

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    src = _write_logs_table(spark, tmp_path)
    Path(eng.config.logs_dir).parent.mkdir(parents=True, exist_ok=True)
    shutil.copytree(src, eng.config.logs_dir, dirs_exist_ok=True)

    eng.table.import_existing()
    g0 = eng.table.manifest()["generation"]
    old_manifest = eng.table.manifest_at(g0)  # adversarial: keep a handle
    eng.erase("line LIKE 'user=3 %'")
    assert eng.logs_df_at(g0).filter(
        "line LIKE 'user=3 %'").count() == 40  # travel works pre-gc

    res = eng.table.gc(keep_generations=1, grace_s=0)
    assert res["deleted_files"] > 0
    # by generation number: gone
    with _pytest.raises(FileNotFoundError):
        eng.logs_df_at(g0)
    # via the stale handle: the erased rows' files are physically gone
    live = set(eng.table.manifest()["files"])
    dead = [p for p in old_manifest["files"] if p not in live]
    assert dead, "erase rewrote nothing?"
    for p in dead:
        assert not (Path(eng.config.logs_dir) / p).exists(), p
    # current snapshot unaffected
    assert eng.logs_df().filter("line LIKE 'user=3 %'").count() == 0
