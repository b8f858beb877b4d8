"""Manifest table commit protocol (table.py).

The three round-1 holes this closes, each pinned by a test:
1. reader-safety: snapshots never 404 mid-maintenance (test_retention
   covers the read-during-retention path; here: gc generation rules);
2. exactly-once: a replayed batch id aborts inside the commit, so a
   crash between data write and state save cannot duplicate rows;
3. lost concurrent appends: a maintenance commit_replace applied after
   an interleaved commit_append preserves the appended files.
"""

from __future__ import annotations

import json
import threading

import pytest

from logsqlite_spark.streaming.ingest import ingest_spool_once
from logsqlite_spark.sources.frames import LogEntry
from logsqlite_spark.sources.spool import SpoolWriter
from logsqlite_spark.table import ManifestTable

BASE_TS = 1_704_067_200_000_000_000


def _touch(table: ManifestTable, rel: str) -> str:
    p = table.dir / rel
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"x")
    return rel


def test_commit_append_is_idempotent_per_batch(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    f1 = _touch(t, "container_id=c1/date=2024-01-01/a.parquet")
    assert t.commit_append([f1], "s", 0, {"c1": 5}, {"c1": "f0"}) is not None
    # crash replay: same batch id again → no-op, nothing double-counted
    f_dup = _touch(t, "container_id=c1/date=2024-01-01/dup.parquet")
    assert t.commit_append([f_dup], "s", 0, {"c1": 5}, {"c1": "f0"}) is None
    m = t.manifest()
    assert m["files"] == [f1]
    assert m["high_water"] == {"c1": 5}
    # the orphaned duplicate file is unreferenced → gc removes it
    t.gc(keep_generations=1)
    assert not (t.dir / f_dup).exists()
    assert (t.dir / f1).exists()


def test_batch_scopes_are_independent(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    f1 = _touch(t, "container_id=c1/date=d/a.parquet")
    f2 = _touch(t, "container_id=c2/date=d/b.parquet")
    assert t.commit_append([f1], "stream-c1", 7, {"c1": 1}, {}) is not None
    # batch 0 of ANOTHER stream must not be mistaken for a replay
    assert t.commit_append([f2], "stream-c2", 0, {"c2": 1}, {}) is not None
    m = t.manifest()
    assert m["batch_ids"] == {"stream-c1": 7, "stream-c2": 0}
    assert m["high_water"] == {"c1": 1, "c2": 1}


def test_commit_replace_preserves_interleaved_append(tmp_path):
    """The compaction-vs-streaming race from the round-1 review: files
    appended between a maintenance job's snapshot and its commit must
    survive the replace."""
    t = ManifestTable(str(tmp_path / "t"))
    old = [_touch(t, f"container_id=c1/date=d/old{i}.parquet") for i in range(3)]
    t.commit_append(old, "s", None, {}, {})
    snapshot_files = t.manifest()["files"]  # maintenance takes its snapshot

    # ...meanwhile the ingest stream appends a new file
    mid = _touch(t, "container_id=c1/date=d/mid.parquet")
    t.commit_append([mid], "s", None, {}, {})

    # maintenance rewrites ONLY its snapshot's files
    new = _touch(t, "container_id=c1/date=d/compacted.parquet")
    t.commit_replace(snapshot_files, [new])
    assert sorted(t.manifest()["files"]) == sorted([mid, new])


def test_concurrent_commits_serialize_without_lost_updates(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    errs = []

    def worker(cid: str):
        try:
            for i in range(20):
                f = _touch(t, f"container_id={cid}/date=d/f{i}.parquet")
                t.commit_append([f], f"s-{cid}", i, {cid: 1}, {})
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(c,)) for c in ("a", "b")]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    m = t.manifest()
    assert len(m["files"]) == 40
    assert m["high_water"] == {"a": 20, "b": 20}
    assert m["generation"] == 40


def test_import_existing_adopts_plain_tree(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    f1 = _touch(t, "container_id=c1/date=d/a.parquet")
    m = t.import_existing()
    assert m["files"] == [f1]
    # second call is a no-op even though more files appeared out-of-band
    _touch(t, "container_id=c1/date=d/b.parquet")
    assert t.import_existing()["files"] == [f1]


def test_gc_respects_keep_generations(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    f1 = _touch(t, "container_id=c/date=d/gen1.parquet")
    t.commit_append([f1], "s", None, {}, {})
    f2 = _touch(t, "container_id=c/date=d/gen2.parquet")
    t.commit_replace([f1], [f2])
    # keep 2 generations: f1 still referenced by gen 1 → spared
    t.gc(keep_generations=2)
    assert (t.dir / f1).exists()
    # keep 1: f1 unreferenced → deleted; f2 live → kept
    t.gc(keep_generations=1)
    assert not (t.dir / f1).exists()
    assert (t.dir / f2).exists()


def test_crash_between_write_and_commit_does_not_duplicate(spark, tmp_path):
    """End-to-end exactly-once: simulate the crash window the round-1
    design had (data appended, state not saved) by replaying the same
    ingest batch — the manifest makes the second attempt a no-op."""
    wh = tmp_path / "wh"
    spool, logs, state = str(wh / "spool"), str(wh / "logs"), str(wh / "state")
    w = SpoolWriter(spool, "c1")
    w.write_burst([LogEntry(source="stdout", time_nano=BASE_TS + i * 10**9,
                            line=f"l{i}".encode()) for i in range(5)])
    res = ingest_spool_once(spark, spool, logs, state, consume=False)
    assert res["rows"] == 5
    # replay the SAME spool files (consume=False left them in place) —
    # the per-container file watermark filters every row out
    res2 = ingest_spool_once(spark, spool, logs, state, consume=True)
    assert res2.get("rows", 0) == 0
    t = ManifestTable(logs)
    df = t.read_df(spark)
    assert df.count() == 5
    assert sorted(r["seq"] for r in df.select("seq").collect()) == [1, 2, 3, 4, 5]


def test_lock_contention_times_out_not_corrupts(tmp_path):
    t = ManifestTable(str(tmp_path / "t"))
    f1 = _touch(t, "container_id=c/date=d/a.parquet")
    t.commit_append([f1], "s", None, {}, {})
    t.dir.mkdir(exist_ok=True)
    t.lock_path.write_text("held")  # someone else holds the lock
    with pytest.raises(TimeoutError):
        t._acquire_lock(timeout_s=0.3)
    t.lock_path.unlink()
    # manifest unharmed
    assert t.manifest()["files"] == [f1]
