"""IVF ANN recall + cleaner scheduler loop + decode-error quarantine."""

import time

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.api import Engine
from logsqlite_spark.config import EngineConfig
from logsqlite_spark.operators.similarity import cosine_topk, ivf_topk
from logsqlite_spark.sources.frames import LogEntry, encode_frame
from logsqlite_spark.sources.spool import SpoolWriter
from logsqlite_spark.tables import table

SF = "/root/testdata/sf0.001"

def test_ivf_recall_vs_bruteforce(spark):
    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r["qid"], r["nid"])
             for r in cosine_topk(q, emb, k=5).collect()}
    approx = {(r["qid"], r["nid"])
              for r in ivf_topk(q, emb, k=5, n_clusters=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # probing half the lists on 500 vecs

def test_ivf_deterministic(spark):
    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    a = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, k=3).collect()))
    assert a == b

def test_ivf_persisted_index_matches_inline_fit(spark, tmp_path):
    from logsqlite_spark.operators.similarity import (
        build_ivf_index, ivf_topk_indexed)

    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_clusters=8)

    # inverted lists are parquet-partitioned by cluster id
    import os
    parts = [d for d in os.listdir(f"{idx}/lists") if d.startswith("__cluster=")]
    assert len(parts) == 8

    inline = sorted(map(tuple,
                        ivf_topk(q, emb, k=5, n_clusters=8, n_probe=4).collect()))
    indexed = sorted(map(tuple,
                         ivf_topk_indexed(spark, q, idx, k=5, n_probe=4).collect()))
    assert indexed == inline and len(indexed) > 0

def test_ivf_auto_persist_builds_once_and_reuses(spark, tmp_path, monkeypatch):
    # file-backed corpus: first call builds the index under
    # $SPARK_GRAFT_IVF_DIR, second call serves from it without refit
    import os

    monkeypatch.setenv("SPARK_GRAFT_IVF_DIR", str(tmp_path / "auto"))
    emb = table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(q, emb, k=5, n_clusters=8,
                                   n_probe=4).collect()))
    root = str(tmp_path / "auto")
    # the flock anchor (<key>.lock) persists by design — it is never
    # deleted, else a waiter holding the old inode and a newcomer on a
    # fresh one would both "hold" the build mutex
    idxs = [e for e in os.listdir(root) if not e.endswith(".lock")]
    assert len(idxs) == 1
    idx_dir = os.path.join(root, idxs[0])
    marker = os.path.join(idx_dir, "_INDEX_OK")

    def data_mtimes():
        return {
            os.path.join(dp, f): os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(idx_dir) for f in fs
            if f != "_INDEX_OK"
        }

    m0 = data_mtimes()
    t0 = os.path.getmtime(marker)
    b = sorted(map(tuple, ivf_topk(q, emb, k=5, n_clusters=8,
                                   n_probe=4).collect()))
    assert a == b and len(a) > 0
    # same key, no rebuild: every index DATA file untouched (the
    # marker mtime advances by design — reads bump it so the GC age
    # guard sees in-use indexes as fresh), still exactly one index
    assert data_mtimes() == m0 and m0
    assert os.path.getmtime(marker) >= t0
    assert [e for e in os.listdir(root)
            if not e.endswith(".lock")] == idxs


BASE_TS = 1_704_067_200_000_000_000

def test_cleaner_loop_runs_periodically(spark, tmp_path):
    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh"),
                                     cleanup_interval_s=1))
    eng.start_logging("c1", None, {"cleanup_max_lines": "2",
                                   "delete_when_stopped": "false"})
    w = SpoolWriter(eng.config.spool_dir, "c1")
    w.write_burst([LogEntry(source="stdout", time_nano=BASE_TS + i * 10**9,
                            line=f"l{i}".encode()) for i in range(6)])
    eng.ingest_once()
    assert eng.read_logs("c1").count() == 6
    stop = eng.start_cleaner(interval_s=0.5)
    try:
        deadline = time.time() + 30
        n = None
        while time.time() < deadline:
            # a read can transiently race the cleaner's partition swap
            # (plain-parquet limitation, see retention.py docstring)
            try:
                n = eng.read_logs("c1").count()
            except Exception:
                n = None
            if n == 2:
                break
            time.sleep(0.5)
        assert n == 2
    finally:
        stop.set()

def test_decode_error_quarantine_table(spark, tmp_path):
    from pathlib import Path

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    d = Path(eng.config.spool_dir) / "cbad"
    d.mkdir(parents=True)
    good = encode_frame(LogEntry(source="stdout", time_nano=BASE_TS, line=b"ok"))
    (d / "00000000000000000001-000000.plog").write_bytes(
        good + b"\x00\x00\x00\xffgarbage")
    res = eng.ingest_once()
    assert res["rows"] == 1 and res["decode_errors"] == 1
    errs = eng.decode_errors_df()
    assert errs is not None and errs.count() == 1
    assert errs.collect()[0]["container_id"] == "cbad"
