"""Control plane: state store (S9) + Engine lifecycle (T3/T5)."""

import pytest

from logsqlite_spark.api import Engine
from logsqlite_spark.config import EngineConfig, LogConfig
from logsqlite_spark.sources.frames import LogEntry
from logsqlite_spark.sources.spool import SpoolWriter
from logsqlite_spark.state import StateStore

BASE_TS = 1_704_067_200_000_000_000

def _burst(spool, cid, n, ts=BASE_TS):
    w = SpoolWriter(spool, cid)
    w.write_burst([
        LogEntry(source="stdout", time_nano=ts + i * 10**9,
                 line=f"l{i}".encode())
        for i in range(n)
    ])

def test_state_upsert_get_remove(tmp_path):
    s = StateStore(str(tmp_path))
    s.upsert("c1", "/run/fifo1", LogConfig())
    s.upsert("c1", "/run/fifo2", LogConfig(max_lines_per_tx=5))  # replace
    doc = s.get("c1")
    assert doc["fifo"] == "/run/fifo2"
    assert doc["log_conf"]["max_lines_per_tx"] == 5
    assert s.remove("c1") is True
    assert s.remove("c1") is False
    assert s.get("c1") is None

def test_state_list_and_dataframe(spark, tmp_path):
    s = StateStore(str(tmp_path))
    s.upsert("c1", "f1", LogConfig())
    s.upsert("c2", "f2", LogConfig(cleanup_age_s=60))
    assert [d["container_id"] for d in s.list_all()] == ["c1", "c2"]
    df = s.to_dataframe(spark)
    assert df.count() == 2
    row = df.filter("container_id = 'c2'").collect()[0]
    assert row["log_conf"]["cleanup_age_s"] == 60

@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    yield eng
    eng.stop_all()

def test_engine_lifecycle_batch(engine):
    engine.start_logging("c1", "/fifo/c1",
                         {"delete_when_stopped": "false"})
    _burst(engine.config.spool_dir, "c1", 5)
    res = engine.ingest_once()
    assert res["rows"] == 5

    out = engine.read_logs("c1", tail=2)
    assert [r["seq"] for r in out.collect()] == [4, 5]

    engine.stop_logging("c1")
    assert engine.state.get("c1") is None
    # delete_when_stopped=false keeps data
    assert engine.logs_df().count() == 5

def test_engine_delete_when_stopped(engine):
    engine.start_logging("c1", "/fifo/c1")  # default: delete on stop
    engine.start_logging("c2", "/fifo/c2")
    _burst(engine.config.spool_dir, "c1", 3)
    _burst(engine.config.spool_dir, "c2", 2)
    engine.ingest_once()
    engine.stop_logging("c1")
    left = engine.logs_df()
    assert left.select("container_id").distinct().collect()[0][0] == "c2"
    assert left.count() == 2

def test_engine_replay_restores_registrations(spark, engine):
    engine.start_logging("c1", "/fifo/c1")
    engine.start_logging("c2", "/fifo/c2")
    # new engine instance over the same warehouse == daemon restart
    eng2 = Engine(spark, engine.config)
    assert eng2.replay() == ["c1", "c2"]

def test_engine_cleanup_all(engine):
    engine.start_logging("c1", None, {"cleanup_max_lines": "2",
                                      "delete_when_stopped": "false"})
    _burst(engine.config.spool_dir, "c1", 6)
    engine.ingest_once()
    results = engine.cleanup_all()
    assert results["c1"]["deleted_rows"] == 4
    assert sorted(r["seq"] for r in
                  engine.read_logs("c1").select("seq").collect()) == [5, 6]

def test_engine_sql_surface(engine):
    engine.start_logging("c1", None, {"delete_when_stopped": "false"})
    _burst(engine.config.spool_dir, "c1", 4)
    engine.ingest_once()
    out = engine.sql(
        "SELECT container_id, count(*) AS n, max(seq) AS top "
        "FROM logs GROUP BY container_id")
    assert out.collect()[0].asDict() == {"container_id": "c1", "n": 4, "top": 4}
    st = engine.sql("SELECT container_id, log_conf.delete_when_stopped AS d "
                    "FROM active_streams")
    assert st.collect()[0]["d"] is False

def test_engine_follow_sees_new_rows(engine):
    engine.start_logging("cf", None, {"delete_when_stopped": "false"})
    _burst(engine.config.spool_dir, "cf", 3)
    engine.ingest_once()

    batches = []
    it = engine.follow("cf", tail=2, poll_interval_s=0.1, max_idle_polls=3)
    batches.append(next(it))  # history with tail cap
    assert [r["seq"] for r in batches[0]] == [2, 3]

    _burst(engine.config.spool_dir, "cf", 2, ts=BASE_TS + 10**11)
    engine.ingest_once()
    batches.append(next(it))  # live rows past the cursor, cap dropped
    assert [r["seq"] for r in batches[1]] == [4, 5]
    # idle timeout ends iteration (reference FOLLOW_COUNTER_MAX)
    assert list(it) == []


def _wait(pred, timeout=60.0, every=0.5):
    import time
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            if pred():
                return True
        except Exception:
            pass
        time.sleep(every)
    return False


def test_t4_restart_policy_bounces_logger_on_decode_error(spark, tmp_path):
    """T4 parity (statehandler.rs:146-166): with
    ``on_decode_error="restart"`` a committed micro-batch that saw a
    protobuf DecodeError restarts that container's ingest stream; data
    already committed survives, the bad frame is quarantined, and the
    stream keeps consuming afterwards."""
    from pathlib import Path

    from logsqlite_spark.sources.frames import encode_frame

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh"),
                                     on_decode_error="restart"))
    try:
        _burst(eng.config.spool_dir, "ct4", 3)
        q0 = eng.start_logging("ct4", "/run/ct4.fifo", streaming=True)
        run_id0 = q0.runId

        assert _wait(lambda: spark.read.parquet(
            eng.config.logs_dir).count() >= 3)

        # corrupt frame after a good one, via a raw spool file whose
        # name respects the monotonic time-ns convention (a
        # future-dated name would poison the file watermark and
        # legitimately quarantine every later burst as out-of-order)
        import time as _time

        d = Path(eng.config.spool_dir) / "ct4"
        good = encode_frame(LogEntry(source="stdout",
                                     time_nano=BASE_TS + 10**11,
                                     line=b"ok"))
        (d / f"{_time.time_ns():020d}-999999.plog").write_bytes(
            good + b"\x00\x00\x00\xffgarbage")

        # the policy bounces the stream: new runId registered
        assert _wait(lambda: eng._restarts.get("ct4", 0) >= 1), \
            "restart policy never fired"
        assert _wait(lambda: eng._queries["ct4"].runId != run_id0)

        # committed rows survived; bad frame quarantined; stream live
        _burst(eng.config.spool_dir, "ct4", 2, ts=BASE_TS + 2 * 10**11)
        assert _wait(lambda: spark.read.parquet(
            eng.config.logs_dir).count() >= 6)
        assert eng.decode_errors_df().count() == 1
    finally:
        eng.stop_all()


def test_t4_quarantine_policy_never_restarts(spark, tmp_path):
    """Default policy: decode errors quarantine and the stream keeps
    its original run — no bounce."""
    from pathlib import Path

    from logsqlite_spark.sources.frames import encode_frame

    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    try:
        d = Path(eng.config.spool_dir) / "cq4"
        d.mkdir(parents=True, exist_ok=True)
        good = encode_frame(LogEntry(source="stdout", time_nano=BASE_TS,
                                     line=b"ok"))
        import time as _time
        (d / f"{_time.time_ns():020d}-000000.plog").write_bytes(
            good + b"\x00\x00\x00\xffgarbage")
        q0 = eng.start_logging("cq4", "/run/cq4.fifo", streaming=True)
        run_id0 = q0.runId
        assert _wait(lambda: spark.read.parquet(
            eng.config.logs_dir).count() >= 1)
        assert _wait(lambda: eng.decode_errors_df() is not None
                     and eng.decode_errors_df().count() == 1)
        assert eng._restarts.get("cq4", 0) == 0
        assert eng._queries["cq4"].runId == run_id0
    finally:
        eng.stop_all()


def test_follow_seam_catchup_to_live_no_gap_no_dup(engine):
    """The tail-catch-up -> live-stream handoff seam (VERDICT r11 #4,
    SURVEY §7.2): rows landing BETWEEN iterator creation and the
    first (history) poll must appear exactly once — either inside the
    tail window or as the first live batch — and the cursor must hand
    off at the seq high-water with no gap and no re-emission."""
    engine.start_logging("cs", None, {"delete_when_stopped": "false"})
    _burst(engine.config.spool_dir, "cs", 3)          # seqs 1..3
    engine.ingest_once()

    it = engine.follow("cs", tail=2, poll_interval_s=0.05,
                       max_idle_polls=3)
    # land new rows before the first poll reads: they are part of the
    # table the history poll sees, so the tail window shifts onto them
    _burst(engine.config.spool_dir, "cs", 2, ts=BASE_TS + 10**11)  # 4,5
    engine.ingest_once()
    first = [r["seq"] for r in next(it)]
    assert first == [4, 5]  # tail=2 of the CURRENT high-water

    # live rows strictly past the handoff cursor: exactly once, no gap
    _burst(engine.config.spool_dir, "cs", 2, ts=BASE_TS + 2 * 10**11)  # 6,7
    engine.ingest_once()
    second = [r["seq"] for r in next(it)]
    assert second == [6, 7]

    emitted = first + second
    assert len(emitted) == len(set(emitted))          # no dup
    assert emitted == list(range(min(emitted), max(emitted) + 1))  # no gap
    assert list(it) == []                             # idle timeout
