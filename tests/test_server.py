"""LogDriver HTTP endpoint over a unix socket (wire parity, S8/main.rs)."""

import json

import pytest

from logsqlite_spark.api import Engine
from logsqlite_spark.config import EngineConfig
from logsqlite_spark.server import connect_client
from logsqlite_spark.sources.frames import LogEntry, decode_frames
from logsqlite_spark.sources.spool import SpoolWriter

BASE_TS = 1_704_067_200_000_000_000


@pytest.fixture()
def engine(spark, tmp_path):
    eng = Engine(spark, EngineConfig(warehouse_dir=str(tmp_path / "wh")))
    yield eng
    eng.stop_all()


@pytest.fixture()
def server(engine, tmp_path):
    srv = engine.serve_logdriver(str(tmp_path / "plugin.sock"))
    yield srv
    srv.stop()


def _post(srv, route, obj):
    conn = connect_client(srv.socket_path)
    body = json.dumps(obj).encode()
    conn.request("POST", route, body=body,
                 headers={"Content-Length": str(len(body))})
    return conn.getresponse()


def test_capabilities(server):
    resp = _post(server, "/LogDriver.Capabilities", {})
    assert resp.status == 200
    assert json.loads(resp.read()) == {"Cap": {"ReadLogs": True}}


def test_start_read_stop_roundtrip(spark, engine, server):
    # StartLogging registers the container (keyed by fifo, like docker)
    resp = _post(server, "/LogDriver.StartLogging",
                 {"File": "/run/f1.fifo",
                  "Info": {"ContainerID": "c1",
                           "Config": {"max_lines_per_tx": "500"}}})
    assert json.loads(resp.read())["Err"] == ""

    w = SpoolWriter(engine.config.spool_dir, "c1")
    w.write_burst([
        LogEntry(source="stdout", time_nano=BASE_TS + i * 10**9,
                 line=f"hello-{i}".encode())
        for i in range(5)
    ])
    engine.ingest_once("c1")

    # ReadLogs streams back the exact wire frames (chunked body)
    resp = _post(server, "/LogDriver.ReadLogs",
                 {"Info": {"ContainerID": "c1"},
                  "Config": {"Since": "0001-01-01T00:00:00Z",
                             "Until": "0001-01-01T00:00:00Z",
                             "Tail": 0, "Follow": False}})
    assert resp.status == 200
    entries = list(decode_frames(resp.read()))
    assert [e.line for e in entries] == \
        [f"hello-{i}\n".encode() for i in range(5)]
    assert entries[0].source == "stdout"
    assert entries[0].time_nano == BASE_TS

    # tail + since behave like the reference's ReadConfig normalization
    resp = _post(server, "/LogDriver.ReadLogs",
                 {"Info": {"ContainerID": "c1"}, "Config": {"Tail": 2}})
    tails = [e.line for e in decode_frames(resp.read())]
    assert tails == [b"hello-3\n", b"hello-4\n"]

    resp = _post(server, "/LogDriver.StopLogging", {"File": "/run/f1.fifo"})
    assert json.loads(resp.read())["Err"] == ""


def test_read_unknown_container_empty_stream(server):
    resp = _post(server, "/LogDriver.ReadLogs",
                 {"Info": {"ContainerID": "nope"}, "Config": {}})
    assert resp.status == 200
    assert list(decode_frames(resp.read())) == []


def test_unknown_route_404(server):
    resp = _post(server, "/LogDriver.Bogus", {})
    assert resp.status == 404


def test_tail_then_follow_combined(spark, engine, server):
    """The reference's tail-then-follow seam (logger.rs:386): one
    ReadLogs call with Tail=2 AND Follow=true serves the capped
    history first, then drops the cap and streams rows ingested after
    the call started — over the real unix-socket chunked wire."""
    import struct
    import threading
    import time as _time

    from logsqlite_spark.sources.frames import decode_log_entry

    resp = _post(server, "/LogDriver.StartLogging",
                 {"File": "/run/f2.fifo",
                  "Info": {"ContainerID": "c2", "Config": {}}})
    assert json.loads(resp.read())["Err"] == ""

    w = SpoolWriter(engine.config.spool_dir, "c2")
    w.write_burst([
        LogEntry(source="stdout", time_nano=BASE_TS + i * 10**9,
                 line=f"hello-{i}".encode())
        for i in range(5)
    ])
    engine.ingest_once("c2")

    conn = connect_client(server.socket_path)
    body = json.dumps({"Info": {"ContainerID": "c2"},
                       "Config": {"Tail": 2, "Follow": True}}).encode()
    conn.request("POST", "/LogDriver.ReadLogs", body=body,
                 headers={"Content-Length": str(len(body))})
    resp = conn.getresponse()
    assert resp.status == 200

    got: list[bytes] = []

    def _read_exact(n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = resp.read(n - len(buf))
            if not chunk:
                raise AssertionError(f"stream ended after {got}")
            buf += chunk
        return buf

    def _reader():
        # exactly 5 frames total (tail 2 of history + 3 live); the
        # reader must exit after the last one — a blocked read() holds
        # the response lock and deadlocks conn.close() in the main
        # thread
        while len(got) < 5:
            (ln,) = struct.unpack(">I", _read_exact(4))
            got.append(decode_log_entry(_read_exact(ln)).line)

    t = threading.Thread(target=_reader, daemon=True)
    t.start()

    # the capped history must arrive while the live rows don't exist
    deadline = _time.monotonic() + 30
    while len(got) < 2 and _time.monotonic() < deadline:
        _time.sleep(0.1)
    assert got[:2] == [b"hello-3\n", b"hello-4\n"], got

    # live rows ingested AFTER the call started stream out uncapped
    w.write_burst([
        LogEntry(source="stdout", time_nano=BASE_TS + (5 + i) * 10**9,
                 line=f"hello-{5 + i}".encode())
        for i in range(3)
    ])
    engine.ingest_once("c2")
    t.join(timeout=30)
    assert got == [f"hello-{i}\n".encode() for i in range(3, 8)], got
    conn.close()


def test_plugin_activate_handshake(spark, engine, server):
    """Dockerd's first call is /Plugin.Activate (docker.rs:190-193,
    routed at main.rs:101); the full handshake — Activate →
    Capabilities → StartLogging → ReadLogs — must work over ONE
    keep-alive socket session, like a real daemon drives it."""
    conn = connect_client(server.socket_path)

    def req(route, obj):
        body = json.dumps(obj).encode()
        conn.request("POST", route, body=body,
                     headers={"Content-Length": str(len(body))})
        resp = conn.getresponse()
        assert resp.status == 200, route
        return resp.read()

    assert json.loads(req("/Plugin.Activate", {})) == \
        {"Implements": ["LogDriver"]}
    assert json.loads(req("/LogDriver.Capabilities", {})) == \
        {"Cap": {"ReadLogs": True}}
    assert json.loads(req("/LogDriver.StartLogging",
                          {"File": "/run/hs.fifo",
                           "Info": {"ContainerID": "hs1"}}))["Err"] == ""

    w = SpoolWriter(engine.config.spool_dir, "hs1")
    w.write_burst([LogEntry(source="stdout", time_nano=BASE_TS,
                            line=b"hi")])
    engine.ingest_once("hs1")

    frames = req("/LogDriver.ReadLogs",
                 {"Info": {"ContainerID": "hs1"}, "Config": {}})
    assert [e.line for e in decode_frames(frames)] == [b"hi\n"]
    conn.close()
