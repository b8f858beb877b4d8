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
