"""Control plane state (S9): the ``active_fetches`` table re-expressed.

Reference: a SQLite table ``active_fetches(container_id PRIMARY KEY,
fifo, log_conf BLOB)`` mutated by a single actor loop
(/root/reference/src/statehandler.rs:83-132) and replayed on boot
(statehandler.rs:193-219).

Here: one JSON document per container under ``state/streams/`` — the
filesystem gives primary-key semantics (path = key), atomic upsert
(temp+rename = INSERT OR REPLACE), O(1) delete, and crash safety, with
zero Spark jobs for control-plane mutations (a 100-row metadata table
has no business on the cluster). ``to_dataframe`` exposes it as the
typed ACTIVE_STREAMS_SCHEMA table for queries.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from logsqlite_spark.config import LogConfig
from logsqlite_spark.schema import ACTIVE_STREAMS_SCHEMA

class StateStore:
    def __init__(self, state_dir: str):
        self.dir = Path(state_dir) / "streams"
        self.dir.mkdir(parents=True, exist_ok=True)

    def _path(self, container_id: str) -> Path:
        return self.dir / f"{container_id}.json"

    def upsert(self, container_id: str, fifo: str | None,
               conf: LogConfig) -> None:
        """INSERT OR REPLACE (statehandler.rs:113-120)."""
        doc = {"container_id": container_id, "fifo": fifo,
               "log_conf": conf.to_dict()}
        tmp = self._path(container_id).with_suffix(".tmp")
        tmp.write_text(json.dumps(doc))
        os.rename(tmp, self._path(container_id))

    def remove(self, container_id: str) -> bool:
        """DELETE (statehandler.rs:129-132)."""
        p = self._path(container_id)
        if p.exists():
            p.unlink()
            return True
        return False

    def get(self, container_id: str) -> dict | None:
        p = self._path(container_id)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def list_all(self) -> list[dict]:
        """Full scan, boot replay input (statehandler.rs:193-219)."""
        return [json.loads(p.read_text())
                for p in sorted(self.dir.glob("*.json"))]

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = []
        for doc in self.list_all():
            lc = doc["log_conf"]
            rows.append(
                (
                    doc["container_id"],
                    doc.get("fifo"),
                    (
                        lc.get("max_lines_per_tx"),
                        lc.get("max_size_per_tx"),
                        lc.get("message_read_timeout_ms"),
                        lc.get("cleanup_age_s"),
                        lc.get("cleanup_max_lines"),
                        lc.get("cleanup_interval_s"),
                        lc.get("delete_when_stopped"),
                    ),
                )
            )
        return spark.createDataFrame(rows, ACTIVE_STREAMS_SCHEMA)
