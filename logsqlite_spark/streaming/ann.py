"""Streaming ANN index maintenance — the ingest-time twin of
``operators/similarity.append_to_ivf_index`` (round 9).

A continuously-ingesting embedding pipeline appends each micro-batch
of new vectors to the persisted IVF index: assignment against the
frozen centroids scans only the batch, the drift gate triggers a
refit when the data moves, and — because foreachBatch is
at-least-once — a JSON pointer records the last merged ``batch_id``
so a crash-replayed micro-batch is skipped, not double-appended (the
same exactly-once protocol as ``streaming/partials.py``; the lists
themselves are append-only files, so skipping the replay is the whole
idempotence story).

Compaction (``compact_ivf_lists``) is the companion maintenance op:
every appended batch adds one file per touched cluster.
"""

from __future__ import annotations

import json
import os
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame

from logsqlite_spark.operators.similarity import append_to_ivf_index

_STATE = "_APPEND_STATE.json"


def _local_index_root(path: str) -> str:
    parsed = urlparse(path)
    if parsed.scheme in ("", "file") and not parsed.netloc:
        return parsed.path or path
    raise ValueError(
        f"streaming IVF append needs an atomic-rename local index dir "
        f"for its batch pointer; got {path!r}")


def last_appended_batch(index_path: str) -> int | None:
    try:
        with open(os.path.join(_local_index_root(index_path), _STATE)) as fh:
            return int(json.load(fh)["batch_id"])
    except FileNotFoundError:
        return None


def _write_state(index_path: str, batch_id: int) -> None:
    root = _local_index_root(index_path)
    tmp = os.path.join(root, _STATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(root, _STATE))


def ivf_append_sink(index_path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    drift_threshold: float = 2.0,
                    ) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body (a plain callable, so batch tests
    drive it directly): append one micro-batch of vectors to the
    persisted index, exactly once per ``batch_id``."""
    _local_index_root(index_path)  # fail fast on a non-local root

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        last = last_appended_batch(index_path)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already appended
        append_to_ivf_index(batch_df, index_path, id_col=id_col,
                            vec_col=vec_col,
                            drift_threshold=drift_threshold)
        _write_state(index_path, batch_id)

    return on_batch


def start_streaming_ivf_append(stream: DataFrame, index_path: str,
                               checkpoint_dir: str,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               drift_threshold: float = 2.0):
    """Wire the sink into an embedding stream: each micro-batch lands
    in the index under the exactly-once pointer protocol."""
    return (
        stream.writeStream
        .foreachBatch(ivf_append_sink(index_path, id_col=id_col,
                                      vec_col=vec_col,
                                      drift_threshold=drift_threshold))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
