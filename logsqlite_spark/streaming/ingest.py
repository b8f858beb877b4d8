"""Ingest pipeline (S4-S7): spool -> decode -> seq -> partitioned parquet.

ROWID parity (the §7 watch-list hard part): the reference gets arrival
order for free from SQLite's ROWID. Here ``seq`` is assigned as

    seq = high_water[container] + row_number() over (
              partition by container_id order by (path, frame_no))

inside each micro-batch, with high-water marks persisted atomically
alongside the data. Correctness rests on the same invariant the
reference has — ONE writer per container (one FIFO, one logger task;
logger.rs:242-272): spool files of one container are produced in
order, so (path, frame_no) is the arrival order, and batches are
processed in file order by the streaming source.

Exactly-once: data files, seq high-water marks, the per-container
spool-file watermark, and the per-stream batch id are committed in ONE
atomic manifest commit (table.py) — the transactionality the reference
gets from BEGIN/END TRANSACTION (logger.rs:155-219). A crash between
any two steps leaves only unreferenced staging files; replaying the
micro-batch (same epoch id) is detected inside the commit and skipped,
so plain parquet never degrades to at-least-once.

Scale: the shuffle per micro-batch is one hash partition by
container_id (bounded by batch size, not table size); the parquet
append is partitioned (container_id, date) so downstream queries prune.
At 1000 executors the same code runs unchanged — micro-batch row_number
windows are per-container and AQE splits skew.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logsqlite_spark.config import LogConfig
from logsqlite_spark.sources.spool import read_spool_batch, read_spool_stream
from logsqlite_spark.table import ManifestTable, open_table

DECODE_ERROR_SOURCE = "__decode_error__"

# Staging writes use FileOutputCommitter ALGORITHM 2 (r17, VERDICT r16
# #6, guide §6): v1 renames every task's output TWICE (task dir → job
# _temporary, then a sequential driver-side pass into the staging
# root) — measured as part of the 0.58 s partitioned-write term of
# ingest_100k_lines. v2 moves each file once, at task commit. The
# usual v2 caveat (a failed/speculative task can leave committed files
# behind) is NEUTRALIZED by this pipeline's own design: publication is
# the MANIFEST commit, not the filesystem — `adopt_staged` runs only
# after a fully-successful write job into a per-batch unique staging
# dir, and a failed job's staging dir is discarded wholesale, never
# adopted (the crash-safety soaks exercise exactly this seam).
# Env-tunable for deployments whose object store needs a different
# committer entirely.
_COMMITTER_ALGO = os.environ.get("SPARK_GRAFT_COMMITTER_ALGO", "2")


def _staged_parquet_write(df: DataFrame, staging,
                          max_records_per_file: int) -> None:
    """The shared staging write: partitioned parquet under the
    committer algorithm above (the option is merged into the write
    job's Hadoop conf via newHadoopConfWithOptions)."""
    (df.write.mode("overwrite")
     .option("maxRecordsPerFile", max_records_per_file)
     .option("mapreduce.fileoutputcommitter.algorithm.version",
             _COMMITTER_ALGO)
     .partitionBy("container_id", "date")
     .parquet(str(staging)))

def assign_seq(decoded: DataFrame, high_water: dict[str, int]) -> DataFrame:
    """Turn decoded entries into the logs-table shape with seq assigned.

    Arrival order inside a batch = (path, frame_no); spool file names
    are zero-padded counters so lexicographic path order is write
    order. The window is per container — skew bounded by per-container
    batch volume.
    """
    # High-water lookup as a literal map expression, not a join: the map
    # is one entry per container (tiny), and a broadcast join here costs
    # a full BroadcastExchange per micro-batch. Fall back to a join only
    # past a size where literal expressions get unwieldy.
    hw_items = list(high_water.items())
    if not hw_items:
        hw_col = F.lit(0)
    elif len(hw_items) <= 10_000:
        pairs = []
        for cid, hw in hw_items:
            pairs += [F.lit(cid), F.lit(int(hw))]
        hw_col = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col("container_id")),
            F.lit(0),
        )
    else:
        spark = decoded.sparkSession
        hw_df = spark.createDataFrame(hw_items, "container_id string, hw long")
        decoded = decoded.join(F.broadcast(hw_df), "container_id", "left")
        hw_col = F.coalesce(F.col("hw"), F.lit(0))

    w = Window.partitionBy("container_id").orderBy("path", "frame_no")
    return (
        decoded.filter(F.col("source") != DECODE_ERROR_SOURCE)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("seq", hw_col + F.col("__rn"))
        .withColumn("ts_nanos", F.col("time_nano"))
        .withColumn("ts", F.timestamp_micros(F.expr("time_nano div 1000")))
        .withColumn("date", F.to_date("ts"))
        .select("seq", "ts_nanos", "ts", "source", "line", "partial",
                "partial_meta", "container_id", "date")
    )

def _obs_or_agg(obs, df: DataFrame, aggs: list) -> dict:
    """Ride-along ``Observation`` metrics, with an exact fallback.

    Spark's CollectMetrics delivery on a FileFormatWriter action is
    not guaranteed: ``ObservationManager.tryComplete`` completes the
    observation with ``Row.empty`` whenever an execution's logical
    plan contains the CollectMetrics node but its runtime
    ``observedMetrics`` map came back without the entry (reproduced
    deterministically in this Spark build after an unrelated append
    on the same lineage).  When that happens, recompute the SAME
    aggregate expressions as one explicit tiny job — correct always,
    one job in the common case."""
    try:
        jrow = obs._jo.getRow()
        empty = jrow.length() == 0
    except Exception:  # noqa: BLE001 — any delivery failure: recompute
        empty = True
    if not empty:
        return obs.get
    return df.agg(*aggs).first().asDict()


def _norm_path(p: str) -> str:
    """Plain filesystem form of a spool path — pre-round-13 manifests
    stored the watermark in whatever URI spelling the source produced
    (binaryFile ``file:/x``, input_file_name ``file:///x``, both
    percent-encoded); the decode now emits plain paths, so stored
    watermarks normalize on read and the string compare stays
    consistent across upgrades.  Percent-decoding applies ONLY to the
    legacy URI spellings — a plain path may legitimately contain a
    literal ``%``."""
    import re
    import urllib.parse

    if re.match(r"^file:/+", p):
        return urllib.parse.unquote(re.sub(r"^file:/+", "/", p))
    return p


def _write_batch(batch_df: DataFrame, logs_dir: str, state_dir: str,
                 scope: str, batch_id: int | None,
                 max_records_per_file: int,
                 on_stale: str = "quarantine",
                 single_container: str | None = None,
                 listing: list[str] | None = None) -> dict:
    """Assign seq and append one (micro-)batch; returns progress info.

    The append is exactly-once: rows land in the table's staging dir,
    get adopted (moved, still unreferenced), and become visible in ONE
    manifest commit together with the seq high-water, spool watermark,
    and batch id. Replays abort inside the commit's critical section,
    so a crash at any point here never duplicates rows.

    ``single_container``: the container a SCOPED stream is pinned to
    (start_ingest_stream(container_id=...)).  The per-container stats
    the commit needs (file watermark, good/error/stale counts) then
    degenerate to GLOBAL aggregates, so they ride the write job as
    ``Observation`` metrics instead of a separate aggregation job —
    one Spark job per micro-batch instead of two.  Halving per-batch
    fixed cost is what bounds ingest→follow-visible latency (the
    reference's 1 s poll design point, logger.rs:287-288), and at
    cluster scale it halves driver job-scheduling load per trigger.

    ``listing`` (round 13): the exact spool file list a BATCH pull
    read (``ingest_spool_once`` lists the spool on the driver anyway).
    With it, the multi-container pull also commits in ONE job: the
    per-container file watermark comes from the listing itself and
    the per-container row counts from the staged parquet footers, so
    the separate per-container stats aggregation (and the 100k-row
    cache it required) disappears.  The multiplexed STREAM keeps the
    grouped-stats path — its micro-batch has no driver listing.
    """
    table = open_table(logs_dir)
    st = table.import_existing()  # no-op once the manifest exists
    if batch_id is not None and batch_id <= st["batch_ids"].get(scope, -1):
        return {"skipped_replay": True, "batch_id": batch_id}

    # File-level idempotence: spool file names are monotonic per
    # container (single writer), so anything at or below the
    # last-consumed watermark is either a replay (batch re-pull,
    # checkpoint rebuild) or — the dangerous case — an externally
    # written file that VIOLATES name monotonicity and would otherwise
    # be silently confused with a replay and lost. Neither enters the
    # table, but ``on_stale="quarantine"`` (the default) parks the
    # rows in ``state_dir/out_of_order`` and surfaces counters, so a
    # misnamed file is an inspectable incident, not silent data loss.
    # ``on_stale="drop"`` is for callers that replay by design
    # (``consume=False`` batch re-pulls).
    # Hot-path guard: the common case (fresh table, or a steady stream
    # whose files are always new) has an EMPTY watermark map — skip the
    # __stale column entirely there so the per-row condition, the extra
    # aggregate, and the live-row filters never enter the plan. The
    # quarantine machinery only costs when there is a watermark to
    # violate.
    last_file = {cid: _norm_path(v)
                 for cid, v in st.get("last_file", {}).items()}
    track_stale = bool(last_file)
    if track_stale:
        pairs = []
        for cid, name in last_file.items():
            pairs += [F.lit(cid), F.lit(name)]
        lf_col = F.element_at(F.create_map(*pairs), F.col("container_id"))
        stale_cond = lf_col.isNotNull() & (F.col("path") <= lf_col)
        batch_df = batch_df.withColumn("__stale", stale_cond)
        not_stale = ~F.col("__stale")
    else:
        not_stale = F.lit(True)

    if single_container is not None:
        return _write_batch_observed(
            batch_df, table, st, state_dir, scope, batch_id,
            max_records_per_file, on_stale, single_container,
            track_stale, not_stale)
    if listing is not None:
        return _write_batch_listed(
            batch_df, table, st, state_dir, scope, batch_id,
            max_records_per_file, on_stale, listing, last_file,
            track_stale, not_stale)
    return _write_batch_grouped(
        batch_df, table, st, state_dir, scope, batch_id,
        max_records_per_file, on_stale, track_stale, not_stale)


def _write_batch_grouped(batch_df: DataFrame, table: ManifestTable,
                         st: dict, state_dir: str, scope: str,
                         batch_id: int | None,
                         max_records_per_file: int, on_stale: str,
                         track_stale, not_stale) -> dict:
    """TWO-JOB commit for a multiplexed STREAMING micro-batch (no
    driver listing exists): one per-container stats aggregation over
    the persisted decode, then the write from cache."""
    batch_df = batch_df.persist()
    try:
        # ONE stats job over the raw batch: per-container file watermark
        # + decode-error / good-row / stale-row counts (one row per
        # container, not per record). ``seq`` is a dense per-container
        # row_number on top of the high-water mark, so max(seq) after
        # the write is just high_water + n_good — no second aggregation
        # job needed. Watermark and counts consider live rows only.
        good = (F.col("source") != DECODE_ERROR_SOURCE).cast("long")
        if track_stale:
            live = not_stale.cast("long")
            aggs = [
                F.max(F.when(not_stale, F.col("path"))).alias("f"),
                F.sum(live - good * live).alias("e"),
                F.sum(good * live).alias("n"),
                F.sum(1 - live).alias("st"),
            ]
        else:
            aggs = [
                F.max("path").alias("f"),
                F.sum(1 - good).alias("e"),
                F.sum(good).alias("n"),
                F.lit(0).alias("st"),
            ]
        stats = batch_df.groupBy("container_id").agg(*aggs).collect()
        if not stats:
            return {"rows": 0, "decode_errors": 0, "batch_id": batch_id}
        top_files = {r["container_id"]: r["f"] for r in stats
                     if r["f"] is not None}
        n_errors = sum(r["e"] for r in stats)
        n_stale = sum(r["st"] for r in stats)
        # Quarantine writes go through the staged-rename helper, NOT a
        # direct .mode("append") into the shared dir (round-15 stream-
        # soak finding, caught at cycle 37): two concurrent streams
        # (the plog and jsonl mux queries) appending into the same
        # path share Hadoop's job-staging dir `<dir>/_temporary/0` —
        # whichever job commits first recursively deletes it and the
        # other dies on FileNotFoundException mid-write.  The helper
        # stages under a per-call `_inflight-<uuid>` dir (isolated
        # `_temporary`) and renames files in with unique names; its
        # count guard is exact here because the grouped batch is
        # persisted (the quarantine re-read serves from cache).
        if n_stale and on_stale == "quarantine":
            _quarantine_write(
                batch_df.filter(F.col("__stale"))
                .select("path", "container_id", "frame_no", "source",
                        "time_nano", "line"),
                str(Path(state_dir) / "out_of_order"), int(n_stale),
                "out-of-order")
        if n_errors:
            # T4 policy: corrupt frames never poison the stream — the
            # good prefix of the file was kept (decode stops at the bad
            # frame, like the reference restarting on DecodeError), and
            # the error row is quarantined for ops visibility.
            _quarantine_write(
                batch_df.filter((F.col("source") == DECODE_ERROR_SOURCE)
                                & not_stale)
                .select("path", "container_id", "line"),
                str(Path(state_dir) / "decode_errors"), int(n_errors),
                "decode-error")
        increments = {r["container_id"]: int(r["n"]) for r in stats if r["n"]}
        n_rows = sum(increments.values())
        new_files: list[str] = []
        if n_rows:
            staging = table.new_staging_dir()
            live_df = batch_df.filter(not_stale) if track_stale else batch_df
            _staged_parquet_write(assign_seq(live_df, st["high_water"]),
                                  staging, max_records_per_file)
            new_files = table.adopt_staged(staging)
            staged_n = sum(_parquet_num_rows(str(table.dir / f))
                           for f in new_files)
            if staged_n != n_rows:
                # stats job and write job read the persisted batch, so
                # they can only diverge under cache eviction+recompute
                # — abort rather than commit counts the data does not
                # back (adopted files unreferenced; gc reclaims)
                raise RuntimeError(
                    f"staged parquet rows ({staged_n}) != stats rows "
                    f"({n_rows}) — aborting the commit")
        committed = table.commit_append(new_files, scope, batch_id,
                                        increments, top_files)
        if committed is None:  # concurrent replay won the commit
            return {"skipped_replay": True, "batch_id": batch_id}
        return {
            "rows": int(n_rows),
            "decode_errors": int(n_errors),
            "out_of_order_rows": int(n_stale) if on_stale == "quarantine" else 0,
            "batch_id": batch_id,
            "high_water": dict(committed["high_water"]),
            "new_files": new_files,
        }
    finally:
        batch_df.unpersist()


def _write_batch_observed(batch_df: DataFrame, table: ManifestTable,
                          st: dict, state_dir: str, scope: str,
                          batch_id: int | None,
                          max_records_per_file: int, on_stale: str,
                          cid: str, track_stale, not_stale) -> dict:
    """ONE-JOB commit for a single-container-scoped batch: the
    per-container stats `_write_batch` needs are global aggregates
    here, so they ride the write job as ``Observation`` metrics — the
    decode runs exactly once, inside the write.  The rare quarantine
    paths (decode errors / stale files) re-scan the batch instead of
    keeping it persisted: the happy path owes them nothing.
    Semantics are pinned identical to the grouped path in
    ``tests/test_ingest.py`` (same manifest commit shape, same
    watermark/counter math, exactly-once replay skip)."""
    import shutil

    from pyspark.sql import Observation

    is_err = F.col("source") == DECODE_ERROR_SOURCE
    good = (~is_err).cast("long")
    # contract guard (round-13 ADVICE): a scoped stream must only see
    # its own container's rows — a mis-scoped spool dir would silently
    # corrupt ANOTHER container's high_water/last_file here, so count
    # foreign rows in the same ride-along and fall back to the grouped
    # per-container path when any appear.
    foreign = (F.col("container_id") != F.lit(cid)).cast("long")
    if track_stale:
        live = not_stale.cast("long")
        aggs = [
            F.max(F.when(not_stale, F.col("path"))).alias("f"),
            F.sum(live - good * live).alias("e"),
            F.sum(good * live).alias("n"),
            F.sum(1 - live).alias("st"),
            F.sum(foreign).alias("x"),
        ]
    else:
        aggs = [
            F.max("path").alias("f"),
            F.sum(1 - good).alias("e"),
            F.sum(good).alias("n"),
            F.sum(F.lit(0)).alias("st"),
            F.sum(foreign).alias("x"),
        ]
    obs = Observation()
    observed = batch_df.observe(obs, *aggs)
    live_df = observed.filter(not_stale) if track_stale else observed
    staging = table.new_staging_dir()
    _staged_parquet_write(assign_seq(live_df, st["high_water"]),
                          staging, max_records_per_file)
    row = _obs_or_agg(obs, batch_df, aggs)
    if int(row["x"] or 0):
        # foreign-container rows: the single-container contract is
        # broken — discard this attempt's staging and recompute with
        # exact per-container stats (correct, just two jobs)
        shutil.rmtree(staging, ignore_errors=True)
        return _write_batch_grouped(
            batch_df, table, st, state_dir, scope, batch_id,
            max_records_per_file, on_stale, track_stale, not_stale)
    top_file = row["f"]
    n_errors = int(row["e"] or 0)
    n_rows = int(row["n"] or 0)
    n_stale = int(row["st"] or 0)
    if top_file is None and not (n_rows or n_errors or n_stale):
        # empty batch: mirror the grouped path's early return — no
        # commit, no batch-id consumption, no orphan staging dir
        shutil.rmtree(staging, ignore_errors=True)
        return {"rows": 0, "decode_errors": 0, "batch_id": batch_id}
    if n_stale and on_stale == "quarantine":
        _quarantine_write(
            batch_df.filter(F.col("__stale"))
            .select("path", "container_id", "frame_no", "source",
                    "time_nano", "line"),
            str(Path(state_dir) / "out_of_order"), n_stale,
            "out-of-order")
    if n_errors:
        _quarantine_write(
            batch_df.filter((F.col("source") == DECODE_ERROR_SOURCE)
                            & not_stale)
            .select("path", "container_id", "line"),
            str(Path(state_dir) / "decode_errors"), n_errors,
            "decode-error")
    new_files = table.adopt_staged(staging)
    increments = {cid: n_rows} if n_rows else {}
    top_files = {cid: top_file} if top_file is not None else {}
    committed = table.commit_append(new_files, scope, batch_id,
                                    increments, top_files)
    if committed is None:  # concurrent replay won the commit
        return {"skipped_replay": True, "batch_id": batch_id}
    return {
        "rows": int(n_rows),
        "decode_errors": int(n_errors),
        "out_of_order_rows": int(n_stale) if on_stale == "quarantine" else 0,
        "batch_id": batch_id,
        "high_water": dict(committed["high_water"]),
        "new_files": new_files,
    }


def _quarantine_write(df: DataFrame, outdir: str, expected: int,
                      what: str) -> None:
    """Divergence-guarded quarantine append (round-14 soak finding).

    The quarantine is a RE-SCAN of the batch source, and a
    re-execution can legitimately see different data than the write
    job's first pass did: the soak caught a pull whose first execution
    misread a fresh spool file into an error sentinel while the
    quarantine re-scan read it clean — the sentinel vanished from the
    quarantine and the row was silently lost under an advanced
    watermark.  An ``Observation`` rides this write and the row count
    must equal what the FIRST execution counted; a mismatch aborts the
    whole commit (nothing consumed, no watermark moves), so the next
    pull re-reads the file — which, in the misread direction, is
    exactly what saves the row.  The rows land in a temp subdir and
    move in only on a matching count, so an aborted attempt never
    pollutes the quarantine (out_of_order rows are re-ingestable; a
    duplicate there would mislead).  Collecting the rows through the
    observation instead would be exact-by-construction but unbounded
    driver memory under a corrupt-flood (one error row per garbage
    jsonl line); this stays distributed and O(1) on the driver."""
    import shutil
    import uuid

    from pyspark.sql import Observation

    tmp = os.path.join(outdir, f"_inflight-{uuid.uuid4().hex}")
    obs = Observation()
    cnt = [F.count(F.lit(1)).alias("n")]
    (df.observe(obs, *cnt).write.mode("overwrite").parquet(tmp))
    got = int(_obs_or_agg(obs, df, cnt)["n"] or 0)
    if got != expected:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"{what} quarantine re-scan saw {got} rows but the write "
            f"job counted {expected} — the source read diverged "
            "between executions; aborting the commit so nothing is "
            "consumed and the next pull re-reads the files")
    for name in os.listdir(tmp):
        if name.endswith(".parquet"):
            os.rename(os.path.join(tmp, name),
                      os.path.join(outdir, f"{uuid.uuid4().hex}-{name}"))
    shutil.rmtree(tmp, ignore_errors=True)


def _write_batch_listed(batch_df: DataFrame, table: ManifestTable,
                        st: dict, state_dir: str, scope: str,
                        batch_id: int | None,
                        max_records_per_file: int, on_stale: str,
                        listing: list[str], last_file: dict[str, str],
                        track_stale, not_stale) -> dict:
    """ONE-JOB commit for a multi-container BATCH pull (round 13).

    The grouped path's per-container stats job existed to learn three
    things the commit needs; with the driver's own spool listing in
    hand, none of them needs a Spark aggregation:

    - per-container FILE WATERMARK: the max live (non-stale, nonempty)
      listed path per container — pure driver arithmetic (a nonempty
      spool file always decodes to >= 1 row, counting the error
      sentinel, so this matches the grouped path's max-over-rows);
    - per-container ROW COUNTS (seq increments): the staged parquet
      FOOTERS, read driver-side after the write — exact by
      construction (they count precisely the rows the commit
      publishes, immune to task-retry double counting);
    - global error/stale counts: ``Observation`` metrics riding the
      write job.  The rare quarantine writes re-scan the batch, but
      each re-scan is count-verified against the first execution and
      any divergence aborts the commit (see ``_quarantine_write`` —
      the round-14 soak caught executions of the same pull reading
      different bytes from a fresh spool file).

    Net: decode → seq → write → commit is one Spark job with no
    batch-sized cache; at cluster scale that removes a full
    batch-size persist and a scheduling round-trip per pull.
    """
    from pyspark.sql import Observation

    is_err = F.col("source") == DECODE_ERROR_SOURCE
    good = (~is_err).cast("long")
    # the paths_seen set is O(files-per-batch) on the driver; bounded
    # by construction because every caller hands a listing capped at
    # ``max_files_per_pull`` entries (ingest_spool_once chunks any
    # larger backlog into sequential commits) — VERDICT r14 #5
    if track_stale:
        live = not_stale.cast("long")
        aggs = [F.sum(live - good * live).alias("e"),
                F.sum(1 - live).alias("st"),
                F.sum(good * live).alias("n"),
                F.collect_set("path").alias("paths_seen")]
    else:
        aggs = [F.sum(1 - good).alias("e"),
                F.sum(F.lit(0)).alias("st"),
                F.sum(good).alias("n"),
                F.collect_set("path").alias("paths_seen")]
    obs = Observation()
    observed = batch_df.observe(obs, *aggs)
    live_df = observed.filter(not_stale) if track_stale else observed
    staging = table.new_staging_dir()
    _staged_parquet_write(assign_seq(live_df, st["high_water"]),
                          staging, max_records_per_file)
    row = _obs_or_agg(obs, batch_df, aggs)
    n_errors = int(row["e"] or 0)
    n_stale = int(row["st"] or 0)
    # READ-COVERAGE GUARD (round 14, soak finding): this path derives
    # the file watermark from the driver's own LISTING — which is only
    # sound if the Spark read actually covered every listed file.  A
    # nonempty spool file always decodes to >= 1 row (error sentinel
    # included), so a listed nonempty file absent from the rows' path
    # set means the read dropped it: advancing the watermark would
    # turn that into SILENT PERMANENT loss (observed once under the
    # kill soak: watermark past 2.5 files whose rows never committed).
    # Abort loudly instead — staging is unreferenced, nothing is
    # consumed, and the next pull retries the same files.
    seen = set(row["paths_seen"] or [])
    uncovered = [p for p in listing if p not in seen
                 and os.path.exists(p) and os.path.getsize(p) > 0
                 and not _is_blank_spool_file(p)]
    if uncovered:
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            "listed spool files missing from the batch read "
            f"({len(uncovered)}/{len(listing)}): {uncovered[:5]} — "
            "aborting the commit so no watermark advances past "
            "unread data; the next pull retries them")
    if n_stale and on_stale == "quarantine":
        _quarantine_write(
            batch_df.filter(F.col("__stale"))
            .select("path", "container_id", "frame_no", "source",
                    "time_nano", "line"),
            str(Path(state_dir) / "out_of_order"), n_stale,
            "out-of-order")
    if n_errors:
        _quarantine_write(
            batch_df.filter((F.col("source") == DECODE_ERROR_SOURCE)
                            & not_stale)
            .select("path", "container_id", "line"),
            str(Path(state_dir) / "decode_errors"), n_errors,
            "decode-error")
    new_files = table.adopt_staged(staging)
    from logsqlite_spark.table import unescape_partition_value

    increments: dict[str, int] = {}
    for f in new_files:
        # staged dirs carry Spark's Hive-escaped cid (':' -> %3A …);
        # watermark keys must be the RAW cid assign_seq looks up
        cid = unescape_partition_value(f.split("/", 1)[0].split("=", 1)[1])
        n = _parquet_num_rows(str(table.dir / f))
        increments[cid] = increments.get(cid, 0) + n
    increments = {c: n for c, n in increments.items() if n}
    n_rows = sum(increments.values())
    # WRITE-COVERAGE GUARD (same soak finding, other side): the seq
    # increments come from the staged parquet footers; if the write
    # persisted fewer rows than the read produced, committing would
    # lose the difference silently.
    if n_rows != int(row["n"] or 0):
        # files are already adopted but UNREFERENCED (no commit) —
        # gc reclaims them; nothing is consumed, the next pull retries
        raise RuntimeError(
            f"staged parquet rows ({n_rows}) != rows read "
            f"({int(row['n'] or 0)}) — aborting the commit")
    top_files: dict[str, str] = {}
    for p in listing:
        cid = os.path.basename(os.path.dirname(p))
        if track_stale:
            lf = last_file.get(cid)
            if lf is not None and p <= lf:
                continue  # stale file: never advances the watermark
        try:
            if os.path.getsize(p) == 0:
                continue  # zero rows decoded: grouped path wouldn't see it
        except OSError:
            continue
        if cid not in top_files or p > top_files[cid]:
            top_files[cid] = p
    if not (n_rows or n_errors or n_stale):
        return {"rows": 0, "decode_errors": 0, "batch_id": batch_id}
    committed = table.commit_append(new_files, scope, batch_id,
                                    increments, top_files)
    if committed is None:  # concurrent replay won the commit
        return {"skipped_replay": True, "batch_id": batch_id}
    return {
        "rows": int(n_rows),
        "decode_errors": int(n_errors),
        "out_of_order_rows": int(n_stale) if on_stale == "quarantine" else 0,
        "batch_id": batch_id,
        "high_water": dict(committed["high_water"]),
        "new_files": new_files,
    }


def _parquet_num_rows(path: str) -> int:
    """Footer-only row count (no column data read)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _is_blank_spool_file(path: str) -> bool:
    """True iff the file's decoded content is whitespace-only.

    The read-coverage guard's premise — "a listed nonempty file always
    decodes to >= 1 row" — has exactly one counterexample: a .jsonl(.gz)
    file containing only blank lines, which Spark's json reader (and the
    gz split path) skips entirely (round-15 ADVICE: the repo's own
    ``JsonlSpoolWriter.write_burst([])`` produces such a 1-byte file,
    and one of them permanently blocked every multi-container pull).
    Such a file carries zero rows by design, so treat it as covered.
    Only called for the rare listed-but-unseen candidates, driver-side;
    an unreadable/corrupt-gz file returns False (a corrupt gz always
    yields a decode-error sentinel row, so it is in the seen set and
    never reaches this check)."""
    import gzip

    try:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            while True:
                chunk = fh.read(1 << 16)
                if not chunk:
                    return True
                if chunk.translate(None, b" \t\r\n\f\v"):
                    return False
    except OSError:
        return False


def ingest_spool_once(spark: SparkSession, spool_dir: str, logs_dir: str,
                      state_dir: str, container_id: str | None = None,
                      max_records_per_file: int = 1_000_000,
                      consume: bool = True, fmt: str = "plog",
                      max_files_per_pull: int = 4096) -> dict:
    """Batch ingest: drain what's in the spool now (one 'transaction').

    ``consume=True`` removes processed spool files afterwards — FIFO
    semantics; batch mode's equivalent of the stream checkpoint.
    ``fmt``: 'plog' (length-prefixed protobuf) or 'jsonl' (JVM-native
    decode — the faster path when the shipper can emit JSON lines).

    ``max_files_per_pull`` (VERDICT r14 #5): a backlogged spool (a
    shipper that ran for days while the engine was down) is drained as
    a SEQUENCE of bounded exactly-once commits instead of one monster
    batch.  Each chunk commits and (with ``consume``) deletes its
    files before the next starts, so a crash mid-backlog loses no
    progress, and every driver-side per-file structure — the listing
    itself, the read-coverage guard's ``collect_set(path)``
    observation, the staged-footer walk, the consume loop — is hard-
    bounded at ``max_files_per_pull`` entries regardless of backlog
    size.  Files sort per-container within the global listing, so
    chunk boundaries preserve per-container arrival order and the
    watermark advances monotonically across chunks.
    """
    # List the spool on the driver (the spool is posix-visible by
    # nature — it's where the FIFO tailer writes) and hand the exact
    # file list to Spark. One listing serves three jobs: the
    # empty-spool fast path (no Py4J PATH_NOT_FOUND stack spew), the
    # read itself, and the post-commit consume deletion — files landing
    # mid-ingest are simply left for the next pull, never deleted
    # unread.
    import glob as _glob

    ext = "jsonl" if fmt == "jsonl" else "plog"
    # *.{ext}* also lists rotated-shipper .gz files; in-flight tmp
    # files are dot-prefixed and never match
    files = sorted(_glob.glob(f"{spool_dir}/{container_id or '*'}/*.{ext}*"))
    if not files:
        return {"rows": 0}
    # many-container pulls: stat the explicit path list on the DRIVER
    # (session.py sets this too; re-assert for harness-built sessions —
    # past 32 paths the default spins up a distributed listing job
    # whose scheduling dwarfs 100 local stat calls)
    spark.conf.set(
        "spark.sql.sources.parallelPartitionDiscovery.threshold", "10000")

    def one_chunk(chunk: list[str]) -> dict:
        if fmt == "jsonl":
            from logsqlite_spark.sources.jsonl import read_jsonl_spool_batch

            decoded = read_jsonl_spool_batch(spark, spool_dir, container_id,
                                             paths=chunk)
        else:
            decoded = read_spool_batch(spark, spool_dir, container_id,
                                       paths=chunk)
        # consume=True deletes what it reads, so a stale-named file
        # later is a real monotonicity violation -> quarantine it.
        # consume=False re-reads consumed files by design -> silently
        # drop the replays.
        res = _write_batch(decoded, logs_dir, state_dir, "__pull__", None,
                           max_records_per_file,
                           on_stale="quarantine" if consume else "drop",
                           single_container=container_id,
                           listing=chunk if container_id is None else None)
        if consume:
            for fp in chunk:
                if os.path.exists(fp):
                    os.remove(fp)
        return res

    if len(files) <= max_files_per_pull:
        return one_chunk(files)
    # Chunked merge is a SUPERSET of the single-chunk dict (ADVICE
    # r15): counters sum, dict/list payloads merge/extend, booleans
    # OR (e.g. a replay-skipped chunk still surfaces as
    # skipped_replay=True), and batch_id carries the LAST chunk's
    # value instead of a hardcoded None — so callers see the same
    # shape whether the backlog fit in one commit or thirty.
    total: dict = {"rows": 0, "decode_errors": 0, "out_of_order_rows": 0,
                   "batch_id": None, "high_water": {}, "new_files": [],
                   "chunks": 0}
    for i in range(0, len(files), max_files_per_pull):
        res = one_chunk(files[i:i + max_files_per_pull])
        total["chunks"] += 1
        for k, v in res.items():
            if k == "batch_id":
                total[k] = v
            elif isinstance(v, dict):
                merged = dict(total.get(k) or {})
                merged.update(v)
                total[k] = merged
            elif isinstance(v, list):
                total[k] = list(total.get(k) or []) + v
            elif isinstance(v, bool):
                total[k] = bool(total.get(k, False)) or v
            elif isinstance(v, (int, float)):
                total[k] = total.get(k, 0) + v
            else:
                total[k] = v
    return total

def start_ingest_stream(
    spark: SparkSession,
    spool_dir: str,
    logs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    conf: LogConfig | None = None,
    query_name: str = "logsqlite-ingest",
    fmt: str = "plog",
    container_id: str | None = None,
    on_batch_result=None,
):
    """S4/S5: the continuous ingest StreamingQuery.

    Default is ONE multiplexed stream for all containers (SURVEY §7.5);
    ``container_id`` scopes the stream to that container's spool subdir
    for per-container queries (one writer per container, like the
    reference's one logger per FIFO — concurrent scoped streams commit
    disjoint containers through the manifest lock, so they can't lose
    each other's updates). The stream's ``query_name`` is its batch-id
    scope in the manifest; give concurrent streams distinct names.

    LogConfig mapping (config.rs:175-177 -> Spark):
    - message_read_timeout  -> trigger processingTime (burst window)
    - max_size_per_tx       -> maxBytesPerTrigger (batch size cap)
    - commit visibility     -> micro-batch commit (free)
    """
    conf = conf or LogConfig()
    if fmt == "jsonl":
        from logsqlite_spark.sources.jsonl import read_jsonl_spool_stream

        decoded = read_jsonl_spool_stream(
            spark, spool_dir, max_bytes_per_trigger=conf.max_size_per_tx,
            container_id=container_id)
    else:
        decoded = read_spool_stream(spark, spool_dir,
                                    max_bytes_per_trigger=conf.max_size_per_tx,
                                    container_id=container_id)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        res = _write_batch(batch_df, logs_dir, state_dir, query_name,
                           batch_id,
                           max_records_per_file=max(conf.max_lines_per_tx, 1),
                           single_container=container_id)
        # Observed AFTER the manifest commit, so a policy hook (e.g.
        # T4 restart-on-decode-error) never sees an uncommitted batch.
        if on_batch_result is not None:
            on_batch_result(res)

    trigger_ms = max(conf.message_read_timeout_ms, 100)
    return (
        decoded.writeStream.foreachBatch(on_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_ms} milliseconds")
        .start()
    )

def ingest_throughput(query) -> float | None:
    """S7: lines/s of the last committed micro-batch (logger.rs:187-196
    logged the same per transaction)."""
    p = query.lastProgress
    if not p:
        return None
    return p.get("processedRowsPerSecond") if isinstance(p, dict) else None
