"""Generic streaming twin for APPEND-ONLY corpus-side artifacts
(round 9) — and the winnow / semantic-dedup sinks built on it.

Two kinds of incremental state live in this engine:

* **aggregate snapshots** (the (gram, df) partials): small, merged by
  re-aggregation — versioned immutable snapshots
  (``streaming/partials.py``);
* **append-only row artifacts** (winnow fingerprints, cluster
  assignments, IVF lists): corpus-sized, grown by appending each
  batch's own rows — rewriting a version per batch would cost
  O(corpus) per batch, so the artifact is ONE parquet dir plus a
  batch-id pointer, exactly the ``streaming/ann.py`` protocol.

``append_artifact_sink`` is that protocol, generalized: per
micro-batch it (1) skips crash-replayed batch_ids (foreachBatch is
at-least-once; the rows are append-only, so skipping the replay IS
exactly-once), (2) optionally emits the batch's incremental query
output against the PRE-batch artifact to a side output, then (3)
appends ``transform(batch)`` to the artifact and flips the pointer.
A crash between append and pointer-flip replays the batch and
re-appends — the pointer write therefore happens LAST only after the
emit, and the append is made idempotent by the batch_id guard at the
top (the same ordering argument as the IVF sink).

The winnow and semantic wrappers make the two remaining incremental
operators (``winnow_matches_incremental``,
``semantic_dedup_incremental``) end-to-end streaming citizens, like
substring dedup (partials) and the IVF index (ann) already are.
"""

from __future__ import annotations

import json
import os
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame

_STATE = "_APPEND_STATE.json"


def _local_root(root: str) -> str:
    parsed = urlparse(root)
    if parsed.scheme in ("", "file") and not parsed.netloc:
        return parsed.path or root
    raise ValueError(
        f"append-artifact sink needs an atomic-rename local state dir "
        f"for its batch pointer; got {root!r}")


def last_appended_batch(state_dir: str) -> int | None:
    try:
        with open(os.path.join(_local_root(state_dir), _STATE)) as fh:
            return int(json.load(fh)["batch_id"])
    except FileNotFoundError:
        return None


def _write_state(state_dir: str, batch_id: int) -> None:
    root = _local_root(state_dir)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, _STATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(root, _STATE))


def _committed_paths(root: str, last: int) -> list[str]:
    """Readable paths of an append-only artifact/emit dir: COMMITTED
    per-batch subdirs (``b<i>`` with ``i <= last``) plus any legacy
    flat files (pre-round-13 appends / compaction output — flat means
    a completed staged swap, so always committed).  A higher-numbered
    partial subdir from a crashed attempt is excluded — the same
    silent-data-loss guard as :func:`banded_state_rows`."""
    out = []
    for name in os.listdir(root):
        if name.startswith("b") and name[1:].isdigit():
            if int(name[1:]) <= last:
                out.append(os.path.join(root, name))
        elif not name.startswith(("_", ".")):
            out.append(os.path.join(root, name))
    return out


def _artifact_paths(state_dir: str, sub: str, last: int) -> list[str]:
    return _committed_paths(os.path.join(_local_root(state_dir), sub), last)


def artifact_rows(spark, state_dir: str) -> DataFrame | None:
    """The accumulated COMMITTED artifact, or None before the first
    batch.  Reads only batch subdirs at or below the pointer, so a
    crash-replayed batch never sees its own crashed attempt's rows as
    history."""
    last = last_appended_batch(state_dir)
    if last is None:
        return None
    paths = _artifact_paths(state_dir, "data", last)
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(*paths))


def emitted_rows(spark, state_dir: str, emit_dir: str) -> DataFrame | None:
    """Every COMMITTED incremental emit of an artifact sink, or None
    before the first batch.  Emit subdirs commit together with their
    state subdir (both written before the pointer advances), so the
    same ``b<i> <= pointer`` filter as :func:`artifact_rows` keeps a
    crashed attempt's partial emit invisible to consumers."""
    last = last_appended_batch(state_dir)
    if last is None:
        return None
    # a committed batch pointer with no emit dir (sink run without an
    # emit fn, or a wrong path) is "nothing emitted", not an OSError
    if not os.path.isdir(emit_dir):
        return None
    paths = _committed_paths(emit_dir, last)
    if not paths:
        return None
    return (spark.read.option("recursiveFileLookup", "true")
            .parquet(*paths))


def append_artifact_sink(
    state_dir: str,
    transform: Callable[[DataFrame], DataFrame],
    emit: Callable[[DataFrame, DataFrame | None], DataFrame] | None = None,
    emit_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body (a plain callable so batch tests
    drive it directly).

    ``transform(batch)`` → the batch's artifact rows, written to a
    per-batch subdir ``data/b<batch_id>`` with mode OVERWRITE;
    ``emit(batch, history_or_None)`` → the batch's incremental output
    against the PRE-batch artifact, written to ``emit_dir/b<batch_id>``
    the same way.  Per-batch-keyed overwrites (round 13, the
    ``components_sink`` idiom) make a crash at ANY point exactly-once:
    a replay rewrites its own subdirs instead of appending duplicates,
    and :func:`artifact_rows` filters history to COMMITTED subdirs so
    the replay never reads its crashed attempt's rows as history.
    """
    _local_root(state_dir)  # fail fast on a non-local root
    if (emit is None) != (emit_dir is None):
        raise ValueError("emit and emit_dir must be given together")

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        last = last_appended_batch(state_dir)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already applied
        history = artifact_rows(spark, state_dir)
        if emit is not None:
            emit(batch_df, history).write.mode("overwrite").parquet(
                os.path.join(emit_dir, f"b{batch_id}"))
        transform(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, "data", f"b{batch_id}"))
        _write_state(state_dir, batch_id)

    return on_batch


def winnow_sink(state_dir: str, emit_dir: str | None = None,
                min_shared: int = 8, max_doc_freq: int = 64,
                ) -> Callable[[DataFrame, int], None]:
    """Streaming winnow dedup: the artifact is the corpus (doc_id, fp)
    table; each batch optionally emits its near-dup matches against
    everything ingested before it."""
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_matches_incremental,
    )

    def _emit(batch: DataFrame, history: DataFrame | None) -> DataFrame:
        hist = history if history is not None else \
            batch.sparkSession.createDataFrame([], "doc_id long, fp long")
        return winnow_matches_incremental(
            batch, hist, min_shared=min_shared,
            max_doc_freq=max_doc_freq)

    return append_artifact_sink(
        state_dir, winnow_fingerprints,
        emit=_emit if emit_dir is not None else None,
        emit_dir=emit_dir)


def minhash_sink(state_dir: str, emit_dir: str | None = None,
                 band_size: int = 4,
                 max_band_freq: int | None = None,
                 ) -> Callable[[DataFrame, int], None]:
    """Streaming MinHash-LSH dedup: the artifact is the corpus
    (doc_id, band, key) banded-signature table; each batch optionally
    emits its candidate pairs against everything ingested before it."""
    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs_incremental,
        minhash_bands,
    )

    def _transform(batch: DataFrame) -> DataFrame:
        return minhash_bands(batch, band_size)

    def _emit(batch: DataFrame, history: DataFrame | None) -> DataFrame:
        hist = history if history is not None else \
            batch.sparkSession.createDataFrame(
                [], "doc_id long, band int, key string")
        return minhash_band_pairs_incremental(
            batch, hist, band_size=band_size,
            max_band_freq=max_band_freq)

    return append_artifact_sink(
        state_dir, _transform,
        emit=_emit if emit_dir is not None else None,
        emit_dir=emit_dir)


def simhash_sink(state_dir: str, emit_dir: str | None = None,
                 n_bits: int = 60) -> Callable[[DataFrame, int], None]:
    """Streaming SimHash dedup (the deployment groups path): the
    artifact is the corpus (doc_id, simhash) table; each batch
    optionally emits its docs' cluster assignment over everything
    ingested up to and including it."""
    from logsqlite_spark.operators.dedup import (
        simhash_dedup,
        simhash_groups_incremental,
    )

    def _transform(batch: DataFrame) -> DataFrame:
        return simhash_dedup(batch, n_bits=n_bits)

    def _emit(batch: DataFrame, history: DataFrame | None) -> DataFrame:
        hist = history if history is not None else \
            batch.sparkSession.createDataFrame(
                [], "doc_id long, simhash long")
        return simhash_groups_incremental(batch, hist, n_bits=n_bits)

    return append_artifact_sink(
        state_dir, _transform,
        emit=_emit if emit_dir is not None else None,
        emit_dir=emit_dir)


def _committed_subdirs(state_dir: str, sub: str, last: int) -> list[str]:
    """Per-batch subdirs ``b<i>`` with ``i <= last`` — a crashed
    attempt may have written ``b<last+1>`` before dying short of the
    pointer flip; its replay must NOT see that partial dir as
    history (it would self-match every doc in the batch and emit an
    empty kept set — silent data loss)."""
    root = os.path.join(_local_root(state_dir), sub)
    out = []
    for name in os.listdir(root):
        if name.startswith("b") and name[1:].isdigit() \
                and int(name[1:]) <= last:
            out.append(os.path.join(root, name))
    return out


def banded_state_rows(spark, state_dir: str):
    """The banded-dedup sink's two state tables — corpus ``(doc_id,
    band, key)`` bands and ``(doc_id, h)`` digests — or ``(None,
    None)`` pre-bootstrap.  Reads only COMMITTED per-batch subdirs
    (``b<i>`` with ``i <= last_appended_batch``) so a crash-replayed
    batch never reads its own crashed attempt's rows as history."""
    last = last_appended_batch(state_dir)
    if last is None:
        return None, None
    rd = (spark.read.option("recursiveFileLookup", "true").parquet)
    return (rd(*_committed_subdirs(state_dir, "bands", last)),
            rd(*_committed_subdirs(state_dir, "digests", last)))


def banded_dedup_sink(state_dir: str,
                      docs_table: Callable[[], DataFrame],
                      emit_dir: str,
                      threshold: float = 0.6,
                      band_size: int = 4,
                      max_band_freq: int | None = None,
                      ) -> Callable[[DataFrame, int], None]:
    """Streaming twin of ``incremental_dedup_banded`` (round 12) —
    the deployment near-dedup as a document sink: per micro-batch the
    KEPT survivors (exact-md5 + banded-candidate exact-Jaccard
    confirm against everything ingested before) land in ``emit_dir``,
    and the FULL batch's bands + digests append to the state (dropped
    docs still partner later arrivals, exactly the batch operator's
    earlier-id rule — so sequential emits reproduce the batch API
    applied cumulatively, pytest-pinned).

    ``docs_table`` re-reads the at-rest corpus (the ingest sink's own
    output table) — the confirm stage fetches candidate partner TEXTS
    from it by id-pruned lookup; state itself stays 3 columns/doc.
    Per-batch-keyed subdirs make crash replays rewrite instead of
    duplicate (the ``components_sink`` idiom).
    """
    from logsqlite_spark.operators.dedup import (
        incremental_dedup_banded,
        minhash_bands,
    )

    _local_root(state_dir)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        last = last_appended_batch(state_dir)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already applied
        bands, digests = banded_state_rows(spark, state_dir)
        if bands is None:
            bands = spark.createDataFrame(
                [], "doc_id long, band int, key string")
            digests = spark.createDataFrame([], "doc_id long, h string")
        kept = incremental_dedup_banded(
            batch_df, docs_table(), threshold=threshold,
            band_size=band_size, history_bands=bands,
            history_digests=digests, max_band_freq=max_band_freq)
        kept.write.mode("overwrite").parquet(
            os.path.join(emit_dir, f"b{batch_id}"))
        minhash_bands(batch_df, band_size).write.mode("overwrite") \
            .parquet(os.path.join(state_dir, "bands", f"b{batch_id}"))
        (batch_df.select(F.col("doc_id").cast("long").alias("doc_id"),
                         F.md5("text").alias("h"))
         .write.mode("overwrite")
         .parquet(os.path.join(state_dir, "digests", f"b{batch_id}")))
        _write_state(state_dir, batch_id)

    return on_batch


def semantic_sink(state_dir: str, centroids: DataFrame,
                  emit_dir: str | None = None, tau: float | None = None,
                  ) -> Callable[[DataFrame, int], None]:
    """Streaming SemDeDup: the artifact is the corpus cluster
    assignment (vec_id, cluster_id, qv, nq) against FROZEN
    ``centroids`` (fit on the bootstrap corpus; refit-on-drift is the
    IVF append playbook); each batch optionally emits its semantic
    near-dup pairs against everything ingested before it."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.clustering import (
        SEM_TAU,
        assign_clusters,
        semantic_dedup_incremental,
    )

    t = SEM_TAU if tau is None else tau
    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"

    def _transform(batch: DataFrame) -> DataFrame:
        return (assign_clusters(batch, centroids)
                .withColumn("nq", F.expr(sq))
                .select("vec_id", "cluster_id", "qv", "nq"))

    def _emit(batch: DataFrame, history: DataFrame | None) -> DataFrame:
        hist = history if history is not None else \
            batch.sparkSession.createDataFrame(
                [], "vec_id long, cluster_id int, qv array<bigint>, "
                    "nq long")
        return semantic_dedup_incremental(
            batch, None, centroids, tau=t, history_assigned=hist)

    return append_artifact_sink(
        state_dir, _transform,
        emit=_emit if emit_dir is not None else None,
        emit_dir=emit_dir)


_DSTATE = "_DEDUP_INDEX_STATE.json"


def _read_dstate(state_dir: str) -> dict | None:
    try:
        with open(os.path.join(_local_root(state_dir), _DSTATE)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_dstate(state_dir: str, st: dict) -> None:
    root = _local_root(state_dir)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, _DSTATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(st, fh)
    os.replace(tmp, os.path.join(root, _DSTATE))


def dedup_index_rows(spark, state_dir: str):
    """The accumulated streaming :class:`DedupIndex`, or None before
    the first batch."""
    from logsqlite_spark.operators.dedup import DedupIndex

    st = _read_dstate(state_dir)
    if st is None:
        return None

    def rd(sub: str) -> DataFrame:
        return (spark.read.option("recursiveFileLookup", "true")
                .parquet(os.path.join(state_dir, sub)))

    return DedupIndex(
        digests=rd("digests"), inverted=rd("inverted"),
        forward=rd("forward"), sizes=rd("sizes"),
        dfreq=spark.read.parquet(os.path.join(
            state_dir, "dfreq",
            st.get("dfreq_dir", f"v{st['batch_id']}"))),
        stats=spark.createDataFrame([(st["n_docs"],)], "n_docs long"),
    )


def dedup_index_sink(state_dir: str, emit_dir: str | None = None,
                     threshold: float = 0.6, n: int = 5,
                     max_df_frac: float = 0.5,
                     ) -> Callable[[DataFrame, int], None]:
    """Streaming exact+jaccard dedup over the persisted
    :class:`DedupIndex` — the combined protocol the index needs: its
    per-doc tables (digests / inverted / forward / sizes) grow
    append-only, while ``dfreq`` is a re-merged aggregate snapshot
    (the partials idiom) and ``n_docs`` rides the state pointer.

    Per batch: dedup the batch against the PRE-batch index
    (``incremental_dedup_indexed``), emit the survivors, index THEM
    (dropped docs never enter the corpus — the production ingest
    shape), merge the dfreq snapshot, and flip the pointer last.

    Exactly-once is stronger here than in ``append_artifact_sink``:
    every write is a per-batch-keyed subdir (``<table>/b{batch_id}``,
    ``dfreq/v{batch_id}``, ``emits/b{batch_id}``) written with
    overwrite, so a crash-replayed batch REWRITES its own subdirs
    byte-identically instead of appending duplicates — there is no
    append-before-pointer window at all.  Readers list the table root
    recursively (``dedup_index_rows``).
    """
    from logsqlite_spark.operators.dedup import (
        DedupIndex,
        dedup_index_tables,
        incremental_dedup_indexed,
    )

    _local_root(state_dir)  # fail fast on a non-local root

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        st = _read_dstate(state_dir)
        if st is not None and batch_id <= st["batch_id"]:
            return  # crash-replayed micro-batch: already applied
        idx = dedup_index_rows(spark, state_dir)
        if idx is None:
            idx = DedupIndex(
                digests=spark.createDataFrame([], "doc_id long, h string"),
                inverted=spark.createDataFrame([], "tok string, doc_id long"),
                forward=spark.createDataFrame([], "doc_id long, tok string"),
                sizes=spark.createDataFrame([], "doc_id long, sz_total long"),
                dfreq=spark.createDataFrame([], "tok string, df long"),
                stats=spark.createDataFrame([(0,)], "n_docs long"),
            )
        kept = incremental_dedup_indexed(
            batch_df, idx, threshold=threshold, n=n,
            max_df_frac=max_df_frac).localCheckpoint(eager=True)
        if emit_dir is not None:
            kept.write.mode("overwrite").parquet(
                os.path.join(emit_dir, f"b{batch_id}"))
        t = dedup_index_tables(kept, n)
        for name, df in (("digests", t.digests), ("inverted", t.inverted),
                         ("forward", t.forward), ("sizes", t.sizes)):
            df.write.mode("overwrite").parquet(
                os.path.join(state_dir, name, f"b{batch_id}"))
        from pyspark.sql import functions as F

        merged = t.dfreq if st is None else (
            spark.read.parquet(os.path.join(
                state_dir, "dfreq",
                st.get("dfreq_dir", f"v{st['batch_id']}")))
            .unionByName(t.dfreq)
            .groupBy("tok").agg(F.sum("df").alias("df")))
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"dfreq/v{batch_id}"))
        n_docs = (0 if st is None else st["n_docs"]) + kept.count()
        _write_dstate(state_dir, {"batch_id": batch_id, "n_docs": n_docs,
                                  "dfreq_dir": f"v{batch_id}"})

    return on_batch


def start_append_artifact_stream(stream: DataFrame, sink,
                                 checkpoint_dir: str):
    """Wire any sink from this module into a stream."""
    return (stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir).start())


def compact_artifact(spark, state_dir: str, min_files: int = 8,
                     target_records: int = 4_000_000) -> dict:
    """Maintenance for an append-only artifact: each batch appends one
    file, so a high batch cadence fragments the data dir (the same
    failure mode ``compact_ivf_lists`` handles for the IVF lists).
    Rewrites the artifact into ``target_records``-sized files via
    write-staging-then-rename, content-preserving. Run it BETWEEN
    batches (single-writer engines — this repo's shape; a concurrent
    deployment compacts to a versioned dir and swaps)."""
    import glob
    import shutil

    root = _local_root(state_dir)
    data = os.path.join(root, "data")
    last = last_appended_batch(state_dir)
    if last is None:
        return {"compacted": False, "files_before": 0, "files_after": 0}
    files = glob.glob(os.path.join(data, "**", "*.parquet"),
                      recursive=True)
    if len(files) < min_files:
        return {"compacted": False, "files_before": len(files),
                "files_after": len(files)}
    # committed rows only; the staged swap also drops any
    # higher-numbered partial subdir a crashed attempt left (safe: a
    # replay rewrites its own subdir in full)
    df = artifact_rows(spark, state_dir)
    n = df.count()
    n_out = max(1, -(-n // target_records))  # ceil
    staged = os.path.join(root, ".compact_tmp")
    shutil.rmtree(staged, ignore_errors=True)
    df.coalesce(n_out).write.mode("overwrite") \
        .option("maxRecordsPerFile", target_records).parquet(staged)
    shutil.rmtree(data)
    os.replace(staged, data)
    return {"compacted": True, "files_before": len(files),
            "files_after": n_out}


def compact_dedup_index(spark, state_dir: str, min_dirs: int = 8,
                        target_records: int = 4_000_000) -> dict:
    """Maintenance twin of :func:`compact_artifact` for the
    ``dedup_index_sink`` layout: each batch writes one ``b{id}``
    subdir per per-doc table, so a high cadence fragments all four.
    Consolidates each table into one ``b{pointer}`` subdir (the
    reader's recursive listing is layout-agnostic; keeping the
    batch-keyed naming preserves the replay contract — replays at or
    below the pointer are skipped, so the consolidated dir is never
    rewritten).  Old dfreq snapshot versions below the pointer are
    pruned too.  Run BETWEEN batches, single-writer, like
    ``compact_artifact``."""
    import glob
    import shutil

    root = _local_root(state_dir)
    st = _read_dstate(state_dir)
    if st is None:
        return {"compacted": False, "reason": "no state"}
    out: dict = {"compacted": False}
    for name in ("digests", "inverted", "forward", "sizes"):
        tdir = os.path.join(root, name)
        subs = sorted(glob.glob(os.path.join(tdir, "b*")))
        if len(subs) < min_dirs:
            continue
        df = (spark.read.option("recursiveFileLookup", "true")
              .parquet(tdir))
        n = df.count()
        n_out = max(1, -(-n // target_records))  # ceil
        staged = os.path.join(root, f".compact_{name}")
        shutil.rmtree(staged, ignore_errors=True)
        (df.coalesce(n_out).write.mode("overwrite")
         .option("maxRecordsPerFile", target_records)
         .parquet(os.path.join(staged, f"b{st['batch_id']}")))
        shutil.rmtree(tdir)
        os.replace(staged, tdir)
        out["compacted"] = True
        out[name] = {"dirs_before": len(subs), "dirs_after": 1}
    # retire superseded dfreq snapshots (the pointer names the live one)
    live = st.get("dfreq_dir", f"v{st['batch_id']}")
    dropped = 0
    for vdir in glob.glob(os.path.join(root, "dfreq", "*")):
        if os.path.basename(vdir) != live:
            shutil.rmtree(vdir, ignore_errors=True)
            dropped += 1
    out["dfreq_versions_dropped"] = dropped
    return out


_CSTATE = "_COMPONENTS_STATE.json"


def _read_cstate(state_dir: str) -> dict | None:
    try:
        with open(os.path.join(_local_root(state_dir), _CSTATE)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _flatten_relabels(rows) -> dict[int, int]:
    """Transitively resolve a relabel-delta chain: each batch's merge
    maps labels to strictly smaller ones, and a later batch may map an
    earlier batch's target further down — follow to the fixpoint."""
    raw = {int(r["old"]): int(r["new"]) for r in rows}
    flat: dict[int, int] = {}

    def resolve(x: int) -> int:
        seen = []
        while x in raw and x not in flat:
            seen.append(x)
            x = raw[x]
        final = flat.get(x, x)
        for s in seen:
            flat[s] = final
        return final

    for o in list(raw):
        resolve(o)
    return flat


def components_rows(spark, state_dir: str) -> DataFrame | None:
    """The streamed components table, resolved: the append-only
    ``assign`` base joined through the flattened relabel chain.  The
    chain is collected driver-side — it is the CUMULATIVE MERGE
    HISTORY (one row per component-merge ever), orders of magnitude
    smaller than the labels table, and :func:`compact_components`
    squashes it to zero."""
    from pyspark.sql import functions as F

    st = _read_cstate(state_dir)
    if st is None:
        return None
    assign = (spark.read.option("recursiveFileLookup", "true")
              .parquet(os.path.join(state_dir, "assign")))
    rel_dir = os.path.join(_local_root(state_dir), "relabel")
    if os.path.isdir(rel_dir) and any(
            e.is_dir() for e in os.scandir(rel_dir)):
        rows = (spark.read.option("recursiveFileLookup", "true")
                .parquet(os.path.join(state_dir, "relabel")).collect())
    else:
        rows = []
    flat = _flatten_relabels(rows)
    if not flat:
        return assign.select("doc_id", "cluster_id")
    bmap = spark.createDataFrame(
        [(o, n) for o, n in flat.items()], "old long, new long")
    return (assign.join(F.broadcast(bmap),
                        assign["cluster_id"] == bmap["old"], "left")
            .select("doc_id",
                    F.coalesce("new", "cluster_id").alias("cluster_id")))


def decisions_rows(spark, state_dir: str, docs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame | None:
    """The user-facing keep/drop verdict table served straight from
    the streamed components state: ``docs`` (the corpus id scan)
    left-joined through :func:`components_rows`, projected with the
    batch API's verdict rule — the streaming end of the
    ``dedup_decisions`` story (pairs stream in via any dedup sink →
    ``components_sink`` → verdicts here, no batch recompute ever).
    None pre-bootstrap."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import _verdict_rows

    comp = components_rows(spark, state_dir)
    if comp is None:
        return None
    return _verdict_rows(
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(comp.withColumnRenamed("doc_id", "__cd"),
              F.col("doc_id") == F.col("__cd"), "left")
        .select("doc_id", "cluster_id"))


def components_sink(state_dir: str,
                    compact_every: int | None = None
                    ) -> Callable[[DataFrame, int], None]:
    """Streaming connected components over an EDGE stream — feed it
    any dedup sink's per-batch candidate-pair emits (``a_id, b_id``
    rows) and it maintains the corpus components table incrementally.

    The corpus-sized labels table is never rewritten: per batch,
    ``cc_merge_delta`` reduces the new edges to (a) assignment rows
    for never-seen nodes, appended to the ``assign`` base, and (b) a
    tiny label-merge mapping, appended to the ``relabel`` chain.
    Readers flatten the chain (driver-side dict over the cumulative
    merge history) and apply it in one broadcast join —
    :func:`components_rows`.  Per-batch-keyed subdirs make replays
    rewrite instead of duplicate, like ``dedup_index_sink``.

    ``compact_every`` (round 12, VERDICT r11 #8): squash the relabel
    chain into the base every time that many relabel dirs accumulate
    — :func:`compact_components` runs inline after the batch commit
    (we ARE between batches inside foreachBatch: single writer by
    construction), so the driver-side relabel collect in
    :func:`components_rows` is BOUNDED at ``compact_every`` batches'
    merge history instead of growing for the stream's lifetime
    (invariant pytest-pinned).  None keeps compaction manual.
    """
    from logsqlite_spark.operators.dedup import cc_merge_delta

    _local_root(state_dir)  # fail fast on a non-local root

    def on_batch(pairs_df: DataFrame, batch_id: int) -> None:
        import glob as _glob

        from pyspark.sql import functions as F

        spark = pairs_df.sparkSession
        st = _read_cstate(state_dir)
        if st is not None and batch_id <= st["batch_id"]:
            return  # crash-replayed micro-batch: already applied
        current = components_rows(spark, state_dir)
        if current is None:
            current = spark.createDataFrame(
                [], "doc_id long, cluster_id long")
        m, new_rows = cc_merge_delta(pairs_df, current)
        new_rows.write.mode("overwrite").parquet(
            os.path.join(state_dir, "assign", f"b{batch_id}"))
        (m.filter(F.col("__old") != F.col("__new"))
         .select(F.col("__old").alias("old"), F.col("__new").alias("new"))
         .write.mode("overwrite").parquet(
             os.path.join(state_dir, "relabel", f"b{batch_id}")))
        _write_cstate(state_dir, {"batch_id": batch_id})
        if compact_every is not None:
            n_rel = len(_glob.glob(os.path.join(
                _local_root(state_dir), "relabel", "b*")))
            if n_rel >= compact_every:
                compact_components(spark, state_dir)

    return on_batch


def _write_cstate(state_dir: str, st: dict) -> None:
    root = _local_root(state_dir)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, _CSTATE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(st, fh)
    os.replace(tmp, os.path.join(root, _CSTATE))


def compact_components(spark, state_dir: str) -> dict:
    """Squash the relabel chain into the assign base: rewrite assign
    resolved (one consolidated ``b{pointer}`` subdir), clear the
    relabel dirs.  ``components_rows`` is unchanged by construction;
    run BETWEEN batches, single-writer.

    Layout (round 11): the consolidated base is range-partitioned and
    sorted on ``doc_id``, so files cover disjoint id ranges —
    ``cc_merge_delta``'s endpoint lookup pushes its ``doc_id IN``
    predicate through the relabel join into this scan, and the
    min/max footer stats prune whole files (the
    ``write_components_bucketed`` story applied to the streamed
    state; plan-pinned in test_plans)."""
    import glob
    import shutil

    root = _local_root(state_dir)
    st = _read_cstate(state_dir)
    if st is None:
        return {"compacted": False, "reason": "no state"}
    resolved = components_rows(spark, state_dir)
    staged = os.path.join(root, ".compact_assign")
    shutil.rmtree(staged, ignore_errors=True)
    (resolved.repartitionByRange(16, "doc_id")
     .sortWithinPartitions("doc_id")
     .write.mode("overwrite").parquet(
         os.path.join(staged, f"b{st['batch_id']}")))
    adir = os.path.join(root, "assign")
    shutil.rmtree(adir)
    os.replace(staged, adir)
    dropped = 0
    for d in glob.glob(os.path.join(root, "relabel", "b*")):
        shutil.rmtree(d, ignore_errors=True)
        dropped += 1
    return {"compacted": True, "relabel_dirs_dropped": dropped}


def erase_from_artifact(spark, state_dir: str, ids: list[int],
                        id_col: str = "doc_id") -> dict:
    """Retract rows from a flat append-only artifact (the
    ``winnow_sink`` / ``minhash_sink`` / ``simhash_sink`` layout) —
    per-doc rows with no cross-row aggregates, so a filter-rewrite is
    exact: the artifact becomes bit-equivalent to one built without
    those docs.  Staged swap like :func:`compact_artifact`; run
    BETWEEN batches, single-writer; amortize by batching ids.
    Historical per-batch emits are not retroactively edited (they
    were correct when emitted — the retraction applies to the corpus
    state, exactly like the dedup-index erase)."""
    import shutil

    from pyspark.sql import functions as F

    root = _local_root(state_dir)
    if last_appended_batch(state_dir) is None:
        return {"rows_erased": 0, "reason": "no state"}
    data = os.path.join(root, "data")
    from logsqlite_spark.artifacts import filter_ids

    df = artifact_rows(spark, state_dir)  # committed rows only
    rows_erased = filter_ids(df, id_col, ids, keep=True).count()
    if rows_erased == 0:
        return {"rows_erased": 0}
    staged = os.path.join(root, ".erase_tmp")
    shutil.rmtree(staged, ignore_errors=True)
    filter_ids(df, id_col, ids, keep=False).write.mode("overwrite") \
        .parquet(staged)
    shutil.rmtree(data)
    os.replace(staged, data)
    return {"rows_erased": rows_erased}


def erase_from_dedup_index(spark, state_dir: str,
                           doc_ids: list[int]) -> dict:
    """Retract documents from the streamed :class:`DedupIndex` — the
    deletion half of the index lifecycle (append via the sink, compact
    via :func:`compact_dedup_index`, erase here; a 100 TB pipeline
    honoring takedown/PII removal needs all three).

    The erased docs' text is NEVER needed: their ``(tok, df)``
    contribution comes from their own ``forward``-index rows (the df
    partials are an associative sum over disjoint doc sets, so
    subtraction is exact — the ngram-partials argument run backwards),
    and after the rewrite the index is bit-equivalent to one built
    WITHOUT those docs: a later batch identical to an erased doc
    survives dedup.

    Crash-RESUMABLE, not just restartable: the erased docs' partial is
    STAGED (with the target dfreq dir name and count) before anything
    is rewritten, so a re-run after a crash at ANY point completes the
    same erase exactly once — the partial is never recomputed from
    tables that may already be clean, per-doc rewrites are no-op
    filters when already applied, and a pointer that already names the
    staged target skips the subtraction entirely.  digests rewrite
    LAST so the resume trigger (ids still present in digests, or a
    staging marker) survives every window.  Run BETWEEN batches,
    single-writer; amortize by batching doc_ids.
    """
    import glob
    import shutil

    from pyspark.sql import functions as F

    from logsqlite_spark.artifacts import filter_ids

    root = _local_root(state_dir)
    st = _read_dstate(state_dir)
    if st is None:
        return {"erased": 0, "reason": "no state"}
    ids = [int(x) for x in doc_ids]
    stage_root = os.path.join(root, ".erase_stage")
    meta_path = os.path.join(stage_root, "meta.json")
    idx = dedup_index_rows(spark, state_dir)
    n_now = filter_ids(idx.digests, "doc_id", ids, keep=True).count()

    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if sorted(meta["ids"]) != sorted(ids):
            raise RuntimeError(
                "a different erase is staged; finish it first by "
                f"re-running with ids={meta['ids']}")
    if n_now == 0 and meta is None:
        return {"erased": 0}

    live = st.get("dfreq_dir", f"v{st['batch_id']}")
    if meta is None:
        # stage the retraction partial + target BEFORE any rewrite
        seq = len(glob.glob(os.path.join(root, "dfreq", "e*")))
        new_dir = f"e{st['batch_id']}_{seq}"
        (filter_ids(idx.forward, "doc_id", ids, keep=True)
         .groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("e"))
         .write.mode("overwrite").parquet(
             os.path.join(stage_root, "partial")))
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"ids": ids, "n_erased": n_now,
                       "target": new_dir}, fh)
        os.replace(tmp, meta_path)
        meta = {"ids": ids, "n_erased": n_now, "target": new_dir}
    new_dir = meta["target"]
    n_erased = meta["n_erased"]

    if live != new_dir:
        # subtraction not yet applied (pointer still names the old dir)
        partial = spark.read.parquet(os.path.join(stage_root, "partial"))
        new_dfreq = (idx.dfreq.join(partial, "tok", "left")
                     .select("tok",
                             (F.col("df") - F.coalesce(F.col("e"),
                                                       F.lit(0)))
                             .alias("df"))
                     .filter(F.col("df") > 0))
        new_dfreq.write.mode("overwrite").parquet(
            os.path.join(root, "dfreq", new_dir))

    # rewrite the per-doc tables without the erased docs (staged swap);
    # already-clean tables filter to themselves — no-ops on resume
    for name in ("inverted", "forward", "sizes", "digests"):
        tdir = os.path.join(root, name)
        df = filter_ids(
            spark.read.option("recursiveFileLookup", "true")
            .parquet(tdir), "doc_id", ids, keep=False)
        staged = os.path.join(root, f".erase_{name}")
        shutil.rmtree(staged, ignore_errors=True)
        df.write.mode("overwrite").parquet(
            os.path.join(staged, f"b{st['batch_id']}"))
        shutil.rmtree(tdir)
        os.replace(staged, tdir)

    if live != new_dir:
        _write_dstate(state_dir, {"batch_id": st["batch_id"],
                                  "n_docs": st["n_docs"] - n_erased,
                                  "dfreq_dir": new_dir})
        shutil.rmtree(os.path.join(root, "dfreq", live),
                      ignore_errors=True)
    shutil.rmtree(stage_root, ignore_errors=True)
    return {"erased": n_erased, "dfreq_dir": new_dir}
