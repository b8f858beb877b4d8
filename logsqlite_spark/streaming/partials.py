"""Streaming substring-dedup state — the ingest-time twin of
``operators/textstats.ngram_df_partials`` (VERDICT r8 #6).

The batch API (``repeated_ngram_stats_incremental``) assumes someone
maintains the persisted ``(gram, df)`` snapshot between batches; this
module IS that someone for a continuously-ingesting pipeline: a
``foreachBatch`` sink that

  1. computes the incoming micro-batch's own gram partials (only the
     batch is tokenized — the at-rest corpus is never re-scanned),
  2. merges them into the persisted snapshot (``sum(df)`` over
     disjoint doc sets is associative, so merge ≡ one-shot recompute
     over everything ingested — pytest-pinned),
  3. optionally emits the batch's substring-dup stats against the
     PRE-batch history, exactly what the batch-mode incremental
     operator reports.

Durability protocol: snapshots are immutable version directories
(``v00000001/``, ...) under one root, with a JSON pointer file naming
the current version and the last merged ``batch_id``.  A replayed
micro-batch (foreachBatch is at-least-once; Spark replays the last
uncommitted batch after a crash) is detected by ``batch_id <= last``
and skipped, so the merge is exactly-once.  The pointer flips via
write-temp + atomic rename AFTER the new version is fully written — a
crash mid-write leaves the old pointer serving the old, complete
snapshot.  Old versions are GC'd (keep 2: current + the one a
concurrent reader may still hold open).

At 100 TB: the snapshot is a pre-aggregated (gram, df) table —
orders of magnitude smaller than the corpus — and each merge costs
one batch tokenization + one snapshot-sized columnar scan.  The
pointer file assumes a filesystem with atomic rename; local and HDFS
qualify, eventual-consistency object stores need a real metastore —
a non-local root raises loudly instead of corrupting silently
(the lesson of ADVICE r7's alert-migration item).
"""

from __future__ import annotations

import json
import math
import os
import shutil
from typing import Callable
from urllib.parse import urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logsqlite_spark.operators.textstats import (
    ngram_df_partials,
    repeated_ngram_stats_incremental,
)

_POINTER = "_SNAPSHOT.json"
_KEEP_VERSIONS = 2


def _local_root(root: str) -> str:
    parsed = urlparse(root)
    if parsed.scheme in ("", "file") and not parsed.netloc:
        return parsed.path or root
    raise ValueError(
        f"streaming ngram partials need an atomic-rename local root; "
        f"got {root!r} — mount it or add a metastore-backed pointer")


def read_pointer(snapshot_root: str) -> tuple[int | None, int | None]:
    """(current version, last merged batch_id); (None, None) if no
    snapshot has been committed yet."""
    path = os.path.join(_local_root(snapshot_root), _POINTER)
    try:
        with open(path) as fh:
            d = json.load(fh)
        return int(d["version"]), int(d["batch_id"])
    except FileNotFoundError:
        return None, None


def _write_pointer(snapshot_root: str, version: int, batch_id: int) -> None:
    root = _local_root(snapshot_root)
    tmp = os.path.join(root, _POINTER + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(root, _POINTER))


def snapshot_partials(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (gram, df) snapshot, or None pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}"))


def _gc_versions(snapshot_root: str, current: int) -> None:
    import shutil

    root = _local_root(snapshot_root)
    try:
        for name in os.listdir(root):
            if not (name.startswith("v") and name[1:].isdigit()):
                continue
            if int(name[1:]) <= current - _KEEP_VERSIONS:
                shutil.rmtree(os.path.join(root, name),
                              ignore_errors=True)
    except OSError:
        pass


def ngram_partials_sink(snapshot_root: str, n: int = 8, min_df: int = 2,
                        text_col: str = "text", id_col: str = "doc_id",
                        stats_dir: str | None = None,
                        ) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` body (returned as a plain callable so batch
    tests drive it directly): merge one micro-batch of documents into
    the persisted gram-partials snapshot, optionally appending the
    batch's dup stats vs the pre-batch history to ``stats_dir``.

    Batches must carry disjoint ``id_col`` sets (the ingest path's
    at-least-once duplicates are exactly what the batch_id replay
    guard removes; *cross-batch* doc re-sends need upstream dedup,
    e.g. ``streaming_dedup_exact``)."""
    _local_root(snapshot_root)  # fail fast on a non-local root

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        history = (None if ver is None else spark.read.parquet(
            os.path.join(snapshot_root, f"v{ver:08d}")))
        if stats_dir is not None:
            hist_or_empty = history if history is not None else \
                spark.createDataFrame([], "gram string, df long")
            repeated_ngram_stats_incremental(
                batch_df, hist_or_empty, n=n, min_df=min_df,
                text_col=text_col, id_col=id_col) \
                .write.mode("append").parquet(stats_dir)
        batch_partials = ngram_df_partials(batch_df, n=n,
                                           text_col=text_col,
                                           id_col=id_col)
        merged = batch_partials if history is None else (
            batch_partials.unionByName(history)
            .groupBy("gram")
            .agg(F.sum("df").cast("long").alias("df")))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def start_streaming_ngram_partials(stream: DataFrame, snapshot_root: str,
                                   checkpoint_dir: str, n: int = 8,
                                   min_df: int = 2,
                                   text_col: str = "text",
                                   id_col: str = "doc_id",
                                   stats_dir: str | None = None):
    """Wire the sink into a document stream: each micro-batch merges
    into the snapshot under the exactly-once pointer protocol."""
    return (
        stream.writeStream
        .foreachBatch(ngram_partials_sink(
            snapshot_root, n=n, min_df=min_df, text_col=text_col,
            id_col=id_col, stats_dir=stats_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def snapshot_lm(spark, snapshot_root: str):
    """The current persisted LM snapshot (bigrams, unigrams, vocab)
    or None pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    base = os.path.join(snapshot_root, f"v{ver:08d}")
    rd = spark.read.parquet
    return (rd(os.path.join(base, "bigrams")),
            rd(os.path.join(base, "unigrams")),
            rd(os.path.join(base, "vocab")))


def bigram_lm_sink(snapshot_root: str, text_col: str = "text",
                   scores_dir: str | None = None,
                   k_smooth: float = 1.0,
                   ) -> Callable[[DataFrame, int], None]:
    """Streaming twin of ``bigram_lm_artifact`` + incremental scoring
    (round 9): each micro-batch merges its bigram/unigram counts and
    vocabulary into the versioned LM snapshot (the same exactly-once
    pointer protocol as the gram partials — counts merge by
    associative sum, the vocab by occurrence-count sum), optionally
    appending
    the batch's union-LM scores (≡ the batch API against the
    pre-batch snapshot) to ``scores_dir``."""
    from logsqlite_spark.operators.textstats import (
        _tok,
        bigram_logprob_incremental,
    )

    _local_root(snapshot_root)  # fail fast on a non-local root

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        lm = snapshot_lm(spark, snapshot_root)
        if lm is None:
            lm = (spark.createDataFrame(
                      [], "first string, second string, b long"),
                  spark.createDataFrame([], "first string, u long"),
                  spark.createDataFrame([], "tok string, c long"))
        h_bg, h_un, h_vocab = lm
        if scores_dir is not None:
            bigram_logprob_incremental(
                batch_df, h_bg, h_un, h_vocab, k_smooth=k_smooth,
                text_col=text_col) \
                .write.mode("append").parquet(scores_dir)
        pairs = F.explode(F.expr(
            "transform(sequence(1, size(__t) - 1), "
            "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
        )).alias("p")
        base = batch_df.select(F.expr(_tok(text_col)).alias("__t"))
        dp = (base.filter(F.size("__t") >= 2).select(pairs)
              .select("p.first", "p.second"))
        m_bg = (dp.groupBy("first", "second")
                .agg(F.count(F.lit(1)).cast("long").alias("b"))
                .unionByName(h_bg)
                .groupBy("first", "second")
                .agg(F.sum("b").cast("long").alias("b")))
        m_un = (dp.groupBy("first")
                .agg(F.count(F.lit(1)).cast("long").alias("u"))
                .unionByName(h_un)
                .groupBy("first").agg(F.sum("u").cast("long").alias("u")))
        m_vocab = (base.select(F.explode("__t").alias("tok"))
                   .groupBy("tok")
                   .agg(F.count(F.lit(1)).cast("long").alias("c"))
                   .unionByName(h_vocab)
                   .groupBy("tok").agg(F.sum("c").cast("long").alias("c")))
        new_ver = 1 if ver is None else ver + 1
        out = os.path.join(snapshot_root, f"v{new_ver:08d}")
        m_bg.write.mode("overwrite").parquet(
            os.path.join(out, "bigrams"))
        m_un.write.mode("overwrite").parquet(
            os.path.join(out, "unigrams"))
        m_vocab.write.mode("overwrite").parquet(
            os.path.join(out, "vocab"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def erase_from_lm_snapshot(spark, snapshot_root: str, docs: DataFrame,
                           text_col: str = "text") -> dict:
    """Retract previously-ingested documents from the LM snapshot —
    the erase leg of the LM lifecycle (append via
    :func:`bigram_lm_sink`, compact is inherent to the re-merged
    snapshot, erase here).  All three tables are associative SUMS
    over disjoint doc sets, so the merge runs backwards: subtract the
    docs' own bigram/unigram/vocab counts, drop rows that reach zero,
    and the snapshot is value-identical to one built WITHOUT those
    docs.

    Unlike the dedup-index erase this NEEDS the retracted text (the
    snapshot keeps aggregates, not per-doc rows — the usual takedown
    request carries the document).  The contract that the docs were
    actually ingested is CHECKED, not assumed: any count that would
    go negative proves the claim false and raises before the pointer
    moves (a wrong retraction must not silently corrupt the LM).

    Crash-safety is the snapshot protocol itself: the new version is
    fully written, then the pointer flips by atomic rename — a crash
    at any point leaves the old complete version serving.  Run
    BETWEEN batches, single-writer.
    """
    from logsqlite_spark.operators.textstats import _tok

    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("erase_from_lm_snapshot: no LM snapshot at "
                         f"{snapshot_root}")
    h_bg, h_un, h_vocab = snapshot_lm(spark, snapshot_root)

    pairs = F.explode(F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
    )).alias("p")
    base = docs.select(F.expr(_tok(text_col)).alias("__t"))
    dp = (base.filter(F.size("__t") >= 2).select(pairs)
          .select("p.first", "p.second"))
    e_bg = (dp.groupBy("first", "second")
            .agg((-F.count(F.lit(1))).cast("long").alias("b")))
    e_un = (dp.groupBy("first")
            .agg((-F.count(F.lit(1))).cast("long").alias("u")))
    e_vocab = (base.select(F.explode("__t").alias("tok"))
               .groupBy("tok")
               .agg((-F.count(F.lit(1))).cast("long").alias("c")))

    m_bg = (h_bg.unionByName(e_bg).groupBy("first", "second")
            .agg(F.sum("b").cast("long").alias("b")))
    m_un = (h_un.unionByName(e_un).groupBy("first")
            .agg(F.sum("u").cast("long").alias("u")))
    m_vocab = (h_vocab.unionByName(e_vocab).groupBy("tok")
               .agg(F.sum("c").cast("long").alias("c")))

    new_ver = ver + 1
    out = os.path.join(snapshot_root, f"v{new_ver:08d}")
    m_bg.filter(F.col("b") != 0).write.mode("overwrite").parquet(
        os.path.join(out, "bigrams"))
    m_un.filter(F.col("u") != 0).write.mode("overwrite").parquet(
        os.path.join(out, "unigrams"))
    m_vocab.filter(F.col("c") != 0).write.mode("overwrite").parquet(
        os.path.join(out, "vocab"))

    # verify the ingestion contract from the STAGED tables before the
    # pointer moves: a negative survivor means the docs were not (all)
    # part of the corpus — refuse the erase, keep serving the old
    # version, and leave the staged dir for inspection
    rd = spark.read.parquet
    neg = (rd(os.path.join(out, "bigrams")).filter(F.col("b") < 0).count()
           + rd(os.path.join(out, "unigrams")).filter(F.col("u") < 0)
           .count()
           + rd(os.path.join(out, "vocab")).filter(F.col("c") < 0).count())
    if neg:
        raise ValueError(
            "erase_from_lm_snapshot: retraction would drive "
            f"{neg} count rows negative — the supplied docs were not "
            "part of the ingested corpus; snapshot unchanged")
    _write_pointer(snapshot_root, new_ver, batch_id)
    _gc_versions(snapshot_root, new_ver)
    return {"erased": True, "version": new_ver}


# ---------------------------------------------------------------------------
# PCA sufficient statistics (round 9 — the linalg tier's incremental
# state). The persisted snapshot is operators/linalg.gramian_stats_df's
# exact quantized-integer table, so merge ≡ one-shot and
# erase ≡ built-without bit-identically; only the FIT dequantizes.


def snapshot_pca_stats(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (idx, val) stats table, or None
    pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "stats"))


def _merged_pca_stats(hist: DataFrame | None, delta: DataFrame,
                      what: str) -> DataFrame:
    if hist is None:
        return delta
    # a dimension change between batches would silently union two flat
    # layouts of different widths — refuse instead
    h_n, d_n = hist.count(), delta.count()
    if h_n != d_n:
        raise ValueError(
            f"{what}: stats width changed ({h_n} -> {d_n} rows) — "
            "embedding dimension differs from the ingested corpus")
    return (hist.unionByName(delta).groupBy("idx")
            .agg(F.sum("val").cast("decimal(38,0)").alias("val")))


def pca_stats_sink(snapshot_root: str, vec_col: str = "embedding",
                   ) -> Callable[[DataFrame, int], None]:
    """Streaming twin of the PCA fit: each micro-batch's quantized
    Gramian/sum/count partials merge into the versioned snapshot under
    the exactly-once pointer protocol; ``fit_pca_from_stats`` serves a
    model from any version without ever re-scanning ingested vectors.

    At 100 TB the snapshot is d² + d + 1 rows — constant-size state —
    and each merge costs one batch scan plus a constant-size shuffle.
    """
    from logsqlite_spark.operators.linalg import gramian_stats_df

    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        merged = _merged_pca_stats(
            snapshot_pca_stats(spark, snapshot_root),
            gramian_stats_df(batch_df, vec_col), "pca_stats_sink")
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "stats"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def erase_from_pca_snapshot(spark, snapshot_root: str,
                            vectors: DataFrame,
                            vec_col: str = "embedding") -> dict:
    """Retract previously-ingested vectors from the PCA state — the
    erase leg of the linalg lifecycle. The stats are exact integer
    sums, so subtraction is bit-identical to built-without (like the
    LM counts; pytest-pinned). Needs the retracted vectors themselves
    (the snapshot keeps aggregates, not per-row state).

    The ingested-contract check is the necessary condition the state
    can express: the count and every Gramian diagonal (Σ qᵢ² per
    dimension) must stay ≥ 0 — a violation proves the vectors were
    not (all) ingested and the erase refuses before the pointer
    flips. (Off-diagonals and sums are legitimately signed, so a
    crafted false retraction passing this check remains possible —
    unlike the LM, whose every entry is a count.)
    """
    from logsqlite_spark.operators.linalg import gramian_stats_df

    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("erase_from_pca_snapshot: no snapshot at "
                         f"{snapshot_root}")
    hist = snapshot_pca_stats(spark, snapshot_root)
    delta = gramian_stats_df(vectors, vec_col) \
        .select("idx", (-F.col("val")).cast("decimal(38,0)").alias("val"))
    merged = _merged_pca_stats(hist, delta, "erase_from_pca_snapshot")
    new_ver = ver + 1
    # stage outside the version namespace, validate, THEN rename into
    # place (ADVICE r10: a rejected retraction used to leave an orphan
    # v{N+1}/ dir the pointer never references and gc skips)
    root = _local_root(snapshot_root)
    staging = os.path.join(root, ".erase_stage")
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(staging, "stats"))

    staged = spark.read.parquet(os.path.join(staging, "stats"))
    n_idx = staged.count()
    d = int((math.isqrt(4 * n_idx - 3) - 1) // 2)
    diag = [i * (d + 1) for i in range(d)] + [n_idx - 1]
    neg = staged.filter(F.col("idx").isin(diag) & (F.col("val") < 0)) \
        .count()
    if neg:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            "erase_from_pca_snapshot: retraction would drive "
            f"{neg} non-negative stats negative — the supplied vectors "
            "were not part of the ingested corpus; snapshot unchanged")
    vdir = os.path.join(root, f"v{new_ver:08d}")
    shutil.rmtree(vdir, ignore_errors=True)
    os.replace(staging, vdir)
    _write_pointer(snapshot_root, new_ver, batch_id)
    _gc_versions(snapshot_root, new_ver)
    return {"erased": True, "version": new_ver}


# ---------------------------------------------------------------------------
# PSI bin counts (round 10 — the drift monitor's incremental state).
# The persisted snapshot is operators/anomaly.psi_bin_counts' exact
# integer (event_type, cur, bin, n) table; counts merge by sum, so
# merge ≡ one-shot and erase ≡ built-without bit-identically, and
# every entry is a COUNT — the LM-grade ingested-contract check
# (no negative cell survives a legitimate retraction).


def snapshot_psi_counts(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted PSI bin-count table, or None
    pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "counts"))


def _merged_psi_counts(hist: DataFrame | None,
                       delta: DataFrame) -> DataFrame:
    if hist is None:
        return delta
    return (hist.unionByName(delta)
            .groupBy("event_type", "cur", "bin")
            .agg(F.sum("n").cast("long").alias("n")))


def psi_counts_sink(snapshot_root: str) -> Callable[[DataFrame, int], None]:
    """Streaming twin of the PSI drift monitor: each micro-batch's
    bin counts merge into the versioned snapshot under the
    exactly-once pointer protocol;
    ``anomaly.value_psi_from_counts`` serves the report from any
    version without re-scanning ingested events.

    At 100 TB the snapshot is ≤ 2·n_bins rows per event type —
    constant-size state — and each merge costs one batch scan plus a
    control-plane shuffle."""
    from logsqlite_spark.operators.anomaly import psi_bin_counts

    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        merged = _merged_psi_counts(
            snapshot_psi_counts(spark, snapshot_root),
            psi_bin_counts(batch_df))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "counts"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def erase_from_psi_snapshot(spark, snapshot_root: str,
                            events: DataFrame) -> dict:
    """Retract previously-ingested events from the PSI state. Every
    snapshot entry is a count, so the ingested contract is fully
    checkable: any cell a retraction would drive negative proves the
    events were not (all) ingested, and the erase refuses before the
    pointer flips — the strong (LM-counts) variant of the check, with
    no signed-entry caveat."""
    from logsqlite_spark.operators.anomaly import psi_bin_counts

    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("erase_from_psi_snapshot: no snapshot at "
                         f"{snapshot_root}")
    hist = snapshot_psi_counts(spark, snapshot_root)
    delta = psi_bin_counts(events).select(
        "event_type", "cur", "bin", (-F.col("n")).alias("n"))
    merged = _merged_psi_counts(hist, delta).filter(F.col("n") != 0)
    new_ver = ver + 1
    # stage → validate → rename, so a rejected retraction leaves no
    # orphan version dir (ADVICE r10; same fix as the PCA erase)
    root = _local_root(snapshot_root)
    staging = os.path.join(root, ".erase_stage")
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(staging, "counts"))
    neg = spark.read.parquet(os.path.join(staging, "counts")) \
        .filter(F.col("n") < 0).count()
    if neg:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            "erase_from_psi_snapshot: retraction would drive "
            f"{neg} bin counts negative — the supplied events were "
            "not part of the ingested corpus; snapshot unchanged")
    vdir = os.path.join(root, f"v{new_ver:08d}")
    shutil.rmtree(vdir, ignore_errors=True)
    os.replace(staging, vdir)
    _write_pointer(snapshot_root, new_ver, batch_id)
    _gc_versions(snapshot_root, new_ver)
    return {"erased": True, "version": new_ver}


def start_streaming_psi_counts(stream: DataFrame, snapshot_root: str,
                               checkpoint_dir: str):
    """Wire the PSI sink into an event stream: each micro-batch's bin
    counts merge into the snapshot under the exactly-once pointer
    protocol; `anomaly.value_psi_from_counts` serves the live drift
    report from any version."""
    return (
        stream.writeStream
        .foreachBatch(psi_counts_sink(snapshot_root))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# Lexical token counts (round 11 — X11's streaming/erase legs, closing
# the family's inc/streaming/erase symmetry with PSI/LM/PCA).  The
# persisted snapshot is operators/lexstats.lang_token_counts' exact
# integer (lang, tok, f) table; counts merge by associative sum, so
# merge ≡ one-shot and erase ≡ built-without bit-identically, and
# every entry is a COUNT — the LM-grade ingested-contract check.


def snapshot_lex_counts(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (lang, tok, f) token-count table, or
    None pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "counts"))


def _merged_lex_counts(hist: DataFrame | None,
                       delta: DataFrame) -> DataFrame:
    if hist is None:
        return delta
    return (hist.unionByName(delta)
            .groupBy("lang", "tok")
            .agg(F.sum("f").cast("long").alias("f")))


def lex_counts_sink(snapshot_root: str) -> Callable[[DataFrame, int], None]:
    """Streaming twin of the lexical monitor: each micro-batch of
    DOCUMENTS folds its (lang, tok, f) counts into the versioned
    snapshot under the exactly-once pointer protocol;
    ``lexstats.zipf_slope_from_counts`` serves the Zipf report from
    any version.  Per batch only the batch is tokenized — the at-rest
    state contributes one vocabulary-sized merge, never a corpus
    re-scan (the psi_counts_sink shape)."""
    from logsqlite_spark.operators.lexstats import lang_token_counts

    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        merged = _merged_lex_counts(
            snapshot_lex_counts(spark, snapshot_root),
            lang_token_counts(batch_df))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "counts"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def erase_from_lex_snapshot(spark, snapshot_root: str,
                            docs: DataFrame) -> dict:
    """Retract previously-ingested documents from the lexical state.
    Every snapshot entry is a count, so the ingested contract is fully
    checkable: any (lang, tok) cell a retraction would drive negative
    proves the docs were not (all) ingested, and the erase refuses
    with the snapshot unchanged — stage → validate → rename, so a
    rejected retraction leaves no orphan version dir."""
    from logsqlite_spark.operators.lexstats import lang_token_counts

    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("erase_from_lex_snapshot: no snapshot at "
                         f"{snapshot_root}")
    hist = snapshot_lex_counts(spark, snapshot_root)
    delta = lang_token_counts(docs).select(
        "lang", "tok", (-F.col("f")).alias("f"))
    merged = _merged_lex_counts(hist, delta).filter(F.col("f") != 0)
    new_ver = ver + 1
    root = _local_root(snapshot_root)
    staging = os.path.join(root, ".erase_stage")
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(staging, "counts"))
    neg = spark.read.parquet(os.path.join(staging, "counts")) \
        .filter(F.col("f") < 0).count()
    if neg:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            "erase_from_lex_snapshot: retraction would drive "
            f"{neg} token counts negative — the supplied docs were "
            "not part of the ingested corpus; snapshot unchanged")
    vdir = os.path.join(root, f"v{new_ver:08d}")
    shutil.rmtree(vdir, ignore_errors=True)
    os.replace(staging, vdir)
    _write_pointer(snapshot_root, new_ver, batch_id)
    _gc_versions(snapshot_root, new_ver)
    return {"erased": True, "version": new_ver}


def start_streaming_lex_counts(stream: DataFrame, snapshot_root: str,
                               checkpoint_dir: str):
    """Wire the lexical sink into a document stream: each
    micro-batch's token counts merge into the snapshot under the
    exactly-once pointer protocol; ``lexstats.zipf_slope_from_counts``
    serves the live Zipf report from any version."""
    return (
        stream.writeStream
        .foreachBatch(lex_counts_sink(snapshot_root))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# N-gram first-occurrence index (round 11 — the novelty monitor's
# incremental state).  The persisted snapshot is
# operators/lexstats.ngram_first_seen's (g, first_doc) table; MIN is
# associative, so merge ≡ one-shot bit-identically.  NO ERASE LEG BY
# DESIGN: a min-partial cannot retract its own minimum without the
# second-smallest occurrence, which only the corpus-sized postings
# know — retraction here means rebuild, documented rather than faked.


def snapshot_first_seen(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (g, first_doc) table, or None
    pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "first"))


def first_seen_sink(snapshot_root: str,
                    novelty_dir: str | None = None,
                    ) -> Callable[[DataFrame, int], None]:
    """Streaming twin of the novelty monitor: each micro-batch of
    DOCUMENTS merges its (g, first_doc) mins into the versioned
    snapshot under the exactly-once pointer protocol, optionally
    emitting the batch's novelty report against the PRE-batch history
    to ``novelty_dir`` (exactly what
    ``lexstats.ngram_novelty_incremental`` reports).  The SNAPSHOT is
    arrival-order-independent (min merges commute); the EMITTED
    per-batch reports concatenate into the one-shot table only when
    batches arrive in doc_id order (the ingest path's natural order —
    same contract as ``ngram_partials_sink``'s doc-disjointness).
    Per batch only the batch is tokenized."""
    from logsqlite_spark.operators.lexstats import (
        ngram_first_seen, ngram_novelty_incremental)

    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        hist = snapshot_first_seen(spark, snapshot_root)
        if novelty_dir is not None:
            h = hist if hist is not None else spark.createDataFrame(
                [], "g string, first_doc long")
            ngram_novelty_incremental(batch_df, h).write.mode(
                "append").parquet(novelty_dir)
        delta = ngram_first_seen(batch_df)
        merged = delta if hist is None else (
            hist.unionByName(delta).groupBy("g")
            .agg(F.min("first_doc").alias("first_doc")))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "first"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def rebuild_first_seen(spark, snapshot_root: str, corpus: DataFrame,
                       retract_ids=None, n: int | None = None,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> dict:
    """Erase-by-REBUILD for the min-partial family (VERDICT r11 #5 —
    closes the documented erase asymmetry): a min-partial cannot
    retract its own minimum (the second-smallest occurrence lives
    only in the corpus-sized postings), so retraction re-derives the
    ``(g, first_doc)`` snapshot from the surviving corpus.

    ``corpus`` is the at-rest document table the snapshot was built
    over; ``retract_ids`` the doc ids to exclude (None = plain
    re-derivation, e.g. after corpus compaction).  Same commit
    protocol as every snapshot leg: the new version is fully written
    and VALIDATED before the pointer flips — a crash or a failed
    validation leaves the old complete version serving.  Refusal
    semantics are N/A by construction (the rebuild never subtracts,
    so no count can go negative); validation instead pins the
    retraction's own contract: no retracted id may survive as a
    ``first_doc``.

    Cost is one corpus scan — the honest price of erasing from a
    min-partial, paid per takedown batch instead of per ingest batch
    (the sink's per-batch work stays O(batch)).
    """
    from logsqlite_spark.artifacts import filter_ids
    from logsqlite_spark.operators.lexstats import (
        NOVELTY_N, ngram_first_seen)

    if n is None:
        n = NOVELTY_N
    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("rebuild_first_seen: no snapshot at "
                         f"{snapshot_root}")
    ids = [int(x) for x in retract_ids] if retract_ids is not None else []
    survivors = filter_ids(corpus, id_col, ids, keep=False) if ids \
        else corpus
    rebuilt = ngram_first_seen(survivors, n, text_col, id_col)
    new_ver = ver + 1
    out = os.path.join(snapshot_root, f"v{new_ver:08d}", "first")
    rebuilt.write.mode("overwrite").parquet(out)
    # validate the STAGED version before the pointer moves
    staged = spark.read.parquet(out)
    if ids:
        bad = filter_ids(staged, "first_doc", ids, keep=True).count()
        if bad:
            raise AssertionError(
                f"rebuild_first_seen: {bad} retracted ids survive as "
                "first_doc in the staged rebuild — snapshot unchanged")
    n_grams = staged.count()
    _write_pointer(snapshot_root, new_ver,
                   batch_id if batch_id is not None else -1)
    _gc_versions(snapshot_root, new_ver)
    return {"rebuilt": True, "version": new_ver, "grams": int(n_grams),
            "retracted": len(ids)}


def start_streaming_first_seen(stream: DataFrame, snapshot_root: str,
                               checkpoint_dir: str,
                               novelty_dir: str | None = None):
    """Wire the first-seen sink into a document stream."""
    return (
        stream.writeStream
        .foreachBatch(first_seen_sink(snapshot_root, novelty_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# Daily event-type counts (round 11 — the burst monitor's incremental
# state).  The persisted snapshot is the (event_type, day, n) table
# behind anomaly.daily_burst_zscore; counts merge by associative sum,
# so merge ≡ one-shot and erase ≡ built-without bit-identically —
# every entry a COUNT (the LM-grade ingested contract).


def snapshot_daily_counts(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (event_type, day, n) table, or None
    pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "counts"))


def _daily_counts(events: DataFrame) -> DataFrame:
    return (events.select(
        F.col("event_type"),
        F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
        .alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n")))


def _merged_daily_counts(hist: DataFrame | None,
                         delta: DataFrame) -> DataFrame:
    if hist is None:
        return delta
    return (hist.unionByName(delta)
            .groupBy("event_type", "day")
            .agg(F.sum("n").cast("long").alias("n")))


def daily_counts_sink(snapshot_root: str) -> Callable[[DataFrame, int], None]:
    """Streaming twin of the daily burst monitor: each micro-batch of
    EVENTS folds its (event_type, day) counts into the versioned
    snapshot under the exactly-once pointer protocol;
    ``anomaly.daily_burst_from_counts`` serves the z-score report from
    any version.  State is calendar-sized (types × days), never
    event-sized."""
    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        merged = _merged_daily_counts(
            snapshot_daily_counts(spark, snapshot_root),
            _daily_counts(batch_df))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "counts"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def erase_from_daily_counts(spark, snapshot_root: str,
                            events: DataFrame) -> dict:
    """Retract previously-ingested events from the burst-monitor
    state; any cell a retraction would drive negative proves the
    events were not (all) ingested and the erase refuses — stage →
    validate → rename, no orphan version dir."""
    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("erase_from_daily_counts: no snapshot at "
                         f"{snapshot_root}")
    hist = snapshot_daily_counts(spark, snapshot_root)
    delta = _daily_counts(events).select(
        "event_type", "day", (-F.col("n")).alias("n"))
    merged = _merged_daily_counts(hist, delta).filter(F.col("n") != 0)
    new_ver = ver + 1
    root = _local_root(snapshot_root)
    staging = os.path.join(root, ".erase_stage")
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").parquet(
        os.path.join(staging, "counts"))
    neg = spark.read.parquet(os.path.join(staging, "counts")) \
        .filter(F.col("n") < 0).count()
    if neg:
        shutil.rmtree(staging, ignore_errors=True)
        raise ValueError(
            "erase_from_daily_counts: retraction would drive "
            f"{neg} day counts negative — the supplied events were "
            "not part of the ingested corpus; snapshot unchanged")
    vdir = os.path.join(root, f"v{new_ver:08d}")
    shutil.rmtree(vdir, ignore_errors=True)
    os.replace(staging, vdir)
    _write_pointer(snapshot_root, new_ver, batch_id)
    _gc_versions(snapshot_root, new_ver)
    return {"erased": True, "version": new_ver}


def start_streaming_daily_counts(stream: DataFrame, snapshot_root: str,
                                 checkpoint_dir: str):
    """Wire the daily-counts sink into an event stream."""
    return (
        stream.writeStream
        .foreachBatch(daily_counts_sink(snapshot_root))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


# ---------------------------------------------------------------------------
# portable-sketch state: HLL register table + KMV bottom-k samples
#
# Streaming twins of the round-13 portable sketches
# (operators/sketches.py "Portable sketches"): each micro-batch of
# EVENTS folds into the versioned snapshot under the same exactly-once
# pointer protocol.  State is fixed-size per day (<= m=4096 register
# rows / <= k=256 sample rows + one count row), so a year of 100 TB
# ingest carries MBs of state; only the batch is ever hashed (the
# merge laws pinned in test_sketches.py make maintained state equal a
# full rebuild, which is what the serving reports' shared DuckDB
# oracle certifies at the driver).
#
# No erase: HLL registers and evicted-sample rows are not invertible
# retractions — erase is a REBUILD from the retained corpus (the
# min-partials policy of rebuild_first_seen), not a delta.


def _hll_batch_regs(events: DataFrame) -> DataFrame:
    from logsqlite_spark.operators.sketches import hll_portable_registers

    return hll_portable_registers(events.select(
        F.col("user_id"),
        F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
        .alias("day")))


def snapshot_hll_registers(spark, snapshot_root: str) -> DataFrame | None:
    """The current persisted (day, j, m_j) register table, or None
    pre-bootstrap."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    return spark.read.parquet(
        os.path.join(snapshot_root, f"v{ver:08d}", "regs"))


def hll_registers_sink(snapshot_root: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: max-merge the batch's registers into the
    snapshot.  Unlike the count sinks, a register merge is IDEMPOTENT
    (max), so even a hypothetical double-merge couldn't corrupt state;
    the batch_id guard still skips replays for cost."""

    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        fresh = _hll_batch_regs(batch_df)
        hist = snapshot_hll_registers(spark, snapshot_root)
        merged = fresh if hist is None else (
            fresh.unionByName(hist)
            .groupBy("day", "j").agg(F.max("m_j").alias("m_j")))
        new_ver = 1 if ver is None else ver + 1
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_root, f"v{new_ver:08d}", "regs"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def distinct_report_from_snapshot(spark, snapshot_root: str) -> DataFrame:
    """Per-day + ALL distinct estimates served from the register
    snapshot — never re-reads events (the events_distinct_hll_portable
    report shape, same columns)."""
    from logsqlite_spark.operators.sketches import (
        hll_merge_all_grain, hll_portable_estimate)

    regs = snapshot_hll_registers(spark, snapshot_root)
    if regs is None:
        raise ValueError("distinct_report_from_snapshot: no snapshot "
                         f"at {snapshot_root}")
    return hll_portable_estimate(
        regs.unionByName(hll_merge_all_grain(regs)))


def _kmv_batch_events(events: DataFrame) -> DataFrame:
    from logsqlite_spark.operators.sketches import _CENTS

    return events.select(
        F.col("event_id"),
        F.to_date(F.timestamp_micros(F.expr("ts div 1000")))
        .cast("string").alias("day"),
        F.expr(_CENTS).alias("value_c"))


def snapshot_kmv(spark, snapshot_root: str):
    """(samples, counts) of the current KMV snapshot, or None."""
    ver, _ = read_pointer(snapshot_root)
    if ver is None:
        return None
    base = os.path.join(snapshot_root, f"v{ver:08d}")
    return (spark.read.parquet(os.path.join(base, "samples")),
            spark.read.parquet(os.path.join(base, "counts")))


def kmv_samples_sink(snapshot_root: str,
                     k: int | None = None) -> Callable[[DataFrame, int], None]:
    """foreachBatch body: fold the batch's bottom-k sample and exact
    day counts into the snapshot (bottom-k of kept ∪ batch-bottom-k —
    exact by the merge law, so serving equals a full re-scan)."""
    from logsqlite_spark.operators.sketches import _KMV_K, kmv_bottom_k

    kk = _KMV_K if k is None else k
    _local_root(snapshot_root)

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(_local_root(snapshot_root), exist_ok=True)
        ver, last = read_pointer(snapshot_root)
        if last is not None and batch_id <= last:
            return  # crash-replayed micro-batch: already merged
        e = _kmv_batch_events(batch_df)
        fresh_s = kmv_bottom_k(e, kk)
        fresh_n = e.groupBy("day").agg(F.count("*").cast("long").alias("n"))
        hist = snapshot_kmv(spark, snapshot_root)
        if hist is None:
            merged_s, merged_n = fresh_s, fresh_n
        else:
            hist_s, hist_n = hist
            merged_s = kmv_bottom_k(hist_s.unionByName(fresh_s), kk)
            merged_n = (hist_n.unionByName(fresh_n)
                        .groupBy("day")
                        .agg(F.sum("n").cast("long").alias("n")))
        new_ver = 1 if ver is None else ver + 1
        base = os.path.join(snapshot_root, f"v{new_ver:08d}")
        merged_s.write.mode("overwrite").parquet(
            os.path.join(base, "samples"))
        merged_n.write.mode("overwrite").parquet(
            os.path.join(base, "counts"))
        _write_pointer(snapshot_root, new_ver, batch_id)
        _gc_versions(snapshot_root, new_ver)

    return on_batch


def quantile_report_from_snapshot(spark, snapshot_root: str,
                                  k: int | None = None) -> DataFrame:
    """Per-day + ALL percentiles served from the sample snapshot —
    touches only state rows (the events_value_quantiles_portable
    report shape, same columns)."""
    from logsqlite_spark.operators.sketches import _KMV_K, kmv_report

    hist = snapshot_kmv(spark, snapshot_root)
    if hist is None:
        raise ValueError("quantile_report_from_snapshot: no snapshot "
                         f"at {snapshot_root}")
    samples, counts = hist
    return kmv_report(samples, counts, _KMV_K if k is None else k)


def rebuild_hll_registers(spark, snapshot_root: str, events: DataFrame,
                          retract_ids=None) -> dict:
    """Erase-by-REBUILD for the HLL register snapshot: registers are
    max-partials, so (like the min-partial family above) a retraction
    cannot be subtracted — re-derive from the surviving corpus.
    ``retract_ids`` are event_ids to exclude (None = plain
    re-derivation).  Staged version validated before the pointer
    flips: register indexes in [0, m), rho in [1, 49], ≤ m rows/day."""
    from logsqlite_spark.artifacts import filter_ids
    from logsqlite_spark.operators.sketches import _HLL_M, _HLL_RMAX

    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("rebuild_hll_registers: no snapshot at "
                         f"{snapshot_root}")
    ids = [int(x) for x in retract_ids] if retract_ids is not None else []
    survivors = filter_ids(events, "event_id", ids, keep=False) if ids \
        else events
    rebuilt = _hll_batch_regs(survivors)
    new_ver = ver + 1
    out = os.path.join(snapshot_root, f"v{new_ver:08d}", "regs")
    rebuilt.write.mode("overwrite").parquet(out)
    staged = spark.read.parquet(out)
    bad = staged.filter(
        (F.col("j") < 0) | (F.col("j") >= _HLL_M)
        | (F.col("m_j") < 1) | (F.col("m_j") > _HLL_RMAX)).count()
    over = (staged.groupBy("day").count()
            .filter(F.col("count") > _HLL_M).count())
    if bad or over:
        raise AssertionError(
            f"rebuild_hll_registers: staged rebuild invalid ({bad} "
            f"out-of-range registers, {over} oversized days) — "
            "snapshot unchanged")
    _write_pointer(snapshot_root, new_ver,
                   batch_id if batch_id is not None else -1)
    _gc_versions(snapshot_root, new_ver)
    return {"rebuilt": True, "version": new_ver, "retracted": len(ids)}


def rebuild_kmv_samples(spark, snapshot_root: str, events: DataFrame,
                        retract_ids=None, k: int | None = None) -> dict:
    """Erase-by-REBUILD for the KMV quantile snapshot: an evicted
    sample row is unrecoverable from state, so retraction re-draws the
    bottom-k from the surviving corpus.  Validation pins the
    retraction contract directly: no retracted event_id may survive in
    the staged samples, and counts must equal the survivors'."""
    from logsqlite_spark.artifacts import filter_ids
    from logsqlite_spark.operators.sketches import _KMV_K, kmv_bottom_k

    kk = _KMV_K if k is None else k
    ver, batch_id = read_pointer(snapshot_root)
    if ver is None:
        raise ValueError("rebuild_kmv_samples: no snapshot at "
                         f"{snapshot_root}")
    ids = [int(x) for x in retract_ids] if retract_ids is not None else []
    survivors = filter_ids(events, "event_id", ids, keep=False) if ids \
        else events
    e = _kmv_batch_events(survivors)
    new_ver = ver + 1
    base = os.path.join(snapshot_root, f"v{new_ver:08d}")
    kmv_bottom_k(e, kk).write.mode("overwrite").parquet(
        os.path.join(base, "samples"))
    e.groupBy("day").agg(F.count("*").cast("long").alias("n")) \
        .write.mode("overwrite").parquet(os.path.join(base, "counts"))
    staged = spark.read.parquet(os.path.join(base, "samples"))
    if ids:
        bad = filter_ids(staged, "event_id", ids, keep=True).count()
        if bad:
            raise AssertionError(
                f"rebuild_kmv_samples: {bad} retracted event_ids "
                "survive in the staged samples — snapshot unchanged")
    staged_n = (spark.read.parquet(os.path.join(base, "counts"))
                .agg(F.sum("n")).collect()[0][0] or 0)
    surv_n = survivors.count()
    if staged_n != surv_n:
        raise AssertionError(
            f"rebuild_kmv_samples: staged counts sum to {staged_n}, "
            f"survivors number {surv_n} — snapshot unchanged")
    _write_pointer(snapshot_root, new_ver,
                   batch_id if batch_id is not None else -1)
    _gc_versions(snapshot_root, new_ver)
    return {"rebuilt": True, "version": new_ver, "retracted": len(ids)}
