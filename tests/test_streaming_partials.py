"""Streaming gram-partials snapshot (VERDICT r8 #6): the end-to-end
twin of incremental substring dedup — micro-batches merged through
foreachBatch must leave exactly the state a one-shot
``ngram_df_partials`` over everything ingested would produce."""

import time

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.textstats import (
    ngram_df_partials,
    repeated_ngram_stats_incremental,
)
from logsqlite_spark.streaming.partials import (
    ngram_partials_sink,
    read_pointer,
    snapshot_partials,
    start_streaming_ngram_partials,
)

DOCS_SCHEMA = "doc_id long, text string"

B1 = [(1, "a b c d e f g h i j"),
      (2, "a b c d e f g h i j k l"),      # shares the 8-gram with 1
      (3, "zz yy xx ww vv uu tt ss")]
B2 = [(10, "a b c d e f g h i j m n"),     # shares with batch-1 docs
      (11, "zz yy xx ww vv uu tt ss rr")]  # shares with doc 3


def _partials_rows(df):
    return sorted((r["gram"], r["df"]) for r in df.collect())


def test_two_microbatches_equal_oneshot_union(spark, tmp_path):
    snap = str(tmp_path / "snap")
    sink = ngram_partials_sink(snap)
    sink(spark.createDataFrame(B1, DOCS_SCHEMA), 0)
    sink(spark.createDataFrame(B2, DOCS_SCHEMA), 1)

    union = spark.createDataFrame(B1 + B2, DOCS_SCHEMA)
    got = _partials_rows(snapshot_partials(spark, snap))
    want = _partials_rows(ngram_df_partials(union))
    assert got == want and len(want) > 0


def test_replayed_batch_is_merged_exactly_once(spark, tmp_path):
    snap = str(tmp_path / "snap")
    sink = ngram_partials_sink(snap)
    b1 = spark.createDataFrame(B1, DOCS_SCHEMA)
    sink(b1, 0)
    sink(b1, 0)  # foreachBatch crash-replay: same batch_id again
    got = _partials_rows(snapshot_partials(spark, snap))
    want = _partials_rows(ngram_df_partials(b1))
    assert got == want
    assert read_pointer(snap) == (1, 0)


def test_per_batch_stats_match_batch_api(spark, tmp_path):
    """The stats emitted for batch 2 equal what the batch-mode
    incremental operator reports against the pre-batch history."""
    snap = str(tmp_path / "snap")
    stats = str(tmp_path / "stats")
    sink = ngram_partials_sink(snap, stats_dir=stats)
    b1 = spark.createDataFrame(B1, DOCS_SCHEMA)
    b2 = spark.createDataFrame(B2, DOCS_SCHEMA)
    sink(b1, 0)
    sink(b2, 1)

    emitted = spark.read.parquet(stats).filter(F.col("doc_id") >= 10)
    want = repeated_ngram_stats_incremental(b2, ngram_df_partials(b1))
    assert sorted(map(tuple, emitted.collect())) == \
        sorted(map(tuple, want.collect()))


def test_streaming_end_to_end(spark, tmp_path):
    """Real readStream → foreachBatch: files arrive one per trigger,
    the final snapshot equals the one-shot recompute."""
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(B1, DOCS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(B2, DOCS_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_streaming_ngram_partials(stream, snap, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    union = spark.createDataFrame(B1 + B2, DOCS_SCHEMA)
    got = _partials_rows(snapshot_partials(spark, snap))
    want = _partials_rows(ngram_df_partials(union))
    assert got == want
    ver, _ = read_pointer(snap)
    assert ver is not None and ver >= 1


def test_remote_root_raises(spark):
    with pytest.raises(ValueError, match="atomic-rename local root"):
        ngram_partials_sink("s3a://bucket/snap")


def test_streaming_psi_end_to_end(spark, tmp_path):
    """Real readStream → PSI sink: files arrive one per trigger, the
    served drift report equals one-shot value_psi over the union."""
    from logsqlite_spark.operators.anomaly import (
        value_psi,
        value_psi_from_counts,
    )
    from logsqlite_spark.streaming.partials import (
        snapshot_psi_counts,
        start_streaming_psi_counts,
    )

    EV = "event_id long, ts long, event_type string, value double"
    split = 1705363200000000
    r1 = [(i, (split - 10) * 1000, "t", float(v))
          for i, v in enumerate((10, 60, 110))] + \
         [(100, (split + 10) * 1000, "t", 210.0)]
    r2 = [(200, (split - 10) * 1000, "t", 310.0),
          (300, (split + 10) * 1000, "u", 40.0)]
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(r1, EV).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(r2, EV).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(EV)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_streaming_psi_counts(stream, snap, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, value_psi_from_counts(
        snapshot_psi_counts(spark, snap)).collect()))
    want = sorted(map(tuple, value_psi(
        spark.createDataFrame(r1 + r2, EV)).collect()))
    assert got == want and len(want) == 2


def test_streaming_lex_end_to_end(spark, tmp_path):
    """Real readStream → lexical sink: files arrive one per trigger,
    the served Zipf report equals one-shot token_zipf_slope over the
    union."""
    from logsqlite_spark.operators.lexstats import (
        token_zipf_slope,
        zipf_slope_from_counts,
    )
    from logsqlite_spark.streaming.partials import (
        snapshot_lex_counts,
        start_streaming_lex_counts,
    )

    DOC = "doc_id long, text string, lang string"
    r1 = [(0, "the quick brown fox the fox", "en"),
          (1, "le renard brun le le", "fr")]
    r2 = [(2, "the lazy dog the dog and the fox", "en")]
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(r1, DOC).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(r2, DOC).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(DOC)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_streaming_lex_counts(stream, snap, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(map(tuple, zipf_slope_from_counts(
        snapshot_lex_counts(spark, snap)).collect()))
    want = sorted(map(tuple, token_zipf_slope(
        spark.createDataFrame(r1 + r2, DOC)).collect()))
    assert got == want and len(want) == 2


def test_streaming_first_seen_end_to_end(spark, tmp_path):
    """Real readStream → first-seen sink: the merged snapshot equals
    one-shot ngram_first_seen over the union, and the per-batch
    novelty emits concatenate into the one-shot novelty table (first
    occurrences are stable under later arrivals)."""
    from logsqlite_spark.operators.lexstats import (
        ngram_first_seen,
        ngram_novelty,
    )
    from logsqlite_spark.streaming.partials import (
        snapshot_first_seen,
        start_streaming_first_seen,
    )

    DOC = "doc_id long, text string"
    r1 = [(0, "abcdefgh"), (1, "abcdxyzw")]
    r2 = [(2, "abcdefgh"), (3, "qrstuvab")]
    src = str(tmp_path / "in")
    snap = str(tmp_path / "snap")
    ck = str(tmp_path / "ck")
    nov = str(tmp_path / "nov")
    spark.createDataFrame(r1, DOC).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(r2, DOC).coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(DOC)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_streaming_first_seen(stream, snap, ck, novelty_dir=nov)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    union = spark.createDataFrame(r1 + r2, DOC)
    got = sorted(map(tuple,
                     snapshot_first_seen(spark, snap).collect()))
    want = sorted(map(tuple, ngram_first_seen(union).collect()))
    assert got == want and len(want) > 0

    got_nov = sorted(map(tuple, spark.read.parquet(nov).collect()))
    want_nov = sorted(map(tuple, ngram_novelty(union).collect()))
    assert got_nov == want_nov


def test_rebuild_first_seen_equals_built_without(spark, tmp_path):
    """Erase-by-rebuild for the min-partial family (VERDICT r11 #5):
    rebuilding the (g, first_doc) snapshot excluding a retracted id
    set is value-identical to a snapshot built WITHOUT those docs,
    the staged validation guarantees no retracted id survives as a
    first_doc, and the pointer protocol keeps the old version serving
    until the rebuild commits."""
    from logsqlite_spark.operators.lexstats import ngram_first_seen
    from logsqlite_spark.streaming.partials import (
        first_seen_sink,
        read_pointer,
        rebuild_first_seen,
        snapshot_first_seen,
    )

    DOC = "doc_id long, text string"
    rows = [(0, "abcdefgh"), (1, "abcdxyzw"),
            (2, "abcdefgh"), (3, "qrstuvab")]
    corpus = spark.createDataFrame(rows, DOC)
    snap = str(tmp_path / "snap")
    sink = first_seen_sink(snap)
    sink(corpus.filter("doc_id < 2"), 0)
    sink(corpus.filter("doc_id >= 2"), 1)

    res = rebuild_first_seen(spark, snap, corpus, retract_ids=[0, 1])
    assert res["rebuilt"] and res["retracted"] == 2
    got = sorted(map(tuple, snapshot_first_seen(spark, snap).collect()))
    want = sorted(map(tuple, ngram_first_seen(
        corpus.filter("doc_id >= 2")).collect()))
    assert got == want and len(want) > 0
    assert not any(fd in (0, 1) for _, fd in got)
    # pointer advanced exactly once past the sink's two merges
    ver, _ = read_pointer(snap)
    assert ver == 3


def test_rebuild_first_seen_requires_snapshot(spark, tmp_path):
    from logsqlite_spark.streaming.partials import rebuild_first_seen

    corpus = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    with pytest.raises(ValueError):
        rebuild_first_seen(spark, str(tmp_path / "missing"), corpus)


def test_corpus_report_novelty_served_from_state(spark, tmp_path):
    """corpus_report(first_seen_root=...) serves the novelty entry
    from the maintained snapshot; state-served rows equal the
    re-derived one-shot rows (ngram_novelty) on the same corpus."""
    from logsqlite_spark.operators.lexstats import ngram_novelty
    from logsqlite_spark.operators.pipeline import corpus_report
    from logsqlite_spark.streaming.partials import first_seen_sink
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") < 60)
    snap = str(tmp_path / "snap")
    first_seen_sink(snap)(docs, 0)
    got = sorted(map(tuple,
                     corpus_report(docs, first_seen_root=snap)["novelty"]
                     .collect()))
    want = sorted(map(tuple, ngram_novelty(docs).collect()))
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# portable-sketch snapshots (round 13): HLL register table + KMV samples


def _split_events(spark, sf_dir):
    from logsqlite_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    return (ev.filter(F.col("event_id") % 3 != 0),
            ev.filter(F.col("event_id") % 3 == 0), ev)


def test_hll_register_sink_equals_batch_rollup(spark, sf_dir, tmp_path):
    """Two micro-batches through the register sink must serve EXACTLY
    the events_distinct_hll_portable report over everything ingested
    (register max-merge law), and a replayed batch must be a no-op."""
    from logsqlite_spark.operators.sketches import (
        _events, distinct_users_hll_portable)
    from logsqlite_spark.streaming.partials import (
        distinct_report_from_snapshot, hll_registers_sink, read_pointer)

    b1, b2, _ = _split_events(spark, sf_dir)
    snap = str(tmp_path / "hll")
    sink = hll_registers_sink(snap)
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # crash replay: pointer unchanged
    assert read_pointer(snap) == (2, 1)

    got = sorted(map(tuple,
                     distinct_report_from_snapshot(spark, snap).collect()))
    want = sorted(map(tuple, distinct_users_hll_portable(
        _events(spark, sf_dir)).collect()))
    assert got == want and len(got) > 0


def test_kmv_sample_sink_equals_batch_rollup(spark, sf_dir, tmp_path):
    """Same contract for the quantile snapshot: maintained bottom-k
    samples + count deltas serve exactly the full-corpus
    events_value_quantiles_portable report (bottom-k merge law)."""
    from logsqlite_spark.operators.sketches import (
        _events_id, kmv_value_quantiles)
    from logsqlite_spark.streaming.partials import (
        kmv_samples_sink, quantile_report_from_snapshot, read_pointer)

    b1, b2, _ = _split_events(spark, sf_dir)
    snap = str(tmp_path / "kmv")
    sink = kmv_samples_sink(snap)
    sink(b1, 0)
    sink(b2, 1)
    sink(b2, 1)  # crash replay: no double-count of day ns
    assert read_pointer(snap) == (2, 1)

    got = sorted(map(tuple,
                     quantile_report_from_snapshot(spark, snap).collect()))
    want = sorted(map(tuple, kmv_value_quantiles(
        _events_id(spark, sf_dir)).collect()))
    assert got == want and len(got) > 0


def test_rebuild_sketch_snapshots_retract_and_serve(spark, sf_dir, tmp_path):
    """Erase-by-rebuild for both sketch snapshots: after retracting a
    batch of event_ids the served reports must equal fresh builds over
    the survivors; a retracted id must never survive in KMV samples."""
    from logsqlite_spark.operators.sketches import (
        distinct_users_hll_portable, kmv_value_quantiles)
    from logsqlite_spark.streaming.partials import (
        distinct_report_from_snapshot, hll_registers_sink,
        kmv_samples_sink, quantile_report_from_snapshot,
        rebuild_hll_registers, rebuild_kmv_samples)
    from logsqlite_spark.tables import table

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value")
    retract = [r["event_id"] for r in
               ev.filter(F.col("event_id") % 7 == 0)
               .select("event_id").collect()]
    survivors = ev.filter(F.col("event_id") % 7 != 0)

    hsnap, ksnap = str(tmp_path / "hll"), str(tmp_path / "kmv")
    hll_registers_sink(hsnap)(ev, 0)
    kmv_samples_sink(ksnap)(ev, 0)

    out_h = rebuild_hll_registers(spark, hsnap, ev, retract_ids=retract)
    out_k = rebuild_kmv_samples(spark, ksnap, ev, retract_ids=retract)
    assert out_h["rebuilt"] and out_k["rebuilt"]

    got_h = sorted(map(tuple,
                       distinct_report_from_snapshot(spark, hsnap).collect()))
    # fresh build over survivors, via the same event projection
    from pyspark.sql import functions as SF
    surv_ev = survivors.select(
        "user_id",
        SF.to_date(SF.timestamp_micros(SF.expr("ts div 1000")))
        .alias("day"))
    want_h = sorted(map(tuple, distinct_users_hll_portable(
        surv_ev).collect()))
    assert got_h == want_h

    got_k = sorted(map(tuple,
                       quantile_report_from_snapshot(spark, ksnap).collect()))
    surv_id = survivors.select(
        "event_id",
        SF.to_date(SF.timestamp_micros(SF.expr("ts div 1000")))
        .alias("day"),
        SF.expr("cast(floor(cast(value as double) * 100 + 0.5) as bigint)")
        .alias("value_c"))
    want_k = sorted(map(tuple, kmv_value_quantiles(surv_id).collect()))
    assert got_k == want_k
