"""Streaming twins for winnow and semantic dedup (round 9) — the
generic append-only-artifact sink: final artifact ≡ one-shot
computation over everything ingested, per-batch emits ≡ the batch
APIs, exactly-once under replay."""

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.streaming.incremental import (
    append_artifact_sink,
    artifact_rows,
    last_appended_batch,
    minhash_sink,
    semantic_sink,
    simhash_sink,
    start_append_artifact_stream,
    winnow_sink,
)

DOCS = "doc_id long, text string"
SHARED = "the quick brown fox jumps over the lazy dog again and again"
B1 = [(1, SHARED + " alpha"), (2, SHARED + " beta"),
      (3, "completely unrelated text with nothing in common here")]
B2 = [(10, SHARED + " gamma"), (11, "another unrelated piece of text")]


def test_winnow_sink_artifact_and_emits(spark, tmp_path):
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints,
        winnow_matches_incremental,
    )

    state = str(tmp_path / "state")
    emits = str(tmp_path / "emits")
    sink = winnow_sink(state, emit_dir=emits, min_shared=2)
    b1 = spark.createDataFrame(B1, DOCS)
    b2 = spark.createDataFrame(B2, DOCS)
    sink(b1, 0)
    sink(b2, 1)

    union = spark.createDataFrame(B1 + B2, DOCS)
    got = sorted(map(tuple, artifact_rows(spark, state).collect()))
    want = sorted(map(tuple, winnow_fingerprints(union).collect()))
    assert got == want and len(want) > 0

    # batch-2 emits == the batch API against batch-1 history
    emitted = spark.read.option("recursiveFileLookup", "true").parquet(emits).filter(
        (F.col("a_id") >= 10) | (F.col("b_id") >= 10))
    want2 = winnow_matches_incremental(
        b2, winnow_fingerprints(b1), min_shared=2)
    assert sorted(map(tuple, emitted.collect())) == \
        sorted(map(tuple, want2.collect()))
    # batch-1 emitted its within-batch dup pair too
    all_pairs = {(r["a_id"], r["b_id"])
                 for r in spark.read.option("recursiveFileLookup", "true").parquet(emits).collect()}
    assert (1, 2) in all_pairs and (1, 10) in all_pairs


def test_replay_applied_exactly_once(spark, tmp_path):
    state = str(tmp_path / "state")
    sink = winnow_sink(state)
    b1 = spark.createDataFrame(B1, DOCS)
    sink(b1, 0)
    n = artifact_rows(spark, state).count()
    sink(b1, 0)  # crash replay
    assert artifact_rows(spark, state).count() == n
    assert last_appended_batch(state) == 0


def test_semantic_sink_artifact_and_emits(spark, tmp_path):
    from logsqlite_spark.operators.clustering import (
        assign_clusters,
        seed_centroids,
        semantic_dedup_incremental,
    )

    rows = [(i, [float((i * 7) % 5), float((i * 3) % 7), 1.0, 0.5])
            for i in range(24)]
    rows += [(100, rows[1][1]), (101, rows[2][1])]  # planted dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    boot = emb.filter(F.col("vec_id") < 12)
    b1 = emb.filter((F.col("vec_id") >= 12) & (F.col("vec_id") < 100))
    b2 = emb.filter(F.col("vec_id") >= 100)
    ctr = seed_centroids(boot, 4)

    state = str(tmp_path / "state")
    emits = str(tmp_path / "emits")
    sink = semantic_sink(state, ctr, emit_dir=emits, tau=0.99)
    sink(boot, 0)
    sink(b1, 1)
    sink(b2, 2)

    # artifact == one-shot assignment of everything ingested
    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"
    want = (assign_clusters(emb, ctr).withColumn("nq", F.expr(sq))
            .select("vec_id", "cluster_id", "qv", "nq"))
    a = sorted((r["vec_id"], r["cluster_id"], tuple(r["qv"]), r["nq"])
               for r in artifact_rows(spark, state).collect())
    b = sorted((r["vec_id"], r["cluster_id"], tuple(r["qv"]), r["nq"])
               for r in want.collect())
    assert a == b

    # batch-3's emits == the batch API against the pre-batch history
    hist = emb.filter(F.col("vec_id") < 100)
    want3 = semantic_dedup_incremental(b2, hist, ctr, tau=0.99)
    emitted = spark.read.option("recursiveFileLookup", "true").parquet(emits).filter(
        (F.col("a_id") >= 100) | (F.col("b_id") >= 100))
    assert sorted(map(tuple, emitted.collect())) == \
        sorted(map(tuple, want3.collect()))
    pairs = {(r["a_id"], r["b_id"]) for r in emitted.collect()}
    assert (1, 100) in pairs and (2, 101) in pairs


def test_streaming_end_to_end_winnow(spark, tmp_path):
    from logsqlite_spark.operators.textstats import winnow_fingerprints

    src = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(B1, DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    spark.createDataFrame(B2, DOCS).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(DOCS)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_append_artifact_stream(stream, winnow_sink(state), ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    union = spark.createDataFrame(B1 + B2, DOCS)
    assert sorted(map(tuple, artifact_rows(spark, state).collect())) == \
        sorted(map(tuple, winnow_fingerprints(union).collect()))


def test_emit_requires_dir_and_remote_root_raises(spark):
    with pytest.raises(ValueError, match="together"):
        append_artifact_sink("/tmp/x", lambda df: df,
                             emit=lambda b, h: b)
    with pytest.raises(ValueError, match="local state dir"):
        append_artifact_sink("s3a://bucket/x", lambda df: df)


def test_compact_artifact_preserves_content(spark, tmp_path):
    from logsqlite_spark.streaming.incremental import compact_artifact

    state = str(tmp_path / "state")
    sink = winnow_sink(state)
    for i in range(8):
        sink(spark.createDataFrame(
            [(100 * i + j, f"doc {i} {j} " + SHARED) for j in range(3)],
            DOCS), i)
    before = sorted(map(tuple, artifact_rows(spark, state).collect()))
    out = compact_artifact(spark, state, min_files=4)
    assert out["compacted"] and out["files_after"] < out["files_before"]
    assert sorted(map(tuple, artifact_rows(spark, state).collect())) == before
    # the sink keeps working after compaction
    sink(spark.createDataFrame([(9999, "post compact doc")], DOCS), 99)
    assert last_appended_batch(state) == 99


def test_minhash_sink_artifact_and_emits(spark, tmp_path):
    """Streaming MinHash-LSH twin: artifact ≡ one-shot banding over
    everything ingested; per-batch emits ≡ the batch API against the
    PRE-batch history (round 9: completes the streaming incremental
    family across every dedup modality)."""
    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs_incremental,
        minhash_bands,
    )

    dup = "the quick brown fox jumps over the lazy dog once more"
    b1_rows = [(1, dup), (2, dup),
               (3, "completely unrelated text with nothing in common")]
    b2_rows = [(10, dup), (11, "another unrelated piece of text")]
    state = str(tmp_path / "state")
    emits = str(tmp_path / "emits")
    sink = minhash_sink(state, emit_dir=emits)
    b1 = spark.createDataFrame(b1_rows, DOCS)
    b2 = spark.createDataFrame(b2_rows, DOCS)
    sink(b1, 0)
    sink(b2, 1)

    union = spark.createDataFrame(b1_rows + b2_rows, DOCS)
    got = sorted(map(tuple, artifact_rows(spark, state).collect()))
    want = sorted(map(tuple, minhash_bands(union).collect()))
    assert got == want and len(want) > 0

    # batch-2 emits == the batch API against batch-1 history
    emitted = spark.read.option("recursiveFileLookup", "true").parquet(emits).filter(
        (F.col("a_id") >= 10) | (F.col("b_id") >= 10))
    want2 = minhash_band_pairs_incremental(b2, minhash_bands(b1))
    assert sorted(map(tuple, emitted.collect())) ==         sorted(map(tuple, want2.collect()))
    # batch-1 emitted its within-batch dup pair; cross pairs surfaced
    all_pairs = {(r["a_id"], r["b_id"])
                 for r in spark.read.option("recursiveFileLookup", "true").parquet(emits).collect()}
    assert (1, 2) in all_pairs and (1, 10) in all_pairs


def test_simhash_sink_artifact_and_emits(spark, tmp_path):
    """Streaming SimHash twin: artifact ≡ one-shot fingerprinting over
    everything ingested; per-batch emits ≡ the batch API against the
    PRE-batch history."""
    from logsqlite_spark.operators.dedup import (
        simhash_dedup,
        simhash_groups_incremental,
    )

    dup = "the quick brown fox jumps over the lazy dog once more"
    b1_rows = [(1, dup), (2, dup),
               (3, "completely unrelated text with nothing in common")]
    b2_rows = [(10, dup), (11, "another unrelated piece of text")]
    state = str(tmp_path / "state")
    emits = str(tmp_path / "emits")
    sink = simhash_sink(state, emit_dir=emits)
    b1 = spark.createDataFrame(b1_rows, DOCS)
    b2 = spark.createDataFrame(b2_rows, DOCS)
    sink(b1, 0)
    sink(b2, 1)

    union = spark.createDataFrame(b1_rows + b2_rows, DOCS)
    got = sorted(map(tuple, artifact_rows(spark, state).collect()))
    want = sorted(map(tuple, simhash_dedup(union, n_bits=60).collect()))
    assert got == want and len(want) > 0

    # batch-2 emits == the batch API against batch-1 history
    emitted = spark.read.option("recursiveFileLookup", "true").parquet(emits).filter(F.col("doc_id") >= 10)
    want2 = simhash_groups_incremental(b2, simhash_dedup(b1, n_bits=60))
    assert sorted(map(tuple, emitted.collect())) == \
        sorted(map(tuple, want2.collect()))
    # batch-2's dup doc joined the history group rooted at doc 1
    rows = {r["doc_id"]: (r["rep_id"], r["group_size"])
            for r in emitted.collect()}
    assert rows[10] == (1, 3) and rows[11] == (11, 1)


def test_dedup_index_sink_artifact_and_emits(spark, tmp_path):
    """Streaming exact+jaccard dedup over the persisted DedupIndex:
    survivors accumulate, the streamed index ≡ the inline tables over
    every survivor, each batch's emits ≡ the batch API against the
    PRE-batch index, and a crash replay rewrites instead of
    duplicating."""
    from logsqlite_spark.operators.dedup import (
        dedup_index_tables,
        incremental_dedup_indexed,
    )
    from logsqlite_spark.streaming.incremental import (
        dedup_index_rows,
        dedup_index_sink,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    b1_rows = [(1, base + " alpha"),
               (2, base + " alpha"),          # exact dup of 1: dropped
               (3, "completely unrelated text with nothing in common")]
    b2_rows = [(10, base + " alpha"),         # exact dup of survivor 1
               (11, base + " alphA"),         # near dup of survivor 1
               (12, "another unrelated piece of text entirely")]
    state = str(tmp_path / "state")
    emits = str(tmp_path / "emits")
    sink = dedup_index_sink(state, emit_dir=emits, threshold=0.5)
    b1 = spark.createDataFrame(b1_rows, DOCS)
    b2 = spark.createDataFrame(b2_rows, DOCS)
    sink(b1, 0)

    surv1 = incremental_dedup_indexed(
        b1, dedup_index_tables(spark.createDataFrame([], DOCS)),
        threshold=0.5)
    got1 = sorted(map(tuple, spark.read.parquet(emits + "/b0").collect()))
    assert got1 == sorted(map(tuple, surv1.collect()))
    assert {r[0] for r in got1} == {1, 3}  # 2 exact-dropped within batch

    sink(b2, 1)
    want2 = incremental_dedup_indexed(b2, dedup_index_tables(surv1),
                                      threshold=0.5)
    got2 = sorted(map(tuple, spark.read.parquet(emits + "/b1").collect()))
    assert got2 == sorted(map(tuple, want2.collect()))
    assert {r[0] for r in got2} == {12}  # 10 exact-dropped, 11 near-dropped

    # streamed index ≡ inline tables over all survivors
    all_surv = surv1.unionByName(want2)
    idx = dedup_index_rows(spark, state)
    inline = dedup_index_tables(all_surv)
    for fld in ("digests", "inverted", "forward", "sizes", "dfreq"):
        assert sorted(map(tuple, getattr(idx, fld).collect())) == \
            sorted(map(tuple, getattr(inline, fld).collect()))
    assert idx.stats.collect()[0]["n_docs"] == all_surv.count()

    # crash replay of batch 1: state unchanged, no duplicate rows
    n_inv = idx.inverted.count()
    sink(b2, 1)
    idx2 = dedup_index_rows(spark, state)
    assert idx2.inverted.count() == n_inv
    assert idx2.stats.collect()[0]["n_docs"] == all_surv.count()


def test_compact_dedup_index_preserves_content(spark, tmp_path):
    """Compaction consolidates the per-batch subdirs of every per-doc
    table and retires superseded dfreq snapshots — content-preserving,
    and the sink keeps working afterwards."""
    from logsqlite_spark.streaming.incremental import (
        compact_dedup_index,
        dedup_index_rows,
        dedup_index_sink,
    )

    state = str(tmp_path / "state")
    sink = dedup_index_sink(state)
    for i in range(9):
        sink(spark.createDataFrame(
            [(100 * i + j, f"unique doc {i} {j} " * 3 + "padding text")
             for j in range(3)], DOCS), i)

    before = {f: sorted(map(tuple,
                            getattr(dedup_index_rows(spark, state), f)
                            .collect()))
              for f in ("digests", "inverted", "forward", "sizes",
                        "dfreq")}
    res = compact_dedup_index(spark, state, min_dirs=4)
    assert res["compacted"] and res["dfreq_versions_dropped"] == 8
    after_idx = dedup_index_rows(spark, state)
    for f, want in before.items():
        assert sorted(map(tuple, getattr(after_idx, f).collect())) == want

    # the sink still appends after compaction
    sink(spark.createDataFrame([(999, "a fresh post-compaction doc")],
                               DOCS), 9)
    assert dedup_index_rows(spark, state).stats.collect()[0]["n_docs"] \
        == 9 * 3 + 1


def test_erase_from_dedup_index(spark, tmp_path):
    """Erase retracts docs exactly: the index becomes bit-equivalent
    to one built without them (df subtraction from the erased docs'
    own forward rows — no text re-tokenize), and a later batch
    identical to an erased doc survives dedup as if it never existed."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import dedup_index_tables
    from logsqlite_spark.streaming.incremental import (
        dedup_index_rows,
        dedup_index_sink,
        erase_from_dedup_index,
    )

    rows = [(1, "alpha beta gamma delta epsilon unique one"),
            (2, "zeta eta theta iota kappa unique two"),
            (3, "lambda mu nu xi omicron unique three")]
    state = str(tmp_path / "state")
    sink = dedup_index_sink(state)
    sink(spark.createDataFrame(rows, DOCS), 0)

    res = erase_from_dedup_index(spark, state, [2, 999])  # 999: no-op
    assert res["erased"] == 1

    remaining = spark.createDataFrame([rows[0], rows[2]], DOCS)
    idx = dedup_index_rows(spark, state)
    inline = dedup_index_tables(remaining)
    for f in ("digests", "inverted", "forward", "sizes", "dfreq"):
        assert sorted(map(tuple, getattr(idx, f).collect())) == \
            sorted(map(tuple, getattr(inline, f).collect())), f
    assert idx.stats.collect()[0]["n_docs"] == 2

    # a re-submission of the erased text now SURVIVES (never existed)
    sink(spark.createDataFrame([(20, rows[1][1])], DOCS), 1)
    idx2 = dedup_index_rows(spark, state)
    assert idx2.stats.collect()[0]["n_docs"] == 3
    assert idx2.digests.filter(F.col("doc_id") == 20).count() == 1


def test_erase_from_flat_artifact(spark, tmp_path):
    """Generic erase on the flat append-sink layout: the artifact
    becomes bit-equivalent to one built without the erased docs."""
    from logsqlite_spark.operators.textstats import winnow_fingerprints
    from logsqlite_spark.streaming.incremental import (
        artifact_rows,
        erase_from_artifact,
        winnow_sink,
    )

    state = str(tmp_path / "state")
    sink = winnow_sink(state)
    sink(spark.createDataFrame(B1, DOCS), 0)
    sink(spark.createDataFrame(B2, DOCS), 1)

    res = erase_from_artifact(spark, state, [2, 999])
    assert res["rows_erased"] > 0
    remaining = spark.createDataFrame(
        [r for r in B1 + B2 if r[0] != 2], DOCS)
    got = sorted(map(tuple, artifact_rows(spark, state).collect()))
    want = sorted(map(tuple, winnow_fingerprints(remaining).collect()))
    assert got == want

    # the sink keeps appending afterwards
    sink(spark.createDataFrame([(30, "a post-erase document")], DOCS), 2)
    assert artifact_rows(spark, state).filter("doc_id = 30").count() >= 0


def test_components_sink_streams_edge_batches(spark, tmp_path):
    """Streaming CC over an edge stream: the resolved table equals the
    batch recompute over every edge ingested, cross-batch merges
    resolve through the relabel chain, replay is idempotent, and
    compaction squashes the chain without changing the view."""
    from logsqlite_spark.operators.dedup import connected_components
    from logsqlite_spark.streaming.incremental import (
        compact_components,
        components_rows,
        components_sink,
    )

    EDGES = "a_id long, b_id long"
    b1 = [(1, 2), (5, 6), (8, 9)]
    b2 = [(2, 10), (5, 10), (20, 21)]   # bridges {1,2} and {5,6}
    b3 = [(9, 21)]                      # merges {8,9} into {20,21}
    state = str(tmp_path / "state")
    sink = components_sink(state)
    for i, rows in enumerate((b1, b2, b3)):
        sink(spark.createDataFrame(rows, EDGES), i)

    union = spark.createDataFrame(b1 + b2 + b3, EDGES)
    got = sorted(map(tuple, components_rows(spark, state).collect()))
    want = sorted(map(tuple, connected_components(union).collect()))
    assert got == want and len(want) > 0

    # replay of batch 2: nothing changes
    sink(spark.createDataFrame(b3, EDGES), 2)
    assert sorted(map(tuple,
                      components_rows(spark, state).collect())) == want

    # compaction squashes the chain, view identical, sink keeps going
    res = compact_components(spark, state)
    assert res["compacted"] and res["relabel_dirs_dropped"] >= 1
    assert sorted(map(tuple,
                      components_rows(spark, state).collect())) == want
    sink(spark.createDataFrame([(21, 1)], EDGES), 3)  # merge everything
    after = {r["doc_id"]: r["cluster_id"]
             for r in components_rows(spark, state).collect()}
    assert set(after.values()) == {1}


def test_components_sink_composes_with_minhash_emits(spark, tmp_path):
    """Composition: minhash_sink's per-batch pair emits feed the
    components sink; the final view equals full CC over the full-
    corpus minhash pairs (the pair family decomposes exactly, and
    sequential batch-touching emits cover every union pair once)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        connected_components,
        minhash_band_pairs,
    )
    from logsqlite_spark.streaming.incremental import (
        components_rows,
        components_sink,
        minhash_sink,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .select("doc_id", "text")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    mh_state = str(tmp_path / "mh")
    emits = str(tmp_path / "emits")
    cc_state = str(tmp_path / "cc")
    mh = minhash_sink(mh_state, emit_dir=emits)
    cc = components_sink(cc_state)
    seen: set = set()
    for i, b in enumerate(batches):
        mh(b, i)
        allp = {(r["a_id"], r["b_id"])
                for r in spark.read.option("recursiveFileLookup", "true").parquet(emits).collect()}
        fresh = sorted(allp - seen)
        seen = allp
        cc(spark.createDataFrame(fresh, "a_id long, b_id long"), i)

    got = sorted(map(tuple, components_rows(spark, cc_state).collect()))
    want = sorted(map(tuple,
                      connected_components(minhash_band_pairs(docs))
                      .collect()))
    assert got == want and len(want) > 0


def test_filter_ids_large_list_uses_join_and_matches_isin(spark):
    """Above the isin threshold the membership filter switches to a
    broadcast join — same result either way."""
    from logsqlite_spark.artifacts import _ISIN_MAX, filter_ids

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    big = list(range(0, 3000, 2))          # > _ISIN_MAX entries
    assert len(big) > _ISIN_MAX
    small = [1, 2, 3]
    for ids in (small, big):
        keep = sorted(r["doc_id"] for r in
                      filter_ids(df, "doc_id", ids, keep=True).collect())
        drop = sorted(r["doc_id"] for r in
                      filter_ids(df, "doc_id", ids, keep=False).collect())
        want_keep = sorted(set(ids) & set(range(5000)))
        assert keep == want_keep
        assert drop == sorted(set(range(5000)) - set(ids))


def test_erase_dedup_index_rerun_completes_partial_crash(spark, tmp_path):
    """Crash-recovery: if a crash leaves some per-doc tables rewritten
    but digests intact (digests rewrite LAST), re-running the same
    erase re-counts > 0 and completes — no residual postings."""
    import os
    import shutil

    from logsqlite_spark.operators.dedup import dedup_index_tables
    from logsqlite_spark.streaming.incremental import (
        dedup_index_rows,
        dedup_index_sink,
        erase_from_dedup_index,
    )

    rows = [(1, "alpha beta gamma delta unique one"),
            (2, "zeta eta theta iota unique two")]
    state = str(tmp_path / "state")
    sink = dedup_index_sink(state)
    sink(spark.createDataFrame(rows, DOCS), 0)

    # simulate the crash window: inverted already filtered, digests not
    idx = dedup_index_rows(spark, state)
    filtered = idx.inverted.filter("doc_id != 2")
    staged = os.path.join(state, ".crash_sim")
    filtered.write.mode("overwrite").parquet(
        os.path.join(staged, "b0"))
    shutil.rmtree(os.path.join(state, "inverted"))
    os.replace(staged, os.path.join(state, "inverted"))

    res = erase_from_dedup_index(spark, state, [2])
    assert res["erased"] == 1  # digests still held doc 2
    idx2 = dedup_index_rows(spark, state)
    inline = dedup_index_tables(
        spark.createDataFrame([rows[0]], DOCS))
    for f in ("digests", "inverted", "forward", "sizes", "dfreq"):
        assert sorted(map(tuple, getattr(idx2, f).collect())) == \
            sorted(map(tuple, getattr(inline, f).collect())), f


def test_erase_dedup_index_resumes_after_forward_rewritten(spark,
                                                           tmp_path):
    """The worst crash window: the staged partial was written and the
    forward table already rewritten (the subtraction's source rows are
    gone) — resume still applies the exact dfreq retraction from the
    stage, because it is never recomputed from live tables."""
    import json
    import os
    import shutil

    from logsqlite_spark.operators.dedup import dedup_index_tables
    from logsqlite_spark.streaming.incremental import (
        dedup_index_rows,
        dedup_index_sink,
        erase_from_dedup_index,
    )

    rows = [(1, "alpha beta gamma delta unique one"),
            (2, "zeta eta theta iota unique two")]
    state = str(tmp_path / "state")
    sink = dedup_index_sink(state)
    sink(spark.createDataFrame(rows, DOCS), 0)
    idx = dedup_index_rows(spark, state)

    # simulate: stage written (partial + meta), forward rewritten,
    # dfreq/pointer untouched, digests intact
    stage = os.path.join(state, ".erase_stage")
    (idx.forward.filter("doc_id = 2").groupBy("tok")
     .count().withColumnRenamed("count", "e")
     .write.mode("overwrite").parquet(os.path.join(stage, "partial")))
    with open(os.path.join(stage, "meta.json"), "w") as fh:
        json.dump({"ids": [2], "n_erased": 1, "target": "e0_0"}, fh)
    fwd_clean = idx.forward.filter("doc_id != 2")
    staged = os.path.join(state, ".crash_fwd")
    fwd_clean.write.mode("overwrite").parquet(os.path.join(staged, "b0"))
    shutil.rmtree(os.path.join(state, "forward"))
    os.replace(staged, os.path.join(state, "forward"))

    res = erase_from_dedup_index(spark, state, [2])
    assert res["erased"] == 1 and res["dfreq_dir"] == "e0_0"
    idx2 = dedup_index_rows(spark, state)
    inline = dedup_index_tables(spark.createDataFrame([rows[0]], DOCS))
    for f in ("digests", "inverted", "forward", "sizes", "dfreq"):
        assert sorted(map(tuple, getattr(idx2, f).collect())) == \
            sorted(map(tuple, getattr(inline, f).collect())), f
    assert not os.path.exists(stage)  # stage cleaned up


def test_decisions_rows_served_from_streamed_components(spark, tmp_path):
    """Verdicts straight off the streamed CC state equal the batch
    verdict projection over the same edges; docs outside any pair
    read as unique."""
    from logsqlite_spark.operators.dedup import (
        _verdict_rows,
        connected_components,
    )
    from logsqlite_spark.streaming.incremental import (
        components_sink,
        decisions_rows,
    )

    EDGES = "a_id long, b_id long"
    b1 = [(1, 2), (5, 6)]
    b2 = [(2, 10)]
    state = str(tmp_path / "state")
    assert decisions_rows(
        spark, state,
        spark.createDataFrame([(1,)], "doc_id long")) is None
    sink = components_sink(state)
    for i, rows in enumerate((b1, b2)):
        sink(spark.createDataFrame(rows, EDGES), i)

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 6, 10, 99)], "doc_id long")
    got = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
           for r in decisions_rows(spark, state, docs).collect()}
    union = spark.createDataFrame(b1 + b2, EDGES)
    want = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
            for r in _verdict_rows(
                docs.join(connected_components(union)
                          .withColumnRenamed("doc_id", "__cd"),
                          docs["doc_id"] == F.col("__cd"), "left")
                .select("doc_id", "cluster_id")).collect()}
    assert got == want
    assert got[99] == (None, True, "unique")
    assert got[1] == (1, True, "representative")


def test_compacted_components_lookup_pushes_doc_id_filter(spark, tmp_path):
    """compact_components' range-partitioned, doc_id-sorted base: the
    endpoint lookup's IN predicate pushes through the relabel join
    into the parquet scan (footer min/max then prunes files — the
    bucketed-components story applied to the streamed state)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import _endpoint_pruned_history
    from logsqlite_spark.plans import explain_str
    from logsqlite_spark.streaming.incremental import (
        compact_components,
        components_rows,
        components_sink,
    )

    state = str(tmp_path / "cc")
    sink = components_sink(state)
    sink(spark.createDataFrame([(i, i + 1000) for i in range(0, 400, 2)],
                               "a_id long, b_id long"), 0)
    sink(spark.createDataFrame([(1000, 1001), (7, 9)],
                               "a_id long, b_id long"), 1)
    out = compact_components(spark, state)
    assert out["compacted"]

    comp = components_rows(spark, state)
    endpoints = list(range(0, 30, 2))  # > InSet threshold -> In filter
    plan = explain_str(_endpoint_pruned_history(comp, endpoints))
    assert "PushedFilters" in plan and "In(doc_id" in plan, plan

    # and the compacted state still serves the exact table
    got = {r["doc_id"]: r["cluster_id"] for r in comp.collect()}
    assert got[1001] == got[1000] and got[7] == got[9] == 7


def test_components_sink_compacts_on_cadence(spark, tmp_path):
    """compact_every (VERDICT r11 #8): the sink squashes the relabel
    chain whenever that many relabel dirs accumulate, so the
    driver-side relabel collect stays BOUNDED across an arbitrarily
    long stream — and the resolved view equals both the batch
    recompute and a never-compacted twin after every batch."""
    import glob
    import os

    from logsqlite_spark.operators.dedup import connected_components
    from logsqlite_spark.streaming.incremental import (
        components_rows,
        components_sink,
    )

    EDGES = "a_id long, b_id long"
    batches = [
        [(1, 2), (5, 6)],
        [(2, 5), (8, 9)],      # merge {1,2}+{5,6}
        [(9, 1), (20, 21)],    # merge {8,9} into the big one
        [(21, 30)],
        [(30, 1)],             # merge everything
    ]
    state = str(tmp_path / "cadence")
    plain = str(tmp_path / "plain")
    sink = components_sink(state, compact_every=2)
    twin = components_sink(plain)
    seen: list = []
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, EDGES)
        sink(df, i)
        twin(spark.createDataFrame(rows, EDGES), i)
        seen += rows
        # bounded-relabel invariant: never more than compact_every
        # dirs on disk after a batch commits
        n_rel = len(glob.glob(os.path.join(state, "relabel", "b*")))
        assert n_rel < 2, f"relabel chain unbounded: {n_rel} dirs"
        got = sorted(map(tuple, components_rows(spark, state).collect()))
        want = sorted(map(tuple, connected_components(
            spark.createDataFrame(seen, EDGES)).collect()))
        assert got == want
        assert got == sorted(map(tuple,
                                 components_rows(spark, plain).collect()))
    # the never-compacted twin kept its full chain — the cadence is
    # what bounded the state, not the workload
    assert len(glob.glob(os.path.join(plain, "relabel", "b*"))) >= 3


def test_banded_dedup_sink_matches_batch_api(spark, tmp_path):
    """Streaming twin of incremental_dedup_banded (round 12): feeding
    id-ordered document batches through the sink, each batch's emit
    equals the batch API run against the union of earlier batches,
    the state keeps EVERY ingested doc's bands/digests (dropped docs
    still partner later arrivals — the earlier-id rule), and replay
    is idempotent."""
    import os

    from logsqlite_spark.operators.dedup import incremental_dedup_banded
    from logsqlite_spark.streaming.incremental import banded_dedup_sink

    DOC = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again "
    batches = [
        [(0, base * 4), (1, "unrelated totally different content here " * 4)],
        [(10, base * 4),                 # exact dup of 0 -> dropped
         (12, base * 4 + "x"),          # near dup of 0 -> dropped
         (14, "fresh unique content with its own words " * 4)],
        [(20, "fresh unique content with its own words " * 4 + "y"),
         # near dup of 14 -> dropped; ALSO near dup of 12's text? no —
         # distinct base. 22 pairs with the DROPPED 12 via 0's base:
         (22, base * 4 + "xz")],        # near dup of 0/10/12 -> dropped
    ]
    state = str(tmp_path / "bstate")
    emit = str(tmp_path / "bemit")
    all_rows: list = []
    union_df = lambda: spark.createDataFrame(all_rows, DOC)  # noqa: E731
    sink = banded_dedup_sink(state, union_df, emit)
    for i, rows in enumerate(batches):
        all_rows += rows  # docs_table = at-rest corpus incl. batch
        df = spark.createDataFrame(rows, DOC)
        sink(df, i)
        hist = spark.createDataFrame(
            [r for r in all_rows if r not in rows], DOC) if i else \
            spark.createDataFrame([], DOC)
        want = sorted(r["doc_id"] for r in incremental_dedup_banded(
            df, hist).collect())
        got = sorted(r["doc_id"] for r in spark.read.parquet(
            os.path.join(emit, f"b{i}")).collect())
        assert got == want, (i, got, want)
    # the planted outcome end-to-end
    kept = sorted(r["doc_id"] for r in
                  spark.read.option("recursiveFileLookup", "true")
                  .parquet(emit).collect())
    assert kept == [0, 1, 14]
    # replay: nothing duplicated
    sink(spark.createDataFrame(batches[-1], DOC), 2)
    kept2 = sorted(r["doc_id"] for r in
                   spark.read.option("recursiveFileLookup", "true")
                   .parquet(emit).collect())
    assert kept2 == kept


def test_banded_dedup_sink_crash_replay_ignores_partial_state(
        spark, tmp_path):
    """Round-13 ADVICE(high) regression: a crash AFTER the bands/
    digests subdir for batch N is written but BEFORE the pointer flip
    must not let the replay read its own crashed-attempt rows as
    history — that would self-match every doc (md5 identity / Jaccard
    1.0) and overwrite emit/bN with an empty kept set."""
    import os

    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import minhash_bands
    from logsqlite_spark.streaming.incremental import banded_dedup_sink

    DOC = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again "
    b0 = [(0, base * 4),
          (1, "unrelated totally different content here " * 4)]
    b1 = [(10, base * 4),                       # exact dup of 0
          (14, "fresh unique content with its own words " * 4)]  # kept
    state = str(tmp_path / "bstate")
    emit = str(tmp_path / "bemit")
    all_rows: list = []
    union_df = lambda: spark.createDataFrame(all_rows, DOC)  # noqa: E731
    sink = banded_dedup_sink(state, union_df, emit)
    all_rows += b0
    sink(spark.createDataFrame(b0, DOC), 0)
    # --- simulate batch 1's CRASHED attempt: state subdirs written,
    # pointer NOT flipped (exactly the sink's own write shapes) ---
    all_rows += b1
    df1 = spark.createDataFrame(b1, DOC)
    minhash_bands(df1, 4).write.mode("overwrite").parquet(
        os.path.join(state, "bands", "b1"))
    (df1.select(F.col("doc_id").cast("long").alias("doc_id"),
                F.md5("text").alias("h"))
     .write.mode("overwrite").parquet(os.path.join(state, "digests", "b1")))
    # --- foreachBatch replays batch 1 ---
    sink(df1, 1)
    got = sorted(r["doc_id"] for r in spark.read.parquet(
        os.path.join(emit, "b1")).collect())
    assert got == [14], f"replay read its own partial state: {got}"


def test_append_artifact_sink_crash_replay_exactly_once(spark, tmp_path):
    """Round-13: the GENERIC artifact sink gets the same crash-replay
    guarantee as the banded one — a crash AFTER the batch's artifact
    subdir is written but BEFORE the pointer flip must not (a) leave
    duplicate artifact rows after the replay, nor (b) let the replay
    read its own crashed attempt as history (winnow would then match
    every batch doc against itself and emit it as a dup)."""
    import os

    from logsqlite_spark.operators.textstats import winnow_fingerprints
    from logsqlite_spark.streaming.incremental import (
        artifact_rows,
        winnow_sink,
    )

    DOC = "doc_id long, text string"
    b0 = [(0, "the quick brown fox jumps over the lazy dog " * 4)]
    b1 = [(1, "completely different fresh content here now " * 4)]
    state = str(tmp_path / "wstate")
    emits = str(tmp_path / "wemit")
    sink = winnow_sink(state, emit_dir=emits, min_shared=2)
    sink(spark.createDataFrame(b0, DOC), 0)
    # crashed attempt of batch 1: artifact subdir written, pointer NOT
    df1 = spark.createDataFrame(b1, DOC)
    winnow_fingerprints(df1).write.mode("overwrite").parquet(
        os.path.join(state, "data", "b1"))
    # replay
    sink(df1, 1)
    # (a) no duplicate artifact rows
    rows = artifact_rows(spark, state).collect()
    assert len(rows) == len({(r["doc_id"], r["fp"]) for r in rows})
    assert {r["doc_id"] for r in rows} == {0, 1}
    # (b) doc 1 shares nothing with doc 0: the emit must be EMPTY
    # (with the bug, doc 1 matches its own crashed-attempt fps)
    emitted = spark.read.option("recursiveFileLookup", "true") \
        .parquet(emits)
    assert emitted.filter("a_id = 1 OR b_id = 1").count() == 0


def test_emitted_rows_hides_crashed_attempt(spark, tmp_path):
    """`emitted_rows` is the consumer-facing emit reader: it must show
    exactly the COMMITTED emits — a crashed attempt's emit subdir
    (written before the pointer flip) stays invisible until its batch
    commits, and the replay's rewrite is what consumers finally see."""
    import os

    from logsqlite_spark.streaming.incremental import (
        emitted_rows,
        minhash_sink,
    )

    DOC = "doc_id long, text string"
    base = "the quick brown fox jumps over the lazy dog again and again "
    b0 = [(0, base * 4), (1, "unrelated other words entirely here " * 4)]
    b1 = [(10, base * 4)]
    state = str(tmp_path / "mstate")
    emits = str(tmp_path / "memit")
    sink = minhash_sink(state, emit_dir=emits)

    assert emitted_rows(spark, state, emits) is None  # pre-first-batch
    sink(spark.createDataFrame(b0, DOC), 0)
    committed0 = {(r["a_id"], r["b_id"])
                  for r in emitted_rows(spark, state, emits).collect()}

    # crashed attempt of batch 1: emit subdir written with GARBAGE
    # (what a partial attempt could leave), pointer NOT flipped
    (spark.createDataFrame([(99, 100)], "a_id long, b_id long")
     .write.mode("overwrite").parquet(os.path.join(emits, "b1")))
    assert {(r["a_id"], r["b_id"])
            for r in emitted_rows(spark, state, emits).collect()} \
        == committed0, "uncommitted emit visible to consumers"

    sink(spark.createDataFrame(b1, DOC), 1)  # replay rewrites b1
    got = {(r["a_id"], r["b_id"])
           for r in emitted_rows(spark, state, emits).collect()}
    assert (0, 10) in got and (99, 100) not in got


def test_emitted_rows_missing_emit_dir_returns_none(spark, tmp_path):
    """ADVICE r13 (low): a committed batch pointer with NO emit dir
    (sink run without an emit fn, or a consumer passing a wrong path)
    must read as "nothing emitted" (None), not FileNotFoundError from
    os.listdir."""
    from logsqlite_spark.streaming.incremental import (
        emitted_rows,
        minhash_sink,
    )

    DOC = "doc_id long, text string"
    state = str(tmp_path / "mstate")
    sink = minhash_sink(state)  # no emit_dir: artifact-only sink
    sink(spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog " * 4)], DOC), 0)
    assert emitted_rows(spark, state, str(tmp_path / "never_made")) is None
