"""Streaming IVF append (round 9): micro-batched vectors land in the
persisted index exactly once; the final index equals a frozen-geometry
rebuild over everything ingested; compaction bounds file fragmentation
without changing content."""

import os

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.similarity import (
    build_ivf_index,
    compact_ivf_lists,
    ivf_topk_indexed,
)
from logsqlite_spark.streaming.ann import (
    ivf_append_sink,
    last_appended_batch,
    start_streaming_ivf_append,
)
from logsqlite_spark.tables import table as t

SF = "/root/testdata/sf0.001"


def _lists_rows(spark, path):
    df = spark.read.option("basePath", f"{path}/lists") \
        .parquet(f"{path}/lists")
    return sorted((r["nid"], r["__cluster"], tuple(r["code"]))
                  for r in df.collect())


@pytest.fixture()
def base_index(spark, tmp_path):
    emb = t(spark, SF, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    path = str(tmp_path / "idx")
    build_ivf_index(base, path, n_clusters=8)
    return emb, path


def test_two_microbatches_match_frozen_rebuild(spark, tmp_path, base_index):
    emb, path = base_index
    b1 = emb.filter(F.col("vec_id") % 8 == 0)
    b2 = emb.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 != 0))
    sink = ivf_append_sink(path)
    sink(b1, 0)
    sink(b2, 1)
    assert last_appended_batch(path) == 1

    centers = [[float(x) for x in r["center"]] for r in
               spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()]
    scales = [float(x) for x in
              spark.read.parquet(f"{path}/scales").collect()[0]["scales"]]
    ref = str(tmp_path / "ref")
    build_ivf_index(emb, ref, n_clusters=8, centers=centers, scales=scales)
    assert _lists_rows(spark, path) == _lists_rows(spark, ref)


def test_replayed_batch_not_double_appended(spark, base_index):
    emb, path = base_index
    b1 = emb.filter(F.col("vec_id") % 4 == 0)
    sink = ivf_append_sink(path)
    sink(b1, 0)
    n = len(_lists_rows(spark, path))
    sink(b1, 0)  # crash replay: same batch_id
    assert len(_lists_rows(spark, path)) == n


def test_streaming_end_to_end_appends(spark, tmp_path, base_index):
    emb, path = base_index
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    emb.filter(F.col("vec_id") % 8 == 0).coalesce(1) \
        .write.mode("append").parquet(src)
    emb.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 != 0)) \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream.schema(emb.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = start_streaming_ivf_append(stream, path, ck)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = {r[0] for r in _lists_rows(spark, path)}
    assert ids == {r["vec_id"] for r in emb.select("vec_id").collect()}
    # the appended index actually serves
    out = ivf_topk_indexed(spark, emb.filter(F.col("vec_id") < 3), path)
    assert out.count() > 0


def test_compact_ivf_lists_preserves_content(spark, base_index):
    emb, path = base_index
    sink = ivf_append_sink(path)
    for i, m in enumerate(range(4)):
        sink(emb.filter((F.col("vec_id") % 4 == 0)
                        & (F.col("vec_id") % 16 == 4 * m)), i)
    before = _lists_rows(spark, path)
    # appends fragmented at least one cluster dir past the threshold
    frag = [d for d in os.listdir(f"{path}/lists")
            if d.startswith("__cluster=")
            and len([f for f in os.listdir(f"{path}/lists/{d}")
                     if f.endswith(".parquet")]) >= 4]
    assert frag
    out = compact_ivf_lists(spark, path, min_files=4)
    assert out["compacted_clusters"] >= 1
    assert out["files_after"] < out["files_before"]
    assert _lists_rows(spark, path) == before
    for d in frag:
        n = len([f for f in os.listdir(f"{path}/lists/{d}")
                 if f.endswith(".parquet")])
        assert n < 4


def test_remote_index_root_raises():
    with pytest.raises(ValueError, match="local index dir"):
        ivf_append_sink("hdfs://nn/ivf")


def test_erase_from_ivf_index_matches_built_without(spark, tmp_path,
                                                    base_index):
    """Erase (round 9): after retracting ids, the lists are
    bit-identical to a frozen-geometry build that never contained
    them, only the holding clusters were rewritten, stats.n drops by
    the erased count, and serving excludes the erased ids."""
    from logsqlite_spark.operators.similarity import erase_from_ivf_index

    emb, path = base_index
    erased_ids = [r["vec_id"] for r in
                  emb.filter(F.col("vec_id") % 4 != 0)
                  .limit(5).collect()]
    n_before = spark.read.parquet(f"{path}/stats").collect()[0]["n"]
    res = erase_from_ivf_index(spark, path, erased_ids + [10**9])
    assert res["erased"] == 5 and res["clusters_rewritten"] >= 1

    centers = [[float(x) for x in r["center"]] for r in
               spark.read.parquet(f"{path}/centroids")
               .orderBy("cid").collect()]
    scales = [float(x) for x in
              spark.read.parquet(f"{path}/scales").collect()[0]["scales"]]
    ref = str(tmp_path / "ref_erase")
    build_ivf_index(
        emb.filter(F.col("vec_id") % 4 != 0)
        .filter(~F.col("vec_id").isin(erased_ids)),
        ref, n_clusters=8, centers=centers, scales=scales)
    assert _lists_rows(spark, path) == _lists_rows(spark, ref)
    assert spark.read.parquet(f"{path}/stats").collect()[0]["n"] \
        == n_before - 5

    # serving never returns an erased id
    qs = emb.filter(F.col("vec_id") < 8)
    got = ivf_topk_indexed(spark, qs, path, k=50, n_probe=8)
    assert got.filter(F.col("nid").isin(erased_ids)).count() == 0


def test_erase_noop_for_absent_ids(spark, base_index):
    from logsqlite_spark.operators.similarity import erase_from_ivf_index

    emb, path = base_index
    before = _lists_rows(spark, path)
    assert erase_from_ivf_index(spark, path, [10**9])["erased"] == 0
    assert _lists_rows(spark, path) == before


def test_ivf_erase_resumes_after_partial_cluster_rewrite(spark, tmp_path,
                                                         base_index):
    """Crash window: stage written, some clusters already rewritten,
    stats untouched — a re-run finishes the remaining clusters and
    decrements stats.n by the STAGED count exactly once."""
    import json
    import os

    from logsqlite_spark.operators.similarity import (
        _local_fs_path,
        erase_from_ivf_index,
    )

    emb, path = base_index
    base_ids = [r["vec_id"] for r in
                emb.filter(F.col("vec_id") % 4 != 0).limit(4).collect()]
    n_before = spark.read.parquet(f"{path}/stats").collect()[0]["n"]

    # simulate the crash: stage the meta, pre-erase ONE holding
    # cluster by running a real single-id erase, then restore the
    # stage file as if the multi-id erase had crashed midway
    one = erase_from_ivf_index(spark, path, [base_ids[0]])
    assert one["erased"] == 1
    meta = {"ids": base_ids, "n_erased": 4,
            "stats_target": int(n_before) - 4}
    mp = os.path.join(_local_fs_path(path), ".erase_stage.json")
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    # undo the single erase's stats decrement to model "stats untouched"
    from logsqlite_spark.operators.similarity import _write_ivf_stats
    st = spark.read.parquet(f"{path}/stats").collect()[0]
    _write_ivf_stats(spark, path, int(n_before), float(st["mean_d2"]))

    res = erase_from_ivf_index(spark, path, base_ids)
    assert res["erased"] == 4
    assert spark.read.parquet(f"{path}/stats").collect()[0]["n"] \
        == n_before - 4
    assert not os.path.exists(mp)
    # no erased id remains in the lists
    lists = spark.read.option("basePath", f"{path}/lists") \
        .parquet(f"{path}/lists")
    assert lists.filter(F.col("nid").isin(base_ids)).count() == 0

    # a replay of the SAME call after success is a no-op
    res2 = erase_from_ivf_index(spark, path, base_ids)
    assert res2["erased"] == 0
    assert spark.read.parquet(f"{path}/stats").collect()[0]["n"] \
        == n_before - 4
