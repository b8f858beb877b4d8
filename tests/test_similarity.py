"""Similarity search (X3): exact top-k + LSH recall sanity."""

import math

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.similarity import ann_lsh_topk, cosine_topk

@pytest.fixture()
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [0.5, 0.5, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")

def test_cosine_topk_exact_ranking(emb):
    q = emb.filter(F.col("vec_id") == 0)
    out = cosine_topk(q, emb, k=4)
    ranked = [r["nid"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    assert ranked == [1, 3, 2, 4]
    sims = {r["nid"]: r["sim"] for r in out.collect()}
    assert abs(sims[1] - 0.9 / math.hypot(0.9, 0.1)) < 1e-4
    assert sims[2] == 0.0
    assert sims[4] == -1.0

def test_cosine_topk_excludes_self(emb):
    out = cosine_topk(emb.filter(F.col("vec_id") == 0), emb, k=10)
    assert 0 not in {r["nid"] for r in out.collect()}

def test_embedding_dedup_pairs_finds_planted(spark):
    from logsqlite_spark.operators.similarity import embedding_dedup_pairs

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (3, [1.0, 0.001, 0.0, 0.0]),   # near-dup of 0 and 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expected = {(0, 1), (0, 3), (1, 3)}
    # every candidate-generation method must surface the planted dups;
    # exact is the oracle path, lsh is the default, ivf the other ANN
    for method in ("exact", "lsh", "ivf"):
        pairs = {(r["a_id"], r["b_id"]) for r in
                 embedding_dedup_pairs(emb, threshold=0.95,
                                       method=method, n_clusters=2).collect()}
        assert pairs == expected, method

def test_lsh_topk_high_recall_on_tiny_set(spark, emb):
    q = emb.filter(F.col("vec_id") == 0)
    out = ann_lsh_topk(spark, q, emb, k=2)
    got = [r["nid"] for r in sorted(out.collect(), key=lambda r: r["rank"])]
    # with 4 hash tables on 5 vectors the nearest neighbor must surface
    assert got[0] == 1
