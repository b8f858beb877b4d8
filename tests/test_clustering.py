"""Semantic clustering / SemDeDup tier (operators/clustering.py).

The six registry queries carry full DuckDB oracles (integer-exact
quantized math), so value correctness is driver-checked; these tests
pin the semantics the oracle can't see — argmin definition, Lloyd
monotonicity, determinism — and the scale-critical plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logsqlite_spark.operators.clustering import (
    _emb, assign_clusters, cluster_balanced_sample, cluster_stats,
    refine_centroids, seed_centroids, semantic_dedup_pairs,
    semantic_dedup_stats)


def test_assignment_is_argmin_with_tiebreak(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seeds = seed_centroids(emb, k=4)
    got = {r["vec_id"]: (r["cluster_id"], r["dist_q"])
           for r in assign_clusters(emb, seeds).collect()}

    import math

    ctrs = {r["cluster_id"]: r["cv"] for r in seeds.collect()}
    # recompute argmin in Python on the same quantized ints
    for r in emb.select("vec_id", "embedding").collect():
        qv = [math.floor(float(x) * 10_000) for x in r["embedding"]]
        best = min((sum((a - b) ** 2 for a, b in zip(qv, cv)), cid)
                   for cid, cv in ctrs.items())
        assert got[r["vec_id"]] == (best[1], best[0]), r["vec_id"]


def test_assignment_zero_shuffle_plan(spark, sf_dir):
    """The corpus side must never shuffle: centroids are folded to one
    broadcast row and the argmin runs in codegen. No hashpartitioning
    exchange anywhere in the assignment plan."""
    emb = _emb(spark, sf_dir)
    plan = assign_clusters(emb, seed_centroids(emb)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_lloyd_iteration_never_increases_inertia(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    c0 = seed_centroids(emb)

    def inertia(centroids):
        return (cluster_stats(assign_clusters(emb, centroids))
                .agg(F.sum("sum_dist_q")).collect()[0][0])

    i0 = inertia(c0)
    c1 = refine_centroids(assign_clusters(emb, c0), c0)
    i1 = inertia(c1)
    c2 = refine_centroids(assign_clusters(emb, c1), c1)
    i2 = inertia(c2)
    # floor()-quantized means can cost at most 1 per dim per point vs
    # the true mean; monotone within that slack (and strictly
    # decreasing from random seeds in practice)
    assert i1 <= i0 and i2 <= i1 * 1.001, (i0, i1, i2)
    assert i1 < i0, "refinement did nothing"


def test_balanced_sample_quota_and_determinism(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    assigned = assign_clusters(emb, seed_centroids(emb))
    sizes = {r["cluster_id"]: r["n"]
             for r in cluster_stats(assigned).collect()}
    s1 = cluster_balanced_sample(assigned, per_cluster=3).collect()
    per = {}
    for r in s1:
        per[r["cluster_id"]] = per.get(r["cluster_id"], 0) + 1
    for cid, n in per.items():
        assert n == min(3, sizes[cid]), (cid, n)
    s2 = cluster_balanced_sample(assigned, per_cluster=3).collect()
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))


def test_semantic_dedup_pairs_within_cluster_and_reused(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seeds = seed_centroids(emb)
    pairs = semantic_dedup_pairs(emb, seeds, tau=0.3)
    rows = pairs.collect()
    assigned = {r["vec_id"]: r["cluster_id"]
                for r in assign_clusters(emb, seeds).collect()}
    for r in rows:
        assert r["a_id"] < r["b_id"]
        assert assigned[r["a_id"]] == assigned[r["b_id"]] == r["cluster_id"]
        assert r["sim"] >= 0.3

    # the two join sides share the assignment lineage; AQE must reuse
    # the exchange so the corpus is not re-scanned per side
    final = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final or "ReusedQueryStage" in final, final


def test_semantic_dedup_stats_consistent(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    seeds = seed_centroids(emb)
    row = semantic_dedup_stats(emb, seeds, tau=0.3).collect()[0]
    pairs = semantic_dedup_pairs(emb, seeds, tau=0.3).collect()
    dropped = {r["b_id"] for r in pairs}
    assert row["n_vectors"] == emb.count()
    assert row["n_sem_pairs"] == len(pairs)
    assert row["n_kept"] == row["n_vectors"] - len(dropped)


def test_semantic_dedup_cap_bounds_skewed_cluster(spark):
    """Degenerate mode-concentrated corpus: every vector lands in one
    cluster. Without the sub-bucket cap the pair join is C(n,2); with
    it the count is hard-bounded by ~n_sub * C(bucket,2) — the linear
    blocking bound the sf1-decade audit demanded."""
    import pyspark.sql.functions as F

    from logsqlite_spark.operators.clustering import (
        seed_centroids, semantic_dedup_pairs)

    n, cap = 400, 50
    # one tight mode: identical base vector + tiny unique perturbation
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 15), "
               "i -> cast(1.0 + (id % 97) * 0.0001 * (i + 1) as float))")
        .alias("embedding"))
    seeds = seed_centroids(emb, k=4)
    pairs = semantic_dedup_pairs(emb, seeds, tau=-1.0,
                                 max_cluster_size=cap)
    got = pairs.count()
    all_pairs = n * (n - 1) // 2
    # expected ~ n*cap/2 with hash variance; must be far below C(n,2)
    assert 0 < got < all_pairs // 3, (got, all_pairs)


def test_arrow_assignment_identical_to_sql(spark, sf_dir):
    """The vectorized numpy path must produce bit-identical
    assignments to the codegen HOF path (same int64 math, same
    first-hit tiebreak)."""
    from logsqlite_spark.operators.clustering import _emb

    emb = _emb(spark, sf_dir)
    seeds = seed_centroids(emb, k=40)  # >= _ARROW_K_THRESHOLD
    sql_rows = sorted(
        map(tuple, assign_clusters(emb, seeds, impl="sql")
            .select("vec_id", "cluster_id", "dist_q").collect()))
    arrow_rows = sorted(
        map(tuple, assign_clusters(emb, seeds, impl="arrow")
            .select("vec_id", "cluster_id", "dist_q").collect()))
    auto_rows = sorted(
        map(tuple, assign_clusters(emb, seeds)
            .select("vec_id", "cluster_id", "dist_q").collect()))
    assert sql_rows == arrow_rows == auto_rows


def test_semantic_dedup_incremental_equals_full_restricted(spark):
    """semantic_dedup_incremental(batch, history, frozen_centroids)
    must equal semantic_dedup_pairs(history ∪ batch, same centroids)
    restricted to pairs touching the batch — cluster sizes (hence the
    sub-bucket split) counted over the union on both sides."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.clustering import (
        auto_k,
        seed_centroids,
        semantic_dedup_incremental,
        semantic_dedup_pairs,
    )
    from logsqlite_spark.tables import table as t

    emb = t(spark, "/root/testdata/sf0.001", "embeddings")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    ctr = seed_centroids(hist, auto_k(hist))

    # the synthetic corpus is near-orthogonal; lower tau so pairs exist
    inc = semantic_dedup_incremental(batch, hist, ctr, tau=0.2)
    full = semantic_dedup_pairs(emb, ctr, tau=0.2).filter(
        (F.col("a_id") % 4 == 0) | (F.col("b_id") % 4 == 0))
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_semantic_dedup_incremental_excludes_history_only_pairs(spark):
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.clustering import (
        seed_centroids,
        semantic_dedup_incremental,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0, 0.0]),  # hist dup pair
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [1.0, 0.001, 0.0, 0.0]),   # batch: dup of 1 and 2
        (8, [0.0, 0.999, 0.01, 0.0]),  # batch: dup of 3
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    out = semantic_dedup_incremental(batch, hist, seed_centroids(hist, 2),
                                     tau=0.95)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert (1, 2) not in pairs          # history-only: excluded
    assert (1, 4) in pairs and (2, 4) in pairs and (3, 8) in pairs


def test_assignment_artifact_built_once_and_equivalent(spark):
    """The persisted assignment artifact's contract: the at-rest
    corpus is assigned ONCE (counter gate), serves the same rows the
    inline computation yields, and feeding it to
    semantic_dedup_incremental via history_assigned gives the exact
    same pairs as the self-contained recompute path."""
    from logsqlite_spark.operators import clustering as CL
    from logsqlite_spark.tables import table as t

    emb = t(spark, "/root/testdata/sf0.001", "embeddings")
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    k = CL.auto_k(hist)
    ctr = CL.seed_centroids(hist, k)

    CL.assignment_artifact(hist, ctr, k).count()   # builds or serves
    before = CL._ASSIGN_ARTIFACT_BUILDS
    art = CL.assignment_artifact(hist, ctr, k)
    assert art.count() > 0
    assert CL._ASSIGN_ARTIFACT_BUILDS == before

    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"
    inline = (CL.assign_clusters(hist, ctr)
              .withColumn("nq", F.expr(sq))
              .select("vec_id", "cluster_id", "qv", "nq"))
    assert sorted((r["vec_id"], r["cluster_id"], tuple(r["qv"]), r["nq"])
                  for r in art.collect()) == \
        sorted((r["vec_id"], r["cluster_id"], tuple(r["qv"]), r["nq"])
               for r in inline.collect())

    via_art = CL.semantic_dedup_incremental(
        batch, None, ctr, tau=0.2, history_assigned=art)
    recomputed = CL.semantic_dedup_incremental(batch, hist, ctr, tau=0.2)
    assert sorted(map(tuple, via_art.collect())) == \
        sorted(map(tuple, recomputed.collect()))
