"""Semantic clustering + cluster-curated sampling + SemDeDup (§2.8 ext).

The cluster-based curation tier of an LLM training-data pipeline
(SemDeDup, Abbas et al. 2023; DataComp-style cluster-balanced
selection): partition the embedding space around seed centroids,
then (a) audit cluster geometry, (b) sample the corpus evenly across
clusters instead of letting one dense mode dominate, (c) remove
*semantic* duplicates — pairs whose embeddings nearly coincide even
when their text differs — by confining the pairwise search to within
a cluster, which is what makes it tractable at scale.

Scale shapes:

- **assign_clusters is ZERO-shuffle.** The centroid table is folded
  into a single array row and broadcast; each embedding computes its
  argmin centroid with ``array_min(transform(...))`` inside
  whole-stage codegen. No per-row join, no aggregation — a 100 TB
  corpus assigns in one linear scan. (A first cut used a
  groupBy-argmin over an exploded corpus×centroids join: k× the scan
  rows through a shuffle for no reason.)
- **semantic_dedup confines pairs to clusters, with a hard cap.**
  Pair candidates are an equi-join on (cluster_id, sub_bucket):
  auto_k keeps the AVERAGE population constant, and oversized
  clusters (mode-concentrated corpora defeat seed balancing — the
  sf1-decade audit measured n^1.34 uncapped) are hash-split into
  ceil(size/cap) sub-buckets, bounding pairs at ~n·cap/2 at ANY
  skew — the same blocking bound the Jaccard df-cap uses.
  All-pairs never happens.
- Lloyd refinement (``refine_centroids``) is one explode +
  (cluster, dim) partial aggregation per iteration — the classic
  distributed k-means step; dims multiply map-side rows but the
  shuffle carries only k×dim partial sums.

Numeric determinism for the oracle (similarity.py's contract):
embeddings are quantized to integers (``floor(x*10000)``); every
distance/dot/norm is then an exact int64; centroid refinement uses
``floor(sum/count)`` which keeps components integral; seeds are drawn
in salted-md5 order (sampling.py's portable-bucket idiom). The only
FP ops (cosine's multiply/sqrt/divide) run on identical integers in
both engines, so all five registry queries carry FULL DuckDB oracles
— including the refined-centroid stats, whose oracle replays a Lloyd
iteration in SQL.

No reference parity (logsqlite has no vector ops) — this extends X2/X3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.operators.similarity import QUANT, _quantized
from logsqlite_spark.tables import rebalance_for_compute, table

K_CLUSTERS = 8
# SemDeDup's k scales with corpus size: k ~ n / target population
# keeps per-cluster pair counts (and thus total candidate pairs)
# LINEAR in n. A fixed k makes the within-cluster join quadratic.
TARGET_CLUSTER_SIZE = 64
SAMPLE_PER_CLUSTER = 5
# synthetic embeddings are near-orthogonal (max pairwise cosine ~0.51);
# real corpora use ~0.95+ for semantic dedup
SEM_TAU = 0.4
SEED_SALT = "ctr-v1"

_HASH = ("cast(conv(substr(md5(concat('{salt}:', cast({id} as string))), "
         "1, 15), 16, 10) as bigint)")

# exact int64 squared L2 distance between quantized vectors
_L2SQ = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
         "0L, (acc, d) -> acc + d)")


def seed_centroids(emb: DataFrame, k: int = K_CLUSTERS,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """k deterministic medoid seeds: the first k vectors in salted-md5
    order — a uniform, engine-portable pseudo-random draw (k-means's
    'random init', minus the RNG). Returns (cluster_id, cv) with cv
    quantized. The draw is a distributed top-k (TakeOrdered), never a
    global sort."""
    hashed = _quantized(emb, vec_col, "cv").select(
        F.col(id_col).alias("_sid"), "cv",
        F.expr(_HASH.format(salt=SEED_SALT, id=id_col)).alias("_h"))
    w = Window.orderBy("_h", "_sid")
    return (hashed.orderBy("_h", "_sid").limit(k)
            .select((F.row_number().over(w) - 1).cast("int")
                    .alias("cluster_id"), "cv"))


# above this many centroids the interpreted higher-order-function
# argmin (O(k*dim) lambda ops per row) loses to one Arrow-batched
# int64 matmul; both paths compute the SAME exact integers
_ARROW_K_THRESHOLD = 32


def assign_clusters(emb: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    impl: str = "auto") -> DataFrame:
    """Nearest-centroid assignment, zero-shuffle (module docstring).

    Output: (vec_id, cluster_id, dist_q, qv) — dist_q is the exact
    integer squared L2 distance in quantized space; ties break to the
    smaller cluster_id via lexicographic struct ordering in
    ``array_min``. qv (the quantized vector) rides along so chained
    operators (semantic_dedup) don't re-scan.

    ``impl``: ``"sql"`` = pure built-in expressions (broadcast
    centroid array + codegen argmin — best for small k, fully
    JVM-side); ``"arrow"`` = mapInArrow + numpy int64 matmul (d2 =
    |v|² + |c|² − 2·V·Cᵀ, argmin row-wise) — the per-row cost drops
    from O(k·dim) interpreted lambda steps to a vectorized BLAS-shaped
    product, which at auto_k (k ~ n/64, 312 centroids at 20k vectors)
    is ~10× faster; int64 matmul is exact and np.argmin's first-hit
    rule equals the SQL tiebreak (centroids sorted by cluster_id), so
    the two paths are value-identical and both oracle-green.
    ``"auto"`` picks by centroid count."""
    if impl == "auto":
        impl = "arrow" if centroids.count() >= _ARROW_K_THRESHOLD \
            else "sql"
    emb_q = (_quantized(emb, vec_col, "qv")
             .select(F.col(id_col).cast("long").alias("vec_id"), "qv"))
    if impl == "arrow":
        return _assign_arrow(emb_q, centroids)
    ctr_row = centroids.agg(
        F.collect_list(F.struct("cluster_id", "cv")).alias("ctrs"))
    best = (
        "array_min(transform(ctrs, c -> struct("
        + _L2SQ.format(a="qv", b="c.cv")
        + " as dist_q, c.cluster_id as cluster_id)))"
    )
    return (
        emb_q
        .crossJoin(F.broadcast(ctr_row))
        .select("vec_id", "qv", F.expr(best).alias("b"))
        .select("vec_id", "qv", F.col("b.cluster_id").alias("cluster_id"),
                F.col("b.dist_q").alias("dist_q"))
    )


def _assign_arrow(emb_q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Vectorized assignment twin (see assign_clusters ``impl``).
    Centroids are collected once (k×dim int64 — the same bound the
    broadcast-array path carries) and shipped in the task closure."""
    rows = centroids.orderBy("cluster_id").collect()
    import numpy as np
    C = np.array([list(r["cv"]) for r in rows], dtype=np.int64)
    cids = np.array([r["cluster_id"] for r in rows], dtype=np.int32)
    cn = (C * C).sum(axis=1)

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        for b in batches:
            if b.num_rows == 0:
                continue
            qv = b.column("qv")
            V = np.asarray(qv.flatten()).reshape(b.num_rows, -1)
            vn = (V * V).sum(axis=1)
            d2 = vn[:, None] + cn[None, :] - 2 * (V @ C.T)
            idx = d2.argmin(axis=1)  # first hit == smallest cluster_id
            yield pa.record_batch(
                [b.column("vec_id"), qv,
                 pa.array(cids[idx], type=pa.int32()),
                 pa.array(d2[np.arange(len(idx)), idx],
                          type=pa.int64())],
                names=["vec_id", "qv", "cluster_id", "dist_q"])

    return emb_q.mapInArrow(
        fn, "vec_id long, qv array<bigint>, cluster_id int, dist_q long")


def cluster_stats(assigned: DataFrame) -> DataFrame:
    """Cluster geometry audit: population and total/mean squared
    distance (integer-exact sum; mean rounded)."""
    return (
        assigned.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"),
             F.sum("dist_q").cast("long").alias("sum_dist_q"))
        .select("cluster_id", "n", "sum_dist_q",
                F.round(F.col("sum_dist_q").cast("double")
                        / F.col("n").cast("double"), 4).alias("mean_dist_q"))
    )


def cluster_balanced_sample(assigned: DataFrame,
                            per_cluster: int = SAMPLE_PER_CLUSTER,
                            salt: str = "csample-v1") -> DataFrame:
    """Exactly-N-per-cluster selection in salted-md5 order — the
    cluster-balanced (diversity) sampling of DataComp-style curation:
    a dense mode contributes the same quota as a sparse one. Same
    WindowGroupLimit shape as stratified_sample: the rank prunes
    per-cluster before any row moves, so the shuffle carries
    O(k·per_cluster) rows."""
    w = Window.partitionBy("cluster_id").orderBy("_h", "vec_id")
    return (
        assigned
        .withColumn("_h", F.expr(_HASH.format(salt=salt, id="vec_id")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_cluster)
        .select("cluster_id", "vec_id", F.col("rn").cast("int").alias("rn"))
    )


def refine_centroids(assigned: DataFrame,
                     centroids: DataFrame) -> DataFrame:
    """One Lloyd iteration: new centroid = element-wise
    ``floor(mean)`` of each cluster's quantized vectors (stays
    integral — further assignment rounds remain exact and
    oracle-replayable). Empty clusters keep their old centroid.

    Shape: posexplode to (cluster, dim, component) → partial-agg'd
    sum/count → re-assemble with ``array_agg`` sorted by position.
    The shuffle carries k×dim aggregated rows, not corpus rows."""
    sums = (
        assigned.select("cluster_id",
                        F.posexplode("qv").alias("pos", "x"))
        .groupBy("cluster_id", "pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
        .withColumn("m", F.expr("cast(floor(s / c) as bigint)"))
        .groupBy("cluster_id")
        .agg(F.expr("transform(array_sort(collect_list(struct(pos, m))), "
                    "p -> p.m)").alias("new_cv"))
    )
    return (
        centroids.join(sums, "cluster_id", "left")
        .select("cluster_id",
                F.coalesce("new_cv", "cv").alias("cv"))
    )


SUB_SALT = "subsplit-v1"
MAX_CLUSTER_SIZE = 256


def semantic_dedup_pairs(emb: DataFrame, centroids: DataFrame,
                         tau: float = SEM_TAU,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         max_cluster_size: int = MAX_CLUSTER_SIZE
                         ) -> DataFrame:
    """SemDeDup: embedding pairs with cosine ≥ tau, searched ONLY
    within a cluster. Candidates are one ``groupBy(cluster_id, _sub)``
    pandas group per (sub-bucketed) cluster whose |bucket|×|bucket|
    integer Gram matrix scores every intra-bucket pair in a single
    numpy matmul (the r16 rewrite — detailed inline below; the former
    cluster_id self-join shipped each vector ~bucket_size times).
    Scoring stays the exact quantized-integer cosine of the X3 paths,
    so exact/LSH/IVF/semantic dedup differ only in candidate
    generation, never in scoring.

    ``max_cluster_size`` is the worst-case pair bound. auto_k keeps
    the AVERAGE cluster population constant, but on mode-concentrated
    corpora seed-based assignment is skewed — most of a dense mode
    falls to one centroid, and the sf1-decade audit measured pair
    growth n^1.34 without a cap. An oversized cluster is therefore
    split into ceil(size / cap) deterministic salted-md5 sub-buckets
    (balanced clusters get ONE bucket — a no-op), which hard-bounds
    pairs at ~n·cap/2 — linear at ANY skew, the same blocking bound
    the Jaccard df-cap uses. Cost: near-dup pairs straddling
    sub-buckets of a hot cluster are missed (recall < 1 there, like
    every blocking cap); dup-dense clusters are exactly where dups
    concentrate, so the kept intra-bucket pairs still find the mass.
    The per-cluster sizes come from one tiny aggregation of the
    assignment (O(k) rows) joined back on cluster_id.
    """
    # squared norms are per-VECTOR, so compute them once on the
    # assignment side, not per pair — a first cut recomputed both
    # norms inside the pair row (192 lambda ops/pair vs 64 for the
    # dot alone) and was ~3x slower at sf0.1
    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"
    assigned = (
        assign_clusters(emb, centroids, id_col, vec_col)
        .withColumn("nq", F.expr(sq))
        .filter(F.col("nq") > 0)
    )
    sizes = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("_sz"))
    assigned = (
        assigned.join(sizes, "cluster_id")
        .withColumn("_sub", F.expr(_HASH.format(salt=SUB_SALT,
                                                id="vec_id"))
                    % F.ceil(F.col("_sz") / F.lit(max_cluster_size))
                    .cast("long"))
    )
    # scoring (r16): one pandas group per (cluster_id, _sub) bucket —
    # each vector crosses the wire ONCE (the former self-join shipped
    # every vector ~bucket_size times into the pair rows), and the
    # |bucket| x |bucket| integer Gram matrix is ONE numpy matmul per
    # group instead of per-pair interpreted zip_with/aggregate lambdas
    # (guide §2.3 / §4.2; measured 1.64 s -> see OPTIMIZATION_r16).
    # Bit-exactness: int64 matmul is exact (|qv| <= 1e4, dim 64 →
    # |dot| <= 6.4e9 << 2^63) and cast→multiply→sqrt→divide runs the
    # same correctly-rounded IEEE double ops Spark's expressions ran;
    # the display rounding stays IN SPARK (F.round is HALF_UP, numpy
    # rounds half-even) so the emitted sim is bitwise the old value.
    # Group state is hard-bounded by max_cluster_size rows of dim
    # int64s — the same cap that bounds the pair count.
    def _score_bucket(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"cluster_id": pd.Series(dtype="int32"),
                              "a_id": pd.Series(dtype="int64"),
                              "b_id": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        V = np.array(pdf["qv"].tolist(), dtype=np.int64)
        nq = pdf["nq"].to_numpy(dtype=np.int64)
        dots = (V @ V.T).astype(np.float64)
        den = np.sqrt(nq.astype(np.float64)[:, None]
                      * nq.astype(np.float64)[None, :])
        sim = dots / den
        iu, ju = np.triu_indices(n, k=1)  # ids sorted → a_id < b_id
        m = sim[iu, ju] >= tau
        if not m.any():
            return empty
        return pd.DataFrame({
            "cluster_id": np.full(int(m.sum()), key[0], dtype="int32"),
            "a_id": ids[iu[m]], "b_id": ids[ju[m]],
            "sim": sim[iu, ju][m]})

    scored = (assigned
              .select("cluster_id", "_sub", "vec_id", "qv", "nq")
              .groupBy("cluster_id", "_sub")
              .applyInPandas(_score_bucket,
                             "cluster_id int, a_id long, b_id long, "
                             "sim double"))
    return scored.select("cluster_id", "a_id", "b_id",
                         F.round("sim", 6).alias("sim"))


def semantic_dedup_incremental(new_emb: DataFrame,
                               history_emb: DataFrame | None,
                               centroids: DataFrame,
                               tau: float = SEM_TAU,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               max_cluster_size: int = MAX_CLUSTER_SIZE,
                               history_assigned: DataFrame | None = None,
                               ) -> DataFrame:
    """SemDeDup pairs INVOLVING a new batch, against frozen centroids
    — the incremental twin of :func:`semantic_dedup_pairs` (round 9),
    completing the incremental family across every dedup modality
    (exact/jaccard: ``dedup_incremental``; substring:
    ``repeated_ngram_stats_incremental``; winnow:
    ``winnow_matches_incremental``; embedding: this).

    ``centroids`` are fit on HISTORY (frozen; refit on drift is the
    IVF append playbook).  Assignment is the same zero-shuffle
    broadcast argmin for both sides; cluster sizes — which drive the
    sub-bucket split — are counted over history ∪ batch, so every
    doc's ``_sub`` equals what the full recompute assigns and the
    result is IDENTICAL to ``semantic_dedup_pairs(history ∪ batch,
    centroids)`` restricted to pairs touching the batch
    (pytest-pinned; the oracled query replays the full formulation).

    Scale shape: the history side is pruned to the batch's
    (cluster_id, _sub) key set by a broadcast semi-join BEFORE the
    pair join — clusters the batch doesn't touch never enter the
    shuffle (the winnow-incremental argument: a batch-involving pair
    shares the batch doc's bucket by definition).  Pass
    ``history_assigned`` (the persisted output of
    :func:`assignment_artifact` — (vec_id, cluster_id, qv, nq) rows)
    to skip re-assigning the at-rest corpus entirely; without it the
    history assignment is recomputed from embeddings for
    self-containment.  Either way the per-batch ASSIGNMENT work is
    O(batch); with the artifact the history side is a columnar scan.
    """
    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"

    def _assigned(df: DataFrame, nw: int) -> DataFrame:
        return (assign_clusters(df, centroids, id_col, vec_col)
                .withColumn("nq", F.expr(sq))
                .filter(F.col("nq") > 0)
                .withColumn("nw", F.lit(nw))
                .select("vec_id", "cluster_id", "qv", "nq", "nw"))

    hist = (history_assigned.select("vec_id", "cluster_id", "qv", "nq")
            .filter(F.col("nq") > 0)
            .withColumn("nw", F.lit(0))
            if history_assigned is not None
            else _assigned(history_emb, 0))
    combined = hist.unionByName(_assigned(new_emb, 1))
    sizes = combined.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("_sz"))
    combined = (
        combined.join(sizes, "cluster_id")
        .withColumn("_sub", F.expr(_HASH.format(salt=SUB_SALT,
                                                id="vec_id"))
                    % F.ceil(F.col("_sz") / F.lit(max_cluster_size))
                    .cast("long"))
    )
    batch_keys = combined.filter(F.col("nw") == 1) \
        .select("cluster_id", "_sub")
    pruned = combined.join(F.broadcast(batch_keys),
                           ["cluster_id", "_sub"], "leftsemi")
    scored = (
        pruned.select("cluster_id", "_sub", "nw",
                      F.col("vec_id").alias("a_id"),
                      F.col("qv").alias("ai"), F.col("nq").alias("an"))
        .withColumnRenamed("nw", "anw")
        .join(pruned.select("cluster_id", "_sub", "nw",
                            F.col("vec_id").alias("b_id"),
                            F.col("qv").alias("bi"),
                            F.col("nq").alias("bn"))
              .withColumnRenamed("nw", "bnw"),
              ["cluster_id", "_sub"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((F.col("anw") == 1) | (F.col("bnw") == 1))
        .withColumn("dot", F.expr(
            "aggregate(zip_with(ai, bi, (x, y) -> x * y), 0L, "
            "(acc, x) -> acc + x)"))
        .withColumn("sim", F.col("dot").cast("double")
                    / F.sqrt(F.col("an").cast("double")
                             * F.col("bn").cast("double")))
        .filter(F.col("sim") >= tau)
    )
    return scored.select("cluster_id", "a_id", "b_id",
                         F.round("sim", 6).alias("sim"))


def semantic_dedup_stats(emb: DataFrame, centroids: DataFrame,
                         tau: float = SEM_TAU) -> DataFrame:
    """One-row summary: corpus size, semantic-dup pairs found, and
    survivors under the keep-smallest-id policy (a vector is dropped
    iff it appears as the larger id of some pair — SemDeDup's 'keep
    one representative per group' with the same deterministic
    tie-break the exact-dedup path uses)."""
    pairs = semantic_dedup_pairs(emb, centroids, tau)
    # ONE action over the expensive pair lineage: count and distinct
    # dropped ids in the same aggregation (three separate .count()s
    # re-ran the whole clustered join twice more — review r5)
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.countDistinct("b_id").cast("long").alias("n_dropped")
    ).collect()[0]
    total = emb.count()  # metadata-only parquet count-star
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(total, agg["n_pairs"], total - agg["n_dropped"])],
        "n_vectors long, n_sem_pairs long, n_kept long")


# ---------------------------------------------------------------------------
# registry surface


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rebalance_for_compute(table(spark, sf_dir, "embeddings"))


def _q_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return assign_clusters(emb, seed_centroids(emb)).drop("qv")


def _q_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return cluster_stats(assign_clusters(emb, seed_centroids(emb)))


def _q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return cluster_balanced_sample(
        assign_clusters(emb, seed_centroids(emb)))


def _q_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats after ONE Lloyd iteration — pins the refinement math
    (the oracle replays the same iteration in SQL)."""
    emb = _emb(spark, sf_dir)
    c0 = seed_centroids(emb)
    c1 = refine_centroids(assign_clusters(emb, c0), c0)
    return cluster_stats(assign_clusters(emb, c1))


# k is capped: the centroid table is broadcast (collected for the
# arrow path), so it cannot grow O(n) forever — 4096 centroids x 64
# dims is ~2 MB, safe at any cluster size. Beyond the cap, average
# cluster population grows with n, and LINEARITY of the pair join is
# carried by the sub-bucket cap alone (which bounds pairs at ~n*cap/2
# regardless of cluster size); the clusters just get semantically
# coarser. A corpus needing finer semantic granularity at that scale
# uses hierarchical clustering (coarse assign -> per-cell re-cluster),
# which composes from these same primitives.
MAX_K = 4096


def auto_k(emb: DataFrame) -> int:
    """k for SemDeDup at this corpus size (module constant note).
    The count is a metadata-only parquet count-star."""
    return max(K_CLUSTERS,
               min(emb.count() // TARGET_CLUSTER_SIZE, MAX_K))


def _q_sem_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return semantic_dedup_pairs(emb, seed_centroids(emb, auto_k(emb)))


def _q_sem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return semantic_dedup_stats(emb, seed_centroids(emb, auto_k(emb)))


# test hook: eager builds of the persisted assignment artifact — the
# contract is "the at-rest corpus is assigned once, ever" (the same
# counter-gate argument as similarity._SQ_SCALE_COMPUTES and
# textstats._WINNOW_ARTIFACT_BUILDS)
_ASSIGN_ARTIFACT_BUILDS = 0


def assignment_artifact(emb: DataFrame, centroids: DataFrame,
                        k: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """The corpus's cluster assignment (vec_id, cluster_id, qv, nq) as
    a PERSISTED artifact — fingerprint-keyed parquet under the shared
    artifact root, built once per (corpus, k) and served on every
    later call (round 9; the winnow-fp-artifact protocol applied to
    clustering).  Incremental by construction: assignment is per-row
    given frozen centroids, so corpus ∪ batch = this table plus the
    batch's own assignment — append per ingest batch.  A literal or
    streaming corpus (no backing files) computes inline.
    ``k`` keys the artifact because centroids derive deterministically
    from (corpus, k)."""
    import hashlib
    import os

    from logsqlite_spark.operators import similarity as _SIM
    from logsqlite_spark.tables import frames_fingerprint

    global _ASSIGN_ARTIFACT_BUILDS
    spark = emb.sparkSession
    sq = "aggregate(transform(qv, x -> x * x), 0L, (acc, x) -> acc + x)"
    inline = (assign_clusters(emb, centroids, id_col, vec_col)
              .withColumn("nq", F.expr(sq))
              .select("vec_id", "cluster_id", "qv", "nq"))
    try:
        files = emb.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frames
        files = []
    if not files:
        return inline
    from logsqlite_spark.artifacts import write_parts

    # -v2 (r17): size-derived output file count — the raw write
    # inherited the assignment's partitioning and served 32 tiny files
    # per query rep at bench scale (guide §6)
    key = hashlib.sha256("|".join(
        (frames_fingerprint(emb), id_col, vec_col, str(k),
         "sem-assign-v2")).encode()).hexdigest()[:16]
    path = os.path.join(_SIM._ivf_index_root(), key)
    sized = lambda: inline.repartition(write_parts(files, spark))  # noqa: E731
    with _SIM._IVF_BUILD_LOCK:
        if not _SIM._index_marker_exists(spark, path):
            local = _SIM._local_fs_path(path)
            if local is not None:
                with _SIM._DirBuildLock(local):
                    if not _SIM._index_marker_exists(spark, path):
                        _ASSIGN_ARTIFACT_BUILDS += 1
                        sized().write.mode("overwrite") \
                            .parquet(f"{path}/assign")
                        _SIM._write_index_marker(spark, path)
            else:
                _ASSIGN_ARTIFACT_BUILDS += 1
                sized().write.mode("overwrite").parquet(f"{path}/assign")
                _SIM._write_index_marker(spark, path)
            _SIM._gc_auto_index_root()
        else:
            _SIM._touch_index_marker(path)
    from logsqlite_spark.artifacts import serve_parquet
    return serve_parquet(spark, path, "assign")


def _q_sem_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch = vec_id % 4 == 0 (the incremental-twin convention);
    centroids fit on history only — frozen geometry; the history
    assignment served from the persisted artifact, so repeated calls
    never re-assign the at-rest corpus."""
    emb = _emb(spark, sf_dir)
    hist = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    k = auto_k(hist)
    ctr = seed_centroids(hist, k)
    return semantic_dedup_incremental(
        batch, None, ctr,
        history_assigned=assignment_artifact(hist, ctr, k))


QUERIES = {
    "cluster_assign": _q_assign,
    "cluster_stats": _q_stats,
    "cluster_sample": _q_sample,
    "cluster_refined_stats": _q_refined,
    "semantic_dedup_pairs": _q_sem_pairs,
    "semantic_dedup_stats": _q_sem_stats,
    "semantic_dedup_inc": _q_sem_inc,
}

_ORACLE_QV = ("list_transform(embedding, "
              "x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))")

_O_HASH = ("CAST('0x' || substr(md5('{salt}:' || CAST({id} AS VARCHAR)), "
           "1, 15) AS BIGINT)")

# exact integer L2^2 via the norm/dot decomposition (list_dot_product
# on values ≤ ~2.6e10 is integer-exact in doubles)
# oracle-side auto_k: same rule as the Spark helper, evaluated by
# DuckDB so the two sides stay in lockstep at every scale factor
_O_AUTO_K = (f"(SELECT greatest({K_CLUSTERS}, least("
             f"count(*) // {TARGET_CLUSTER_SIZE}, {MAX_K})) "
             "FROM embeddings)")

_O_SEEDS = (
    "seeds AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) - 1 "
    "    AS INT) AS cluster_id, cv, "
    "  list_aggregate(list_transform(cv, x -> x * x), 'sum') AS cn "
    "  FROM (SELECT vec_id, {qv} AS cv, "
    + _O_HASH.format(salt=SEED_SALT, id="vec_id")
    + " AS h FROM embeddings ORDER BY h, vec_id LIMIT {klim})), "
    "base AS (SELECT vec_id, {qv} AS v, "
    "  list_aggregate(list_transform({qv}, x -> x * x), 'sum') AS vn "
    "  FROM embeddings), "
    "assign AS (SELECT vec_id, v, vn, cluster_id, dist_q FROM ("
    "  SELECT b.vec_id, b.v, b.vn, s.cluster_id, "
    "    CAST(b.vn + s.cn - 2 * list_dot_product(CAST(b.v AS DOUBLE[]), "
    "      CAST(s.cv AS DOUBLE[])) AS BIGINT) AS dist_q, "
    "    row_number() OVER (PARTITION BY b.vec_id "
    "      ORDER BY b.vn + s.cn - 2 * list_dot_product("
    "        CAST(b.v AS DOUBLE[]), CAST(s.cv AS DOUBLE[])), s.cluster_id) "
    "      AS rk "
    "  FROM base b CROSS JOIN seeds s) WHERE rk = 1)"
)

# oracle twin of the sub-bucket cap: oversized clusters split into
# ceil(size/cap) salted-md5 buckets (balanced clusters -> 1 bucket)
_O_SUBSPLIT = (
    "nz AS (SELECT * FROM assign WHERE vn > 0), "
    "sizes AS (SELECT cluster_id, count(*) AS sz FROM nz "
    "  GROUP BY cluster_id), "
    "sub AS (SELECT nz.*, "
    + _O_HASH.format(salt=SUB_SALT, id="vec_id")
    + f" % CAST(ceil(CAST(sz AS DOUBLE) / {MAX_CLUSTER_SIZE}) AS BIGINT)"
    " AS sub FROM nz JOIN sizes USING (cluster_id))"
)

# incremental twins: seeds + auto_k evaluated over HISTORY only
# (vec_id % 4 <> 0 — frozen geometry), assignment/sizes/subsplit over
# the full union (what the Spark side's union-sized _sub reproduces),
# pairs restricted to batch-involving
_O_SEEDS_INC = _O_SEEDS.replace(
    "AS h FROM embeddings ORDER BY",
    "AS h FROM embeddings WHERE vec_id % 4 <> 0 ORDER BY")
_O_AUTO_K_INC = _O_AUTO_K.replace(
    "FROM embeddings)", "FROM embeddings WHERE vec_id % 4 <> 0)")

ORACLES = {
    "semantic_dedup_inc": (
        "WITH " + _O_SEEDS_INC + ", " + "{subsplit} "
        "SELECT a.cluster_id, a.vec_id AS a_id, b.vec_id AS b_id, "
        "round(list_dot_product(CAST(a.v AS DOUBLE[]), "
        "    CAST(b.v AS DOUBLE[])) "
        "  / sqrt(CAST(a.vn AS DOUBLE) * CAST(b.vn AS DOUBLE)), 6) AS sim "
        "FROM sub a JOIN sub b ON a.cluster_id = b.cluster_id "
        "AND a.sub = b.sub AND a.vec_id < b.vec_id "
        "WHERE list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        f"  / sqrt(CAST(a.vn AS DOUBLE) * CAST(b.vn AS DOUBLE)) >= {SEM_TAU} "
        "AND (a.vec_id % 4 = 0 OR b.vec_id % 4 = 0)"
    ).format(qv=_ORACLE_QV, klim=_O_AUTO_K_INC, subsplit=_O_SUBSPLIT),
    "cluster_assign": (
        "WITH " + _O_SEEDS +
        " SELECT vec_id, cluster_id, dist_q FROM assign"
    ).format(qv=_ORACLE_QV, klim='8'),
    "cluster_stats": (
        "WITH " + _O_SEEDS +
        " SELECT cluster_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(dist_q) AS BIGINT) AS sum_dist_q, "
        "round(CAST(sum(dist_q) AS DOUBLE) / count(*), 4) AS mean_dist_q "
        "FROM assign GROUP BY cluster_id"
    ).format(qv=_ORACLE_QV, klim='8'),
    "cluster_sample": (
        "WITH " + _O_SEEDS + ", "
        "ranked AS (SELECT cluster_id, vec_id, "
        "  row_number() OVER (PARTITION BY cluster_id ORDER BY "
        + _O_HASH.format(salt="csample-v1", id="vec_id")
        + ", vec_id) AS rn FROM assign) "
        "SELECT cluster_id, vec_id, CAST(rn AS INT) AS rn "
        f"FROM ranked WHERE rn <= {SAMPLE_PER_CLUSTER}"
    ).format(qv=_ORACLE_QV, klim='8'),
    "cluster_refined_stats": (
        "WITH " + _O_SEEDS + ", "
        # one Lloyd iteration: floor(mean) per component, empty
        # clusters keep their seed
        "comp AS (SELECT cluster_id, pos, "
        "    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS m "
        "  FROM (SELECT cluster_id, unnest(v) AS x, "
        "    generate_subscripts(v, 1) AS pos FROM assign) "
        "  GROUP BY cluster_id, pos), "
        "refined AS (SELECT s.cluster_id, "
        "  COALESCE(n.cv, s.cv) AS cv, "
        "  list_aggregate(list_transform(COALESCE(n.cv, s.cv), "
        "    x -> x * x), 'sum') AS cn "
        "  FROM seeds s LEFT JOIN (SELECT cluster_id, "
        "    list(m ORDER BY pos) AS cv FROM comp GROUP BY cluster_id) n "
        "  ON n.cluster_id = s.cluster_id), "
        "assign2 AS (SELECT vec_id, cluster_id, dist_q FROM ("
        "  SELECT b.vec_id, r.cluster_id, "
        "    CAST(b.vn + r.cn - 2 * list_dot_product(CAST(b.v AS DOUBLE[]), "
        "      CAST(r.cv AS DOUBLE[])) AS BIGINT) AS dist_q, "
        "    row_number() OVER (PARTITION BY b.vec_id "
        "      ORDER BY b.vn + r.cn - 2 * list_dot_product("
        "        CAST(b.v AS DOUBLE[]), CAST(r.cv AS DOUBLE[])), "
        "        r.cluster_id) AS rk "
        "  FROM base b CROSS JOIN refined r) WHERE rk = 1) "
        "SELECT cluster_id, CAST(count(*) AS BIGINT) AS n, "
        "CAST(sum(dist_q) AS BIGINT) AS sum_dist_q, "
        "round(CAST(sum(dist_q) AS DOUBLE) / count(*), 4) AS mean_dist_q "
        "FROM assign2 GROUP BY cluster_id"
    ).format(qv=_ORACLE_QV, klim='8'),
    "semantic_dedup_pairs": (
        "WITH " + _O_SEEDS + ", " + "{subsplit} "
        "SELECT a.cluster_id, a.vec_id AS a_id, b.vec_id AS b_id, "
        "round(list_dot_product(CAST(a.v AS DOUBLE[]), "
        "    CAST(b.v AS DOUBLE[])) "
        "  / sqrt(CAST(a.vn AS DOUBLE) * CAST(b.vn AS DOUBLE)), 6) AS sim "
        "FROM sub a JOIN sub b ON a.cluster_id = b.cluster_id "
        "AND a.sub = b.sub AND a.vec_id < b.vec_id "
        "WHERE list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        f"  / sqrt(CAST(a.vn AS DOUBLE) * CAST(b.vn AS DOUBLE)) >= {SEM_TAU}"
    ).format(qv=_ORACLE_QV, klim=_O_AUTO_K, subsplit=_O_SUBSPLIT),
    "semantic_dedup_stats": (
        "WITH " + _O_SEEDS + ", " + "{subsplit} , "
        "pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id "
        "  FROM sub a JOIN sub b ON a.cluster_id = b.cluster_id "
        "  AND a.sub = b.sub AND a.vec_id < b.vec_id "
        "  WHERE list_dot_product(CAST(a.v AS DOUBLE[]), "
        "      CAST(b.v AS DOUBLE[])) "
        f"    / sqrt(CAST(a.vn AS DOUBLE) * CAST(b.vn AS DOUBLE)) "
        f"    >= {SEM_TAU}) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) "
        "  AS n_vectors, "
        "(SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_sem_pairs, "
        "(SELECT CAST(count(*) AS BIGINT) FROM embeddings) - "
        "(SELECT CAST(count(DISTINCT b_id) AS BIGINT) FROM pairs) "
        "  AS n_kept"
    ).format(qv=_ORACLE_QV, klim=_O_AUTO_K, subsplit=_O_SUBSPLIT),
}
