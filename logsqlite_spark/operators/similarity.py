"""Similarity search over embeddings (SURVEY.md §2.8 X3).

Two paths, as a real 100 TB pipeline would ship them:

- **Brute-force cosine top-k** — the exact baseline. The query set is
  broadcast (it's small by construction); the corpus is scanned once,
  embarrassingly parallel, with a per-partition partial top-k folded by
  a ranking window. Linear in corpus size, zero corpus shuffle beyond
  the final tiny top-k aggregation.
- **LSH-bucketed ANN** (``BucketedRandomProjectionLSH``) — the
  sublinear path: corpus hashed once into buckets; a query only meets
  its bucket's members. Deterministic seed.

Numeric determinism for the oracle: similarities are computed on
*quantized* vectors (``floor(x * 10000)`` per element). Every dot
product and norm is then an integer < 2^53, exactly representable even
if an engine sums in doubles, so Spark and DuckDB agree bit-for-bit;
the only FP ops (one multiply, one sqrt, one divide) are IEEE-identical
on identical inputs. Ranks tie-break on neighbor id.
"""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.tables import rebalance_for_compute, table

N_QUERIES = 10
TOP_K = 5
QUANT = 10_000

_QUANTIZE = "transform({c}, x -> cast(floor(cast(x as double) * {q}) as bigint))"
_SQNORM = "aggregate(transform({v}, x -> x * x), 0L, (acc, x) -> acc + x)"
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"

def _quantized(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    return df.withColumn(out, F.expr(_QUANTIZE.format(c=vec_col, q=QUANT)))

def cosine_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries_df is broadcast; corpus partitions never shuffle until the
    final per-query top-k (window over qid — tiny after rank filter
    pushes into the sort via WindowGroupLimit).
    """
    q = _quantized(
        queries_df.select(F.col(id_col).alias("qid"),
                          F.col(vec_col).alias("qv")), "qv", "qi"
    ).withColumn("qn", F.expr(_SQNORM.format(v="qi"))).drop("qv")
    # the corpus never shuffles (query side broadcasts), so every dot
    # product runs where the scan ran — rebalance when the scan is a
    # single small file so all cores participate (no-op at scale)
    c = _quantized(
        rebalance_for_compute(corpus_df)
        .select(F.col(id_col).alias("nid"),
                F.col(vec_col).alias("nv")), "nv", "ni"
    ).withColumn("nn", F.expr(_SQNORM.format(v="ni"))).drop("nv")

    joined = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt(F.col("qn").cast("double") * F.col("nn").cast("double")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("nid").cast("long"),
            F.col("rank").cast("int"),
            F.round("sim", 6).alias("sim"),
        )
    )

SQ_DIM = 64
SQ_LEVELS = 127

# rerank-fetch broadcast gate: winners rows are ~25B (qid, nid,
# cluster), so even 64k candidates/query x a plausible query-batch
# stays well under spark.sql.autoBroadcastJoinThreshold territory;
# anything larger (notably the unbounded-c measurement runs) takes a
# plain join and lets AQE decide from the observed size
_WINNER_BROADCAST_C_MAX = 1 << 16

_SQ_ENCODE = (
    "zip_with({v}, {sc}, (x, s) -> coalesce(cast(floor("
    "cast(x as double) / nullif(s, 0D) * {lv}.0D + 0.5D) as bigint), 0L))"
)

# saturating variant for FROZEN-scale encoding (incremental appends):
# a batch value outside the base corpus's per-dim range would overflow
# int8 under the plain formula — standard SQ practice clamps to the
# code range instead (the fp vector is exact; rerank restores
# precision).  The self-encoded paths keep the unclamped formula their
# DuckDB oracles replicate (a corpus can't exceed its own max-abs).
_SQ_ENCODE_SAT = (
    "zip_with({v}, {sc}, (x, s) -> greatest(-{lv}L, least({lv}L, "
    "coalesce(cast(floor("
    "cast(x as double) / nullif(s, 0D) * {lv}.0D + 0.5D) as bigint), 0L))))"
)

# test hook: number of full-corpus scale aggregations actually run —
# the persisted-scales contract is "one scan per corpus, ever", and a
# counter is the only honest way to pin it (the scan happens eagerly
# at plan-build time, so it never appears in the returned plan)
_SQ_SCALE_COMPUTES = 0


def _compute_sq_scales(corpus_df: DataFrame, dim: int,
                       vec_col: str) -> list[float]:
    """One map-side-combined aggregation: per-dim max(abs(x)) — the
    symmetric-quantization scale vector. Bounded by dimensionality
    (dim doubles on the driver), not data."""
    global _SQ_SCALE_COMPUTES
    _SQ_SCALE_COMPUTES += 1
    row = corpus_df.agg(*[
        F.max(F.abs(F.col(vec_col)[i].cast("double"))).alias(f"s{i}")
        for i in range(dim)
    ]).collect()[0]
    return [float(row[f"s{i}"] or 0.0) for i in range(dim)]


def _sq_auto_path(corpus_df: DataFrame, vec_col: str,
                  dim: int) -> str | None:
    """Deterministic scales-artifact location for a file-backed corpus
    (same fingerprint discipline as the IVF index: backing files AND
    the normalized plan key it, so a rewritten or filtered corpus
    never serves another corpus's scales), or None for literal/
    streaming frames which compute inline."""
    import hashlib
    import os

    from logsqlite_spark.tables import frames_fingerprint

    try:
        files = corpus_df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frames
        return None
    if not files:
        return None
    key = hashlib.sha256("|".join(
        (frames_fingerprint(corpus_df), vec_col, str(dim),
         "sq-scales")).encode()).hexdigest()[:16]
    return os.path.join(_ivf_index_root(), key)


def sq_scales(corpus_df: DataFrame, dim: int = SQ_DIM,
              vec_col: str = "embedding") -> list[float]:
    """Per-dim SQ scale vector, served from a fingerprint-keyed
    persisted artifact (VERDICT r6 #4: the scales were recomputed with
    a full corpus aggregation on EVERY query batch — at 100 TB that is
    an extra corpus scan per call; a serving store computes them once
    at index-build time). Build-once / load-forever under the same
    cross-process flock + marker protocol as the IVF index; the
    artifact is a single 64-double row, so loads are driver-trivial.
    Non-file corpora (unit-test literal frames) compute inline."""
    spark = corpus_df.sparkSession
    path = _sq_auto_path(corpus_df, vec_col, dim)
    if path is None:
        return _compute_sq_scales(corpus_df, dim, vec_col)
    # fingerprint-keyed auto path -> immutable artifact: once loaded,
    # the 64-double vector is served from the in-process memo (r16 —
    # the reload was a per-call driver parquet read + collect job)
    hit = _SQ_SCALES_CACHE.get((spark.sparkContext.applicationId, path))
    if hit is not None:
        return hit
    with _IVF_BUILD_LOCK:
        if not _index_marker_exists(spark, path):
            def _build() -> None:
                scales = _compute_sq_scales(corpus_df, dim, vec_col)
                spark.createDataFrame(
                    [(scales,)], "scales array<double>"
                ).coalesce(1).write.mode("overwrite") \
                    .parquet(f"{path}/scales")
                _write_index_marker(spark, path)

            local = _local_fs_path(path)
            if local is not None:
                with _DirBuildLock(local):
                    if not _index_marker_exists(spark, path):
                        _build()
            else:
                _build()
            _gc_auto_index_root()
        else:
            _touch_index_marker(path)
    row = spark.read.parquet(f"{path}/scales").collect()[0]
    scales = [float(x) for x in row["scales"]]
    _SQ_SCALES_CACHE[(spark.sparkContext.applicationId, path)] = scales
    return scales


def sq_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    dim: int = SQ_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors over int8 scalar-quantized vectors.

    The 100 TB play is memory bandwidth: per-dimension symmetric
    quantization ``code_i = round(x_i / s_i * 127)`` shrinks fp32
    embeddings 4x (and 8x vs fp64 staging), which is the standard
    first compression tier of a production vector store — scan
    bandwidth, shuffle volume, and cache footprint all drop by the
    same factor while recall stays near-exact (the per-dim scale
    spends the full 8-bit range on each coordinate's actual spread).

    Execution shape mirrors :func:`cosine_topk`: the per-dim scales
    come from the fingerprint-keyed persisted artifact
    (:func:`sq_scales` — built ONCE per corpus, loaded thereafter;
    64 doubles, bounded by dimensionality not data, the same class as
    the clustering centroids) and are inlined as a literal array so
    the scoring plan scans the corpus exactly once; codes are built
    JVM-side with ``zip_with`` (whole-stage codegen, no Python); the
    corpus never shuffles (query side broadcasts) and top-k is the
    WindowGroupLimit pattern. Everything after the scale pass is
    INTEGER math — deterministic across engines and partitionings, so
    unlike LSH/IVF this approximate path carries a full DuckDB
    value-hash oracle.
    """
    sc = F.array(*[F.lit(s)
                   for s in sq_scales(corpus_df, dim, vec_col)])

    enc = _SQ_ENCODE.format(v="v", sc="sc", lv=SQ_LEVELS)
    q = (
        queries_df.select(F.col(id_col).alias("qid"),
                          F.col(vec_col).alias("v"), sc.alias("sc"))
        .withColumn("qi", F.expr(enc))
        .withColumn("qn", F.expr(_SQNORM.format(v="qi")))
        .select("qid", "qi", "qn")
    )
    c = (
        rebalance_for_compute(corpus_df)
        .select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"),
                sc.alias("sc"))
        .withColumn("ni", F.expr(enc))
        .withColumn("nn", F.expr(_SQNORM.format(v="ni")))
        .select("nid", "ni", "nn")
    )
    joined = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt(F.col("qn").cast("double") * F.col("nn").cast("double")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("nid").cast("long"),
            F.col("rank").cast("int"),
            F.round("sim", 6).alias("sim"),
        )
    )


def sq_rerank_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    c: int = 32,
    dim: int = SQ_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: int8 SQ prefilter to top-``c`` candidates, then
    full-precision rerank to top-``k`` — the standard production
    topping over :func:`sq_topk`.

    At 100 TB the heavy pass (every corpus vector) runs on the 4x
    compressed codes; the rerank touches only ``n_queries * c`` rows,
    fetched by id (here: a broadcast semi-join against the corpus —
    in a serving store, point lookups). Recall is near-exact because
    rank flips under int8 quantization are local: the true top-k
    almost always sits inside the int8 top-32 even on the isotropic
    worst-case corpus (measured 1.0 at sf0.01 vs 0.87 for pure SQ).
    Both stages are integer-scored, so the full pipeline keeps a
    complete DuckDB value-hash oracle."""
    cand = sq_topk(queries_df, corpus_df, k=c, dim=dim,
                   id_col=id_col, vec_col=vec_col).select("qid", "nid")
    q = _quantized(
        queries_df.select(F.col(id_col).alias("qid"),
                          F.col(vec_col).alias("qv")), "qv", "qi"
    ).withColumn("qn", F.expr(_SQNORM.format(v="qi"))).drop("qv")
    corp = _quantized(
        corpus_df.select(F.col(id_col).alias("nid"),
                         F.col(vec_col).alias("nv")), "nv", "ni"
    ).withColumn("nn", F.expr(_SQNORM.format(v="ni"))).drop("nv")
    # candidates are n_queries*c rows -> broadcast both small sides;
    # the corpus is filtered by the candidate semi-join, never shuffled
    rer = (
        corp.join(F.broadcast(cand), "nid")
        .join(F.broadcast(q), "qid")
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn(
            "sim",
            F.col("dot").cast("double")
            / F.sqrt(F.col("qn").cast("double") * F.col("nn").cast("double")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        rer.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").cast("long"),
            F.col("nid").cast("long"),
            F.col("rank").cast("int"),
            F.round("sim", 6).alias("sim"),
        )
    )


def ann_lsh_topk(
    spark: SparkSession,
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN via random-projection LSH (the sublinear path).

    Euclidean LSH over L2-normalized vectors ranks like cosine
    (||a-b||^2 = 2 - 2cos on the unit sphere). Deterministic seed=42.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, name: str) -> DataFrame:
        vec = df.select(
            F.col(id_col).alias(name),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v"),
        )
        return Normalizer(inputCol="__v", outputCol="__nv", p=2.0).transform(vec)

    qs = prep(queries_df, "qid")
    cs = prep(corpus_df, "nid")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__nv", outputCol="__h", seed=42,
        bucketLength=bucket_length, numHashTables=num_hash_tables)
    model = lsh.fit(cs)
    pairs = model.approxSimilarityJoin(qs, cs, float("inf"), distCol="__d")
    pairs = pairs.filter(F.col("datasetA.qid") != F.col("datasetB.nid"))
    w = Window.partitionBy("datasetA.qid").orderBy(F.col("__d"), F.col("datasetB.nid"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("datasetA.qid").cast("long").alias("qid"),
            F.col("datasetB.nid").cast("long").alias("nid"),
            F.col("rank").cast("int"),
            F.round(1.0 - F.pow(F.col("__d"), 2) / 2.0, 6).alias("sim"),
        )
    )

# --- portable sign-random-projection LSH (oracle-checkable) ----------------
# The ml BucketedRandomProjectionLSH path above is rows-only in the
# driver gate (its hash functions are ml-internal). This variant makes
# the ANN *procedure itself* oracle-checkable: the hyperplane matrix is
# a compile-time integer constant (md5-derived, engine-independent), the
# sign bits are computed in exact integer arithmetic, and DuckDB runs
# the identical banded bucketing — so candidates, scores, and ranks all
# hash-match. Scale shape is unchanged: corpus hashed once, join on
# (band, chunk) meets only bucket-mates, exact rerank inside candidates.
LSH_PLANES = 16
LSH_BANDS = 4
_LSH_SEED = "ann-lsh-v1"


def _lsh_plane_matrix(n_planes: int = LSH_PLANES, dim: int = 64,
                      seed: str = _LSH_SEED) -> list[list[int]]:
    """Deterministic integer hyperplanes in [-1000, 1000]: coefficient
    (p, d) is derived from md5 — reproducible anywhere, no RNG state."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[:15], 16)
            % 2001 - 1000
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def _lsh_band_chunks(vec_col: str, planes: list[list[int]],
                     n_bands: int = LSH_BANDS) -> list:
    """Spark columns chunk0..chunk{B-1}: per-band LSH bucket keys.

    Each plane's sign bit is an int64 dot of the quantized vector with
    an integer constant array — exact, codegen'd, no UDF."""
    width = len(planes) // n_bands
    bits = [
        F.expr(
            "case when aggregate(zip_with({v}, array({c}), (x, y) -> x * y), "
            "0L, (a, x) -> a + x) >= 0 then 1 else 0 end".format(
                v=vec_col, c=", ".join(f"{c}L" for c in row))
        )
        for row in planes
    ]
    return [
        sum((bits[b * width + j] * (1 << j) for j in range(width)),
            F.lit(0)).alias(f"chunk{b}")
        for b in range(n_bands)
    ]


def ann_lsh_portable_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    n_bands: int = LSH_BANDS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via banded sign-LSH, exact rerank inside candidates.

    A query meets a corpus vector iff they agree on all sign bits of at
    least one band (pigeonhole over ``LSH_PLANES / n_bands``-bit
    chunks). The (band, chunk) equi-join is the only corpus shuffle;
    candidate volume is tuned by band width exactly as in the simhash
    Hamming banding (dedup.py). Deterministic — no seed state, the
    plane matrix is a constant."""
    planes = _lsh_plane_matrix(dim=dim)
    width = len(planes) // n_bands

    def hashed(df: DataFrame, name: str) -> DataFrame:
        # ONE selectExpr per projection stage (r16 construct cost):
        # the Column-API form made ~100 py4j round trips per side (16
        # plane-dot F.exprs + 32 Column arithmetic ops + the
        # struct/explode builders) at ~0.15 s per call on the bench
        # driver; composed SQL strings parse JVM-side in one call
        # each. Same integer expression tree, bit-identical output
        # (oracle hash-match re-verified).
        bits = [
            "case when aggregate(zip_with(__qi, array({c}), "
            "(x, y) -> x * y), 0L, (a, x) -> a + x) >= 0 "
            "then 1 else 0 end".format(
                c=", ".join(f"{v}L" for v in row))
            for row in planes
        ]
        chunks = [
            "0 + " + " + ".join(
                f"({bits[b * width + j]}) * {1 << j}"
                for j in range(width))
            for b in range(n_bands)
        ]
        pairs = ", ".join(
            f"named_struct('band', {b}, 'chunk', chunk{b})"
            for b in range(n_bands))
        # interpolated identifiers are backtick-quoted (ADVICE r16 #4):
        # a reserved-word or special-char column name parsed fine under
        # F.col() and must keep doing so through the composed SQL
        q = df.selectExpr(
            f"`{id_col}` as {name}",
            _QUANTIZE.format(c=f"`{vec_col}`", q=QUANT) + " as __qi")
        q = q.selectExpr(
            name, "__qi", _SQNORM.format(v="__qi") + " as __n",
            *[f"{chunks[b]} as chunk{b}" for b in range(n_bands)])
        return q.selectExpr(name, "__qi", "__n",
                            f"inline(array({pairs}))")

    qs = hashed(queries_df, "qid").withColumnsRenamed(
        {"__qi": "qi", "__n": "qn"})
    # corpus-side banding + the exact rerank run on the scan's
    # partitions (query side broadcasts) — rebalance a single-file
    # scan so they use every core; no-op at scale
    cs = hashed(rebalance_for_compute(corpus_df), "nid").withColumnsRenamed(
        {"__qi": "ni", "__n": "nn"})
    cand = (
        cs.join(F.broadcast(qs), on=["band", "chunk"])
        .filter(F.col("qid") != F.col("nid"))
        .dropDuplicates(["qid", "nid"])
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn("sim", F.col("dot").cast("double")
                    / F.sqrt(F.col("qn").cast("double")
                             * F.col("nn").cast("double")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").cast("long"), F.col("nid").cast("long"),
                F.col("rank").cast("int"), F.round("sim", 6).alias("sim"))
    )


def _ivf_index_root() -> str:
    import os
    import tempfile

    return (os.environ.get("SPARK_GRAFT_IVF_DIR")
            or os.path.join(tempfile.gettempdir(), "spark_graft_ivf"))


# Auto-builds serialize on one module lock (a lazily-created per-
# function lock had a create-race: two threads could each make their
# own lock and overwrite the same index dir concurrently). The module
# lock covers THREADS; the auto root is a machine-shared tmpdir, so
# concurrent PROCESSES additionally serialize on an O_EXCL lock file
# beside the index dir (review r5: two drivers querying the same
# corpus could interleave overwrite-writes into one lists/ dir and
# serve a mixed index).
_IVF_BUILD_LOCK = threading.RLock()  # reentrant: the append demo holds
# it across a build_ivf_index + append_to_ivf_index pair, and append
# itself re-acquires for its own callers
_IVF_KEEP_NEWEST = 8
# never GC an index whose marker is fresher than this — another
# session may be mid-read; keep-newest alone could retire a live one
_IVF_GC_MIN_AGE_S = 6 * 3600.0


def _local_fs_path(path: str) -> str | None:
    """The local filesystem path for ``path`` if it is local (bare or
    file: scheme), else None — the O_EXCL lock protocol only exists on
    a local FS; scheme'd stores coordinate via their own atomics."""
    if path.startswith("file:"):
        return path[len("file:"):] or "/"
    return None if "://" in path or path.startswith("hdfs:") else path


class _DirBuildLock:
    """``flock``-based cross-process build mutex beside an index dir.

    Earlier versions used an O_EXCL lock file with an mtime-staleness
    break, but every staleness heuristic has the same race: the
    decision is made from a stat taken BEFORE the break, so a waiter
    can destroy a successor's fresh lock (round-5 ADVICE, and again
    in the round-6 review of the first fix). ``fcntl.flock`` removes
    the heuristic entirely — the kernel drops the lock when the
    holder's fd closes, including on crash, so there IS no stale
    state to break. The lock file itself is just an anchor inode and
    is never deleted. Only valid on a local FS (guaranteed by
    :func:`_local_fs_path` at the call site)."""

    def __init__(self, local_dir: str, timeout_s: float = 600.0):
        import os
        self.lock_file = local_dir + ".lock"
        self.timeout_s = timeout_s
        self._fd: int | None = None
        os.makedirs(os.path.dirname(self.lock_file), exist_ok=True)

    def __enter__(self):
        import fcntl
        import os
        import time
        fd = os.open(self.lock_file, os.O_CREAT | os.O_RDWR)
        deadline = time.monotonic() + self.timeout_s
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                self._fd = fd
                return self
            except OSError:
                if time.monotonic() > deadline:
                    os.close(fd)
                    raise TimeoutError(
                        f"IVF build lock busy: {self.lock_file}")
                time.sleep(0.25)

    def __exit__(self, *exc):
        import fcntl
        import os
        if self._fd is not None:
            fcntl.flock(self._fd, fcntl.LOCK_UN)
            os.close(self._fd)
            self._fd = None


def _ivf_auto_path(corpus_df: DataFrame, id_col: str, vec_col: str,
                   n_clusters: int, sq_dim: int = SQ_DIM) -> str | None:
    """Deterministic index location for a file-backed corpus, or None.

    The key is the shared frames_fingerprint — backing-file
    path+size+mtime AND the normalized logical plan — so a rewritten
    corpus at the same path gets a fresh index, and a filtered/
    projected view of the corpus never aliases the full corpus's
    index (the review reproduced half-corpus results being served to
    full-corpus queries under a files-only key).
    """
    import hashlib
    import os

    from logsqlite_spark.tables import frames_fingerprint

    try:
        files = corpus_df.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frames
        return None
    if not files:
        return None
    # "v3": the artifact gained per-dim SQ scales and an int8 code
    # column in the lists (the SQ∘IVF serving path); the SQ dim is part
    # of the key so an ivf_sq_topk(dim=...) caller gets an index whose
    # scales/codes actually cover that many dimensions instead of
    # silently zero-coding the tail (ADVICE r7).
    # "v4" (round 13): integral deterministic geometry — centroids are
    # quantized-space bigints from the seed+Lloyd fit, so indexes built
    # by the old ml-KMeans code are not aliased; the Lloyd iteration
    # count is part of the key because it IS the geometry (an index
    # built at a different count must not be served).
    key = hashlib.sha256("|".join(
        (frames_fingerprint(corpus_df), id_col, vec_col,
         str(n_clusters),
         f"v4:sq{sq_dim}:li{IVF_LLOYD_ITERS}")).encode()).hexdigest()[:16]
    return os.path.join(_ivf_index_root(), key)


def _gc_auto_index_root() -> None:
    """Bound the auto-index cache: keep the newest _IVF_KEEP_NEWEST
    entries (by marker mtime), delete the rest. Every corpus rewrite
    keys a fresh dir, so without GC an iterating dev box strands one
    full corpus copy per rewrite until the disk fills."""
    import os
    import shutil

    import time

    root = _ivf_index_root()
    try:
        entries = []
        for name in os.listdir(root):
            d = os.path.join(root, name)
            if not os.path.isdir(d):
                continue
            try:
                ts = os.path.getmtime(os.path.join(d, "_INDEX_OK"))
            except OSError:
                # no marker: either a crashed build (stale) or another
                # process mid-build — only GC it once it's clearly old
                ts = os.path.getmtime(d)
                if time.time() - ts < 3600:
                    continue
            entries.append((ts, d))
        entries.sort(reverse=True)
        now = time.time()
        for ts, d in entries[_IVF_KEEP_NEWEST:]:
            # readers bump the marker mtime on use (_touch_index_marker)
            # — a recently-used index is never retired under a live
            # session even when it falls out of the newest-N
            if now - ts < _IVF_GC_MIN_AGE_S:
                continue
            shutil.rmtree(d, ignore_errors=True)
    except OSError:
        pass


def _touch_index_marker(path: str) -> None:
    """Best-effort read-use bump (local roots only) so GC's age guard
    sees in-use indexes as fresh."""
    import contextlib
    import os
    local = _local_fs_path(path)
    if local is None:
        return
    with contextlib.suppress(OSError):
        os.utime(os.path.join(local, "_INDEX_OK"))


def _index_marker_path(spark: SparkSession, path: str,
                       name: str = "_INDEX_OK"):
    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(path + "/" + name)


def _index_marker_exists(spark: SparkSession, path: str,
                         name: str = "_INDEX_OK") -> bool:
    """Scheme-aware probe (file:, bare local, hdfs:, s3a:, ...) — an
    os.path.exists on a scheme-prefixed path is never true, which
    would re-fit and rewrite the index on every query."""
    p = _index_marker_path(spark, path, name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(p)


def _write_index_marker(spark: SparkSession, path: str,
                        name: str = "_INDEX_OK") -> None:
    p = _index_marker_path(spark, path, name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.create(p, True).close()


def _delete_index_marker(spark: SparkSession, path: str,
                         name: str = "_INDEX_OK") -> None:
    p = _index_marker_path(spark, path, name)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, False)


def _fs_write_text(spark: SparkSession, path: str, text: str) -> None:
    """Scheme-aware small-file text write, staged-then-renamed so a
    reader never sees a torn file (r16: the refit meta must work on
    non-local stores too — ADVICE r15 found the os.path version
    stranded a crashed refit forever when the path wasn't local)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    out.write(bytearray(text.encode("utf-8")))
    out.close()
    if fs.exists(p):
        fs.delete(p, False)
    if not fs.rename(tmp, p):
        raise OSError(f"failed to publish {path}")


def _fs_read_text(spark: SparkSession, path: str) -> str:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def _heal_refit(spark: SparkSession, path: str) -> bool:
    """Crash-safe REFIT recovery (round-15 hardening; carry-forward
    of the IVF-soak work).  The refit protocol is: stage the full
    lists ∪ batch union (with Spark's _SUCCESS) and a tiny params
    meta -> DELETE the completion marker (the index is officially
    mid-refit; a crashed rebuild can no longer hide behind a stale
    marker over partial lists) -> rebuild in place (build_ivf_index
    re-creates the marker LAST) -> clean the staging.  This entry
    hook makes every window decidable:

    - marker PRESENT: any refit staging is pre-delete garbage (the
      crash hit before the marker came off) — discard it; the index
      is whole.
    - marker ABSENT + complete staged union + meta: the crash hit
      mid-rebuild — rebuild from the staged union (contains every
      committed vector plus the refit batch) and the marker returns.
    - marker ABSENT otherwise: no completed index (initial build
      never finished) — the caller's no-index error stands.

    r16 (ADVICE r15): this hook ALSO adopts crashed compact/erase
    per-cluster staged swaps, so EVERY lifecycle entry — including
    :func:`append_to_ivf_index`, which previously never healed —
    restores a deleted-but-staged cluster before any list read,
    append, or drift-refit union can observe the hole.  And the whole
    protocol now runs through the Hadoop FS API (marker, meta,
    staging), so a crashed refit on a non-local store heals instead
    of stranding the index behind a permanently-absent marker.

    Returns True iff a completed index exists after healing."""
    import json as _json

    # heal crashed cluster swaps FIRST: a drift refit unions the
    # lists, and appends recreate lists/__cluster=K dirs — either
    # would otherwise turn a staged-but-unrenamed cluster into
    # discarded "stale staging" (silent whole-cluster loss)
    _adopt_staged_cluster_swaps(spark, path, ".compact_tmp_")
    _adopt_staged_cluster_swaps(spark, path, ".erase_tmp_")

    staged = f"{path}/.refit_src"
    meta_p = f"{path}/.refit_meta.json"
    if _index_marker_exists(spark, path):
        if _index_marker_exists(spark, path, ".refit_src"):
            _rm_index_dir(spark, staged)
        if _index_marker_exists(spark, path, ".refit_meta.json"):
            _rm_index_dir(spark, meta_p)
        return True
    have_meta = _index_marker_exists(spark, path, ".refit_meta.json")
    have_union = _index_marker_exists(spark, path,
                                      ".refit_src/_SUCCESS")
    if not (have_meta and have_union):
        return False
    meta = _json.loads(_fs_read_text(spark, meta_p))
    build_ivf_index(spark.read.parquet(staged), path,
                    n_clusters=int(meta["n_clusters"]),
                    id_col="nid", vec_col="nv",
                    sq_dim=int(meta["sq_dim"]))
    _rm_index_dir(spark, staged)
    _rm_index_dir(spark, meta_p)
    return True


def _ensure_ivf_index(corpus_df: DataFrame, n_clusters: int,
                      id_col: str, vec_col: str,
                      index_path: str | None,
                      sq_dim: int = SQ_DIM) -> str | None:
    """Resolve (and lazily build, under the thread + flock protocol)
    the persisted IVF index for a file-backed corpus; None for
    literal/streaming frames, which fit inline. Shared by the plain
    IVF and the composed SQ∘IVF query paths so both serve one
    artifact per corpus."""
    spark = corpus_df.sparkSession
    path = index_path or _ivf_auto_path(corpus_df, id_col, vec_col,
                                        n_clusters, sq_dim)
    if path is None:
        return None
    with _IVF_BUILD_LOCK:
        if not _index_marker_exists(spark, path):
            local = _local_fs_path(path)
            if local is not None:
                with _DirBuildLock(local):
                    # another process may have built while we
                    # waited on its lock — re-check under it
                    if not _index_marker_exists(spark, path):
                        build_ivf_index(corpus_df, path,
                                        n_clusters=n_clusters,
                                        id_col=id_col,
                                        vec_col=vec_col,
                                        sq_dim=sq_dim)
            else:
                build_ivf_index(corpus_df, path,
                                n_clusters=n_clusters,
                                id_col=id_col, vec_col=vec_col,
                                sq_dim=sq_dim)
            if index_path is None:
                _gc_auto_index_root()
        else:
            _touch_index_marker(path)
    return path


def ivf_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_path: str | None = None,
) -> DataFrame:
    """IVF-style ANN: KMeans-partition the corpus ONCE (persisted),
    then each query only scans its ``n_probe`` nearest inverted lists.

    The 100 TB shape: centroids are tiny (driver/broadcast), the
    corpus->cluster assignment is built once and served from the
    persisted index on every subsequent call — a query touches
    ~n_probe/n_clusters of the data and never pays the KMeans fit
    (VERDICT r4 #5: the fit used to run silently inside every query).
    Index resolution: an explicit ``index_path`` wins; otherwise a
    file-backed corpus auto-persists under ``$SPARK_GRAFT_IVF_DIR``
    (default tmpdir) keyed by the corpus files' path+size+mtime; only
    a non-file corpus (e.g. unit-test literal frames) fits inline.
    Exact cosine is computed inside the candidate set with the same
    quantized-integer math as the brute-force path; results are
    identical across all three paths (seed=42).
    """
    spark = corpus_df.sparkSession
    path = _ensure_ivf_index(corpus_df, n_clusters, id_col, vec_col,
                             index_path)
    if path is not None:
        return ivf_topk_indexed(spark, queries_df, path, k=k,
                                n_probe=n_probe, id_col=id_col,
                                vec_col=vec_col,
                                _memo=index_path is None)

    # literal/streaming corpus (unit tests): fit + assign inline, the
    # same deterministic integral geometry as the persisted build.
    # The int8 `code` column is projected away below, so constant
    # scales skip _compute_sq_scales' full-corpus aggregation job —
    # the probe math touches only nid/nv/__cluster
    centers = _fit_centers(corpus_df, n_clusters, id_col, vec_col)
    assigned = _frozen_assign_encode(
        corpus_df, centers, [1.0] * SQ_DIM,
        id_col, vec_col).select("nid", "nv", "__cluster")
    centers_df = spark.createDataFrame(
        [(i, [int(x) for x in c]) for i, c in enumerate(centers)],
        "cid int, center array<bigint>",
    )
    return _ivf_probe(assigned, centers_df, queries_df, k, n_probe,
                      id_col, vec_col)


# exact int64 squared L2 distance between quantized vectors — the
# same expression clustering.py assigns with, so IVF geometry and the
# semantic-clustering tier share one distance definition
_L2SQ_INT = ("aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
             "0L, (acc, d) -> acc + d)")


IVF_LLOYD_ITERS = 3


def _fit_centers(corpus_df: DataFrame, n_clusters: int,
                 id_col: str, vec_col: str,
                 n_iters: int = IVF_LLOYD_ITERS) -> list[list[int]]:
    """Deterministic INTEGRAL centroids for the IVF geometry (round
    13): the salted-md5 seed draw + ``n_iters`` Lloyd iterations in
    QUANTIZED space — clustering.py's engine-portable k-means.
    Integral centers make every assignment and probe distance an
    exact int64, so the whole IVF pipeline (fit → assign → probe →
    rerank) replays bit-for-bit in the DuckDB oracle (one CTE block
    per iteration); the previous pyspark.ml KMeans fit (k-means||
    init) was the single non-replayable step that kept the IVF
    queries rows-only in the driver gate."""
    from logsqlite_spark.operators.clustering import (
        assign_clusters,
        refine_centroids,
        seed_centroids,
    )

    ctr = seed_centroids(corpus_df, k=n_clusters, id_col=id_col,
                         vec_col=vec_col)
    for _ in range(n_iters):
        ctr = refine_centroids(
            assign_clusters(corpus_df, ctr, id_col=id_col,
                            vec_col=vec_col),
            ctr)
    return [[int(x) for x in r["cv"]]
            for r in ctr.orderBy("cluster_id").collect()]


def _frozen_assign_encode(batch_df: DataFrame,
                          centers: list[list[int]],
                          scales: list[float],
                          id_col: str, vec_col: str) -> DataFrame:
    """Assign each row to its nearest FROZEN centroid and int8-encode
    it with the FROZEN scales — (nid, nv, code, __cluster, __d2).

    The 100 TB shape for index maintenance: centroids are a literal
    expression (a few KB), so assignment is an argmin evaluated inside
    the batch's own scan — no join, no shuffle, no window.  Distances
    are exact int64 in quantized space (integral centers); the argmin
    tie-breaks to the lowest cid via struct ordering, the same (d2,
    cid) ordering the probe side (:func:`_probe_lists`) uses.
    """
    ctr = F.array(*[
        F.struct(F.lit(i).alias("cid"),
                 F.array(*[F.lit(int(x)).cast("bigint") for x in c])
                 .alias("center"))
        for i, c in enumerate(centers)])
    sc = F.array(*[F.lit(s) for s in scales])
    return (
        batch_df.select(F.col(id_col).cast("long").alias("nid"),
                        F.col(vec_col).alias("nv"))
        .withColumn("__qi", F.expr(_QUANTIZE.format(c="nv", q=QUANT)))
        .withColumn("__ctr", ctr)
        .withColumn(
            "__best",
            F.array_min(F.expr(
                "transform(__ctr, c -> struct("
                + _L2SQ_INT.format(a="__qi", b="c.center")
                + " as d2, c.cid as cid))")))
        .withColumn("__sc", sc)
        .withColumn(
            "code",
            F.expr(_SQ_ENCODE_SAT.format(v="nv", sc="__sc", lv=SQ_LEVELS))
            .cast("array<tinyint>"))
        .select("nid", "nv", "code",
                F.col("__best.cid").alias("__cluster"),
                F.col("__best.d2").alias("__d2"))
    )


def _write_ivf_stats(spark: SparkSession, path: str, n: int,
                     mean_d2: float) -> None:
    spark.createDataFrame([(int(n), float(mean_d2))],
                          "n bigint, mean_d2 double") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def build_ivf_index(corpus_df: DataFrame, path: str,
                    n_clusters: int = 16,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    sq_dim: int = SQ_DIM,
                    centers: list[list[float]] | None = None,
                    scales: list[float] | None = None) -> None:
    """Fit KMeans ONCE and persist the IVF index: centroids (tiny),
    the per-dim SQ scale vector (64 doubles), per-index assignment
    stats (row count + mean squared assignment distance — the drift
    baseline :func:`append_to_ivf_index` checks new batches against),
    and the corpus inverted lists — each row carrying BOTH the
    full-precision vector and its int8 code — parquet-partitioned by
    cluster id.

    This splits the expensive build from the cheap probe — the
    build-once/query-many shape a production ANN service needs. The
    cluster id is a *partition column*, so an indexed query's
    broadcast join against its probed clusters prunes whole list
    directories at the scan (see ``ivf_topk_indexed``); at 100 TB a
    query set touching n_probe/n_clusters of the data reads only that
    fraction of the files. The codes column (array<tinyint>, 4x
    smaller than the fp32 vectors it mirrors) is what the composed
    SQ∘IVF path (:func:`ivf_sq_topk`) scans — probed lists on
    compressed codes, full precision touched only at rerank.

    ``centers``/``scales``: when given, the fit and the scale scan are
    skipped and every row is assigned/encoded against the FROZEN
    parameters via :func:`_frozen_assign_encode` — the "rebuild with
    the old geometry" reference that pins the append path's
    correctness (an appended index must equal this rebuild exactly).
    """
    spark = corpus_df.sparkSession
    _drop_serve_memo(path)
    if centers is None:
        centers = _fit_centers(corpus_df, n_clusters, id_col, vec_col)
    if scales is None:
        scales = _compute_sq_scales(corpus_df, sq_dim, vec_col)
    assigned = _frozen_assign_encode(corpus_df, centers, scales,
                                     id_col, vec_col)
    centers_df = spark.createDataFrame(
        [(i, [int(x) for x in c]) for i, c in enumerate(centers)],
        "cid int, center array<bigint>",
    )
    centers_df.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame([(scales,)], "scales array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/scales")
    assigned.drop("__d2").write.mode("overwrite").partitionBy("__cluster") \
        .parquet(f"{path}/lists")
    # drift baseline over what was just written: read the persisted
    # lists back (they're already columnar + partition-pruned) instead
    # of re-running the assignment lineage a second time
    written = spark.read.option("basePath", f"{path}/lists") \
        .parquet(f"{path}/lists")
    ctr_arr = F.array(*[
        F.array(*[F.lit(int(x)).cast("bigint") for x in c])
        for c in centers])
    st = (written.withColumn("__qi",
                             F.expr(_QUANTIZE.format(c="nv", q=QUANT)))
          .withColumn("__ctr_at",
                      F.element_at(ctr_arr, F.col("__cluster") + 1))
          .withColumn("__d2", F.expr(
              _L2SQ_INT.format(a="__qi", b="__ctr_at")))
          .agg(F.count("*").alias("n"), F.avg("__d2").alias("m"))
          .collect()[0])
    _write_ivf_stats(spark, path, st["n"], float(st["m"] or 0.0))
    # completion marker (partitioned writes don't emit a top-level
    # _SUCCESS under dynamic partition-overwrite): written LAST so a
    # crashed build is retried, probed by ivf_topk's auto-persist.
    # Hadoop-FS, not open(): the path may carry a scheme (file:,
    # hdfs:, s3a:) that local I/O can't touch
    _write_index_marker(spark, path)


def append_to_ivf_index(batch_df: DataFrame, path: str,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        drift_threshold: float = 2.0) -> dict:
    """Incrementally maintain a persisted IVF index (VERDICT r8 #3):
    assign the new batch to the EXISTING centroids, encode with the
    FROZEN scales, and append to the cluster-partitioned lists —
    re-fitting only when the batch has drifted away from the index
    geometry.

    The 100 TB contract — **appending N rows scans only the N rows**
    (plus the few-KB centroid/scale/stats control artifacts; the
    existing lists are never read on the append path — pinned by a
    reader spy in ``test_similarity``).  This mirrors the
    ``ngram_df_partials`` merge idiom from the incremental substring
    dedup: the persisted artifact absorbs batches associatively, and a
    corpus-sized scan happens only at (re)build.  Previously the
    fingerprint-keyed auto index forced a FULL rebuild per append.

    Drift: the build stamps ``stats`` (row count + mean squared
    assignment distance).  A batch whose mean assignment distance
    exceeds ``drift_threshold`` x the baseline means the frozen
    centroids no longer describe the data; the index is then re-fit
    from lists ∪ batch (the lists carry full-precision vectors, so no
    original-corpus handle is needed).  A non-drifting append folds its
    distances into the running baseline mean.  Indexes built before
    the stats artifact existed append without the drift check.

    Caller contract: batch ids must be new (dedup upstream — an
    id-anti-join here would scan the lists and break the batch-only
    bound).  Appends add one file per touched cluster per batch;
    compact periodically at high batch cadence.  On refit the lists
    are rewritten in place under the build locks — single-writer
    engines (this repo) are safe; a concurrently-serving deployment
    should build to a versioned dir and swap.

    Returns a summary dict: mode ("append"|"refit"), rows appended,
    batch/baseline mean d2.
    """
    spark = batch_df.sparkSession
    _drop_serve_memo(path)
    with _IVF_BUILD_LOCK:
        if not _heal_refit(spark, path):
            raise ValueError(f"no completed IVF index at {path}")
        centers_rows = spark.read.parquet(f"{path}/centroids") \
            .orderBy("cid").collect()
        centers = [[int(x) for x in r["center"]] for r in centers_rows]
        scales = [float(x) for x in spark.read.parquet(
            f"{path}/scales").collect()[0]["scales"]]
        try:
            st = spark.read.parquet(f"{path}/stats").collect()[0]
            base_n, base_mean = int(st["n"]), float(st["mean_d2"])
        except Exception:  # noqa: BLE001 — pre-stats index (back-compat)
            base_n, base_mean = 0, None

        assigned = _frozen_assign_encode(batch_df, centers, scales,
                                         id_col, vec_col)
        # one batch scan: cache the assignment so the stats agg and the
        # list write don't each re-run it (batches are micro-batch
        # sized; the full corpus never enters this path)
        assigned = assigned.persist()
        try:
            st = assigned.agg(F.count("*").alias("n"),
                              F.avg("__d2").alias("m")).collect()[0]
            batch_n, batch_mean = int(st["n"]), float(st["m"] or 0.0)
            if batch_n == 0:
                return {"mode": "append", "rows": 0,
                        "batch_mean_d2": 0.0, "base_mean_d2": base_mean}
            if (base_mean is not None and base_mean > 0
                    and batch_mean > drift_threshold * base_mean):
                # drift: full re-fit over lists ∪ batch.  Spark can't
                # overwrite a path mid-read, so the union is staged to
                # a scratch dir first, then the index rebuilt from it.
                union = (
                    spark.read.option("basePath", f"{path}/lists")
                    .parquet(f"{path}/lists").select("nid", "nv")
                    .unionByName(assigned.select("nid", "nv")))
                staged = f"{path}/.refit_src"
                union.write.mode("overwrite").parquet(staged)
                n_clusters = len(centers)
                # CRASH-SAFE ordering (round 15): the staged union +
                # params meta land FIRST, then the completion marker
                # comes OFF, then the in-place rebuild runs (marker
                # re-created last).  A kill mid-rebuild used to leave
                # a VALID marker over partially-overwritten lists —
                # silent corruption; now the absent marker + complete
                # staging make _heal_refit's recovery decidable at
                # every lifecycle entry.
                import json as _json

                # meta rides the Hadoop FS like the marker, so the
                # crash recovery works on any scheme (ADVICE r15)
                meta_p = f"{path}/.refit_meta.json"
                _fs_write_text(spark, meta_p, _json.dumps(
                    {"n_clusters": n_clusters,
                     "sq_dim": len(scales)}))
                _delete_index_marker(spark, path)
                build_ivf_index(
                    spark.read.parquet(staged), path,
                    n_clusters=n_clusters, id_col="nid", vec_col="nv",
                    sq_dim=len(scales))
                _rm_index_dir(spark, staged)
                _rm_index_dir(spark, meta_p)
                return {"mode": "refit", "rows": batch_n,
                        "batch_mean_d2": batch_mean,
                        "base_mean_d2": base_mean}
            assigned.drop("__d2").write.mode("append") \
                .partitionBy("__cluster").parquet(f"{path}/lists")
            if base_mean is not None:
                new_n = base_n + batch_n
                new_mean = (base_n * base_mean + batch_n * batch_mean) / new_n
                _write_ivf_stats(spark, path, new_n, new_mean)
            return {"mode": "append", "rows": batch_n,
                    "batch_mean_d2": batch_mean,
                    "base_mean_d2": base_mean}
        finally:
            assigned.unpersist()


def _rm_index_dir(spark: SparkSession, path: str) -> None:
    """Scheme-aware recursive delete of a scratch dir."""
    p = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _adopt_staged_cluster_swaps(spark: SparkSession, path: str,
                                prefix: str) -> int:
    """Finish or discard crashed per-cluster staged swaps (round-15
    IVF-soak hardening).  The swap protocol is: write the full staged
    copy -> delete the cluster dir -> rename staged into place.  A
    kill between delete and rename leaves the cluster's ONLY copy in
    the staging dir, and the pre-r15 code used ONE shared staging
    name that the next maintenance call deleted as "stale" — silent
    loss of a whole cluster.  Staging names now embed the cluster
    (``<prefix><__cluster=K>``), so recovery is decidable per dir:

    - the cluster dir is MISSING -> the staged copy is complete (the
      delete only ever runs after the staged write finished) and is
      the only copy: ADOPT it (finish the rename);
    - the cluster dir EXISTS -> the crash hit during/before the
      staged write: the staged dir is an incomplete duplicate,
      discard it.

    Called under the build lock at every compact/erase entry, so a
    crashed swap heals before any new swap starts.  Returns adopted
    count."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    base = hpath(path)
    fs = base.getFileSystem(spark._jsc.hadoopConfiguration())
    adopted = 0
    if not fs.exists(base):
        return 0
    for st in fs.listStatus(base):
        name = st.getPath().getName()
        if not name.startswith(prefix):
            continue
        cname = name[len(prefix):]
        cdir = hpath(f"{path}/lists/{cname}")
        if fs.exists(cdir):
            fs.delete(st.getPath(), True)  # incomplete duplicate
        else:
            if not fs.rename(st.getPath(), cdir):
                raise OSError(
                    f"failed to adopt staged swap for {cname}")
            adopted += 1
    return adopted


def compact_ivf_lists(spark: SparkSession, path: str,
                      min_files: int = 4,
                      target_records: int = 4_000_000) -> dict:
    """Maintenance for an incrementally-appended IVF index: each
    :func:`append_to_ivf_index` adds one file per touched cluster, so
    a high batch cadence fragments the lists (file-listing cost, tiny
    row groups, weak min/max stats — the same failure mode
    ``operators/compact.py`` handles for the logs table).  Rewrites
    every cluster directory holding at least ``min_files`` files into
    ``target_records``-sized files, content-preserving.

    Runs under the index build locks; the swap is
    write-staging-then-rename per cluster directory (Hadoop FS, so any
    scheme works).  Single-writer engines (this repo) are safe; a
    concurrently-serving deployment compacts into a versioned dir and
    swaps, as with refit.  The completion marker is untouched — a
    crash mid-swap leaves at most one cluster directory staged under
    a CLUSTER-SPECIFIC name, adopted or discarded by
    :func:`_adopt_staged_cluster_swaps` at the next compact/erase.
    """
    _drop_serve_memo(path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    with _IVF_BUILD_LOCK:
        if not _heal_refit(spark, path):
            # _heal_refit adopts crashed staged swaps at entry (r16)
            raise ValueError(f"no completed IVF index at {path}")
        lists = hpath(f"{path}/lists")
        fs = lists.getFileSystem(spark._jsc.hadoopConfiguration())
        compacted = files_before = files_after = 0
        for st in fs.listStatus(lists):
            if not st.isDirectory():
                continue
            name = st.getPath().getName()
            if not name.startswith("__cluster="):
                continue
            files = [s for s in fs.listStatus(st.getPath())
                     if s.isFile()
                     and s.getPath().getName().endswith(".parquet")]
            if len(files) < min_files:
                continue
            cdir = f"{path}/lists/{name}"
            df = spark.read.parquet(cdir)
            n = df.count()
            n_out = max(1, -(-n // target_records))  # ceil
            staged = f"{path}/.compact_tmp_{name}"
            fs.delete(hpath(staged), True)  # aborted write leftovers
            df.coalesce(n_out).write.mode("overwrite") \
                .option("maxRecordsPerFile", target_records) \
                .parquet(staged)
            fs.delete(hpath(staged + "/_SUCCESS"), False)
            fs.delete(hpath(cdir), True)
            if not fs.rename(hpath(staged), hpath(cdir)):
                raise OSError(f"failed to swap compacted lists into {cdir}")
            compacted += 1
            files_before += len(files)
            files_after += n_out
    return {"compacted_clusters": compacted,
            "files_before": files_before, "files_after": files_after}


def erase_from_ivf_index(spark: SparkSession, path: str,
                         vec_ids: list[int]) -> dict:
    """Retract vectors from a persisted IVF index — the deletion half
    of the index lifecycle (append via :func:`append_to_ivf_index`,
    compact via :func:`compact_ivf_lists`, erase here).  Only the
    cluster directories actually HOLDING erased ids are rewritten
    (staged swap, the compactor's protocol); every untouched list
    keeps its files.  Serving afterwards is identical to an index
    whose lists never contained those vectors — the geometry
    (centroids, SQ scales) stays frozen, exactly like the append
    path, and the drift baseline keeps its accumulated mean while
    ``n`` drops by the erased count (conservative: an erase never
    masks drift that the erased vectors contributed to).

    Crash-resumable like the dedup-index erase: the erased count and
    the target ``stats.n`` are staged (local roots) before any list
    rewrite, so a re-run finishes remaining clusters and applies the
    stats decrement exactly once (skipped when ``stats.n`` already
    equals the staged target).  Runs under the build locks;
    single-writer, amortize by batching ids."""
    import contextlib
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from logsqlite_spark.artifacts import filter_ids

    _drop_serve_memo(path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path
    ids = [int(x) for x in vec_ids]
    with _IVF_BUILD_LOCK:
        if not _heal_refit(spark, path):
            # _heal_refit adopts crashed staged swaps at entry (r16),
            # so the lists read below sees any adopted cluster
            raise ValueError(f"no completed IVF index at {path}")
        local = _local_fs_path(path)
        meta_path = (_os.path.join(local, ".erase_stage.json")
                     if local is not None else None)
        meta = None
        if meta_path is not None and _os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = _json.load(fh)
            if sorted(meta["ids"]) != sorted(ids):
                raise RuntimeError(
                    "a different IVF erase is staged; re-run with "
                    f"ids={meta['ids']} to finish it first")
        lists = spark.read.option("basePath", f"{path}/lists") \
            .parquet(f"{path}/lists")
        hits = (filter_ids(lists, "nid", ids, keep=True)
                .groupBy("__cluster").agg(F.count(F.lit(1)).alias("c"))
                .collect())
        n_now = sum(r["c"] for r in hits)
        if n_now == 0 and meta is None:
            return {"erased": 0, "clusters_rewritten": 0}
        try:
            st = spark.read.parquet(f"{path}/stats").collect()[0]
            stats_n, stats_m = int(st["n"]), float(st["mean_d2"])
        except Exception:  # noqa: BLE001 — pre-stats index
            stats_n = stats_m = None
        if meta is None and meta_path is not None:
            meta = {"ids": ids, "n_erased": n_now,
                    "stats_target": (None if stats_n is None
                                     else stats_n - n_now)}
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as fh:
                _json.dump(meta, fh)
            _os.replace(tmp, meta_path)
        n_erased = meta["n_erased"] if meta is not None else n_now
        fs = hpath(f"{path}/lists").getFileSystem(
            spark._jsc.hadoopConfiguration())
        for r in hits:
            cdir = f"{path}/lists/__cluster={r['__cluster']}"
            kept = filter_ids(spark.read.parquet(cdir), "nid", ids,
                              keep=False)
            staged = f"{path}/.erase_tmp___cluster={r['__cluster']}"
            fs.delete(hpath(staged), True)  # aborted write leftovers
            kept.write.mode("overwrite").parquet(staged)
            fs.delete(hpath(staged + "/_SUCCESS"), False)
            fs.delete(hpath(cdir), True)
            if not fs.rename(hpath(staged), hpath(cdir)):
                raise OSError(f"failed to swap erased lists into {cdir}")
        if stats_n is not None:
            target = (meta["stats_target"] if meta is not None
                      else stats_n - n_now)
            if target is not None and stats_n != target:
                _write_ivf_stats(spark, path, max(0, target), stats_m)
        if meta_path is not None:
            with contextlib.suppress(OSError):
                _os.remove(meta_path)
        return {"erased": n_erased, "clusters_rewritten": len(hits)}


# Artifact serve-plan memo (r16, guide §1.2 / §5 — driver-side work):
# serving a persisted index re-lists the artifact dirs and re-reads
# parquet footers ON THE DRIVER (~0.2 s per call at sf0.1), and the
# scale-vector load is a whole collect() job — paid by EVERY serve
# call. Auto-path artifacts are immutable by construction (the path is
# keyed by the corpus fingerprint + geometry version, so any corpus or
# format change lands at a NEW path; lifecycle mutation requires an
# explicit index_path), which makes the constructed serve frames (a
# plan, never data) and the loaded 64-double scale vector reusable
# verbatim for the life of the application — exactly the tables.table
# memo idiom. Explicit-path (mutable) indexes never enter the cache,
# and every lifecycle mutation drops its path defensively. Keyed by
# applicationId so a restarted session never serves a stale JVM plan.
# SINGLE-PROCESS assumption (ADVICE r16 #3): invalidation is in-process
# only, so a SIBLING process mutating an index at the same path outside
# the documented explicit-path lifecycle would be served a stale
# memoized listing — acceptable under the immutability invariant above
# (auto paths are never mutated, only superseded at a new fingerprint
# key).  Growth is bounded by the number of distinct immutable
# artifacts an application touches (plans of a few KB each), not data.
_IVF_SERVE_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}
_SQ_SCALES_CACHE: dict[tuple[str, str], list[float]] = {}


def _drop_serve_memo(path: str) -> None:
    """Invalidate memoized serve state for a (possibly mutated) index."""
    for cache in (_IVF_SERVE_CACHE, _SQ_SCALES_CACHE):
        for key in [k for k in cache if k[1] == path]:
            cache.pop(key, None)


def _ivf_serve_frames(spark: SparkSession, path: str,
                      memo: bool) -> tuple[DataFrame, DataFrame]:
    """(centroids_df, lists_df) for a persisted index; memoized only
    for immutable fingerprint-keyed auto paths (``memo=True``)."""
    key = (spark.sparkContext.applicationId, path)
    if memo:
        hit = _IVF_SERVE_CACHE.get(key)
        if hit is not None:
            return hit
    centers_df = spark.read.parquet(f"{path}/centroids")
    lists = spark.read.option("basePath", f"{path}/lists") \
        .parquet(f"{path}/lists")
    if memo:
        _IVF_SERVE_CACHE[key] = (centers_df, lists)
    return centers_df, lists


def _load_sq_scales(spark: SparkSession, path: str,
                    memo: bool) -> list[float]:
    """The persisted per-dim scale vector; memoized like the frames."""
    key = (spark.sparkContext.applicationId, path)
    if memo:
        hit = _SQ_SCALES_CACHE.get(key)
        if hit is not None:
            return hit
    scales = [float(x) for x in spark.read.parquet(
        f"{path}/scales").collect()[0]["scales"]]
    if memo:
        _SQ_SCALES_CACHE[key] = scales
    return scales


def ivf_topk_indexed(spark: SparkSession, queries_df: DataFrame, path: str,
                     k: int = TOP_K, n_probe: int = 4,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     _memo: bool = False) -> DataFrame:
    """ANN top-k against a persisted IVF index — no refit.

    Loads the broadcast-sized centroid table, picks each query's
    ``n_probe`` nearest lists, and joins the probed cluster ids
    against the partition column of the persisted lists, so the scan
    only lists/reads the probed clusters' directories. Results are
    identical to ``ivf_topk`` with the same parameters (same seed,
    same quantized scoring). ``_memo`` is set by :func:`ivf_topk` for
    fingerprint-keyed (immutable) auto indexes only.
    """
    centers_df, assigned = _ivf_serve_frames(spark, path, _memo)
    return _ivf_probe(assigned, centers_df, queries_df, k, n_probe,
                      id_col, vec_col)


def _probe_lists(queries_df: DataFrame, centers_df: DataFrame,
                 n_probe: int, id_col: str, vec_col: str) -> DataFrame:
    """Each query's ``n_probe`` nearest inverted lists (squared-L2 to
    the broadcast centroid table) — (qid, qv, __cluster) rows, shared
    by the fp and SQ probe paths."""
    q = queries_df.select(F.col(id_col).alias("qid"),
                          F.col(vec_col).alias("qv"))
    qc = (
        q.crossJoin(F.broadcast(centers_df))
        .withColumn("__qi", F.expr(_QUANTIZE.format(c="qv", q=QUANT)))
        .withColumn(
            "d2",
            F.expr(_L2SQ_INT.format(a="__qi", b="center")),
        )
    )
    w_probe = Window.partitionBy("qid").orderBy(F.col("d2"), F.col("cid"))
    return (
        qc.withColumn("pr", F.row_number().over(w_probe))
        .filter(F.col("pr") <= n_probe)
        .select("qid", "qv", F.col("cid").alias("__cluster"))
    )


def _ivf_probe(assigned: DataFrame, centers_df: DataFrame,
               queries_df: DataFrame, k: int, n_probe: int,
               id_col: str, vec_col: str) -> DataFrame:
    """Probe side shared by the fit-inline and persisted-index paths."""
    probes = _probe_lists(queries_df, centers_df, n_probe, id_col,
                          vec_col)

    joined = (
        assigned.join(F.broadcast(probes), "__cluster")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("qi", F.expr(_QUANTIZE.format(c="qv", q=QUANT)))
        .withColumn("ni", F.expr(_QUANTIZE.format(c="nv", q=QUANT)))
        .withColumn("qn", F.expr(_SQNORM.format(v="qi")))
        .withColumn("nn", F.expr(_SQNORM.format(v="ni")))
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn("sim", F.col("dot").cast("double")
                    / F.sqrt(F.col("qn").cast("double") * F.col("nn").cast("double")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").cast("long"), F.col("nid").cast("long"),
                F.col("rank").cast("int"), F.round("sim", 6).alias("sim"))
    )

def ivf_sq_topk(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int = TOP_K,
    n_clusters: int = 16,
    n_probe: int = 4,
    c: int = 32,
    dim: int = SQ_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_path: str | None = None,
) -> DataFrame:
    """Composed SQ∘IVF ANN — the production serving shape (VERDICT r6
    #4): probe the IVF inverted lists, score the probed rows on their
    persisted int8 codes, keep the top-``c`` per query, and rerank
    those at full precision to top-``k``.

    Each tier contributes its half of the 100 TB story: IVF prunes
    the SCAN to ~n_probe/n_clusters of the list files (the cluster id
    is a parquet partition column, so pruning happens at the file
    listing), and SQ shrinks what IS scanned 4x (array<tinyint> codes
    vs fp32) — where :func:`ivf_topk` reads full vectors from every
    probed list and :func:`sq_topk` scans the whole corpus's codes,
    this path reads only the probed lists' codes. Full-precision
    vectors are touched for just ``n_queries * c`` rerank rows.
    Candidate recall equals plain IVF at the same probes (identical
    probed set; the int8 prefilter's top-32 covers the fp top-5 —
    same local-rank-flip argument, and the same measured bound, as
    :func:`sq_rerank_topk`); the whole pipeline is integer-scored and
    deterministic — approximate BY DESIGN via list pruning, yet fully
    DuckDB-oracled since round 13 (the deterministic integral geometry
    replays exactly); the pytest recall gate alongside the IVF one
    stays the quantitative bar.
    """
    spark = corpus_df.sparkSession
    path = _ensure_ivf_index(corpus_df, n_clusters, id_col, vec_col,
                             index_path, sq_dim=dim)
    if path is not None:
        memo = index_path is None
        centers_df, lists = _ivf_serve_frames(spark, path, memo)
        scales = _load_sq_scales(spark, path, memo)
        if len(scales) != dim:
            # only reachable with an explicit index_path built at a
            # different sq_dim — zip_with+coalesce in _SQ_ENCODE would
            # otherwise silently zero-code the missing dimensions
            raise ValueError(
                f"IVF index at {path} was built with sq_dim="
                f"{len(scales)}, but dim={dim} was requested")
        # two projections of the SAME persisted lists: stage 1 scans
        # only the int8 codes (ReadSchema excludes nv — pinned in
        # test_plans), the fp vectors are fetched post-top-c
        codes_df = lists.select("nid", "code", "__cluster")
        vecs_df = lists.select("nid", "nv", "__cluster")
    else:
        # literal/streaming corpus (unit tests): fit + encode inline,
        # same deterministic integral geometry as the persisted build
        centers = _fit_centers(corpus_df, n_clusters, id_col, vec_col)
        scales = _compute_sq_scales(corpus_df, dim, vec_col)
        assigned = _frozen_assign_encode(
            corpus_df, centers, scales, id_col, vec_col
        ).select("nid", "nv", "code", "__cluster")
        centers_df = spark.createDataFrame(
            [(i, [int(x) for x in ctr])
             for i, ctr in enumerate(centers)],
            "cid int, center array<bigint>",
        )
        codes_df = assigned.select("nid", "code", "__cluster")
        vecs_df = assigned.select("nid", "nv", "__cluster")

    sc = F.array(*[F.lit(s) for s in scales])
    probes = (
        _probe_lists(queries_df, centers_df, n_probe, id_col, vec_col)
        .withColumn("__sc", sc)
        .withColumn("qi", F.expr(_SQ_ENCODE.format(v="qv", sc="__sc",
                                                   lv=SQ_LEVELS)))
        .withColumn("qn", F.expr(_SQNORM.format(v="qi")))
        .drop("__sc")
    )
    # stage 1: probed lists scanned on int8 codes ONLY — the fp vector
    # column never leaves the parquet store here (VERDICT r7 #3; at
    # 100 TB this is the difference between moving 1x and 5x the list
    # bytes through the scan + shuffle)
    stage1 = (
        codes_df.join(F.broadcast(probes), "__cluster")
        .filter(F.col("qid") != F.col("nid"))
        .withColumn("ni", F.col("code").cast("array<bigint>"))
        .withColumn("nn", F.expr(_SQNORM.format(v="ni")))
        .filter((F.col("qn") > 0) & (F.col("nn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="qi", b="ni")))
        .withColumn(
            "s1",
            F.col("dot").cast("double")
            / F.sqrt(F.col("qn").cast("double")
                     * F.col("nn").cast("double")),
        )
    )
    w1 = Window.partitionBy("qid").orderBy(F.col("s1").desc(),
                                           F.col("nid"))
    # winners carry only ids (qid, nid, __cluster) — the fp query
    # vector re-attaches from the n_queries-row probe side below, so
    # the broadcast stays ~25B/row even when a caller passes an
    # unbounded c (the scale-evidence leg does)
    winners = (
        stage1.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= c)
        .select("qid", "nid", "__cluster")
    )
    qvecs = probes.select("qid", "qv").dropDuplicates(["qid"])
    # fetch the n_queries*c winners' fp vectors: broadcast the small
    # winner-id set against the lists, keeping __cluster in the join
    # key so dynamic partition pruning limits the fetch scan to the
    # winners' list directories (the serving-store point-lookup,
    # expressed as a DPP-prunable broadcast join).  The hint is gated
    # on c (ADVICE r8): an uncapped c (the scale-evidence leg passes
    # 1<<30) makes winners ≡ every stage-1 candidate — linear in the
    # probed corpus — and a FORCED broadcast of that would hit the
    # driver/broadcast limit; those callers get a plain shuffle join
    # and AQE still broadcasts if the runtime size turns out small
    wb = F.broadcast(winners) if c <= _WINNER_BROADCAST_C_MAX else winners
    cand = (
        vecs_df.join(wb, ["__cluster", "nid"])
        .join(F.broadcast(qvecs), "qid")
        .select("qid", "qv", "nid", "nv")
    )
    # stage 2: fp rerank over n_queries*c rows, same quantized-integer
    # scoring as every exact path (identical results across engines)
    rer = (
        _quantized(_quantized(cand, "qv", "q2"), "nv", "n2")
        .withColumn("qn2", F.expr(_SQNORM.format(v="q2")))
        .withColumn("nn2", F.expr(_SQNORM.format(v="n2")))
        .filter((F.col("qn2") > 0) & (F.col("nn2") > 0))
        .withColumn("dot2", F.expr(_DOT.format(a="q2", b="n2")))
        .withColumn(
            "sim",
            F.col("dot2").cast("double")
            / F.sqrt(F.col("qn2").cast("double")
                     * F.col("nn2").cast("double")),
        )
    )
    w2 = Window.partitionBy("qid").orderBy(F.col("sim").desc(),
                                           F.col("nid"))
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").cast("long"), F.col("nid").cast("long"),
                F.col("rank").cast("int"),
                F.round("sim", 6).alias("sim"))
    )


def _score_candidate_pairs(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact quantized-integer cosine over candidate (a_id,av,b_id,bv)
    pairs — shared by every candidate-generation method so exact/lsh/ivf
    differ ONLY in which pairs they consider, never in scoring."""
    return (
        _quantized(_quantized(cand, "av", "ai"), "bv", "bi")
        .withColumn("an", F.expr(_SQNORM.format(v="ai")))
        .withColumn("bn", F.expr(_SQNORM.format(v="bi")))
        .filter((F.col("an") > 0) & (F.col("bn") > 0))
        .withColumn("dot", F.expr(_DOT.format(a="ai", b="bi")))
        .withColumn("sim", F.col("dot").cast("double")
                    / F.sqrt(F.col("an").cast("double") * F.col("bn").cast("double")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("a_id").cast("long"), F.col("b_id").cast("long"),
                F.round("sim", 6).alias("sim"))
    )

def embedding_dedup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh_portable",
    num_hash_tables: int = 4,
    bucket_length: float = 0.5,
    n_clusters: int = 16,
    n_assign: int = 2,
    dim: int = 64,
    n_bands: int = LSH_BANDS,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup flavor of X3).

    ``method`` picks candidate generation; scoring is always the same
    exact quantized-integer cosine (:func:`_score_candidate_pairs`):

    - ``"lsh_portable"`` (default since round 13, the 100 TB path):
      banded SIGN-LSH on the engine's constant integer plane matrix
      (the :func:`ann_lsh_portable_topk` hash) — pairs agreeing on
      every sign bit of at least one band meet.  Fully deterministic
      and engine-portable, so the registry query is DuckDB-oracled
      end-to-end; misses are cross-band near-dups, exactly the
      banding trade every LSH makes.
    - ``"lsh"``: ml random-projection LSH self-join on L2-normalized
      vectors — only bucket-mates meet.  The join radius is
      ``sqrt(2 - 2*(threshold - 0.02))`` (cosine t on the unit sphere
      = distance sqrt(2-2t); the 0.02 slack absorbs normalization/
      quantization drift at the boundary).  Kept as the ml-flavored
      alternative; its hash internals are not replayable elsewhere.
    - ``"ivf"``: deterministic inverted lists; each vector joins its
      ``n_assign`` nearest lists, pairs sharing a list meet.
    - ``"exact"``: all-pairs ``a_id < b_id`` — O(n²), validation and
      oracle use only; this is deliberately NOT the default.
    """
    if method == "lsh_portable":
        planes = _lsh_plane_matrix(dim=dim)
        h = (_quantized(
                emb.select(F.col(id_col).alias("id"),
                           F.col(vec_col).alias("v")), "v", "qv")
             .select("id", "v",
                     *_lsh_band_chunks("qv", planes, n_bands)))
        melted = h.select(
            "id", "v", F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"),
                         F.col(f"chunk{b}").alias("key"))
                for b in range(n_bands)])).alias("bk")
        ).select("id", "v", "bk.band", "bk.key")
        x, y = melted.alias("x"), melted.alias("y")
        cand = (
            x.join(y, on=["band", "key"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a_id"), F.col("x.v").alias("av"),
                    F.col("y.id").alias("b_id"), F.col("y.v").alias("bv"))
            .dropDuplicates(["a_id", "b_id"])
        )
        return _score_candidate_pairs(cand, threshold)
    if method == "exact":
        # validation-only all-pairs; still spread the dot products over
        # every core when the corpus is a single-file scan
        emb = rebalance_for_compute(emb)
        a = _quantized(
            emb.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av")),
            "av", "ai").withColumn("an", F.expr(_SQNORM.format(v="ai"))).drop("av")
        b = _quantized(
            emb.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv")),
            "bv", "bi").withColumn("bn", F.expr(_SQNORM.format(v="bi"))).drop("bv")
        return (
            a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
            .filter((F.col("an") > 0) & (F.col("bn") > 0))
            .withColumn("dot", F.expr(_DOT.format(a="ai", b="bi")))
            .withColumn("sim", F.col("dot").cast("double")
                        / F.sqrt(F.col("an").cast("double") * F.col("bn").cast("double")))
            .filter(F.col("sim") >= threshold)
            .select(F.col("a_id").cast("long"), F.col("b_id").cast("long"),
                    F.round("sim", 6).alias("sim"))
        )

    from pyspark.ml.functions import array_to_vector

    base = rebalance_for_compute(emb).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("__v"),
    )

    if method == "lsh":
        import math

        from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer

        normed = Normalizer(inputCol="__v", outputCol="__nv", p=2.0).transform(base)
        lsh = BucketedRandomProjectionLSH(
            inputCol="__nv", outputCol="__h", seed=42,
            bucketLength=bucket_length, numHashTables=num_hash_tables)
        model = lsh.fit(normed)
        radius = math.sqrt(max(0.0, 2.0 - 2.0 * (threshold - 0.02)))
        pairs = model.approxSimilarityJoin(normed, normed, radius, distCol="__d")
        cand = (
            pairs.filter(F.col("datasetA.id") < F.col("datasetB.id"))
            .select(F.col("datasetA.id").alias("a_id"),
                    F.col("datasetA.v").alias("av"),
                    F.col("datasetB.id").alias("b_id"),
                    F.col("datasetB.v").alias("bv"))
        )
    elif method == "ivf":
        # the same deterministic integral geometry as the ANN index
        # (round 13 — no ml KMeans anywhere in the IVF family)
        centers = _fit_centers(emb, n_clusters, id_col, vec_col)
        spark = emb.sparkSession
        centers_df = spark.createDataFrame(
            [(i, [int(x) for x in c]) for i, c in enumerate(centers)],
            "cid int, center array<bigint>",
        )
        # each vector joins its n_assign nearest lists (multi-assign
        # covers boundary-straddling near-dup pairs a single-assign
        # IVF would split across lists)
        assigned = (
            base.crossJoin(F.broadcast(centers_df))
            .withColumn("__qi", F.expr(_QUANTIZE.format(c="v", q=QUANT)))
            .withColumn(
                "d2",
                F.expr(_L2SQ_INT.format(a="__qi", b="center")),
            )
            .withColumn("pr", F.row_number().over(
                Window.partitionBy("id").orderBy(F.col("d2"), F.col("cid"))))
            .filter(F.col("pr") <= n_assign)
            .select("id", "v", "cid")
        )
        x, y = assigned.alias("x"), assigned.alias("y")
        cand = (
            x.join(y, on="cid")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("a_id"), F.col("x.v").alias("av"),
                    F.col("y.id").alias("b_id"), F.col("y.v").alias("bv"))
            .dropDuplicates(["a_id", "b_id"])
        )
    else:
        raise ValueError(f"unknown method: {method!r}")

    return _score_candidate_pairs(cand, threshold)

def embedding_norms_by_label(emb: DataFrame) -> DataFrame:
    """Per-label mean quantized squared L2 norm — integer-exact agg."""
    df = _quantized(emb, "embedding", "qi")
    df = df.withColumn("sqnorm", F.expr(_SQNORM.format(v="qi")))
    return (
        df.groupBy(F.col("label").cast("int").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("sqnorm").cast("long").alias("sum_sqnorm"),
        )
    )

# ---------------------------------------------------------------------------
# registry wiring

def _q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return cosine_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)

def _q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(spark, emb.filter(F.col("vec_id") < N_QUERIES), emb)

def _q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_norms_by_label(table(spark, sf_dir, "embeddings"))

def _q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return ivf_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)

def _q_ann_ivf_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the composed serving path: probed lists scanned on int8 codes,
    # fp rerank.  Fully oracled since round 13 (deterministic integral
    # geometry replayed in DuckDB); the pytest recall gate remains the
    # quantitative bar (>= the plain-IVF floor at equal probes).
    emb = table(spark, sf_dir, "embeddings")
    return ivf_sq_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)

def _q_ann_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return ann_lsh_portable_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)

def _lsh_portable_sql(k: int = TOP_K, n_bands: int = LSH_BANDS) -> str:
    """DuckDB twin of :func:`ann_lsh_portable_topk`: the same integer
    plane matrix inlined as list literals; dots are integer-valued (so
    exact in DOUBLE), bucketing and rerank mirror the Spark plan."""
    planes = _lsh_plane_matrix()
    width = len(planes) // n_bands

    def chunk(b: int) -> str:
        terms = []
        for j in range(width):
            lst = "[" + ", ".join(str(c) for c in planes[b * width + j]) + "]"
            terms.append(
                "(CASE WHEN list_dot_product(CAST(v AS DOUBLE[]), "
                f"CAST({lst} AS DOUBLE[])) >= 0 THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(terms)

    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, {chunk(b)} AS chunk FROM base"
        for b in range(n_bands)
    )
    return (
        "WITH base AS (SELECT vec_id AS id, {qv} AS v, "
        "  list_aggregate(list_transform({qv}, x -> x * x), 'sum') AS nrm "
        "  FROM embeddings), "
        f"bands AS ({band_rows}), "
        "cand AS (SELECT DISTINCT q.id AS qid, c.id AS nid "
        f"  FROM bands q JOIN bands c ON q.band = c.band "
        f"  AND q.chunk = c.chunk AND q.id < {N_QUERIES} AND q.id <> c.id), "
        "sims AS (SELECT qid, nid, "
        "  list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        "    / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS sim "
        "  FROM cand JOIN base a ON a.id = qid JOIN base b ON b.id = nid "
        "  WHERE a.nrm > 0 AND b.nrm > 0), "
        "ranked AS (SELECT qid, nid, sim, row_number() OVER ("
        "  PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM sims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        f"FROM ranked WHERE rank <= {k}"
    ).format(qv=_ORACLE_QUANT)

def _q_ann_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return sq_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)


def _sq_oracle(k: int = TOP_K, dim: int = SQ_DIM,
               lv: int = SQ_LEVELS) -> str:
    """DuckDB twin of :func:`sq_topk`: the per-dim scales, the int8
    encode, and the integer dot are all replayed with the SAME
    operation order, so the doubles agree bit-for-bit."""
    return (
        "WITH dims AS ("
        f"  SELECT t.i, max(abs(CAST(embedding[t.i] AS DOUBLE))) AS s "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  GROUP BY t.i), "
        "enc AS ("
        "  SELECT vec_id AS id, "
        "    list(COALESCE(CAST(floor(CAST(embedding[t.i] AS DOUBLE) "
        f"      / nullif(d.s, 0) * {lv}.0 + 0.5) AS BIGINT), 0) "
        "      ORDER BY t.i) AS code "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  JOIN dims d ON d.i = t.i GROUP BY vec_id), "
        "normed AS (SELECT id, code, "
        "  list_aggregate(list_transform(code, x -> x * x), 'sum') AS nrm "
        "  FROM enc), "
        "sims AS (SELECT q.id AS qid, c.id AS nid, "
        "  list_dot_product(CAST(q.code AS DOUBLE[]), "
        "                   CAST(c.code AS DOUBLE[])) "
        "    / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS sim "
        f"  FROM normed q, normed c WHERE q.id < {N_QUERIES} "
        "  AND q.id <> c.id AND q.nrm > 0 AND c.nrm > 0), "
        "ranked AS (SELECT qid, nid, sim, row_number() OVER ("
        "  PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM sims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        f"FROM ranked WHERE rank <= {k}"
    )


def _q_ann_sq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return sq_rerank_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)


def _sq_rerank_oracle(k: int = TOP_K, c: int = 32, dim: int = SQ_DIM,
                      lv: int = SQ_LEVELS) -> str:
    """DuckDB twin of :func:`sq_rerank_topk`: the sq stage of
    :func:`_sq_oracle` ranked to top-c, then the exact quantized-int
    rerank of :func:`cosine_topk`'s oracle on the candidates."""
    return (
        "WITH dims AS ("
        f"  SELECT t.i, max(abs(CAST(embedding[t.i] AS DOUBLE))) AS s "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  GROUP BY t.i), "
        "enc AS ("
        "  SELECT vec_id AS id, "
        "    list(COALESCE(CAST(floor(CAST(embedding[t.i] AS DOUBLE) "
        f"      / nullif(d.s, 0) * {lv}.0 + 0.5) AS BIGINT), 0) "
        "      ORDER BY t.i) AS code "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  JOIN dims d ON d.i = t.i GROUP BY vec_id), "
        "normed AS (SELECT id, code, "
        "  list_aggregate(list_transform(code, x -> x * x), 'sum') AS nrm "
        "  FROM enc), "
        "sqsims AS (SELECT q.id AS qid, c.id AS nid, "
        "  list_dot_product(CAST(q.code AS DOUBLE[]), "
        "                   CAST(c.code AS DOUBLE[])) "
        "    / sqrt(CAST(q.nrm AS DOUBLE) * CAST(c.nrm AS DOUBLE)) AS sim "
        f"  FROM normed q, normed c WHERE q.id < {N_QUERIES} "
        "  AND q.id <> c.id AND q.nrm > 0 AND c.nrm > 0), "
        "cand AS (SELECT qid, nid FROM (SELECT qid, nid, row_number() "
        "  OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS r "
        f"  FROM sqsims) WHERE r <= {c}), "
        "fp AS (SELECT vec_id AS id, " + _ORACLE_QUANT + " AS v FROM embeddings), "
        "fpn AS (SELECT id, v, "
        "  list_aggregate(list_transform(v, x -> x * x), 'sum') AS nrm "
        "  FROM fp), "
        "rsims AS (SELECT cand.qid, cand.nid, "
        "  list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        "    / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS sim "
        "  FROM cand JOIN fpn a ON a.id = cand.qid "
        "  JOIN fpn b ON b.id = cand.nid "
        "  WHERE a.nrm > 0 AND b.nrm > 0), "
        "ranked AS (SELECT qid, nid, sim, row_number() OVER ("
        "  PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM rsims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        f"FROM ranked WHERE rank <= {k}"
    )


def _q_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-index demo: build the IVF index on ~90% of the
    corpus, :func:`append_to_ivf_index` the remaining ~10% as a batch
    (batch-only scan, frozen geometry), then serve queries from the
    appended index.  Deterministic artifact keyed off the FULL corpus
    fingerprint + a demo suffix; "_APPEND_OK" marks base-build +
    append both complete so re-runs serve instead of re-appending
    (idempotence — a crash between build and append leaves no demo
    marker and the next run rebuilds from scratch, the static
    partition-overwrite dropping any half-appended lists).  Fully oracled
    since round 13: the DuckDB twin fits the geometry on the base
    subset and assigns every row against the frozen result — exactly
    what build+append produce (the pytest pin that an appended index
    equals a frozen-geometry rebuild exactly remains alongside)."""
    emb = table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 7)
    batch = emb.filter(F.col("vec_id") % 10 == 7)
    root = _ivf_auto_path(emb, "vec_id", "embedding", 16)
    if root is None:  # literal/streaming corpus: no file key — serve inline
        return ivf_topk(emb.filter(F.col("vec_id") < N_QUERIES), emb)
    path = root + "-apnd"
    with _IVF_BUILD_LOCK:
        if not _index_marker_exists(spark, path, "_APPEND_OK"):
            local = _local_fs_path(path)
            ctx = _DirBuildLock(local) if local is not None else \
                contextlib.nullcontext()
            with ctx:
                if not _index_marker_exists(spark, path, "_APPEND_OK"):
                    build_ivf_index(base, path, n_clusters=16,
                                    id_col="vec_id", vec_col="embedding")
                    append_to_ivf_index(batch, path, id_col="vec_id",
                                        vec_col="embedding")
                    _write_index_marker(spark, path, "_APPEND_OK")
            _gc_auto_index_root()
        else:
            _touch_index_marker(path)
    return ivf_topk_indexed(spark, emb.filter(F.col("vec_id") < N_QUERIES),
                            path)


def _q_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # synthetic embeddings are near-orthogonal (max pairwise cosine
    # ~0.51), so the demo threshold is 0.4; real corpora use ~0.95.
    # method="exact" on purpose: this row validates the scoring math
    # against the all-pairs DuckDB oracle; the public default is "lsh".
    return embedding_dedup_pairs(table(spark, sf_dir, "embeddings"),
                                 threshold=0.4, method="exact")

def _q_embedding_dedup_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the scale path (default method): portable sign-LSH candidates +
    # exact rescore.  Fully oracled since round 13 (the plane matrix
    # is a constant, so DuckDB replays banding + rescore verbatim);
    # pytest still pins that its pairs cover the planted near-dups.
    return embedding_dedup_pairs(table(spark, sf_dir, "embeddings"),
                                 threshold=0.4)


def _lsh_dedup_sql(threshold: float = 0.4,
                   n_bands: int = LSH_BANDS) -> str:
    """DuckDB twin of ``embedding_dedup_pairs(method="lsh_portable")``:
    the same banding as :func:`_lsh_portable_sql` but as an a<b pair
    self-join, rescored with the exact quantized-int cosine."""
    planes = _lsh_plane_matrix()
    width = len(planes) // n_bands

    def chunk(b: int) -> str:
        terms = []
        for j in range(width):
            lst = "[" + ", ".join(str(c) for c in planes[b * width + j]) + "]"
            terms.append(
                "(CASE WHEN list_dot_product(CAST(v AS DOUBLE[]), "
                f"CAST({lst} AS DOUBLE[])) >= 0 THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(terms)

    band_rows = " UNION ALL ".join(
        f"SELECT id, {b} AS band, {chunk(b)} AS chunk FROM base"
        for b in range(n_bands)
    )
    return (
        "WITH base AS (SELECT vec_id AS id, {qv} AS v, "
        "  list_aggregate(list_transform({qv}, x -> x * x), 'sum') AS nrm "
        "  FROM embeddings), "
        f"bands AS ({band_rows}), "
        "cand AS (SELECT DISTINCT q.id AS a_id, c.id AS b_id "
        "  FROM bands q JOIN bands c ON q.band = c.band "
        "  AND q.chunk = c.chunk AND q.id < c.id) "
        "SELECT a_id, b_id, "
        "round(list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        "  / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)), 6) AS sim "
        "FROM cand JOIN base a ON a.id = a_id JOIN base b ON b.id = b_id "
        "WHERE a.nrm > 0 AND b.nrm > 0 "
        "AND list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        f"  / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= {threshold}"
    ).format(qv=_ORACLE_QUANT)

QUERIES = {
    "ann_cosine_topk": _q_ann_cosine,
    "ann_lsh_topk": _q_ann_lsh,  # rows-only (ml-internal hash fns)
    "ann_lsh_portable": _q_ann_lsh_portable,
    "ann_sq_topk": _q_ann_sq,
    "ann_sq_rerank": _q_ann_sq_rerank,
    "ann_ivf_topk": _q_ann_ivf,
    "ann_ivf_sq_topk": _q_ann_ivf_sq,
    "ann_ivf_append": _q_ann_ivf_append,
    "embedding_norms": _q_embedding_norms,
    "dedup_embedding_pairs": _q_embedding_dedup,
    "dedup_embedding_ann": _q_embedding_dedup_ann,
}

_ORACLE_QUANT = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT))"
)

# DuckDB twin of clustering._HASH (the seed-draw order)
_O_IVF_HASH = ("CAST('0x' || substr(md5('ctr-v1:' || "
               "CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT)")


def _ivf_geometry_ctes(fit_where: str, n_clusters: int,
                       n_iters: int) -> str:
    """CTE chain replaying :func:`_fit_centers` + the final corpus
    assignment in DuckDB: salted-md5 seed draw over the FIT subset,
    ``n_iters`` unrolled Lloyd iterations (floor-mean, empty clusters
    keep their previous centroid — clustering.refine_centroids), then
    nearest-centroid assignment of the FULL corpus.  All distances are
    integer-exact (quantized vectors; vn + cn − 2·dot stays ≤ ~2e11,
    inside double's 2^53 integer window), so every argmin/tie-break
    matches the Spark side bit-for-bit."""
    d2 = ("{b}.vn + {c}.cn - 2 * list_dot_product("
          "CAST({b}.v AS DOUBLE[]), CAST({c}.cv AS DOUBLE[]))")
    fw = f"WHERE {fit_where} " if fit_where else ""
    parts = [
        ("base AS (SELECT vec_id, {qv} AS v, "
         "  list_aggregate(list_transform({qv}, x -> x * x), 'sum') "
         "  AS vn FROM embeddings)").format(qv=_ORACLE_QUANT),
        f"fitbase AS (SELECT * FROM base {fw})",
        ("ctr0 AS (SELECT CAST(row_number() OVER (ORDER BY h, vec_id) "
         "    - 1 AS INT) AS cid, v AS cv, vn AS cn "
         "  FROM (SELECT vec_id, v, vn, " + _O_IVF_HASH + " AS h "
         f"  FROM fitbase ORDER BY h, vec_id LIMIT {n_clusters}))"),
    ]
    for i in range(1, n_iters + 1):
        p, cur = f"ctr{i - 1}", f"ctr{i}"
        parts.append(
            f"asg{i} AS (SELECT vec_id, v, cid FROM ("
            "  SELECT b.vec_id, b.v, c.cid, row_number() OVER ("
            f"    PARTITION BY b.vec_id ORDER BY "
            + d2.format(b="b", c="c") + ", c.cid) AS rk "
            f"  FROM fitbase b CROSS JOIN {p} c) WHERE rk = 1)")
        parts.append(
            f"{cur} AS (SELECT s.cid, COALESCE(n.cv, s.cv) AS cv, "
            "  list_aggregate(list_transform(COALESCE(n.cv, s.cv), "
            "    x -> x * x), 'sum') AS cn "
            f"  FROM {p} s LEFT JOIN ("
            "    SELECT cid, list(m ORDER BY pos) AS cv FROM ("
            "      SELECT cid, pos, CAST(floor(CAST(sum(x) AS DOUBLE) "
            "        / count(*)) AS BIGINT) AS m "
            "      FROM (SELECT cid, unnest(v) AS x, "
            f"        generate_subscripts(v, 1) AS pos FROM asg{i}) "
            "      GROUP BY cid, pos) GROUP BY cid) n "
            "  ON n.cid = s.cid)")
    fin = f"ctr{n_iters}"
    parts.append(
        "assignf AS (SELECT vec_id, v, vn, cid FROM ("
        "  SELECT b.vec_id, b.v, b.vn, c.cid, row_number() OVER ("
        "    PARTITION BY b.vec_id ORDER BY "
        + d2.format(b="b", c="c") + ", c.cid) AS rk "
        f"  FROM base b CROSS JOIN {fin} c) WHERE rk = 1)")
    parts.append(
        "probes AS (SELECT qid, cid FROM ("
        "  SELECT b.vec_id AS qid, c.cid, row_number() OVER ("
        "    PARTITION BY b.vec_id ORDER BY "
        + d2.format(b="b", c="c") + ", c.cid) AS pr "
        f"  FROM base b CROSS JOIN {fin} c "
        f"  WHERE b.vec_id < {N_QUERIES}) WHERE pr <= 4)")
    return ", ".join(parts)


def _ivf_oracle(fit_where: str = "", k: int = TOP_K,
                n_clusters: int = 16,
                n_iters: int = IVF_LLOYD_ITERS) -> str:
    """DuckDB twin of :func:`ivf_topk` (and, with ``fit_where``, of
    the append demo — geometry fit on the base subset, every row
    assigned against the frozen result, exactly what build+append
    produce): probed lists + the exact quantized-int cosine rerank."""
    return (
        "WITH " + _ivf_geometry_ctes(fit_where, n_clusters, n_iters)
        + ", cand AS (SELECT p.qid, a.vec_id AS nid, a.v AS nv, "
        "    a.vn AS nn FROM probes p JOIN assignf a ON a.cid = p.cid "
        "    WHERE a.vec_id <> p.qid), "
        "sims AS (SELECT c.qid, c.nid, "
        "  list_dot_product(CAST(q.v AS DOUBLE[]), CAST(c.nv AS DOUBLE[])) "
        "    / sqrt(CAST(q.vn AS DOUBLE) * CAST(c.nn AS DOUBLE)) AS sim "
        "  FROM cand c JOIN base q ON q.vec_id = c.qid "
        "  WHERE q.vn > 0 AND c.nn > 0), "
        "ranked AS (SELECT qid, nid, sim, row_number() OVER ("
        "  PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM sims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        f"FROM ranked WHERE rank <= {k}"
    )


def _ivf_sq_oracle(k: int = TOP_K, c: int = 32, dim: int = SQ_DIM,
                   lv: int = SQ_LEVELS, n_clusters: int = 16,
                   n_iters: int = IVF_LLOYD_ITERS) -> str:
    """DuckDB twin of :func:`ivf_sq_topk`: the IVF geometry CTEs, the
    probed lists scored on int8 codes (the :func:`_sq_oracle` encode,
    full-corpus scales) to top-``c``, then the exact quantized-int fp
    rerank to top-``k`` — same operation order as the Spark stages, so
    the doubles agree bit-for-bit."""
    return (
        "WITH " + _ivf_geometry_ctes("", n_clusters, n_iters) + ", "
        "dims AS ("
        f"  SELECT t.i, max(abs(CAST(embedding[t.i] AS DOUBLE))) AS s "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  GROUP BY t.i), "
        "enc AS ("
        "  SELECT vec_id AS id, "
        "    list(COALESCE(CAST(floor(CAST(embedding[t.i] AS DOUBLE) "
        f"      / nullif(d.s, 0) * {lv}.0 + 0.5) AS BIGINT), 0) "
        "      ORDER BY t.i) AS code "
        f"  FROM embeddings CROSS JOIN range(1, {dim + 1}) AS t(i) "
        "  JOIN dims d ON d.i = t.i GROUP BY vec_id), "
        "codes AS (SELECT id, code, "
        "  list_aggregate(list_transform(code, x -> x * x), 'sum') AS cn "
        "  FROM enc), "
        "s1 AS (SELECT p.qid, a.vec_id AS nid, a.cid, "
        "  list_dot_product(CAST(qc.code AS DOUBLE[]), "
        "                   CAST(nc.code AS DOUBLE[])) "
        "    / sqrt(CAST(qc.cn AS DOUBLE) * CAST(nc.cn AS DOUBLE)) AS s "
        "  FROM probes p JOIN assignf a ON a.cid = p.cid "
        "  JOIN codes qc ON qc.id = p.qid JOIN codes nc ON nc.id = a.vec_id "
        "  WHERE a.vec_id <> p.qid AND qc.cn > 0 AND nc.cn > 0), "
        "winners AS (SELECT qid, nid FROM (SELECT qid, nid, "
        "  row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS r "
        f"  FROM s1) WHERE r <= {c}), "
        "rsims AS (SELECT w.qid, w.nid, "
        "  list_dot_product(CAST(q.v AS DOUBLE[]), CAST(n.v AS DOUBLE[])) "
        "    / sqrt(CAST(q.vn AS DOUBLE) * CAST(n.vn AS DOUBLE)) AS sim "
        "  FROM winners w JOIN base q ON q.vec_id = w.qid "
        "  JOIN base n ON n.vec_id = w.nid "
        "  WHERE q.vn > 0 AND n.vn > 0), "
        "ranked AS (SELECT qid, nid, sim, row_number() OVER ("
        "  PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM rsims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        f"FROM ranked WHERE rank <= {k}"
    )

ORACLES = {
    "ann_sq_topk": _sq_oracle(),
    "ann_sq_rerank": _sq_rerank_oracle(),
    "ann_cosine_topk": (
        "WITH q AS (SELECT vec_id AS qid, {qv} AS v FROM embeddings WHERE vec_id < 10), "
        "c AS (SELECT vec_id AS nid, {qv} AS v FROM embeddings), "
        "qn AS (SELECT qid, v, list_aggregate(list_transform(v, x -> x * x), 'sum') AS qn FROM q), "
        "cn AS (SELECT nid, v, list_aggregate(list_transform(v, x -> x * x), 'sum') AS nn FROM c), "
        "sims AS ( "
        "  SELECT qid, nid, "
        "    list_dot_product(CAST(qn.v AS DOUBLE[]), CAST(cn.v AS DOUBLE[])) "
        "      / sqrt(CAST(qn AS DOUBLE) * CAST(nn AS DOUBLE)) AS sim "
        "  FROM qn, cn WHERE qid <> nid AND qn > 0 AND nn > 0), "
        "ranked AS (SELECT qid, nid, sim, "
        "  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM sims) "
        "SELECT qid, nid, CAST(rank AS INT) AS rank, round(sim, 6) AS sim "
        "FROM ranked WHERE rank <= 5"
    ).format(qv=_ORACLE_QUANT),
    "embedding_norms": (
        "SELECT label, count(*) AS n, "
        "CAST(sum(list_aggregate(list_transform({qv}, x -> x * x), 'sum')) AS BIGINT) AS sum_sqnorm "
        "FROM embeddings GROUP BY label"
    ).format(qv=_ORACLE_QUANT),
    # ann_lsh_topk: rows-only (ml-internal hash fns).  The IVF trio is
    # fully oracled since round 13 (deterministic integral geometry).
    "ann_ivf_topk": _ivf_oracle(),
    "ann_ivf_sq_topk": _ivf_sq_oracle(),
    "ann_ivf_append": _ivf_oracle(fit_where="vec_id % 10 <> 7"),
    "ann_lsh_portable": _lsh_portable_sql(),
    "dedup_embedding_ann": _lsh_dedup_sql(),
    "dedup_embedding_pairs": (
        "WITH q AS (SELECT vec_id, {qv} AS v, "
        "  list_aggregate(list_transform({qv}, x -> x * x), 'sum') AS nrm "
        "  FROM embeddings) "
        "SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
        "round(list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        "  / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)), 6) AS sim "
        "FROM q a JOIN q b ON a.vec_id < b.vec_id "
        "WHERE a.nrm > 0 AND b.nrm > 0 "
        "AND list_dot_product(CAST(a.v AS DOUBLE[]), CAST(b.v AS DOUBLE[])) "
        "  / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) >= 0.4"
    ).format(qv=_ORACLE_QUANT),
}
