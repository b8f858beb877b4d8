"""Deterministic sampling & dataset splits over ``documents``.

A training-data pipeline's first job after dedup is carving the corpus
into reproducible train/val/test splits and drawing stratified samples
for eval sets. Both must be (a) deterministic across reruns and
engines, (b) shuffle-free or one-shuffle at 100 TB, and (c) stable
under re-partitioning — which rules out ``df.sample()`` (seeded per
partition split, so the sample changes whenever the file layout does).

The portable primitive is a salted md5 bucket:

    bucket(id) = int(md5(salt || id)[:15 hex]) % N_BUCKETS

md5 is bit-identical everywhere, 15 hex digits fit in an int64, and
the salt gives independent resampling universes. Spark spells it
``conv(substr(md5(x),1,15),16,10)``; DuckDB
``CAST('0x' || substr(md5(x),1,15) AS BIGINT)`` — same integer.

Scale shapes:
- **split_assign** is a pure projection — zero shuffles, whole-stage
  codegen, linear scan. The split column can be written back as a
  partition column so downstream reads prune to one split.
- **stratified_sample** is one hash-partition shuffle on the stratum
  key + WindowGroupLimit (each partition keeps k rows, no full sort).
  Skewed strata cost what a hot group-by key costs; per-stratum k is
  constant so the output is tiny regardless of input size.

Reference parity: none (logsqlite has no sampling); this is part of
the LLM-pipeline superset surface alongside dedup (X1/X2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.functions.rank import with_global_rank
from logsqlite_spark.tables import table

N_BUCKETS = 100
TRAIN_PCT = 80
VAL_PCT = 10  # test gets the remainder
SALT = "split-v1"
STRATUM_K = 20

_BUCKET = (
    "cast(conv(substr(md5(concat('{salt}:', cast({id} as string))), 1, 15), "
    "16, 10) as bigint) % {n}"
)


def _bucket_col(id_col: str, salt: str = SALT, n: int = N_BUCKETS):
    return F.expr(_BUCKET.format(salt=salt, id=id_col, n=n))


def split_assign(docs: DataFrame, id_col: str = "doc_id",
                 salt: str = SALT, train_pct: int = TRAIN_PCT,
                 val_pct: int = VAL_PCT) -> DataFrame:
    """Assign every document a deterministic train/val/test split.

    Pure narrow projection — the 100 TB plan is a single codegen'd
    scan; no shuffle, no sample() nondeterminism, stable across
    repartitioning and engine versions.
    """
    b = _bucket_col(id_col, salt)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        b.cast("int").alias("bucket"),
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def split_counts(docs: DataFrame, id_col: str = "doc_id",
                 salt: str = SALT) -> DataFrame:
    """Split sizes — the sanity check every pipeline runs after
    assignment. One map-side-combined aggregation on a 3-value key."""
    return (
        split_assign(docs, id_col, salt)
        .groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def stratified_sample(docs: DataFrame, stratum_col: str = "lang",
                      k: int = STRATUM_K, id_col: str = "doc_id",
                      salt: str = SALT) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample.

    Rows are ranked inside each stratum by (md5 bucket, id) — a
    uniform pseudo-random order that both engines reproduce — and the
    first k kept. WindowGroupLimit pushes the ``rn <= k`` bound into
    the per-partition sort, so each executor retains k rows per
    stratum instead of sorting its whole partition.
    """
    h = _bucket_col(id_col, salt, 1_000_000_007)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def mixture_sample(docs: DataFrame, quotas: dict[str, int],
                   stratum_col: str = "source", id_col: str = "doc_id",
                   salt: str = "mix-v1") -> DataFrame:
    """Source-weighted corpus mixing (DoReMi/Pile-style static data
    mixture): draw EXACTLY ``quotas[s]`` documents from each listed
    source, deterministically. The quota table is a handful of
    literals broadcast into the per-stratum rank filter, so the plan
    is the stratified-sample WindowGroupLimit — each executor retains
    at most the quota per source, and the shuffle carries
    O(sum(quotas)) rows no matter the corpus size. Sources short of
    their quota contribute everything they have (the caller audits
    via a count per stratum); unlisted sources contribute nothing.

    Determinism: rows rank inside a source by (salted md5, id) — a
    uniform pseudo-random order both engines reproduce, so resampling
    under a different salt gives an independent draw and the DuckDB
    oracle hash-matches exactly.
    """
    h = _bucket_col(id_col, salt, 1_000_000_007)
    quota_map = F.create_map(*[
        x for s, q in quotas.items() for x in (F.lit(s), F.lit(int(q)))])
    w = Window.partitionBy(stratum_col).orderBy(h.asc(),
                                               F.col(id_col).asc())
    # the per-source bound is a map lookup — NOT a literal, so it
    # cannot trigger InsertWindowGroupLimit by itself and every row
    # would sort through the shuffle. The literal max-quota conjunct
    # restores the map-side prune (each task keeps ≤ max(quota) rows
    # per source before the exchange); the map conjunct then trims to
    # the exact per-source quota. Plan pinned in test_plans.py.
    max_q = max(int(q) for q in quotas.values())
    return (
        docs.filter(F.col(stratum_col).isin(list(quotas)))
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") <= F.lit(max_q))
                & (F.col("rn") <= quota_map[F.col(stratum_col)]))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(stratum_col).alias("stratum"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


MIXT_TOTAL = 200


def temperature_mixture_sample(docs: DataFrame, total: int = MIXT_TOTAL,
                               stratum_col: str = "source",
                               id_col: str = "doc_id",
                               salt: str = "mixT-v1") -> DataFrame:
    """Temperature-flattened corpus mixture at τ=2 (α=1/2): each
    stratum's quota is proportional to √n_s — the standard
    multilingual-LLM rebalancing (upsample the tail, downsample the
    head) with the temperature fixed at the one exponent that stays
    engine-exact: IEEE sqrt is correctly rounded (every libm agrees
    bit-for-bit), unlike pow(x, α) for general α. The weight is
    ``floor(sqrt(n_s)·1000)`` — one exact int→double conversion, one
    correctly-rounded sqrt, one correctly-rounded multiply, a floor —
    then quotas are pure integer arithmetic:
    ``quota_s = total·w_s div Σw_s``.

    Plan: the stratum-count aggregation is map-side combinable and
    stratum-cardinality sized; quotas broadcast back onto the
    stratified rank (same salted-md5 order as ``mixture_sample``).
    The literal ``rn <= total`` conjunct keeps the WindowGroupLimit
    map-side prune (the quota itself is a joined column, which cannot
    trigger it); the quota conjunct then trims exactly. Integer
    floor-division under-allocates by at most one doc per stratum —
    deterministic, and documented rather than redistributed (the
    remainder rule would need a second pass for no modeling benefit).
    """
    h = _bucket_col(id_col, salt, 1_000_000_007)
    counts = (docs.groupBy(F.col(stratum_col).alias("stratum"))
              .agg(F.count(F.lit(1)).alias("n_s"))
              .withColumn(
                  "w",
                  F.expr("cast(floor(sqrt(cast(n_s as double)) * 1000) "
                         "as bigint)")))
    quotas = (counts
              .withColumn("w_sum", F.sum("w").over(Window.partitionBy()))
              .withColumn("quota",
                          F.expr(f"cast({int(total)} * w div w_sum "
                                 "as bigint)"))
              .select("stratum", "n_s", "quota"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(),
                                                F.col(id_col).asc())
    ranked = (docs.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= F.lit(int(total))))
    return (
        ranked.join(F.broadcast(quotas),
                    ranked[stratum_col] == quotas["stratum"])
        .filter(F.col("rn") <= F.col("quota"))
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.col("stratum"), F.col("quota").cast("long"),
                F.col("rn").cast("int").alias("rn"))
    )


def corpus_shuffle(docs: DataFrame, seed: str = "shuffle-v1",
                   id_col: str = "doc_id",
                   n_ranges: int | None = None) -> DataFrame:
    """Deterministic global training-order permutation: every document
    gets a position ``pos`` in a seeded pseudo-random total order —
    the epoch shuffle a training pipeline materializes before packing
    examples into batches. Changing ``seed`` yields an independent
    permutation; the same seed is reproducible across reruns, engines,
    and file layouts (unlike ``df.orderBy(rand())``).

    The order key is (salted md5, id) — uniform and total. The naive
    spelling ``row_number() OVER (ORDER BY key)`` is a single-
    partition window: one task sorts the planet. The rank instead
    comes from the distributed two-pass construction
    (``functions/rank.py::with_global_rank``): range-partition on the
    key, narrow in-partition offsets, per-partition counts →
    broadcast cumulative offsets. Correctness does not depend on
    where the sampled range boundaries fall (partition i sorts wholly
    before i+1, so offset+local ≡ global), pinned by the
    boundary-invariance test. At 100 TB this is one wide exchange
    plus a per-partition sort — the minimum any total order costs —
    and writing the output with ``repartitionByRange(pos)`` yields
    epoch files in shuffled order for the trainer to stream.
    """
    h = _bucket_col(id_col, seed, 1_000_000_007)
    keyed = docs.select(F.col(id_col).cast("long").alias("doc_id"),
                        h.alias("h"))
    ranked = with_global_rank(keyed, ["h", "doc_id"], rank_col="pos",
                              n_parts=n_ranges)
    return ranked.select("doc_id", F.col("pos").cast("long").alias("pos"))


def write_training_shards(docs: DataFrame, path: str,
                          rows_per_shard: int = 1000,
                          seed: str = "shuffle-v1",
                          id_col: str = "doc_id") -> DataFrame:
    """Materialize the corpus as fixed-size training shards in seeded
    shuffle order — the export step after :func:`corpus_shuffle`:
    shard k holds positions ``[k·R+1, (k+1)·R]`` of the permutation,
    one parquet file per shard, rows inside each file in position
    order, so a trainer streams ``shard=0,1,2,…`` and sees the exact
    epoch order without any further sort.

    Scale: the permutation is the one wide exchange of
    ``corpus_shuffle``; the shard assignment is a narrow projection
    on ``pos``; ``repartition(shard)`` hash-routes each shard wholly
    into one task (collisions co-locate whole shards, never split
    one), and the per-task ``sortWithinPartitions`` orders at most a
    few shards of rows. Shard size is the knob that bounds task
    memory — R rows per file regardless of corpus size.

    Returns the shard manifest (shard, n_rows, min_pos, max_pos) read
    back from the written files.
    """
    ranked = corpus_shuffle(docs, seed=seed, id_col=id_col)
    out = (
        docs.withColumn("doc_id", F.col(id_col).cast("long"))
        .join(ranked, "doc_id")
        .withColumn("shard", F.expr(
            f"cast((pos - 1) div {int(rows_per_shard)} as int)"))
    )
    (out.repartition("shard")
     .sortWithinPartitions("shard", "pos")
     .write.partitionBy("shard").mode("overwrite").parquet(path))
    spark = docs.sparkSession
    return (
        spark.read.option("basePath", path).parquet(path)
        .groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             F.min("pos").cast("long").alias("min_pos"),
             F.max("pos").cast("long").alias("max_pos"))
    )


MIX_QUOTAS = {"src0": 12, "src1": 3, "src2": 20, "src3": 7}


def _q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_assign(table(spark, sf_dir, "documents"))


def _q_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return split_counts(table(spark, sf_dir, "documents"))


def _q_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(table(spark, sf_dir, "documents"))


def _q_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_sample(table(spark, sf_dir, "documents"), MIX_QUOTAS)


def _q_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_shuffle(table(spark, sf_dir, "documents"))


def _q_mixture_temp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_mixture_sample(table(spark, sf_dir, "documents"))


QUERIES = {
    "split_assign": _q_split_assign,
    "split_counts": _q_split_counts,
    "stratified_sample": _q_stratified,
    "mixture_sample": _q_mixture,
    "corpus_shuffle": _q_shuffle,
    "mixture_temperature": _q_mixture_temp,
}

_SQL_BUCKET = (
    "CAST(concat('0x', substr(md5(concat('{salt}:', CAST({id} AS VARCHAR))), "
    "1, 15)) AS BIGINT) % {n}"
)

_B100 = _SQL_BUCKET.format(salt=SALT, id="doc_id", n=N_BUCKETS)
_BBIG = _SQL_BUCKET.format(salt=SALT, id="doc_id", n=1_000_000_007)

_SPLIT_SQL = (
    f"SELECT doc_id, CAST({_B100} AS INT) AS bucket, "
    f"CASE WHEN {_B100} < {TRAIN_PCT} THEN 'train' "
    f"WHEN {_B100} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
    "ELSE 'test' END AS split FROM documents"
)

ORACLES = {
    "split_assign": _SPLIT_SQL,
    "split_counts": (
        f"SELECT split, count(*) AS n_docs FROM ({_SPLIT_SQL}) GROUP BY split"
    ),
    "stratified_sample": (
        f"WITH r AS (SELECT doc_id, lang AS stratum, row_number() OVER ("
        f"PARTITION BY lang ORDER BY {_BBIG} ASC, doc_id ASC) AS rn "
        "FROM documents) "
        f"SELECT doc_id, stratum, CAST(rn AS INT) AS rn FROM r "
        f"WHERE rn <= {STRATUM_K}"
    ),
    "corpus_shuffle": (
        "SELECT doc_id, row_number() OVER (ORDER BY "
        + _SQL_BUCKET.format(salt="shuffle-v1", id="doc_id", n=1_000_000_007)
        + " ASC, doc_id ASC) AS pos FROM documents"
    ),
    "mixture_temperature": (
        "WITH c AS (SELECT source AS stratum, count(*) AS n_s "
        "FROM documents GROUP BY source), "
        "w AS (SELECT stratum, n_s, "
        "CAST(floor(sqrt(CAST(n_s AS DOUBLE)) * 1000) AS BIGINT) AS w "
        "FROM c), "
        f"q AS (SELECT stratum, CAST(({MIXT_TOTAL} * w) // "
        "(SELECT sum(w) FROM w) AS BIGINT) AS quota FROM w), "
        "r AS (SELECT doc_id, source AS stratum, row_number() OVER ("
        "PARTITION BY source ORDER BY "
        + _SQL_BUCKET.format(salt="mixT-v1", id="doc_id", n=1_000_000_007)
        + " ASC, doc_id ASC) AS rn FROM documents) "
        "SELECT doc_id, stratum, quota, CAST(rn AS INT) AS rn "
        "FROM r JOIN q USING (stratum) WHERE rn <= quota"
    ),
    "mixture_sample": (
        "WITH q(src, quota) AS (VALUES "
        + ", ".join(f"('{s}', {n})" for s, n in MIX_QUOTAS.items())
        + "), "
        "r AS (SELECT doc_id, source AS stratum, row_number() OVER ("
        "  PARTITION BY source ORDER BY "
        + _SQL_BUCKET.format(salt="mix-v1", id="doc_id", n=1_000_000_007)
        + " ASC, doc_id ASC) AS rn "
        "  FROM documents WHERE source IN (SELECT src FROM q)) "
        "SELECT doc_id, stratum, CAST(rn AS INT) AS rn "
        "FROM r JOIN q ON stratum = src WHERE rn <= quota"
    ),
}
