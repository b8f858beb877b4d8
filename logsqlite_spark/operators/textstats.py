"""Text analysis operators (SURVEY.md §2.8 X4) over ``documents``.

All pure built-in expressions — split/filter/transform lambdas run in
whole-stage codegen; nothing leaves the JVM. Every metric is either
integer-exact or a single division of integer-exact values, so the
DuckDB oracle agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.tables import rebalance_for_compute, table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# language marker words for the n-gram/keyword language-ID heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "que"),
    "fr": ("le", "la", "les", "et"),
}

def _sql_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)

def _tok(c: str) -> str:
    return f"filter(split({c}, ' '), t -> t != '')"

def text_quality(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics: token counts, length stats,
    stopword ratio — the junk-filter features of a training pipeline."""
    toks = _tok(text_col)
    stop = _sql_list(STOPWORDS)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(text_col).cast("int").alias("text_len"),
        F.expr(f"size({toks})").cast("int").alias("n_tokens"),
        F.expr(f"size(filter({toks}, t -> t IN ({stop})))")
        .cast("int").alias("n_stopwords"),
        F.round(
            F.expr(f"cast(length(replace({text_col}, ' ', '')) as double)")
            / F.expr(f"cast(size({toks}) as double)"), 6
        ).alias("avg_token_len"),
        F.round(
            F.expr(f"cast(size(filter({toks}, t -> t IN ({stop}))) as double)")
            / F.expr(f"cast(size({toks}) as double)"), 6
        ).alias("stopword_ratio"),
    )

def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish regex token count per document."""
    toks = _tok(text_col)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(f"size({toks})").cast("int").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-z0-9]+"), F.lit(0)))
        .cast("int").alias("re_tokens"),
    )

def token_frequencies(docs: DataFrame, min_count: int = 10,
                      text_col: str = "text") -> DataFrame:
    """Corpus-wide token frequency (threshold, not LIMIT — tie-safe).

    explode -> partial-agg groupBy: the shuffle carries (token, count)
    partials, not token instances.
    """
    return (
        docs.select(F.explode(F.expr(_tok(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )

def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Normalized-text fingerprint: lower + whitespace-collapse + md5."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(norm).alias("fp"),
    )

WINNOW_K = 8   # k-gram width (chars)
WINNOW_W = 4   # winnowing window (consecutive k-gram hashes)


def winnow_fingerprints(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Document fingerprinting via winnowing (rolling k-gram hashes,
    window minima — the MOSS algorithm): each window of ``w``
    consecutive k-gram hashes contributes its minimum, so two
    documents sharing any run of ``k + w - 1`` characters share a
    fingerprint, while per-doc fingerprint count is ~len/w instead of
    ~len. Pure built-in expressions (two chained projections, zero
    shuffle until the caller aggregates); the k-gram hash reuses the
    md5→int idiom of the minhash signatures so the DuckDB oracle
    mirrors it exactly.
    """
    grams = (
        "transform(sequence(1, greatest(length({c}) - {km1}, 1)), "
        "i -> cast(conv(substring(md5(substring({c}, i, {k})), 1, 15), 16, 10) "
        "as bigint) % 4294967296L)"
    ).format(c=text_col, km1=k - 1, k=k)
    fps = (
        "array_distinct(transform("
        "sequence(1, greatest(size(__grams) - {wm1}, 1)), "
        "j -> array_min(slice(__grams, j, {w}))))"
    ).format(wm1=w - 1, w=w)
    return (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(grams).alias("__grams"))
        .select("doc_id", F.explode(F.expr(fps)).alias("fp"))
    )


def chunk_documents(docs: DataFrame, chunk_tokens: int = 64,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-token-budget chunks with overlap —
    the RAG / long-context-pretraining prep step. Pure zero-shuffle
    projection: chunk starts are a generated ``sequence`` at stride
    ``chunk_tokens - overlap`` (the last start is the largest stride
    multiple that still contributes uncovered tokens, so every token
    appears and no trailing chunk is redundant), exploded and sliced
    in whole-stage codegen. A 100 TB corpus chunks at scan speed;
    output order is (doc_id, chunk_id) by construction.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = f"split({text_col}, ' ')"
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.expr(toks).alias("__t"))
        .select(
            "doc_id", F.expr("size(__t)").alias("__n"), "__t",
            F.explode(F.expr(
                f"sequence(0, greatest(size(__t) - {overlap} - 1, 0), "
                f"{stride})")).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / F.lit(stride)).cast("int").alias("chunk_id"),
            F.least(F.lit(chunk_tokens),
                    F.col("__n") - F.col("start")).cast("int")
            .alias("n_tokens"),
            F.expr(f"array_join(slice(__t, start + 1, {chunk_tokens}), "
                   "' ')").alias("chunk_text"))
    )


def winnow_matches(docs: DataFrame, min_shared: int = 8,
                   max_doc_freq: int = 64, k: int = WINNOW_K,
                   w: int = WINNOW_W, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Near-dup / plagiarism candidates: doc pairs sharing at least
    ``min_shared`` winnowing fingerprints, via the same inverted-index
    join + hot-key cap as the Jaccard path. The absolute df cap bounds
    emitted pairs by cap * total_fingerprints — linear in corpus size
    (dedup.py's blocking-bound argument), so the operator keeps its
    shape at 100 TB.
    """
    fp = winnow_fingerprints(docs, k, w, text_col, id_col)
    # Groups-to-pairs, not a self-join: ONE pass computes the (fp ->
    # sorted doc list) groups and pairs are generated from each
    # bounded array in codegen. A self-join formulation re-evaluates
    # the k-gram hashing for every exchange input (~3x the scan cost)
    # and shuffles the fingerprint table twice.
    #
    # The df cap is enforced BEFORE the list aggregation (round 9): a
    # group-size filter after collect_list would first materialize
    # the full doc list of a hot fingerprint in one agg buffer — a
    # template fp in millions of docs OOMs that task at 100 TB
    # (HashAggregate buffers don't spill mid-group; WindowExec does).
    # The window count shares the grouping's hashpartitioning
    # exchange, spills on a pathological partition instead of dying,
    # and the k-gram hash pipeline still runs exactly ONCE (the
    # minhash double-compute lesson — a df pre-count + anti-join
    # formulation re-evaluates the fingerprint scan per consumer).
    # Surviving groups are <= max_doc_freq ids by construction.
    w_fp = Window.partitionBy("fp")
    groups = (
        fp.withColumn("__df", F.count(F.lit(1)).over(w_fp))
        .filter(F.col("__df") <= max_doc_freq)
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = groups.select(F.explode(F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x AS a_id, y AS b_id))))"
    )).alias("p")).select("p.a_id", "p.b_id")
    return (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


# test hook: number of eager corpus fingerprint-table builds — the
# persisted-artifact contract is "the at-rest corpus is winnowed once,
# ever" (VERDICT r8 #4), and the build happens eagerly at artifact
# creation, so a counter, not a plan pin, is the honest gate (the same
# argument as similarity._SQ_SCALE_COMPUTES).
_WINNOW_ARTIFACT_BUILDS = 0


def winnow_fps_artifact(docs: DataFrame, k: int = WINNOW_K,
                        w: int = WINNOW_W, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """The corpus-side winnow fingerprint table ``(doc_id, fp)`` as a
    PERSISTED artifact — fingerprint-keyed parquet under the shared
    artifact root, built once per corpus and served on every later
    call (VERDICT r8 #4: ``text_winnow_matches`` used to re-winnow the
    whole corpus per query).

    Maintenance is incremental by construction: winnowing is per-doc,
    so the table for corpus ∪ batch is the table for corpus plus the
    batch's own fingerprints — append :func:`winnow_fingerprints`
    (new_batch) to the same parquet per ingest batch, exactly the
    ``ngram_df_partials`` snapshot idiom.  At 100 TB the at-rest text
    is never re-hashed; matches against a batch scan this columnar
    table (semi-joined down to the batch's fps) instead.

    Reuses the similarity module's artifact protocol (root dir, flock
    + thread lock, completion marker, keep-newest GC) so all
    fingerprint-keyed caches live and age in one place.  A literal or
    streaming corpus (no backing files to key on) computes inline.
    """
    from logsqlite_spark.artifacts import build_or_serve
    from logsqlite_spark.tables import frames_fingerprint

    global _WINNOW_ARTIFACT_BUILDS
    spark = docs.sparkSession
    # inline plan built LAZILY (r16): constructing the corpus-side
    # hash projection costs ~0.1-0.3 s of driver expression building
    # per call and is thrown away whenever the artifact is served —
    # build it only for the no-files fallback or inside the
    # at-most-once write lambda.
    def inline() -> DataFrame:
        return winnow_fingerprints(docs, k, w, text_col, id_col)
    try:
        files = docs.inputFiles()
    except Exception:  # noqa: BLE001 — e.g. streaming frames
        files = []
    if not files:
        return inline()
    from logsqlite_spark.artifacts import write_parts

    path, built = build_or_serve(
        spark,
        # -v2 (r17): size-derived output file count — the raw write
        # inherited the rebalanced compute's 32 partitions and served
        # 32 tiny files per query rep at bench scale (guide §6)
        (frames_fingerprint(docs), text_col, id_col, str(k), str(w),
         "winnow-fps-v2"),
        lambda p: (inline().repartition(write_parts(files, spark))
                   .write.mode("overwrite").parquet(f"{p}/fps")))
    if built:
        _WINNOW_ARTIFACT_BUILDS += 1
    from logsqlite_spark.artifacts import serve_parquet
    return serve_parquet(spark, path, "fps")


def winnow_matches_incremental(new_docs: DataFrame,
                               history_fps: DataFrame,
                               min_shared: int = 8,
                               max_doc_freq: int = 64,
                               k: int = WINNOW_K, w: int = WINNOW_W,
                               text_col: str = "text",
                               id_col: str = "doc_id") -> DataFrame:
    """Winnow near-dup candidates INVOLVING a new batch, without
    re-fingerprinting the at-rest corpus — the incremental twin of
    :func:`winnow_matches` (VERDICT r8 #4), mirroring
    ``repeated_ngram_stats_incremental``'s new-vs-at-rest shape.

    ``history_fps`` is the persisted ``(doc_id, fp)`` table from
    :func:`winnow_fps_artifact` / :func:`winnow_fingerprints` over
    every prior batch (doc sets disjoint from the batch, which ingest
    guarantees).  Every fingerprint shared by a batch-involving pair
    is by definition one of the BATCH's fingerprints, so the history
    side is first semi-joined down to the batch's fp set — a broadcast
    semi-join against a batch-sized key set, pruning the history scan
    to the relevant fps (with fp-bucketed storage this also prunes at
    the file level).  Groups keep ALL docs of a surviving fp, so the
    ``max_doc_freq`` cap and every pair's ``n_shared`` count are
    computed over history ∪ batch exactly as the full recompute would
    — the result is IDENTICAL to ``winnow_matches(history ∪ batch)``
    restricted to pairs touching the batch (pytest-pinned; the oracled
    query replays the full formulation in SQL).

    Only the batch is tokenized/hashed; history contributes a columnar
    ``(doc_id, fp)`` scan.  Same groups-to-pairs shape (never a
    self-join) and the same group-size bound as the batch operator.
    """
    batch_fp = winnow_fingerprints(new_docs, k, w, text_col, id_col) \
        .withColumn("nw", F.lit(1))
    # materialize the batch's fingerprints ONCE: they feed both the
    # semi-join's build side and the union's probe side, and lazy
    # re-evaluation would re-winnow the batch per consumer (measured
    # ~2x the batch hash cost).  localCheckpoint is bounded by the
    # BATCH — O(micro-batch), never O(corpus) — and truncates lineage
    # so both consumers read the materialized blocks.
    batch_fp = batch_fp.localCheckpoint(eager=True)
    hist = history_fps.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("fp").cast("long").alias("fp")).withColumn("nw", F.lit(0))
    # no .distinct() on the build side: left-semi semantics ignore
    # build duplicates, and the distinct would cost its own shuffle
    pruned = hist.join(F.broadcast(batch_fp.select("fp")),
                       "fp", "leftsemi").unionByName(batch_fp)
    # df cap BEFORE the list aggregation, like winnow_matches (round
    # 9): the window count shares the grouping's exchange and spills
    # on a hot fingerprint instead of materializing its full doc list
    # in an agg buffer; df over pruned ≡ df over history ∪ batch for
    # every batch fp, so the union-exactness argument is unchanged.
    w_fp = Window.partitionBy("fp")
    groups = (
        pruned.withColumn("__df", F.count(F.lit(1)).over(w_fp))
        .filter(F.col("__df") <= max_doc_freq)
        .groupBy("fp")
        .agg(F.sort_array(F.collect_list(F.struct(
            F.col("doc_id").alias("d"), F.col("nw")))).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    pairs = groups.select(F.explode(F.expr(
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), "
        "y -> struct(x.d AS a_id, y.d AS b_id, "
        "greatest(x.nw, y.nw) AS has_new))))"
    )).alias("p")).filter(F.col("p.has_new") == 1) \
        .select("p.a_id", "p.b_id")
    return (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )



def _gram_expr(n: int) -> str:
    """Token n-gram strings over the __t column — shared by the
    detection (repeated_ngram_stats) and removal (dedup_span_clean)
    halves so their gram keys can never desynchronize. Emits an empty
    array for docs shorter than n tokens (sequence(1, 0) in Spark is
    the DESCENDING [1, 0], so the CASE guard is load-bearing)."""
    return (
        f"CASE WHEN size(__t) >= {n} THEN "
        f"transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> array_join(slice(__t, i, {n}), ' ')) "
        "ELSE array() END"
    )


# Salt fan-out bounds for the hot-gram joins below. A template-heavy
# corpus has 8-grams that occur in MILLIONS of documents; any plan
# that routes all of one gram's rows to a single task (a
# gram-partitioned window, or the probe side of a sort-merge join on
# gram) is a straggler/OOM at 100 TB (VERDICT r6: the one
# scale-killer plan in the repo). The fan-out follows the session's
# shuffle parallelism (ADVICE r7: a fixed 16 caps skew relief at 16
# tasks per hot gram regardless of cluster size), clamped: at least
# 16 so a small-parallelism session still breaks hot keys, at most 64
# so the (small) replicated hot-gram build side stays bounded.
_GRAM_SALTS_MIN, _GRAM_SALTS_MAX = 16, 64


def _gram_salts(spark: SparkSession) -> int:
    try:
        parallelism = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # noqa: BLE001 — e.g. "auto" under AQE-only confs
        parallelism = _GRAM_SALTS_MIN
    return max(_GRAM_SALTS_MIN, min(parallelism, _GRAM_SALTS_MAX))


def _join_hot_grams(probe: DataFrame, hot_grams: DataFrame,
                    how: str = "left") -> DataFrame:
    """Skew-safe membership join of per-gram rows against the hot-gram
    set: the probe side is salted on ``xxhash64(doc_id)`` and the
    build side (one row per duplicated gram — a small fraction of the
    gram universe) is replicated across all salts, so a hot gram's
    rows spread over ``_gram_salts(spark)`` tasks instead of one. Pure
    equi-join on (gram, salt): AQE can still pick a broadcast when the
    replicated build side is small, and sort-merge never sees a
    single-task hot key. Adds a marker column ``__hot`` (1 on match)."""
    n_salts = _gram_salts(probe.sparkSession)
    salted_hot = hot_grams.select(
        "gram",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        .alias("__salt"),
        F.lit(1).alias("__hot"),
    )
    salted_probe = probe.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(n_salts))
        .cast("int"))
    return (salted_probe.join(salted_hot, ["gram", "__salt"], how)
            .drop("__salt"))


def repeated_ngram_stats(docs: DataFrame, n: int = 8, min_df: int = 2,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact repeated-token-n-gram signal per document — the substring
    dedup statistic of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (2022): a position is *duplicated* when
    its token n-gram occurs in >= ``min_df`` distinct documents, and
    a document's ``dup_fraction`` is the share of its positions that
    are duplicated. Pipelines cut or down-weight high-dup documents;
    unlike the winnowing path (sampled fingerprints, approximate)
    this is exact on token n-grams.

    Shape: gram generation is a zero-shuffle generated-sequence
    projection (like chunking), and the corpus is scanned exactly
    ONCE — positions combine map-side to (gram, doc_id, count)
    partials before anything shuffles; doc-frequency is then a
    two-level aggregate over those partials (each (gram, doc_id) row
    = one distinct doc, and ``groupBy(gram).count`` combines map-side
    so a hot gram ships at most one partial per task, never its raw
    rows); only grams with ``df >= min_df`` survive as the hot set,
    which joins back to the partials through the salted
    :func:`_join_hot_grams` so a hot gram's rows spread across tasks
    instead of piling into one (the earlier gram-partitioned-window
    formulation put every (gram, doc) row of one gram into a single
    task's sort — a straggler/OOM on a template-heavy 100 TB corpus).
    Nothing bigger than the distinct (gram, doc) pairs ever shuffles.
    At 100 TB you key on ``xxhash64(gram)`` to shrink shuffle bytes
    (same plan; strings kept here so DuckDB replays the key
    byte-for-byte). Documents shorter than ``n`` tokens emit no
    positions and are absent from the output (both engines drop them
    identically)."""
    toks = _tok(text_col)
    grams = _gram_expr(n)
    g = (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(toks).alias("__t"))
        .select("doc_id", F.explode(F.expr(grams)).alias("gram"))
        # no-op (array_join never yields NULL) — but it matches the
        # isnotnull(gram) predicate the join below pushes into its
        # build side, so BOTH branches of the self-join share one
        # identical exchange subtree and ReuseExchange keeps the
        # corpus scan single
        .filter(F.col("gram").isNotNull())
    )
    per_gram_doc = g.groupBy("gram", "doc_id").agg(
        F.count(F.lit(1)).alias("c"))
    # one row per (gram, doc): the gram's row count IS its distinct-doc
    # frequency; only membership in the df>=min_df set matters
    # downstream, so the join-back carries one row per HOT gram
    # sum(least(c, 1)) ≡ count of (gram, doc) rows (c >= 1 always),
    # phrased so Catalyst can't prune c out of this branch: keeping c
    # makes the (gram, doc) partial-aggregate exchange byte-identical
    # to the probe branch's, so exchange reuse serves BOTH sides of
    # the self-join from ONE shuffle and one gram explode — a plain
    # count(1) here gets rewritten to a keys-only aggregate whose
    # exchange no longer matches, doubling the generate+aggregate work
    hot = (per_gram_doc.groupBy("gram")
           .agg(F.sum(F.least(F.col("c"), F.lit(1))).alias("df"))
           .filter(F.col("df") >= min_df)
           .select("gram"))
    return (
        _join_hot_grams(per_gram_doc, hot)
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_grams"),
             F.sum(F.when(F.col("__hot") == 1, F.col("c"))
                   .otherwise(0)).cast("long").alias("n_dup_positions"))
        .select(
            "doc_id", "n_grams", "n_dup_positions",
            F.round(F.col("n_dup_positions").cast("double")
                    / F.col("n_grams").cast("double"), 6)
            .alias("dup_fraction"))
    )


def ngram_df_partials(docs: DataFrame, n: int = 8,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(gram, df) doc-frequency partials of a corpus snapshot — the
    persisted state of INCREMENTAL substring dedup (VERDICT r6 #7).

    At 100 TB the at-rest corpus is never re-scanned per batch: this
    aggregate runs once per snapshot (or is maintained by merging the
    previous snapshot with each batch's partials —
    ``sum(df)`` is associative over disjoint doc sets), lands in
    parquet, and each incoming batch merges against it. Same gram key
    and two-level (gram, doc)->gram aggregation as
    :func:`repeated_ngram_stats`, so a hot template gram ships one
    partial per task, never raw rows."""
    g = (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(_tok(text_col)).alias("__t"))
        .select("doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram"))
    )
    return (
        g.groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("gram")
        .agg(F.sum(F.least(F.col("c"), F.lit(1))).cast("long").alias("df"))
    )


def repeated_ngram_stats_incremental(
        new_docs: DataFrame, history_partials: DataFrame,
        n: int = 8, min_df: int = 2,
        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Substring-dup stats for an incoming batch WITHOUT re-scanning
    the at-rest corpus — the incremental twin of
    :func:`repeated_ngram_stats`, mirroring ``incremental_dedup``'s
    new-vs-at-rest shape (VERDICT r6 #7).

    ``history_partials`` is the persisted (gram, df) table from
    :func:`ngram_df_partials` over every prior batch (doc sets must be
    disjoint from the new batch, which batch ingest guarantees). The
    merged doc frequency ``df_hist + df_new`` equals the full-corpus
    df exactly, so a new doc's stats are IDENTICAL to what a full
    recompute over history ∪ batch would report for it (pytest-pinned;
    the oracled query replays the full-corpus formulation in SQL).
    Scale shape: only the new batch is tokenized; history contributes
    a pre-aggregated (gram, df) scan; the merge is one map-side-
    combinable aggregate; join-back to the batch's (gram, doc)
    partials goes through the salted :func:`_join_hot_grams` so a hot
    template gram spreads across tasks."""
    per_gram_doc = (
        rebalance_for_compute(new_docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(_tok(text_col)).alias("__t"))
        .select("doc_id", F.explode(F.expr(_gram_expr(n))).alias("gram"))
        .groupBy("gram", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    )
    new_df = per_gram_doc.groupBy("gram").agg(
        F.sum(F.least(F.col("c"), F.lit(1))).cast("long").alias("df"))
    hot = (
        new_df.unionByName(
            history_partials.select("gram", F.col("df").cast("long")))
        .groupBy("gram").agg(F.sum("df").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("gram")
    )
    return (
        _join_hot_grams(per_gram_doc, hot)
        .groupBy("doc_id")
        .agg(F.sum("c").cast("long").alias("n_grams"),
             F.sum(F.when(F.col("__hot") == 1, F.col("c"))
                   .otherwise(0)).cast("long").alias("n_dup_positions"))
        .select(
            "doc_id", "n_grams", "n_dup_positions",
            F.round(F.col("n_dup_positions").cast("double")
                    / F.col("n_grams").cast("double"), 6)
            .alias("dup_fraction"))
    )


def dedup_span_clean(docs: DataFrame, n: int = 8, min_df: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The removal half of Lee-et-al substring dedup: every token
    covered by a duplicated n-gram (one occurring in >= ``min_df``
    docs — :func:`repeated_ngram_stats` is the detection half) is cut,
    and the document text is rebuilt from the survivors. Overlapping
    duplicated spans need no interval merging — coverage is just the
    distinct set of covered token indices.

    Shape: the gram->df aggregation and join-back of the stats
    operator, then covered positions explode to token indices,
    ``collect_set`` per doc (bounded by the doc's own length), and the
    rebuild runs in codegen: filter the index sequence against the
    removal set, map back to tokens. Documents with nothing to remove
    pass through verbatim. Unlike the stats operator this needs the
    POSITIONS of duplicated grams, so the gram stream is consumed
    twice (df aggregation + coverage join) and Spark re-derives it —
    two corpus scans; a 100 TB run persists the gram stream
    (DISK_ONLY) or feeds coverage from the stats pass instead. The rebuild idiom (filter indices, then
    index into the token array) is chosen because both Spark and
    DuckDB express it identically — lambda-with-index exists in only
    one of them."""
    # tokens coalesce to [] so zero-token and NULL-text docs flow
    # through as (0, 0, '') instead of crashing the rebuild (Spark's
    # sequence(1, 0) is the DESCENDING [1, 0] -> element_at OOB) or
    # diverging from the oracle on NULL
    toks = f"coalesce({_tok(text_col)}, array())"
    grams = _gram_expr(n)
    base = (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(toks).alias("__t"))
    )
    g = base.select("doc_id",
                    F.posexplode(F.expr(grams)).alias("pos0", "gram"))
    # two-level distinct-doc count (partial on (gram, doc) then a
    # per-task partial on gram — a hot gram never ships raw rows),
    # and the coverage join-back runs through the salted
    # _join_hot_grams so one duplicated template gram can't pull
    # millions of position rows into a single join task
    hot = (g.groupBy("gram")
           .agg(F.countDistinct("doc_id").alias("df"))
           .filter(F.col("df") >= min_df)
           .select("gram"))
    removed = (
        _join_hot_grams(g, hot, how="inner")
        .select("doc_id", F.explode(
            F.expr(f"sequence(pos0 + 1, pos0 + {n})")).alias("tok_idx"))
        .groupBy("doc_id")
        .agg(F.collect_set("tok_idx").alias("rm"))
    )
    rebuilt = (
        "transform(filter("
        "CASE WHEN size(__t) >= 1 THEN sequence(1, size(__t)) "
        "ELSE array() END, "
        "j -> NOT array_contains(coalesce(rm, array()), j)), "
        "j -> element_at(__t, j))"
    )
    return (
        base.join(removed, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("size(__t)").cast("long").alias("n_tokens"),
            F.expr("size(coalesce(rm, array()))").cast("long")
            .alias("n_removed"),
            F.expr(f"array_join({rebuilt}, ' ')").alias("clean_text"))
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Keyword-marker language ID (deterministic argmax, 'en'-biased
    tie-break in fixed key order)."""
    toks = _tok(text_col)
    score_cols = []
    for lang, markers in LANG_MARKERS.items():
        expr = f"size(filter({toks}, t -> t IN ({_sql_list(markers)})))"
        score_cols.append((lang, expr))
    df = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        *[F.expr(e).cast("int").alias(f"score_{lang}") for lang, e in score_cols],
    )
    # argmax with first-wins tie-break in LANG_MARKERS key order
    langs = list(LANG_MARKERS)
    pred = F.lit(langs[0])
    best = F.col(f"score_{langs[0]}")
    for lang in langs[1:]:
        cond = F.col(f"score_{lang}") > best
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
        best = F.when(cond, F.col(f"score_{lang}")).otherwise(best)
    return df.withColumn("pred_lang", pred)

def doc_stats(docs: DataFrame) -> DataFrame:
    """Corpus stats by (lang, source)."""
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
        )
    )

QUANTILE_PS = (0.5, 0.9, 0.99)

def length_quantiles(docs: DataFrame, group_col: str = "lang",
                     val_col: str = "n_chars") -> DataFrame:
    """Exact per-group discrete percentiles (p50/p90/p99) of document
    length — the length-filter calibration step of a data pipeline.

    Discrete (type-1) percentile computed from first principles: value
    at row ceil(p*n) of the sorted group. Integer-exact in any engine
    — avoids percentile_cont, whose interpolation arithmetic is
    engine-specific. One shuffle on the group key; WindowExec sorts
    within groups, then a conditional agg collapses to one row/group.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(val_col)
    ranked = docs.select(
        group_col, F.col(val_col).alias("v"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("n"),
    )
    aggs = [
        F.max(F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(p)), F.col("v")))
        .cast("long").alias(f"p{int(p * 100)}")
        for p in QUANTILE_PS
    ]
    return ranked.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_docs"), *aggs)

REDACT_PATTERNS = (
    # (name, regex, replacement) — PII scrub pass of a training pipeline
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://[^\s]+", "<URL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)

def clean_text(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Normalization + PII redaction + stopword strip, one codegen pass.

    Output keeps the token count removed so downstream quality filters
    can budget on it. Pure narrow projection — zero shuffles; at
    100 TB this runs at scan speed and pipelines into the parquet
    sink. Spark ``regexp_replace`` is replace-all by default (the
    DuckDB twin needs the explicit 'g' flag).
    """
    cleaned = F.lower(F.col(text_col))
    for _, pat, repl in REDACT_PATTERNS:
        cleaned = F.regexp_replace(cleaned, F.lit(pat), F.lit(repl))
    cleaned = F.trim(F.regexp_replace(cleaned, F.lit(r"\s+"), F.lit(" ")))
    toks = "filter(split(__c, ' '), t -> t != '')"
    kept = f"filter({toks}, t -> t not in ({_sql_list(STOPWORDS)}))"
    # spread a one-file scan before the regex-chain projection;
    # no-op at scale (r16 — the redaction pass ran single-task)
    return (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                cleaned.alias("__c"))
        .select(
            "doc_id",
            F.expr(f"array_join({kept}, ' ')").alias("clean"),
            (F.expr(f"size({toks})") - F.expr(f"size({kept})"))
            .cast("int").alias("n_removed"),
        )
    )

def repetition_signals(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals: duplicate 2-gram mass and the
    share of the most frequent 2-gram, per document.

    High values flag boilerplate/spam for a training-corpus filter.
    ZERO-shuffle formulation: per document, sort the gram array and
    fold it once with a run-length accumulator (``aggregate`` with a
    struct state) — distinct count, max run, and duplicate mass all
    fall out of one O(g log g) in-row pass, so the whole operator is
    a pure projection that runs at scan speed and pipelines into any
    sink. (The explode + two-level groupBy alternative is also linear
    but pays two shuffles of every gram; the per-distinct-gram
    ``filter`` count is O(g²) — both strictly worse.) Ratios are
    single divisions of exact integers, so the oracle agrees
    bit-for-bit. Documents with fewer than two tokens have no 2-grams
    and drop out (matching the oracle's inner-unnest semantics).
    """
    # materialize the token array ONCE, then one zip_with pass — an
    # element_at-per-index formulation re-evaluates filter(split(...))
    # for every element and goes O(tokens²) per document
    grams = (
        "CASE WHEN size(__t) < 2 THEN array() "
        "ELSE zip_with(slice(__t, 1, size(__t) - 1), "
        "slice(__t, 2, size(__t) - 1), (x, y) -> concat(x, ' ', y)) END"
    )
    # run-length fold over the sorted grams: (prev, run, maxr, dupm, nd)
    fold = (
        "aggregate(array_sort(__g), "
        "named_struct('prev', cast(null as string), 'run', 0, "
        "  'maxr', 0, 'dupm', 0, 'nd', 0), "
        "(a, x) -> IF(a.prev IS NOT NULL AND x = a.prev, "
        "  named_struct('prev', x, 'run', a.run + 1, 'maxr', a.maxr, "
        "    'dupm', a.dupm, 'nd', a.nd), "
        "  named_struct('prev', x, 'run', 1, "
        "    'maxr', greatest(a.maxr, a.run), "
        "    'dupm', a.dupm + IF(a.run > 1, a.run, 0), 'nd', a.nd + 1)), "
        "a -> named_struct('maxr', greatest(a.maxr, a.run), "
        "  'dupm', a.dupm + IF(a.run > 1, a.run, 0), 'nd', a.nd))"
    )
    # spread a one-file scan over every core before the CPU-heavy
    # sort+fold; no-op at scale (r16 — the fold ran single-task)
    return (
        rebalance_for_compute(docs)
        .select(F.col(id_col).cast("long").alias("doc_id"),
                F.expr(_tok(text_col)).alias("__t"))
        .select("doc_id", F.expr(grams).alias("__g"))
        .filter(F.size("__g") >= 1)
        .select("doc_id", F.size("__g").cast("int").alias("n_grams"),
                F.expr(fold).alias("__r"))
        .select(
            "doc_id", "n_grams",
            F.col("__r.nd").cast("int").alias("n_distinct"),
            F.round(F.col("__r.maxr").cast("double")
                    / F.col("n_grams").cast("double"), 6)
            .alias("top_gram_share"),
            F.round(F.col("__r.dupm").cast("double")
                    / F.col("n_grams").cast("double"), 6)
            .alias("dup_gram_frac"),
        )
    )

def doc_entropy(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) plus the
    exact distinct-token count — the information-density counterpart to
    :func:`repetition_signals` (low entropy flags template/boilerplate
    text that plain length or stopword filters miss).

    ZERO-shuffle, same shape as ``repetition_signals``: sort the token
    array in-row and fold it once with a run-length accumulator —
    ``Σ c·ln(c)`` accumulates run-by-run, the distinct count and
    ``n = size(tokens)`` are exact integers, and
    ``H = (ln n − Σ c·ln(c)/n) / ln 2`` needs just those. The whole
    operator is a pure projection running at scan speed. The single
    ``round(…, 4)`` on the one genuinely-floating output follows the
    ``bigram_logprob`` oracle rule (1e-4 quantization absorbs
    summation-order ULP drift between engines). Empty documents score
    NULL entropy with ``n_tokens = 0`` so a filter can route them
    explicitly; single-token documents score exactly 0.0.
    """
    # run-length fold over the sorted tokens: on each run boundary add
    # the finished run's c·ln(c) (guarded: the initial run = 0 would
    # make 0·ln(0) = NaN, and ln(1) = 0 makes 1-runs free)
    close_run = ("IF(a.run = 0L, a.sl, "
                 "a.sl + a.run * ln(cast(a.run AS double)))")
    fold = (
        "aggregate(array_sort(__t), "
        "named_struct('prev', cast(null as string), 'run', 0L, "
        "  'sl', cast(0.0 as double), 'nd', 0L), "
        "(a, x) -> IF(a.prev IS NOT NULL AND x = a.prev, "
        "  named_struct('prev', x, 'run', a.run + 1L, 'sl', a.sl, "
        "    'nd', a.nd), "
        f"  named_struct('prev', x, 'run', 1L, 'sl', {close_run}, "
        "    'nd', a.nd + 1L)), "
        f"a -> named_struct('sl', {close_run}, 'nd', a.nd))"
    )
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    F.expr(_tok(text_col)).alias("__t"))
        .select("doc_id", F.size("__t").cast("long").alias("n_tokens"),
                F.expr(fold).alias("__r"))
        .select(
            "doc_id", "n_tokens",
            F.col("__r.nd").cast("long").alias("n_unique"),
            F.when(
                F.col("n_tokens") > 0,
                F.round(
                    (F.log(F.col("n_tokens").cast("double"))
                     - F.col("__r.sl") / F.col("n_tokens"))
                    / F.log(F.lit(2.0)), 4),
            ).alias("entropy_bits"),
        )
    )


def token_freq_per_lang(docs: DataFrame, k: int = 5,
                        min_count: int = 5) -> DataFrame:
    """Top-k tokens per language — grouped top-k over the exploded
    corpus (explode → two-key agg → WindowGroupLimit). The rank
    tie-breaks on the token so the cut is deterministic."""
    from pyspark.sql.window import Window as W

    counts = (
        docs.select("lang", F.explode(F.expr(_tok("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def token_freq_histogram(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """Frequency-of-frequencies (the Zipf sanity check): how many
    distinct tokens occur exactly f times. Two map-side-combinable
    aggregations; the second groups a tiny domain."""
    freq = (
        docs.select(F.explode(F.expr(_tok("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .filter(F.col("f") >= min_count)
    )
    return (
        freq.groupBy("f")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"))
        .select(F.col("f").cast("long").alias("f"), "n_tokens")
    )


def bpe_pair_stats(docs: DataFrame, min_count: int = 2,
                   text_col: str = "text") -> DataFrame:
    """Adjacent-token-pair frequencies — step 1 of BPE/WordPiece
    tokenizer training (the merge candidate table; the training loop
    repeatedly merges the argmax pair and recounts).  One zero-join
    projection (a generated-sequence explode over positions, the
    ``chunk_documents`` idiom) into one map-side-combinable
    aggregation: at 100 TB the shuffle carries (pair, partial-count)
    rows only, and the min_count filter drops the hapax tail before
    any driver contact.  Corpus-level counts, position-weighted
    (every adjacent occurrence counts, not per-doc distinct) —
    matching how BPE counts merge candidates.
    """
    pairs = F.explode(F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
    )).alias("p")
    return (
        docs.select(F.expr(_tok(text_col)).alias("__t"))
        .filter(F.size("__t") >= 2)
        .select(pairs)
        .groupBy("p.first", "p.second")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= min_count)
    )


BPE_END = "</w>"


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_pass_expr(syms_col: str, first: str, second: str) -> str:
    """One left-to-right non-overlapping merge pass of the pair
    (first, second) over a symbol array, as a pure codegen fold:
    append each symbol, but when the accumulator ends in ``first``
    and the incoming symbol is ``second``, replace the tail with the
    merged symbol.  This is exactly the classic single-pair replace
    scan (a merged symbol is first+second and so can never equal
    ``first`` again, which is what makes the fold ≡ the textbook
    left-to-right pass — 'aaa' under (a,a) gives [aa, a])."""
    f, s, m = _sql_str(first), _sql_str(second), _sql_str(first + second)
    return (
        f"aggregate({syms_col}, cast(array() as array<string>), "
        f"(acc, s) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = {f} AND s = {s} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({m})) "
        f"ELSE concat(acc, array(s)) END)"
    )


def _bpe_word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) — the distinct-word frequency table with
    initial character symbols + end-of-word marker. The ONE corpus
    scan of BPE training; everything after iterates on this table."""
    return (
        docs.select(F.explode(F.expr(_tok(text_col))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms",
            F.expr(f"concat(filter(split(word, ''), c -> c != ''), "
                   f"array({_sql_str(BPE_END)}))"))
    )


def bpe_train(docs: DataFrame, n_merges: int = 20,
              min_pair_count: int = 2,
              text_col: str = "text") -> DataFrame:
    """Learn a BPE merge table from the corpus (Sennrich et al. 2016,
    the tokenizer-training loop that :func:`bpe_pair_stats` is step 1
    of). Returns (rank, first, second, merged, pair_count).

    Scale shape — the textbook trick makes this tractable at 100 TB:
    the corpus is scanned ONCE into the distinct-word frequency table
    (vocabulary-sized, orders of magnitude smaller than the corpus);
    every training iteration then runs on that table only. Per
    iteration: one freq-weighted adjacent-pair aggregation (map-side
    combinable; the shuffle carries (pair, partial-count) rows), an
    argmax of ONE row collected to the driver (control-plane, the
    KMeans-loop idiom, not a data collect), and a narrow codegen fold
    rewriting the symbol arrays. ``localCheckpoint`` truncates the
    per-iteration lineage so the plan stays bounded (the connected-
    components loop's idiom, ``dedup.py``). Ties on count break
    lexicographically on the pair so training is deterministic.
    """
    spark = docs.sparkSession
    words = _bpe_word_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = F.explode(F.expr(
                "transform(sequence(1, size(syms) - 1), "
                "i -> struct(syms[i - 1] AS first, syms[i] AS second))"
            )).alias("p")
            best = (
                words.filter(F.size("syms") >= 2)
                .select("freq", pairs)
                .groupBy("p.first", "p.second")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("first").asc(),
                         F.col("second").asc())
                .limit(1).collect()
            )
            if not best or best[0]["n"] < min_pair_count:
                break
            first, second, n = (best[0]["first"], best[0]["second"],
                                int(best[0]["n"]))
            merges.append((rank, first, second, first + second, n))
            nxt = words.withColumn(
                "syms", F.expr(_merge_pass_expr("syms", first, second))
            ).localCheckpoint(eager=True)
            words.unpersist(blocking=False)
            words = nxt
    finally:
        words.unpersist(blocking=False)
    return spark.createDataFrame(
        merges,
        "rank int, first string, second string, merged string, "
        "pair_count long")


def bpe_segment(docs: DataFrame, merges: list[tuple] | None = None,
                n_merges: int = 20,
                text_col: str = "text") -> DataFrame:
    """Subword token counts per document under a learned BPE merge
    table — the 'how many tokens is my corpus under this tokenizer'
    question every training-data budget starts with.

    The merges replay over the DISTINCT-WORD table (each pass is the
    same narrow codegen fold as training — no argmax, no collect),
    giving a (word, n_subtokens) mapping that joins back onto the
    corpus' word instances; at 100 TB the mapping is vocabulary-sized
    (AQE broadcasts it) and the corpus sees one explode + one join +
    one per-doc aggregation.
    """
    if merges is None:
        merges = [(r["first"], r["second"])
                  for r in bpe_train(docs, n_merges=n_merges,
                                     text_col=text_col)
                  .orderBy("rank").collect()]
    else:
        merges = [(m[1], m[2]) if len(m) >= 3 and isinstance(m[0], int)
                  else (m[0], m[1]) for m in merges]
    vocab = _bpe_word_table(docs, text_col)
    for i, (first, second) in enumerate(merges, start=1):
        vocab = vocab.withColumn(
            "syms", F.expr(_merge_pass_expr("syms", first, second)))
        if i % 8 == 0:
            vocab = vocab.localCheckpoint(eager=True)
    mapping = vocab.select(
        "word", F.size("syms").cast("long").alias("n_sub"))
    inst = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.explode(F.expr(_tok(text_col))).alias("word"))
    return (
        inst.join(mapping, "word")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
             F.sum("n_sub").cast("long").alias("n_bpe_tokens"))
    )


def bigram_logprob(docs: DataFrame, k_smooth: float = 1.0,
                   text_col: str = "text") -> DataFrame:
    """Per-document average bigram log-likelihood under an add-k
    smoothed bigram LM fit on the corpus itself — the CCNet-style
    perplexity-filter signal (low average log-prob ⇒ unnatural text),
    one step up from ``token_commonness``'s unigram stand-in.

    ``P(y|x) = (B(x,y) + k) / (U(x) + k·V)`` with ``B`` the adjacent-
    pair counts (exactly :func:`bpe_pair_stats`'s table at
    min_count=1), ``U(x)`` the count of positions where ``x`` has a
    successor, and ``V`` the vocabulary size.  Scoring joins each
    doc's position pairs against the bigram table on (first, second)
    — one shuffle join plus the count aggregations, all map-side
    combinable; every observed doc pair is in ``B`` by construction
    so the join is inner with no smoothing fallback row needed.
    Docs with <2 tokens score NULL (no bigram evidence), kept with
    ``n_pairs = 0`` so the filter can route them explicitly.

    Output doubles are rounded to 4 decimals (the repo's oracle rule
    for genuinely-floating results).
    """
    pairs = F.explode(F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
    )).alias("p")
    base = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.expr(_tok(text_col)).alias("__t"))
    doc_pairs = (base.filter(F.size("__t") >= 2).select("doc_id", pairs)
                 .select("doc_id", "p.first", "p.second"))
    bg = doc_pairs.groupBy("first", "second").agg(
        F.count(F.lit(1)).alias("b"))
    un = doc_pairs.groupBy("first").agg(F.count(F.lit(1)).alias("u"))
    vocab = (base.select(F.explode("__t").alias("tok")).distinct()
             .agg(F.count(F.lit(1)).alias("v")))
    scored = (
        doc_pairs.join(bg, ["first", "second"])
        .join(un, "first")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id",
                F.log((F.col("b") + F.lit(float(k_smooth)))
                      / (F.col("u") + F.lit(float(k_smooth)) * F.col("v")))
                .alias("lp"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
             F.round(F.avg("lp"), 4).alias("avg_lp"))
    )
    return (base.select("doc_id").distinct()
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                    "avg_lp"))


_BIGRAM_ARTIFACT_BUILDS = 0


def bigram_lm_artifact(docs: DataFrame, text_col: str = "text"):
    """The corpus LM state for incremental scoring, persisted
    build-once: ``(bigrams(first, second, b), unigrams(first, u),
    vocab(tok, c))``.  All three merge by associative SUM over
    disjoint doc sets — the partials idiom, so ingest appends a
    batch's own counts instead of re-reading the corpus.  The vocab
    carries occurrence counts (not a bare distinct set) so the merge
    runs BACKWARDS too: retraction subtracts a doc's counts and a
    token vanishes exactly when its count reaches zero
    (``streaming/partials.erase_from_lm_snapshot``); |vocab| is still
    its row count for every reader.  Inline (lazy) fallback for
    literal/streaming frames."""
    from logsqlite_spark.artifacts import build_or_serve
    from logsqlite_spark.tables import frames_fingerprint

    global _BIGRAM_ARTIFACT_BUILDS
    spark = docs.sparkSession

    # inline plans built lazily (r16): thrown away whenever the
    # artifact is served; see winnow_fps_artifact
    def inline():
        pairs = F.explode(F.expr(
            "transform(sequence(1, size(__t) - 1), "
            "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
        )).alias("p")
        base = docs.select(F.expr(_tok(text_col)).alias("__t"))
        dp = (base.filter(F.size("__t") >= 2).select(pairs)
              .select("p.first", "p.second"))
        bigrams = dp.groupBy("first", "second").agg(
            F.count(F.lit(1)).alias("b"))
        unigrams = dp.groupBy("first").agg(F.count(F.lit(1)).alias("u"))
        vocab = (base.select(F.explode("__t").alias("tok"))
                 .groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                     .alias("c")))
        return bigrams, unigrams, vocab
    try:
        files = docs.inputFiles()
    except Exception:  # noqa: BLE001
        files = []
    if not files:
        return inline()

    def _write(p: str) -> None:
        bigrams, unigrams, vocab = inline()
        bigrams.write.mode("overwrite").parquet(f"{p}/bigrams")
        unigrams.write.mode("overwrite").parquet(f"{p}/unigrams")
        vocab.write.mode("overwrite").parquet(f"{p}/vocab")

    path, built = build_or_serve(
        spark, (frames_fingerprint(docs), text_col, "bigram-lm"), _write)
    if built:
        _BIGRAM_ARTIFACT_BUILDS += 1
    from logsqlite_spark.artifacts import serve_parquet
    return (serve_parquet(spark, path, "bigrams"),
            serve_parquet(spark, path, "unigrams"),
            serve_parquet(spark, path, "vocab"))


def bigram_logprob_incremental(new_docs: DataFrame,
                               hist_bigrams: DataFrame,
                               hist_unigrams: DataFrame,
                               hist_vocab: DataFrame,
                               k_smooth: float = 1.0,
                               text_col: str = "text") -> DataFrame:
    """Score a new batch under the UNION corpus LM without re-reading
    the at-rest corpus — ≡ :func:`bigram_logprob` over history ∪
    batch restricted to batch docs (pytest-pinned; the oracled query
    replays the full formulation).

    Union counts for the BATCH's pairs are history partials + batch
    partials (history semi-joined down to the batch's pair/first
    keys, broadcast batch-sized builds); the union vocabulary size is
    |hist vocab| + |batch tokens ∉ hist vocab| (a broadcast anti-join
    count).  Per-batch cost: O(batch tokens + matched stat rows).
    """
    pairs = F.explode(F.expr(
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(__t[i - 1] AS first, __t[i] AS second))"
    )).alias("p")
    base = (new_docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                            F.expr(_tok(text_col)).alias("__t"))
            .localCheckpoint(eager=True))
    dp = (base.filter(F.size("__t") >= 2).select("doc_id", pairs)
          .select("doc_id", "p.first", "p.second")
          .localCheckpoint(eager=True))
    b_bg = dp.groupBy("first", "second").agg(
        F.count(F.lit(1)).alias("bb"))
    b_un = dp.groupBy("first").agg(F.count(F.lit(1)).alias("bu"))
    b_toks = base.select(F.explode("__t").alias("tok")).distinct() \
        .localCheckpoint(eager=True)

    h_bg = hist_bigrams.join(
        F.broadcast(b_bg.select("first", "second")),
        ["first", "second"], "leftsemi")
    bg = (b_bg.join(h_bg, ["first", "second"], "left")
          .select("first", "second",
                  (F.coalesce(F.col("b"), F.lit(0)) + F.col("bb"))
                  .alias("b")))
    h_un = hist_unigrams.join(F.broadcast(b_un.select("first")),
                              "first", "leftsemi")
    un = (b_un.join(h_un, "first", "left")
          .select("first",
                  (F.coalesce(F.col("u"), F.lit(0)) + F.col("bu"))
                  .alias("u")))
    # |union vocab| = |hist| + |batch-only| — two count aggregates
    v_hist = hist_vocab.agg(F.count(F.lit(1)).alias("vh"))
    v_new = (b_toks.join(hist_vocab, "tok", "left_anti")
             .agg(F.count(F.lit(1)).alias("vn")))
    vocab = v_hist.crossJoin(v_new).select(
        (F.col("vh") + F.col("vn")).alias("v"))
    scored = (
        dp.join(bg, ["first", "second"])
        .join(un, "first")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id",
                F.log((F.col("b") + F.lit(float(k_smooth)))
                      / (F.col("u") + F.lit(float(k_smooth)) * F.col("v")))
                .alias("lp"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
             F.round(F.avg("lp"), 4).alias("avg_lp"))
    )
    return (base.select("doc_id").distinct()
            .join(scored, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                    "avg_lp"))


TFIDF_K = 5


def tfidf_topk(docs: DataFrame, k: int = TFIDF_K,
               text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by a rarity-weighted
    term score — the keyword-extraction / doc-routing primitive
    (tf-idf family). The score is ``tf·1e6 div df`` (term frequency
    over document frequency, ppm-quantized): a LINEAR idf rather than
    the log variant, chosen deliberately — the ranking then compares
    exact integers, so the per-document top-k is bit-identical across
    engines (platform ``ln`` divergence in the last ulp could flip a
    rank tie; integer div cannot). Ties break on the token itself.

    Shape at 100 TB: explode → (doc, tok) count is one map-side-
    combinable shuffle; the df table derives from it with a second,
    vocabulary-sized aggregation; the join back is tok-keyed with a
    vocab-sized build side (AQE broadcasts it); the per-doc top-k is
    a WindowGroupLimit — each task keeps k rows per doc before the
    exchange. No all-pairs, no driver contact.
    """
    inst = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.explode(F.expr(_tok(text_col))).alias("tok"))
    tf = (inst.groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_tbl = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(df_tbl, "tok")
              .withColumn("score_ppm",
                          F.expr("tf * 1000000L div df").cast("long")))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_ppm").desc(), F.col("tok").asc())
    return (scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("doc_id", "tok", F.col("tf").cast("long"),
                    F.col("df").cast("long"), "score_ppm",
                    F.col("rnk").cast("int").alias("rnk")))


def token_commonness(docs: DataFrame) -> DataFrame:
    """Mean corpus document-frequency of each document's tokens — the
    unigram-LM-score stand-in that stays engine-exact (a true log-prob
    would hit platform-libm ``ln`` divergence; integer df sums cannot).
    Low scores flag gibberish/OCR noise; high scores flag boilerplate.

    Shape: token instances join the (vocab-sized) df table on the
    token, then one per-doc agg — at 100 TB the df table is the small
    side of the join and the whole thing is two shuffles.
    """
    inst = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.explode(F.expr(_tok("text"))).alias("tok"))
    df_tbl = (inst.distinct().groupBy("tok")
              .agg(F.count(F.lit(1)).alias("df")))
    return (
        inst.join(df_tbl, "tok")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_toks"),
             F.sum("df").cast("long").alias("sum_df"))
        .select("doc_id", "n_toks", "sum_df",
                F.round(F.col("sum_df").cast("double")
                        / F.col("n_toks").cast("double"), 6)
                .alias("mean_df"))
    )


def quality_percentile(docs: DataFrame) -> DataFrame:
    """Per-document corpus percentile of the document length —
    percent_rank semantics, (rank-1)/(n-1) over the (n_chars, doc_id)
    total order (the doc_id tie-break makes the rank, and hence the
    double, exactly reproducible).

    The rank comes from the distributed two-pass construction
    (functions/rank.py), NOT a global ``Window.orderBy`` — at corpus
    scale the single ordering partition would serialize every row
    through one task. Every n_chars value is unique within its
    (n_chars, doc_id) key, so the distributed rank is bit-identical
    to percent_rank's.
    """
    from logsqlite_spark.functions.rank import with_global_rank

    ranked = with_global_rank(
        docs.select(F.col("doc_id").cast("long"),
                    F.col("n_chars").cast("long")),
        ["n_chars", "doc_id"])
    pct = F.when(F.col("n") > 1,
                 (F.col("rn") - 1).cast("double")
                 / (F.col("n") - 1).cast("double")).otherwise(F.lit(0.0))
    return ranked.select("doc_id", "n_chars",
                         F.round(pct, 6).alias("len_pctile"))


GATE_MIN_TOKENS = 25
RULE_SHORT, RULE_REPEAT, RULE_STOPWORDY = 1, 2, 4


def quality_gate(docs: DataFrame) -> DataFrame:
    """Composite corpus filter with a failure-reason bitmask — the
    production shape: one pass emits WHY each document fails (bit 0 =
    too short, bit 1 = repetitive, bit 2 = stopword-heavy) so the
    pipeline can report per-rule drop rates, not just a survivor
    count.

    Every rule is an integer cross-multiplication of counts the
    single projection already computed (``16·max_run ≥ n_grams``
    instead of ``share ≥ 1/16``), so the mask is exact in any engine
    and the whole gate is ZERO-shuffle — same scan-speed contract as
    ``repetition_signals``, whose run-length fold it reuses.
    """
    grams = (
        "CASE WHEN size(__t) < 2 THEN array() "
        "ELSE zip_with(slice(__t, 1, size(__t) - 1), "
        "slice(__t, 2, size(__t) - 1), (x, y) -> concat(x, ' ', y)) END"
    )
    fold = (
        "aggregate(array_sort(__g), "
        "named_struct('prev', cast(null as string), 'run', 0, 'maxr', 0), "
        "(a, x) -> IF(a.prev IS NOT NULL AND x = a.prev, "
        "  named_struct('prev', x, 'run', a.run + 1, 'maxr', a.maxr), "
        "  named_struct('prev', x, 'run', 1, "
        "    'maxr', greatest(a.maxr, a.run))), "
        "a -> greatest(a.maxr, a.run))"
    )
    stop = _sql_list(STOPWORDS)
    base = (
        rebalance_for_compute(docs)
        .select(F.col("doc_id").cast("long").alias("doc_id"),
                F.expr(_tok("text")).alias("__t"))
        .select("doc_id",
                F.size("__t").cast("int").alias("n_tokens"),
                F.expr(f"size(filter(__t, t -> t IN ({stop})))")
                .cast("int").alias("n_stop"),
                F.expr(grams).alias("__g"))
        .select("doc_id", "n_tokens", "n_stop",
                F.size("__g").cast("int").alias("n_grams"),
                F.expr(fold).cast("int").alias("max_run"))
    )
    mask = (
        F.when(F.col("n_tokens") < GATE_MIN_TOKENS,
               F.lit(RULE_SHORT)).otherwise(F.lit(0))
        + F.when((F.col("n_grams") > 0)
                 & (F.col("max_run") * 16 >= F.col("n_grams")),
                 F.lit(RULE_REPEAT)).otherwise(F.lit(0))
        + F.when(F.col("n_stop") * 8 >= F.col("n_tokens"),
                 F.lit(RULE_STOPWORDY)).otherwise(F.lit(0))
    )
    return base.select(
        "doc_id", "n_tokens", "n_grams", "max_run", "n_stop",
        mask.cast("int").alias("fail_mask"),
        (mask == 0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# registry wiring

def _q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_quality(table(spark, sf_dir, "documents"))

def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(table(spark, sf_dir, "documents"))

def _q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_frequencies(table(spark, sf_dir, "documents"))

def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(table(spark, sf_dir, "documents"))

def _q_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repeated_ngram_stats(table(spark, sf_dir, "documents"))


def _q_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_span_clean(table(spark, sf_dir, "documents"))


def _q_repeated_ngrams_incremental(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    # the incremental path end-to-end: the at-rest 3/4 of the corpus
    # is collapsed to (gram, df) partials, the "new batch" (doc_id %
    # 4 == 0) merges against them — results must equal the
    # full-corpus recompute restricted to the batch (the oracle)
    docs = table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return repeated_ngram_stats_incremental(
        batch, ngram_df_partials(history))


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(table(spark, sf_dir, "documents"))


def lang_confusion(docs: DataFrame) -> DataFrame:
    """Confusion matrix of the lang-id heuristic against the labeled
    ``lang`` column — the evaluation every classifier-shaped cleanup
    step needs before its output gates anything.  One columnar join of
    two doc-keyed projections, then a tiny (lang × pred) rollup."""
    pred = lang_id(docs).select("doc_id", "pred_lang")
    lab = docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "lang")
    return (lab.join(pred, "doc_id")
            .groupBy("lang", "pred_lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))


def _q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_confusion(table(spark, sf_dir, "documents"))

def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_stats(table(spark, sf_dir, "documents"))

def _q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_quantiles(table(spark, sf_dir, "documents"))

def _q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clean_text(table(spark, sf_dir, "documents"))

def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_signals(table(spark, sf_dir, "documents"))

def _q_token_freq_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_freq_per_lang(table(spark, sf_dir, "documents"))

def _q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_entropy(table(spark, sf_dir, "documents"))

def _q_token_freq_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_freq_histogram(table(spark, sf_dir, "documents"))

def _q_quality_pctile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_percentile(table(spark, sf_dir, "documents"))

def _q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_pair_stats(table(spark, sf_dir, "documents"))


def _q_bigram_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_logprob(table(spark, sf_dir, "documents"))


def _q_bigram_lp_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch = doc_id % 4 == 0; the history LM comes from the
    persisted partials artifact, so repeated calls never re-read the
    at-rest corpus."""
    docs = table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    bg, un, vocab = bigram_lm_artifact(hist)
    return bigram_logprob_incremental(batch, bg, un, vocab)


def _q_token_commonness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_commonness(table(spark, sf_dir, "documents"))

def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_topk(table(spark, sf_dir, "documents"))

def _q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracled since round 12 (was rows-only): the Sennrich loop is
    # seeded and tie-broken, so the 12 iterations UNROLL into a flat
    # CTE chain (_bpe_ctes_sql) — argmax per round as a LIMIT 1 CTE,
    # the merge pass as a positional gaps-and-islands rewrite
    return bpe_train(table(spark, sf_dir, "documents"), n_merges=12)

def _q_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # oracled since round 12: replays the same unrolled chain, maps
    # word -> len(syms), joins instances
    return bpe_segment(table(spark, sf_dir, "documents"), n_merges=12)

def _q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_gate(table(spark, sf_dir, "documents"))

def _q_quality_gate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-rule drop rates: one map-side-combinable agg over the
    # zero-shuffle gate projection — the report a pipeline owner reads
    g = quality_gate(table(spark, sf_dir, "documents"))
    bit = lambda m: F.sum(((F.col("fail_mask").bitwiseAND(m)) / m)
                          .cast("long")).cast("long")
    return g.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("kept").cast("long")).cast("long").alias("n_kept"),
        bit(1).alias("n_short"),
        bit(2).alias("n_repetitive"),
        bit(4).alias("n_stopwordy"),
    )

def _q_winnow_fps(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints(table(spark, sf_dir, "documents"))


def _q_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_matches(table(spark, sf_dir, "documents"))


def _q_winnow_matches_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch = doc_id % 4 == 0 (the incremental-twin convention of
    repeated_ngrams_incremental); history fps come from the persisted
    artifact, so repeated calls never re-winnow the at-rest corpus."""
    docs = table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    return winnow_matches_incremental(batch, winnow_fps_artifact(history))


def _q_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(table(spark, sf_dir, "documents"),
                           chunk_tokens=32, overlap=4)


QUERIES = {
    "chunk_documents": _q_chunks,
    "text_quality": _q_text_quality,
    "token_counts": _q_token_counts,
    "token_freq": _q_token_freq,
    "text_fingerprint": _q_fingerprint,
    "text_winnow_fps": _q_winnow_fps,
    "text_winnow_matches": _q_winnow_matches,
    "text_winnow_matches_inc": _q_winnow_matches_inc,
    "lang_id": _q_lang_id,
    "lang_id_confusion": _q_lang_confusion,
    "repeated_ngrams": _q_repeated_ngrams,
    "repeated_ngrams_incremental": _q_repeated_ngrams_incremental,
    "dedup_span_clean": _q_span_clean,
    "doc_stats": _q_doc_stats,
    "length_quantiles": _q_length_quantiles,
    "clean_text": _q_clean_text,
    "repetition_signals": _q_repetition,
    "doc_entropy": _q_doc_entropy,
    "token_freq_per_lang": _q_token_freq_per_lang,
    "token_freq_histogram": _q_token_freq_hist,
    "quality_percentile": _q_quality_pctile,
    "token_commonness": _q_token_commonness,
    "tfidf_topk": _q_tfidf_topk,
    "bpe_pair_stats": _q_bpe_pairs,
    "bpe_train_merges": _q_bpe_train,
    "bpe_segment_counts": _q_bpe_segment,
    "bigram_logprob": _q_bigram_lp,
    "bigram_logprob_inc": _q_bigram_lp_inc,
    "quality_gate": _q_quality_gate,
    "quality_gate_stats": _q_quality_gate_stats,
}

_STOP = _sql_list(STOPWORDS)
_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

def _bpe_ctes_sql(n_merges: int = 12, min_count: int = 2) -> list[str]:
    """The DuckDB twin of :func:`bpe_train`'s loop, UNROLLED: the
    iteration count is a fixed literal and every step is
    deterministic (count-desc, then lexicographic pair tie-break), so
    round ``i`` is four CTEs — pair counts ``c{i}``, the argmax
    ``b{i}`` (empty once the best pair drops under ``min_count``,
    which freezes every later round: the NULL scalar matches
    nothing), the positional pair-hit table, and the rewritten word
    table ``w{i+1}``.  The merge pass replicates the left-to-right
    non-overlapping fold via gaps-and-islands: consecutive hit
    positions form an island, every even-ranked hit is ACTIVE, an
    active hit rewrites ``sym -> sym || second`` and drops its
    successor ('aaa' under (a,a) -> [aa, a], exactly the Spark
    fold's semantics).  MATERIALIZED keeps DuckDB from re-inlining
    the chain exponentially."""
    parts = [
        "w0 AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS freq, "
        "list_append(list_transform(generate_series(1, length(word)), "
        "i -> substr(word, i, 1)), '</w>') AS syms "
        f"FROM documents, unnest({_TOKS}) AS t(word) GROUP BY word)"
    ]
    for i in range(n_merges):
        parts += [
            f"c{i} AS MATERIALIZED (SELECT syms[j] AS f, syms[j+1] AS s, "
            "CAST(sum(freq) AS BIGINT) AS n "
            f"FROM w{i}, unnest(generate_series(1, len(syms) - 1)) AS g(j) "
            "WHERE len(syms) >= 2 GROUP BY 1, 2)",
            f"b{i} AS MATERIALIZED (SELECT f, s, n FROM c{i} "
            f"WHERE n >= {min_count} "
            "ORDER BY n DESC, f ASC, s ASC LIMIT 1)",
            f"u{i} AS MATERIALIZED (SELECT word, freq, syms[j] AS sym, "
            "j AS ord, syms[j + 1] AS nxt "
            f"FROM w{i}, unnest(generate_series(1, len(syms))) AS g(j))",
            f"m{i} AS MATERIALIZED (SELECT word, freq, sym, ord, "
            f"coalesce(sym = (SELECT f FROM b{i}) "
            f"AND nxt = (SELECT s FROM b{i}), FALSE) AS hit FROM u{i})",
            f"i{i} AS MATERIALIZED (SELECT word, freq, sym, ord, hit, "
            "CASE WHEN hit THEN ord - row_number() OVER "
            f"(PARTITION BY word, hit ORDER BY ord) END AS isl FROM m{i})",
            f"a{i} AS MATERIALIZED (SELECT word, freq, sym, ord, hit, isl, "
            "CASE WHEN hit THEN (row_number() OVER "
            "(PARTITION BY word, isl ORDER BY ord) - 1) % 2 = 0 "
            f"ELSE FALSE END AS act FROM i{i})",
            f"d{i} AS MATERIALIZED (SELECT word, freq, sym, ord, act, "
            "coalesce(lag(act) OVER (PARTITION BY word ORDER BY ord), "
            f"FALSE) AS prev_act FROM a{i})",
            f"w{i + 1} AS MATERIALIZED (SELECT word, freq, "
            f"list(CASE WHEN act THEN sym || (SELECT s FROM b{i}) "
            f"ELSE sym END ORDER BY ord) AS syms FROM d{i} "
            "WHERE NOT prev_act GROUP BY word, freq)",
        ]
    return parts


def _bpe_train_sql(n_merges: int = 12) -> str:
    union = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS INT) AS rank, f AS first, s AS second, "
        f"f || s AS merged, n AS pair_count FROM b{i}"
        for i in range(n_merges))
    return "WITH " + ", ".join(_bpe_ctes_sql(n_merges)) + " " + union


def _bpe_segment_sql(n_merges: int = 12) -> str:
    return (
        "WITH " + ", ".join(_bpe_ctes_sql(n_merges))
        + ", mapping AS MATERIALIZED (SELECT word, "
        f"CAST(len(syms) AS BIGINT) AS n_sub FROM w{n_merges}), "
        f"inst AS (SELECT doc_id, word FROM documents, "
        f"unnest({_TOKS}) AS t(word)) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens "
        "FROM inst JOIN mapping USING (word) GROUP BY doc_id")


def _langid_oracle() -> str:
    scores = ", ".join(
        f"CAST(len(list_filter({_TOKS}, t -> t IN ({_sql_list(m)}))) AS INT) AS score_{lang}"
        for lang, m in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    # same first-wins argmax as the Spark side
    pred = f"'{langs[0]}'"
    best = f"score_{langs[0]}"
    for lang in langs[1:]:
        pred = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {pred} END"
        best = f"greatest(score_{lang}, {best})"
    return (
        f"SELECT doc_id, score_en, score_de, score_es, score_fr, {pred} AS pred_lang "
        f"FROM (SELECT doc_id, {scores} FROM documents)"
    )

# winnowing oracle prefix: k-gram rolling hashes then window minima,
# same md5->int idiom as the minhash signature oracle (dedup.py)
_WINNOW_FP_SQL = (
    "WITH g AS (SELECT doc_id, "
    f"list_transform(generate_series(1, greatest(length(text) - {WINNOW_K - 1}, 1)), "
    f"i -> CAST(concat('0x', substr(md5(substr(text, i, {WINNOW_K})), 1, 15)) AS BIGINT) "
    "% 4294967296) AS grams FROM documents), "
    "f AS (SELECT doc_id, list_distinct(list_transform("
    f"generate_series(1, greatest(len(grams) - {WINNOW_W - 1}, 1)), "
    f"j -> list_aggregate(list_slice(grams, j, j + {WINNOW_W - 1}), 'min'))) AS fps FROM g)"
)



def _span_clean_oracle(n: int = 8, min_df: int = 2) -> str:
    """DuckDB twin of :func:`dedup_span_clean` — same gram keys, same
    covered-index union, same filter-indices-then-index rebuild.
    Tokens coalesce to [] exactly like the Spark side, so a NULL-text
    document yields (0, 0, '') in both engines instead of a NULL
    n_tokens poisoning the value-hash (ADVICE r6)."""
    return (
        f"WITH t AS (SELECT doc_id, COALESCE({_TOKS}, []) AS tk "
        "FROM documents), "
        "pos AS (SELECT doc_id, tk, "
        f"  unnest(range(1, len(tk) - {n - 1} + 1)) AS i "
        f"  FROM t WHERE len(tk) >= {n}), "
        "g AS (SELECT doc_id, i, "
        f"  array_to_string(tk[i:i+{n - 1}], ' ') AS gram FROM pos), "
        "dfc AS (SELECT gram FROM g GROUP BY gram "
        f"  HAVING count(DISTINCT doc_id) >= {min_df}), "
        "cov AS (SELECT g.doc_id, "
        f"  unnest(range(g.i, g.i + {n})) AS tok_idx "
        "  FROM g JOIN dfc ON g.gram = dfc.gram), "
        "rmv AS (SELECT doc_id, list(DISTINCT tok_idx) AS rm FROM cov "
        "  GROUP BY doc_id) "
        "SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens, "
        "CAST(len(COALESCE(rmv.rm, [])) AS BIGINT) AS n_removed, "
        "COALESCE(array_to_string(list_transform(list_filter("
        "  range(1, len(t.tk) + 1), "
        "  j -> NOT list_contains(COALESCE(rmv.rm, []), j)), "
        "  j -> t.tk[j]), ' '), '') AS clean_text "
        "FROM t LEFT JOIN rmv ON t.doc_id = rmv.doc_id"
    )


def _repeated_ngrams_oracle(n: int = 8, min_df: int = 2) -> str:
    """DuckDB twin of :func:`repeated_ngram_stats` — same whitespace
    tokens, same string gram key, same df>=min_df rule."""
    return (
        f"WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents), "
        "pos AS (SELECT doc_id, tk, "
        f"  unnest(range(1, len(tk) - {n - 1} + 1)) AS i "
        f"  FROM t WHERE len(tk) >= {n}), "
        "g AS (SELECT doc_id, "
        f"  array_to_string(tk[i:i+{n - 1}], ' ') AS gram FROM pos), "
        "dfc AS (SELECT gram FROM g GROUP BY gram "
        f"  HAVING count(DISTINCT doc_id) >= {min_df}), "
        "perdoc AS (SELECT doc_id, count(*) AS n_grams FROM g "
        "  GROUP BY doc_id), "
        "dup AS (SELECT g.doc_id, count(*) AS n_dup FROM g "
        "  JOIN dfc ON g.gram = dfc.gram GROUP BY g.doc_id) "
        "SELECT p.doc_id, CAST(p.n_grams AS BIGINT) AS n_grams, "
        "CAST(COALESCE(d.n_dup, 0) AS BIGINT) AS n_dup_positions, "
        "round(CAST(COALESCE(d.n_dup, 0) AS DOUBLE) "
        "  / CAST(p.n_grams AS DOUBLE), 6) AS dup_fraction "
        "FROM perdoc p LEFT JOIN dup d ON p.doc_id = d.doc_id"
    )

ORACLES = {
    "chunk_documents": (
        # stride = 32 - 4 = 28; starts = range(0, greatest(n-4,1), 28)
        # (range excludes the stop, matching Spark's inclusive
        # sequence(0, n-4-1, 28) — same start set)
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "  FROM documents), "
        "s AS (SELECT doc_id, toks, len(toks) AS n, "
        "  unnest(range(0, greatest(len(toks) - 4, 1), 28)) AS start "
        "  FROM t) "
        "SELECT doc_id, CAST(start / 28 AS INT) AS chunk_id, "
        "CAST(least(32, n - start) AS INT) AS n_tokens, "
        "array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text "
        "FROM s"
    ),
    "text_quality": (
        f"SELECT doc_id, CAST(length(text) AS INT) AS text_len, "
        f"CAST(len({_TOKS}) AS INT) AS n_tokens, "
        f"CAST(len(list_filter({_TOKS}, t -> t IN ({_STOP}))) AS INT) AS n_stopwords, "
        f"round(CAST(length(replace(text, ' ', '')) AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE), 6) AS avg_token_len, "
        f"round(CAST(len(list_filter({_TOKS}, t -> t IN ({_STOP}))) AS DOUBLE) / CAST(len({_TOKS}) AS DOUBLE), 6) AS stopword_ratio "
        "FROM documents"
    ),
    "token_counts": (
        f"SELECT doc_id, CAST(len({_TOKS}) AS INT) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS re_tokens "
        "FROM documents"
    ),
    "token_freq": (
        f"SELECT t.tok AS tok, count(*) AS n FROM documents, "
        f"unnest({_TOKS}) AS t(tok) GROUP BY t.tok HAVING count(*) >= 10"
    ),
    "text_fingerprint": (
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp "
        "FROM documents"
    ),
    "text_winnow_fps": _WINNOW_FP_SQL + " SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM f",
    "text_winnow_matches": (
        _WINNOW_FP_SQL +
        ", e AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM f), "
        "hot AS (SELECT fp FROM e GROUP BY fp HAVING count(*) > 64), "
        "cold AS (SELECT * FROM e WHERE fp NOT IN (SELECT fp FROM hot)) "
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared "
        "FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 8"
    ),
    # incremental ≡ the full-corpus formulation restricted to pairs
    # touching the batch (every shared fp of such a pair is a batch
    # fp, so the fp-pruned incremental path reproduces the full
    # group sizes and counts exactly)
    "text_winnow_matches_inc": (
        _WINNOW_FP_SQL +
        ", e AS (SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM f), "
        "hot AS (SELECT fp FROM e GROUP BY fp HAVING count(*) > 64), "
        "cold AS (SELECT * FROM e WHERE fp NOT IN (SELECT fp FROM hot)) "
        "SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared "
        "FROM cold a JOIN cold b ON a.fp = b.fp AND a.doc_id < b.doc_id "
        "WHERE a.doc_id % 4 = 0 OR b.doc_id % 4 = 0 "
        "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 8"
    ),
    "bpe_train_merges": _bpe_train_sql(),
    "bpe_segment_counts": _bpe_segment_sql(),
    "bpe_pair_stats": (
        f"WITH t AS (SELECT {_TOKS} AS toks FROM documents) "
        "SELECT toks[i] AS first, toks[i + 1] AS second, "
        "count(*) AS n FROM t, "
        "unnest(generate_series(1, len(toks) - 1)) AS g(i) "
        "WHERE len(toks) >= 2 "
        "GROUP BY 1, 2 HAVING count(*) >= 2"
    ),
    # avg_lp rounded to 4 on both sides; ln/avg are IEEE doubles in
    # both engines, and the 1e-4 quantization absorbs summation-order
    # ULP drift
    "bigram_logprob": (
        f"WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
        "dp AS (SELECT doc_id, toks[i] AS first, toks[i + 1] AS second "
        "  FROM base, unnest(generate_series(1, len(toks) - 1)) AS g(i) "
        "  WHERE len(toks) >= 2), "
        "bg AS (SELECT first, second, count(*) AS b FROM dp "
        "  GROUP BY 1, 2), "
        "un AS (SELECT first, count(*) AS u FROM dp GROUP BY 1), "
        "vocab AS (SELECT count(DISTINCT tok) AS v FROM base, "
        "  unnest(toks) AS t(tok)), "
        "scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs, "
        "  round(avg(ln((b + 1.0) / (u + 1.0 * v))), 4) AS avg_lp "
        "  FROM dp JOIN bg USING (first, second) JOIN un USING (first), "
        "  vocab GROUP BY doc_id) "
        "SELECT base.doc_id, "
        "CAST(coalesce(scored.n_pairs, 0) AS BIGINT) AS n_pairs, "
        "scored.avg_lp FROM (SELECT DISTINCT doc_id FROM base) base "
        "LEFT JOIN scored ON base.doc_id = scored.doc_id"
    ),
    # incremental ≡ the union-LM formulation restricted to batch docs
    "bigram_logprob_inc": (
        f"WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
        "dp AS (SELECT doc_id, toks[i] AS first, toks[i + 1] AS second "
        "  FROM base, unnest(generate_series(1, len(toks) - 1)) AS g(i) "
        "  WHERE len(toks) >= 2), "
        "bg AS (SELECT first, second, count(*) AS b FROM dp "
        "  GROUP BY 1, 2), "
        "un AS (SELECT first, count(*) AS u FROM dp GROUP BY 1), "
        "vocab AS (SELECT count(DISTINCT tok) AS v FROM base, "
        "  unnest(toks) AS t(tok)), "
        "scored AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs, "
        "  round(avg(ln((b + 1.0) / (u + 1.0 * v))), 4) AS avg_lp "
        "  FROM dp JOIN bg USING (first, second) JOIN un USING (first), "
        "  vocab GROUP BY doc_id) "
        "SELECT base.doc_id, "
        "CAST(coalesce(scored.n_pairs, 0) AS BIGINT) AS n_pairs, "
        "scored.avg_lp FROM (SELECT DISTINCT doc_id FROM base) base "
        "LEFT JOIN scored ON base.doc_id = scored.doc_id "
        "WHERE base.doc_id % 4 = 0"
    ),
    # entropy rounded to 4 on both sides (the bigram_logprob rule);
    # n/n_unique are exact integers, NULL entropy for empty docs
    "doc_entropy": (
        f"WITH base AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
        "c AS (SELECT doc_id, tok, count(*) AS c FROM base, "
        "  unnest(toks) AS t(tok) GROUP BY 1, 2), "
        "agg AS (SELECT doc_id, sum(c) AS n, count(*) AS nd, "
        "  sum(c * ln(c)) AS sl FROM c GROUP BY 1) "
        "SELECT CAST(base.doc_id AS BIGINT) AS doc_id, "
        "CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(agg.nd, 0) AS BIGINT) AS n_unique, "
        "round((ln(agg.n) - agg.sl / agg.n) / ln(2), 4) AS entropy_bits "
        "FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id"
    ),
    "lang_id": _langid_oracle(),
    "lang_id_confusion": (
        f"WITH p AS ({_langid_oracle()}) "
        "SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n "
        "FROM documents d JOIN p USING (doc_id) GROUP BY 1, 2"
    ),
    "repeated_ngrams": _repeated_ngrams_oracle(),
    # incremental ≡ full recompute restricted to the batch (df over
    # history ∪ batch is what the merge reproduces exactly)
    "repeated_ngrams_incremental": (
        f"SELECT * FROM ({_repeated_ngrams_oracle()}) WHERE doc_id % 4 = 0"
    ),
    "dedup_span_clean": _span_clean_oracle(),
    # ceil(p*n) is evaluated in IEEE doubles on both sides (identical
    # literal, identical product, identical ceil) — consistent even at
    # the 0.99*n representation boundary.
    "length_quantiles": (
        "WITH r AS (SELECT lang, n_chars AS v, "
        "  row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn, "
        "  count(*) OVER (PARTITION BY lang) AS n FROM documents) "
        "SELECT lang, CAST(max(n) AS BIGINT) AS n_docs, "
        + ", ".join(
            f"CAST(max(CASE WHEN rn = ceil(n * {p!r}) THEN v END) AS BIGINT) "
            f"AS p{int(p * 100)}"
            for p in QUANTILE_PS
        )
        + " FROM r GROUP BY lang"
    ),
    "clean_text": (
        "WITH c AS (SELECT doc_id, trim(regexp_replace("
        "  regexp_replace(regexp_replace(regexp_replace(lower(text), "
        "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
        "  'https?://[^\\s]+', '<URL>', 'g'), "
        "  '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
        "  '\\s+', ' ', 'g')) AS t FROM documents), "
        f"toks AS (SELECT doc_id, list_filter(string_split(t, ' '), "
        "  x -> x <> '') AS tk FROM c), "
        f"kept AS (SELECT doc_id, tk, list_filter(tk, "
        f"  x -> x NOT IN ({_STOP})) AS kp FROM toks) "
        "SELECT doc_id, array_to_string(kp, ' ') AS clean, "
        "CAST(len(tk) - len(kp) AS INT) AS n_removed FROM kept"
    ),
    "doc_stats": (
        "SELECT lang, source, count(*) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
        "round(avg(CAST(n_chars AS DOUBLE)), 6) AS avg_chars "
        "FROM documents GROUP BY lang, source"
    ),
    "repetition_signals": (
        f"WITH tk AS (SELECT doc_id, {_TOKS} AS l FROM documents), "
        "gs AS (SELECT doc_id, list_transform(generate_series(1, len(l) - 1), "
        "  i -> l[i] || ' ' || l[i + 1]) AS grams FROM tk), "
        "g AS (SELECT doc_id, u.gram AS gram FROM gs, unnest(grams) AS u(gram)), "
        "pg AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY doc_id, gram) "
        "SELECT doc_id, CAST(sum(cnt) AS INT) AS n_grams, "
        "CAST(count(*) AS INT) AS n_distinct, "
        "round(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE), 6) "
        "  AS top_gram_share, "
        "round(CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE) "
        "  / CAST(sum(cnt) AS DOUBLE), 6) AS dup_gram_frac "
        "FROM pg GROUP BY doc_id"
    ),
    "token_freq_per_lang": (
        f"WITH c AS (SELECT lang, t.tok AS tok, count(*) AS n "
        f"FROM documents, unnest({_TOKS}) AS t(tok) "
        "GROUP BY lang, t.tok HAVING count(*) >= 5), "
        "r AS (SELECT lang, tok, n, row_number() OVER (PARTITION BY lang "
        "ORDER BY n DESC, tok) AS rnk FROM c) "
        "SELECT lang, tok, n, CAST(rnk AS INT) AS rnk FROM r WHERE rnk <= 5"
    ),
    "token_freq_histogram": (
        f"WITH fr AS (SELECT t.tok AS tok, count(*) AS f "
        f"FROM documents, unnest({_TOKS}) AS t(tok) "
        "GROUP BY t.tok HAVING count(*) >= 2) "
        "SELECT CAST(f AS BIGINT) AS f, count(*) AS n_tokens "
        "FROM fr GROUP BY f"
    ),
    "quality_percentile": (
        "SELECT doc_id, n_chars, "
        "round(percent_rank() OVER (ORDER BY n_chars, doc_id), 6) "
        "  AS len_pctile FROM documents"
    ),
    "quality_gate": ("WITH tk AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS l FROM documents), gs AS (SELECT doc_id, len(l) AS n_tokens,   len(list_filter(l, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS n_stop,   CASE WHEN len(l) < 2 THEN []   ELSE list_transform(generate_series(1, len(l) - 1), i -> l[i] || ' ' || l[i + 1]) END AS g   FROM tk), e AS (SELECT doc_id, u.x AS x FROM gs, unnest(g) AS u(x)), pg AS (SELECT doc_id, x, count(*) AS c FROM e GROUP BY doc_id, x), rg AS (SELECT doc_id, CAST(max(c) AS INT) AS max_run,   CAST(sum(c) AS INT) AS n_grams FROM pg GROUP BY doc_id), j AS (SELECT gs.doc_id, CAST(n_tokens AS INT) AS n_tokens,   CAST(n_stop AS INT) AS n_stop,   coalesce(n_grams, 0) AS n_grams, coalesce(max_run, 0) AS max_run   FROM gs LEFT JOIN rg ON gs.doc_id = rg.doc_id) SELECT doc_id, n_tokens, n_grams, max_run, n_stop, CAST((CASE WHEN n_tokens < 25 THEN 1 ELSE 0 END)  + (CASE WHEN n_grams > 0 AND max_run * 16 >= n_grams THEN 2 ELSE 0 END)  + (CASE WHEN n_stop * 8 >= n_tokens THEN 4 ELSE 0 END) AS INT) AS fail_mask, ((CASE WHEN n_tokens < 25 THEN 1 ELSE 0 END)  + (CASE WHEN n_grams > 0 AND max_run * 16 >= n_grams THEN 2 ELSE 0 END)  + (CASE WHEN n_stop * 8 >= n_tokens THEN 4 ELSE 0 END)) = 0 AS kept FROM j"),
    "token_commonness": (
        f"WITH inst AS (SELECT doc_id, t.tok AS tok FROM documents, "
        f"unnest({_TOKS}) AS t(tok)), "
        "dfr AS (SELECT tok, count(*) AS df FROM "
        "(SELECT DISTINCT doc_id, tok FROM inst) GROUP BY tok) "
        "SELECT doc_id, CAST(count(*) AS INT) AS n_toks, "
        "CAST(sum(df) AS BIGINT) AS sum_df, "
        "round(CAST(sum(df) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) "
        "  AS mean_df "
        "FROM inst JOIN dfr USING (tok) GROUP BY doc_id"
    ),
    "tfidf_topk": (
        f"WITH inst AS (SELECT doc_id, t.tok AS tok FROM documents, "
        f"unnest({_TOKS}) AS t(tok)), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM inst "
        "GROUP BY doc_id, tok), "
        "dfr AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok), "
        "s AS (SELECT doc_id, tok, tf, df, "
        "CAST((tf * 1000000) // df AS BIGINT) AS score_ppm "
        "FROM tf JOIN dfr USING (tok)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_ppm DESC, tok ASC) AS rnk FROM s) "
        f"SELECT doc_id, tok, tf, df, score_ppm, CAST(rnk AS INT) AS rnk "
        f"FROM r WHERE rnk <= {TFIDF_K}"
    ),
}

# the stats rollup reuses the gate oracle verbatim as a CTE
ORACLES["quality_gate_stats"] = (
    "WITH g AS (" + ORACLES["quality_gate"] + ") "
    "SELECT count(*) AS n_docs, "
    "CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    "CAST(sum(fail_mask & 1) AS BIGINT) AS n_short, "
    "CAST(sum((fail_mask & 2) // 2) AS BIGINT) AS n_repetitive, "
    "CAST(sum((fail_mask & 4) // 4) AS BIGINT) AS n_stopwordy FROM g"
)
