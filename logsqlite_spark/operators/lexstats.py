"""Lexical distribution statistics over the documents corpus:
Zipf-law fit and pointwise-mutual-information pairs.

The corpus-health dashboard a training-data pipeline runs after
token-frequency extraction (``textstats.token_freq``): does the token
distribution LOOK like natural language (Zipf slope ≈ −1; a scraped
corpus full of boilerplate or generated spam bends the curve), and
which token pairs co-occur far above chance (collocations — also the
cheap detector for templated/injected content, whose PMI pairs are
near-deterministic).

Scale design:

- ``token_zipf_slope`` aggregates the CORPUS to one (lang, token)
  frequency row each — map-side-combinable, one shuffle — then ranks
  within language and fits ``ln f = a + s·ln r`` by least squares on
  the top ``top_v`` ranks via ``regr_slope`` (head-rank fitting is
  the standard practice; the tail is where Zipf breaks anyway, and it
  caps the per-lang window at ``top_v``).  The ranking window runs
  over the VOCABULARY (≤ millions of rows per lang at web scale, not
  the corpus) — the same bounded-window argument as
  ``textstats.quality_percentile``'s docstring, with ``top_v`` as the
  hard bound on what the fit consumes.
- ``token_pmi_pairs`` restricts to the ``top_v`` highest-df tokens
  (deterministic tie-break df desc, token asc), so the per-document
  pair explosion is bounded by (tokens ∩ top_v choose 2) and the
  aggregate by top_v² — never vocabulary².  One distinct-postings
  scan, one bounded self-join on doc_id, broadcast df lookups.

Both emit exact integer counts plus one ln/regression over them,
rounded to 6 — the module float rule, IEEE-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from logsqlite_spark.tables import rebalance_for_compute, table

ZIPF_TOP_V = 10_000
PMI_TOP_V = 1_000
PMI_TOP_K = 50
PMI_MIN_PAIR = 5


def token_zipf_slope(docs: DataFrame, top_v: int = ZIPF_TOP_V,
                     text_col: str = "text",
                     lang_col: str = "lang") -> DataFrame:
    """Per-language Zipf fit over whitespace tokens: OLS slope and r²
    of ``ln(freq)`` against ``ln(rank)`` for the ``top_v`` head
    ranks, plus the distinct-vocabulary and token-mass counts the
    slope normalizes over.  Natural text sits near −1; strong
    deviation flags boilerplate floods or synthetic spam."""
    return zipf_slope_from_counts(
        lang_token_counts(docs, text_col, lang_col), top_v)


def token_pmi_pairs(docs: DataFrame, top_v: int = PMI_TOP_V,
                    k: int = PMI_TOP_K, min_pair: int = PMI_MIN_PAIR,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k token pairs by document-level PMI among the ``top_v``
    highest-df tokens: ``pmi = ln(n_ab · N / (df_a · df_b))`` with N
    the doc count — the collocation / template-content detector.
    ``min_pair`` drops rare accidental co-occurrences (PMI's classic
    low-count instability).  Fully deterministic: df ties break on
    token, the final top-k orders on (rounded pmi desc, a, b).

    Plan shape (r16, third cut — measured over two audited ones): the
    per-doc DISTINCT token set is an IN-ROW array
    (``array_distinct(split(...))``), so document-frequency needs no
    (doc_id, tok) distinct exchange and the pairing arm needs no
    ``collect_set`` re-grouping — the two full-data shuffles the
    exploded-postings shape paid.  ``topv`` comes back to the driver
    (≤ ``top_v`` control-plane rows) in the same job that aggregates
    df, then serves the pairing arm as an InSet FILTER inside the
    per-doc array (no semi-join, no checkpoint) and the df lookups as
    a broadcast LocalRelation.  Pairing is groups-to-pairs (sorted
    per-doc token set → in-row combination explode), never a postings
    self-join: per-doc cost bounded by (tokens ∩ top_v)², and the
    only remaining full-data exchange is the (a, b) pair count."""
    # rebalance: the split + in-row distinct + pair explode is the
    # query's whole per-row compute, and a small corpus arrives as
    # one input split — without the spread both arms run single-task
    sets = rebalance_for_compute(docs).select(
        F.col(id_col).alias("doc_id"),
        F.sort_array(F.array_distinct(F.array_remove(
            F.split(F.col(text_col), " "), ""))).alias("ts"))
    dfreq = (sets.select(F.explode("ts").alias("tok"))
             .groupBy("tok")
             .agg(F.count(F.lit(1)).cast("long").alias("df")))
    top_rows = dfreq.orderBy(F.desc("df"), F.col("tok")) \
        .limit(top_v).collect()
    keep = [r["tok"] for r in top_rows]
    topv = docs.sparkSession.createDataFrame(
        top_rows, "tok string, df long")
    pairs = (sets
             .select(F.filter("ts", lambda t: t.isin(keep)).alias("ts"))
             .select(F.explode(F.expr(
                 "flatten(transform(ts, (x, i) -> "
                 "transform(slice(ts, i + 2, size(ts)), "
                 "y -> struct(x AS a, y AS b))))")).alias("pr"))
             .select("pr.a", "pr.b")
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
             .filter(F.col("n_ab") >= min_pair))
    n_docs = docs.select(
        F.count(F.lit(1)).cast("double").alias("__n"))
    da = topv.select(F.col("tok").alias("a"), F.col("df").alias("df_a"))
    db = topv.select(F.col("tok").alias("b"), F.col("df").alias("df_b"))
    scored = (pairs.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
              .crossJoin(F.broadcast(n_docs))
              .select("a", "b", "n_ab", "df_a", "df_b",
                      F.round(F.log(F.col("n_ab").cast("double")
                                    * F.col("__n")
                                    / (F.col("df_a").cast("double")
                                       * F.col("df_b").cast("double"))),
                              6).alias("pmi")))
    return (scored.orderBy(F.desc("pmi"), "a", "b").limit(k)
            .select("a", "b", "n_ab", "df_a", "df_b", "pmi"))


NOVELTY_N = 5


def ngram_novelty(docs: DataFrame, n: int = NOVELTY_N,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-document novelty: the fraction of its distinct character
    n-grams that NO earlier document (by arrival id) contains — the
    curriculum / freshness-decay curve of a growing corpus.  A feed
    that keeps re-crawling the same content shows novelty collapsing
    toward 0; a doc at ~1.0 is genuinely new material.

    One distinct-postings scan, a ``min(doc_id)`` per gram (the
    first-occurrence index — map-side-combinable, the vocabulary is
    the shuffle, never the corpus), joined back to the postings and
    reduced per document.  Exact integers + one division, rounded 6.
    """
    sh = F.explode(F.expr(
        "transform(sequence(1, greatest(length({c}) - {m}, 1)), "
        "i -> substring({c}, i, {n}))".format(c=text_col, m=n - 1, n=n)
    )).alias("g")
    post = (docs.select(F.col(id_col).alias("doc_id"), sh)
            .filter(F.col("g") != "").distinct())
    first = post.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (post.join(first, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).cast("long").alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    F.round(F.col("n_novel").cast("double")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("novelty")))


def ngram_first_seen(docs: DataFrame, n: int = NOVELTY_N,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """The novelty report's sufficient statistic: ``(g, first_doc)``
    — min(doc_id) per distinct character n-gram.  Mergeable by MIN
    (associative), so it is the incremental/streaming state for
    novelty monitoring: vocabulary-sized, never corpus-sized."""
    sh = F.explode(F.expr(
        "transform(sequence(1, greatest(length({c}) - {m}, 1)), "
        "i -> substring({c}, i, {n}))".format(c=text_col, m=n - 1, n=n)
    )).alias("g")
    return (docs.select(F.col(id_col).alias("doc_id"), sh)
            .filter(F.col("g") != "").distinct()
            .groupBy("g").agg(F.min("doc_id").alias("first_doc")))


def ngram_novelty_incremental(new_docs: DataFrame,
                              history_first_seen: DataFrame,
                              n: int = NOVELTY_N,
                              text_col: str = "text",
                              id_col: str = "doc_id") -> DataFrame:
    """Per-document novelty for an incoming batch served from the
    at-rest :func:`ngram_first_seen` state — the 100 TB shape
    (VERDICT r10 #8: ``doc_ngram_novelty``'s dedicated full-corpus
    scan was the heaviest linear constant in the r10 tier; a batch's
    report needs only the batch's postings plus a vocabulary-sized
    lookup).

    Exact for ANY corpus split: min(doc_id) over the union
    decomposes as min(history min, batch min) per gram, and an
    at-rest document's novelty never changes when later documents
    arrive (first occurrences are stable) — so
    ``novelty(hist) ∪ inc(batch, first_seen(hist))`` over an id-prefix
    split reproduces the one-shot report row-identically
    (pytest-pinned; the registry twin shares the one-shot oracle
    verbatim).

    Scale: only the batch is tokenized; the history state joins in
    pruned to the batch's gram set via a broadcast left-semi (the
    winnow-incremental pattern), so the at-rest side contributes a
    semi-joined columnar scan, never a shuffle of the vocabulary.
    """
    sh = F.explode(F.expr(
        "transform(sequence(1, greatest(length({c}) - {m}, 1)), "
        "i -> substring({c}, i, {n}))".format(c=text_col, m=n - 1, n=n)
    )).alias("g")
    post = (new_docs.select(F.col(id_col).alias("doc_id"), sh)
            .filter(F.col("g") != "").distinct())
    bfirst = post.groupBy("g").agg(F.min("doc_id").alias("__bf"))
    hist = (history_first_seen
            .select("g", F.col("first_doc").alias("__hf"))
            .join(F.broadcast(bfirst.select("g")), "g", "leftsemi"))
    first = (bfirst.join(hist, "g", "left")
             .select("g", F.least(
                 F.col("__bf"),
                 F.coalesce("__hf", F.col("__bf"))).alias("first_doc")))
    return (post.join(first, "g")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).cast("long").alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    F.round(F.col("n_novel").cast("double")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("novelty")))


def ngram_novelty_from_state(docs: DataFrame,
                             first_seen: DataFrame,
                             n: int = NOVELTY_N,
                             text_col: str = "text",
                             id_col: str = "doc_id") -> DataFrame:
    """The per-document novelty report served from a MAINTAINED
    ``(g, first_doc)`` state table (``ngram_first_seen`` /
    ``streaming.partials.first_seen_sink``) instead of re-deriving
    first occurrences from a full corpus scan — the 100 TB serving
    shape for ``corpus_report``: the docs are tokenized, but the
    corpus-wide min-aggregation is replaced by a join against the
    vocabulary-sized state.  When ``first_seen`` covers every doc in
    ``docs`` (it was built over a corpus ⊇ docs) the output is
    row-identical to ``ngram_novelty(docs)`` when docs IS that corpus
    (pytest-pinned).  A LAGGING snapshot (docs ingested after the
    last first_seen batch) degrades safely: grams absent from the
    state are NOVEL by definition — left-join + coalesce(first_doc,
    doc_id) keeps them in n_grams and scores them 1.0, instead of the
    inner join silently dropping them (and, for a doc whose grams are
    all unseen, dropping the doc from the report entirely).
    """
    sh = F.explode(F.expr(
        "transform(sequence(1, greatest(length({c}) - {m}, 1)), "
        "i -> substring({c}, i, {n}))".format(c=text_col, m=n - 1, n=n)
    )).alias("g")
    post = (docs.select(F.col(id_col).alias("doc_id"), sh)
            .filter(F.col("g") != "").distinct())
    first_seen = first_seen.withColumnRenamed("first_doc", "__fd")
    return (post.join(first_seen, "g", "left")
            .withColumn("first_doc", F.coalesce("__fd", F.col("doc_id")))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).cast("long").alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    F.round(F.col("n_novel").cast("double")
                            / F.col("n_grams").cast("double"), 6)
                    .alias("novelty")))


VOCAB_CHECKPOINTS = 10


def vocab_growth(docs: DataFrame, k: int = VOCAB_CHECKPOINTS,
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Heaps-law curve: cumulative distinct vocabulary at ``k``
    arrival checkpoints (doc_id deciles) plus the fitted growth
    exponent ``heaps_beta`` (OLS of ln vocab vs ln token mass —
    natural corpora sit at β ≈ 0.4-0.6; a feed of re-crawled or
    templated content flattens the curve, synthetic token soup pushes
    it toward 1).  The X11 corpus-health companion to the Zipf fit.

    Scale shape: ONE corpus scan builds per-doc token counts (for the
    cumulative doc/mass columns) and ONE vocabulary-sized aggregate
    over the word first-occurrence index (min(doc_id) per token — the
    same sufficient statistic family as :func:`ngram_first_seen`);
    each checkpoint is a conditional sum inside those two aggregates,
    so the checkpoint count multiplies single-row agg columns, never
    rows.  Everything after the two aggregations is control-plane
    (k rows).  Exact integers + one regression, rounded 6.
    """
    max_id = int(docs.agg(F.max(F.col(id_col))).collect()[0][0])
    cps = [(i, max_id * i // k) for i in range(1, k + 1)]
    tok_arr = F.filter(F.split(F.col(text_col), " "),
                       lambda x: x != "")
    per_doc = docs.select(F.col(id_col).alias("doc_id"),
                          F.size(tok_arr).cast("long").alias("ntok"))
    doc_aggs = per_doc.agg(*(
        [F.sum(F.when(F.col("doc_id") <= cp, 1).otherwise(0))
         .cast("long").alias(f"nd{i}") for i, cp in cps]
        + [F.sum(F.when(F.col("doc_id") <= cp, F.col("ntok"))
                 .otherwise(0)).cast("long").alias(f"ms{i}")
           for i, cp in cps]))
    first = (docs.select(F.col(id_col).alias("doc_id"),
                         F.explode(F.split(F.col(text_col), " "))
                         .alias("tok"))
             .filter(F.col("tok") != "")
             .groupBy("tok").agg(F.min("doc_id").alias("fd")))
    voc_aggs = first.agg(*[
        F.sum(F.when(F.col("fd") <= cp, 1).otherwise(0))
        .cast("long").alias(f"vc{i}") for i, cp in cps])
    # one row, 3k columns — two consumers below (the checkpoint rule:
    # lazily it would re-run BOTH corpus aggregates per consumer)
    wide = doc_aggs.crossJoin(voc_aggs).localCheckpoint(eager=True)
    rows = wide.select(F.explode(F.array(*[
        F.struct(F.lit(i).cast("long").alias("ck"),
                 F.lit(cp).cast("long").alias("cp"),
                 F.col(f"nd{i}").alias("n_docs"),
                 F.col(f"ms{i}").alias("token_mass"),
                 F.col(f"vc{i}").alias("vocab"))
        for i, cp in cps])).alias("r")).select("r.*")
    beta = rows.agg(F.round(F.regr_slope(
        F.log(F.col("vocab").cast("double")),
        F.log(F.col("token_mass").cast("double"))), 6).alias("__b"))
    return (rows.crossJoin(F.broadcast(beta))
            .select("ck", "cp", "n_docs", "token_mass", "vocab",
                    F.col("__b").alias("heaps_beta")))


# ---------------------------------------------------------------------------
# registry wiring

def _q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_zipf_slope(table(spark, sf_dir, "documents"))


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_pmi_pairs(table(spark, sf_dir, "documents"))


def _q_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_novelty(table(spark, sf_dir, "documents"))


def lang_token_counts(docs: DataFrame, text_col: str = "text",
                      lang_col: str = "lang") -> DataFrame:
    """The Zipf fit's sufficient statistics — exact (lang, tok, f)
    counts, mergeable by associative sum (the ngram-partials idiom):
    the incremental/streaming state for lexical monitoring."""
    return (docs.select(F.col(lang_col).alias("lang"),
                        F.explode(F.split(F.col(text_col), " "))
                        .alias("tok"))
            .filter(F.col("tok") != "")
            .groupBy("lang", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("f")))


def zipf_slope_from_counts(counts: DataFrame,
                           top_v: int = ZIPF_TOP_V) -> DataFrame:
    """The Zipf report served from (possibly merged) token counts —
    identical math to :func:`token_zipf_slope` from the ranking down."""
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.col("tok"))
    head = (counts.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= top_v))
    lf, lr = F.log(F.col("f").cast("double")), \
        F.log(F.col("r").cast("double"))
    return (head.groupBy("lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_ranks"),
                 F.sum("f").cast("long").alias("token_mass"),
                 F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
                 F.round(F.regr_r2(lf, lr), 6).alias("r2")))


def _q_zipf_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin: token-count partials from two doc_id-split
    batches merged by exact integer sum — bit-identical to one-shot
    (oracle shared verbatim, the events_value_psi_inc pattern)."""
    docs = table(spark, sf_dir, "documents")
    parts = lang_token_counts(docs.filter(F.col("doc_id") % 2 == 0)) \
        .unionByName(
            lang_token_counts(docs.filter(F.col("doc_id") % 2 == 1)))
    merged = (parts.groupBy("lang", "tok")
              .agg(F.sum("f").cast("long").alias("f")))
    return zipf_slope_from_counts(merged)


def _q_zipf_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin under the driver's oracle: two doc_id-split
    micro-batches fold through ``lex_counts_sink``'s exactly-once
    pointer protocol into a fresh snapshot, and the Zipf report is
    served FROM the snapshot — bit-identical to one-shot (counts
    merge by exact integer sum), oracle shared verbatim."""
    import tempfile

    from logsqlite_spark.streaming.partials import (
        lex_counts_sink, snapshot_lex_counts)

    docs = table(spark, sf_dir, "documents")
    root = tempfile.mkdtemp(prefix="lex-stream-q-")
    sink = lex_counts_sink(root)
    sink(docs.filter(F.col("doc_id") % 2 == 0), 0)
    sink(docs.filter(F.col("doc_id") % 2 == 1), 1)
    return zipf_slope_from_counts(snapshot_lex_counts(spark, root))


def _q_novelty_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental twin over an id-prefix split: the at-rest half's
    one-shot report (unchanged by later arrivals) unioned with the
    batch half served from the history's (g, first_doc) partials —
    row-identical to one-shot, oracle shared verbatim."""
    docs = table(spark, sf_dir, "documents")
    cutoff = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    hist = docs.filter(F.col("doc_id") <= cutoff)
    batch = docs.filter(F.col("doc_id") > cutoff)
    return ngram_novelty(hist).unionByName(
        ngram_novelty_incremental(batch, ngram_first_seen(hist)))


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_growth(table(spark, sf_dir, "documents"))


QUERIES = {
    "token_zipf_slope": _q_zipf,
    "token_pmi_pairs": _q_pmi,
    "doc_ngram_novelty": _q_novelty,
    "token_zipf_slope_inc": _q_zipf_inc,
    "token_zipf_slope_stream": _q_zipf_stream,
    "doc_ngram_novelty_inc": _q_novelty_inc,
    "vocab_growth": _q_vocab_growth,
}

ORACLES = {
    "token_zipf_slope": (
        "WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok "
        "  FROM documents), "
        "f AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS f FROM t "
        "  WHERE tok <> '' GROUP BY 1, 2), "
        "h AS (SELECT lang, f, row_number() OVER "
        "  (PARTITION BY lang ORDER BY f DESC, tok) AS r FROM f) "
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_ranks, "
        "CAST(sum(f) AS BIGINT) AS token_mass, "
        "round(regr_slope(ln(CAST(f AS DOUBLE)), "
        "  ln(CAST(r AS DOUBLE))), 6) AS zipf_slope, "
        "round(regr_r2(ln(CAST(f AS DOUBLE)), "
        "  ln(CAST(r AS DOUBLE))), 6) AS r2 "
        f"FROM h WHERE r <= {ZIPF_TOP_V} GROUP BY lang"
    ),
    "doc_ngram_novelty": (
        "WITH post AS (SELECT DISTINCT doc_id, g FROM (SELECT doc_id, "
        "  unnest(list_transform(generate_series(1, "
        f"    greatest(length(text) - {NOVELTY_N - 1}, 1)), "
        f"    i -> substr(text, i, {NOVELTY_N}))) AS g FROM documents) "
        "  WHERE g <> ''), "
        "f AS (SELECT g, min(doc_id) AS first_doc FROM post GROUP BY g) "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        "CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) "
        "  AS BIGINT) AS n_novel, "
        "round(CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) "
        "  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS novelty "
        "FROM post JOIN f USING (g) GROUP BY doc_id"
    ),
    "token_pmi_pairs": (
        "WITH post AS (SELECT DISTINCT doc_id, tok FROM (SELECT doc_id, "
        "  unnest(string_split(text, ' ')) AS tok FROM documents) "
        "  WHERE tok <> ''), "
        "dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df "
        "  FROM post GROUP BY tok), "
        f"topv AS (SELECT tok, df FROM dfreq "
        f"  ORDER BY df DESC, tok LIMIT {PMI_TOP_V}), "
        "p AS (SELECT post.doc_id, post.tok FROM post "
        "  JOIN topv USING (tok)), "
        "pairs AS (SELECT x.tok AS a, y.tok AS b, "
        "  CAST(count(*) AS BIGINT) AS n_ab "
        "  FROM p x JOIN p y ON x.doc_id = y.doc_id AND x.tok < y.tok "
        f"  GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_PAIR}), "
        "n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents) "
        "SELECT a, b, n_ab, da.df AS df_a, db.df AS df_b, "
        "round(ln(CAST(n_ab AS DOUBLE) * n_docs / "
        "  (CAST(da.df AS DOUBLE) * CAST(db.df AS DOUBLE))), 6) AS pmi "
        "FROM pairs, n "
        "JOIN topv da ON da.tok = a JOIN topv db ON db.tok = b "
        f"ORDER BY pmi DESC, a, b LIMIT {PMI_TOP_K}"
    ),
}

# the inc/stream twins' counts merge by exact integer sum: report is
# bit-identical, oracle shared verbatim
ORACLES["token_zipf_slope_inc"] = ORACLES["token_zipf_slope"]
ORACLES["token_zipf_slope_stream"] = ORACLES["token_zipf_slope"]
# first occurrences are stable under later arrivals and min() merges
# exactly, so the inc twin is row-identical: oracle shared verbatim
ORACLES["doc_ngram_novelty_inc"] = ORACLES["doc_ngram_novelty"]

ORACLES["vocab_growth"] = (
    "WITH mx AS (SELECT max(doc_id) AS m FROM documents), "
    f"cps AS (SELECT k AS ck, (SELECT m FROM mx) * k // "
    f"{VOCAB_CHECKPOINTS} AS cp "
    f"  FROM generate_series(1, {VOCAB_CHECKPOINTS}) t(k)), "
    "toks AS (SELECT doc_id, tok FROM (SELECT doc_id, "
    "  unnest(string_split(text, ' ')) AS tok FROM documents) "
    "  WHERE tok <> ''), "
    "first AS (SELECT tok, min(doc_id) AS fd FROM toks GROUP BY tok), "
    "stats AS (SELECT ck, cp, "
    "  (SELECT CAST(count(*) AS BIGINT) FROM documents d "
    "     WHERE d.doc_id <= cp) AS n_docs, "
    "  (SELECT CAST(count(*) AS BIGINT) FROM toks t "
    "     WHERE t.doc_id <= cp) AS token_mass, "
    "  (SELECT CAST(count(*) AS BIGINT) FROM first f "
    "     WHERE f.fd <= cp) AS vocab "
    "  FROM cps), "
    "beta AS (SELECT round(regr_slope(ln(CAST(vocab AS DOUBLE)), "
    "  ln(CAST(token_mass AS DOUBLE))), 6) AS b FROM stats) "
    "SELECT CAST(ck AS BIGINT) AS ck, CAST(cp AS BIGINT) AS cp, "
    "n_docs, token_mass, vocab, (SELECT b FROM beta) AS heaps_beta "
    "FROM stats"
)
