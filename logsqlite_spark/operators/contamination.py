"""Benchmark-contamination detection over ``documents``.

Before training on a scraped corpus you must check it against your
eval benchmarks: a document sharing long word-n-grams with a benchmark
item is contaminated and poisons the eval. The standard procedure
(n-gram overlap, as popularized by the GPT-3 and PaLM appendix
decontamination sections) is:

  1. shingle the benchmark items into distinct word n-grams,
  2. shingle each corpus document the same way,
  3. inner-join on the n-gram — a corpus doc meets only benchmarks it
     actually shares an n-gram with,
  4. per (doc, benchmark) count shared n-grams and flag when the
     share of the *benchmark's* n-grams found in the doc crosses a
     threshold.

Scale shape: the benchmark side is tiny (thousands of eval items vs a
100 TB corpus), so its shingle table **broadcasts** — the corpus is
scanned once, shuffled only on the (doc, bench) group key whose
cardinality is bounded by actual collisions, never corpus × bench.
All counts are exact integers; the share is one division, so the
DuckDB oracle agrees bit-for-bit.

Reference parity: none (logsqlite has no corpus ops) — LLM-pipeline
superset surface alongside dedup (X2) and text analysis (X4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logsqlite_spark.tables import table

NGRAM_N = 4
SHARE_THRESHOLD = 0.5


def _shingled(df: DataFrame, id_out: str, text_col: str, id_col: str,
              n: int) -> DataFrame:
    # tokens materialized once per row — inlining the filter(split())
    # into every transform step re-splits the text per n-gram
    grams = (
        f"CASE WHEN size(__t) < {n} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__t, i, {n})))) END"
    )
    toks = f"filter(split({text_col}, ' '), t -> t != '')"
    return (
        df.select(F.col(id_col).cast("long").alias(id_out),
                  F.expr(toks).alias("__t"))
        .select(id_out, F.explode(F.expr(grams)).alias("ngram"))
    )


def contamination_check(docs: DataFrame, bench: DataFrame,
                        n: int = NGRAM_N,
                        threshold: float = SHARE_THRESHOLD,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Per (document, benchmark item) n-gram overlap + contamination flag.

    ``share`` is shared / benchmark n-grams — the fraction of the
    benchmark item recoverable from the document. The flag compares in
    exact integer space (``shared * denominator >= threshold_num *
    bench_ngrams``) so no float boundary can disagree with the oracle.
    """
    # threshold as an exact rational (e.g. 0.5 -> 1/2)
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)

    # docs-side shingling is the CPU-heavy term and never shuffles
    # (the bench side broadcasts) — spread a one-file scan over every
    # core; no-op at scale
    from logsqlite_spark.tables import rebalance_for_compute

    d = _shingled(rebalance_for_compute(docs), "doc_id", text_col, id_col, n)
    b = _shingled(bench, "bench_id", text_col, id_col, n)
    bsizes = b.groupBy("bench_id").agg(
        F.count(F.lit(1)).alias("bench_ngrams"))
    shared = (
        d.join(F.broadcast(b), "ngram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(F.broadcast(bsizes), "bench_id")
        .select(
            "doc_id", "bench_id",
            F.col("shared").cast("long").alias("shared"),
            F.col("bench_ngrams").cast("long").alias("bench_ngrams"),
            F.round(F.col("shared").cast("double")
                    / F.col("bench_ngrams").cast("double"), 6).alias("share"),
            (F.col("shared") * F.lit(frac.denominator)
             >= F.lit(frac.numerator) * F.col("bench_ngrams"))
            .alias("contaminated"),
        )
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  n: int = NGRAM_N,
                  threshold: float = SHARE_THRESHOLD,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus minus contaminated documents (LEFT ANTI on the flags)."""
    flagged = (
        contamination_check(docs, bench, n, threshold, text_col, id_col)
        .filter(F.col("contaminated"))
        .select(F.col("doc_id").alias("__bad_id")).distinct()
    )
    return docs.join(flagged, F.col(id_col) == F.col("__bad_id"),
                     "left_anti")


# ---------------------------------------------------------------------------
# registry wiring — the benchmark set is carved deterministically from
# the documents table (every 25th doc) so the driver gate needs no
# extra fixture; a real deployment passes its eval suite instead.

_BENCH_MOD = 25


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    return contamination_check(corpus, bench)


def _q_decontaminate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % _BENCH_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _BENCH_MOD != 0)
    kept = decontaminate(corpus, bench)
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum(F.length("text")).cast("long").alias("kept_chars"),
    )


QUERIES = {
    "contamination_check": _q_contamination,
    "decontaminate_stats": _q_decontaminate_stats,
}

_NGRAMS_SQL = (
    "CASE WHEN len(l) < {n} THEN [] "
    "ELSE list_distinct(list_transform(generate_series(1, len(l) - {m}), "
    "i -> array_to_string(l[i:i+{m}], ' '))) END"
)
# DuckDB slice l[i:i+m] is inclusive of both ends -> n = m+1 tokens


def _shingle_cte(src_filter: str, n: int = NGRAM_N) -> str:
    expr = _NGRAMS_SQL.format(n=n, m=n - 1)
    return (
        "SELECT doc_id, u.ngram AS ngram FROM ("
        "SELECT doc_id, "
        f"{expr} AS gs "
        "FROM (SELECT doc_id, list_filter(string_split(text, ' '), "
        f"t -> t <> '') AS l FROM documents WHERE {src_filter})) "
        ", unnest(gs) AS u(ngram)"
    )


ORACLES = {
    "contamination_check": (
        f"WITH d AS ({_shingle_cte(f'doc_id % {_BENCH_MOD} <> 0')}), "
        f"b AS ({_shingle_cte(f'doc_id % {_BENCH_MOD} = 0')}), "
        "bs AS (SELECT doc_id AS bench_id, count(*) AS bench_ngrams "
        "FROM b GROUP BY doc_id), "
        "sh AS (SELECT d.doc_id AS doc_id, b.doc_id AS bench_id, "
        "count(*) AS shared FROM d JOIN b ON d.ngram = b.ngram "
        "GROUP BY d.doc_id, b.doc_id) "
        "SELECT doc_id, bench_id, CAST(shared AS BIGINT) AS shared, "
        "CAST(bench_ngrams AS BIGINT) AS bench_ngrams, "
        "round(CAST(shared AS DOUBLE) / CAST(bench_ngrams AS DOUBLE), 6) "
        "  AS share, "
        "shared * 2 >= 1 * bench_ngrams AS contaminated "
        "FROM sh JOIN bs USING (bench_id)"
    ),
    "decontaminate_stats": (
        f"WITH d AS ({_shingle_cte(f'doc_id % {_BENCH_MOD} <> 0')}), "
        f"b AS ({_shingle_cte(f'doc_id % {_BENCH_MOD} = 0')}), "
        "bs AS (SELECT doc_id AS bench_id, count(*) AS bench_ngrams "
        "FROM b GROUP BY doc_id), "
        "sh AS (SELECT d.doc_id AS doc_id, b.doc_id AS bench_id, "
        "count(*) AS shared FROM d JOIN b ON d.ngram = b.ngram "
        "GROUP BY d.doc_id, b.doc_id), "
        "bad AS (SELECT DISTINCT doc_id FROM sh JOIN bs USING (bench_id) "
        "WHERE shared * 2 >= bench_ngrams) "
        "SELECT count(*) AS n_kept, "
        "CAST(sum(length(text)) AS BIGINT) AS kept_chars "
        f"FROM documents WHERE doc_id % {_BENCH_MOD} <> 0 "
        "AND doc_id NOT IN (SELECT doc_id FROM bad)"
    ),
}
