"""End-to-end corpus preparation chain."""

from pyspark.sql import functions as F

from logsqlite_spark.operators.pipeline import (
    corpus_stats,
    packed_corpus,
    prepare_corpus,
)


def _fixture(spark):
    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),   # exact dup of 0
        (2, "alpha beta gamma delta epsilon theta"),  # near-dup of 0
        (3, "one two three four five six seven"),     # clean survivor
        (4, "too short"),                             # fails quality gate
    ], "doc_id long, text string")
    emb = spark.createDataFrame([
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # embedding near-dup of 0
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ], "vec_id long, embedding array<float>")
    return docs, emb


def test_chain_drops_dups_shorts_and_neardups(spark):
    docs, emb = _fixture(spark)
    got = {r.doc_id for r in
           prepare_corpus(docs, emb, method="exact").collect()}
    # 1 exact-dup'd away, 2 near-dup'd away, 4 too short
    assert got == {0, 3}


def test_stats_totals_match_corpus(spark):
    docs, emb = _fixture(spark)
    stats = corpus_stats(docs, emb, method="exact").collect()
    assert sum(r.n_docs for r in stats) == 2
    assert sum(r.sum_tokens for r in stats) == 13  # 6 + 7 tokens


def test_packed_corpus_never_mixes_splits(spark):
    docs, emb = _fixture(spark)
    packed = packed_corpus(docs, emb, budget=8, method="exact")
    per_pack = (packed.groupBy("pack_id")
                .agg(F.countDistinct("split").alias("k")).collect())
    assert per_pack and all(r.k == 1 for r in per_pack)


def test_write_prepared_corpus_via_manifest(spark, tmp_path):
    from logsqlite_spark.operators.pipeline import write_prepared_corpus
    from logsqlite_spark.table import ManifestTable
    from logsqlite_spark.tables import table as t

    SF = "/root/testdata/sf0.001"
    out = str(tmp_path / "corpus")
    res = write_prepared_corpus(t(spark, SF, "documents"),
                                t(spark, SF, "embeddings"), out,
                                method="exact")
    assert res["rows"] > 0 and res["files"] > 0
    assert set(res["split_counts"]) <= {"train", "val", "test"}

    # the manifest-resolved reader sees exactly the committed rows,
    # and split partition dirs exist for scan pruning
    mt = ManifestTable(out)
    df = mt.read_df(spark)
    assert df.count() == res["rows"]
    import os
    assert any(d.startswith("split=") for d in os.listdir(out))


def test_corpus_report_composes_certified_pieces(spark):
    """One-call dashboard: every entry matches its standalone operator
    (the registry-certified semantics) on the same corpus."""
    from logsqlite_spark import registry
    from logsqlite_spark.operators.pipeline import corpus_report
    from logsqlite_spark.tables import table

    SF = "/root/testdata/sf0.001"
    rep = corpus_report(table(spark, SF, "documents"))
    assert set(rep) == {"dup_rate_by_source", "zipf", "novelty",
                        "quality_drop_rates", "checks",
                        "vocab_growth", "lsh_precision"}
    qs = registry.queries()
    for key, qname in (("dup_rate_by_source", "dedup_rate_by_source"),
                       ("zipf", "token_zipf_slope"),
                       ("novelty", "doc_ngram_novelty"),
                       ("quality_drop_rates", "quality_gate_stats"),
                       ("checks", "quality_checks_documents"),
                       ("vocab_growth", "vocab_growth"),
                       ("lsh_precision", "dedup_lsh_precision")):
        got = sorted(map(tuple, rep[key].collect()))
        want = sorted(map(tuple, qs[qname](spark, SF).collect()))
        assert got == want, key
