"""Lexical-statistics tier: Zipf fit and PMI pairs.

The registry queries are value-checked by the DuckDB oracle; here we
pin the SEMANTICS on constructed corpora where the right answer is
computable by hand (or by numpy OLS)."""

from __future__ import annotations

import math

import numpy as np

from logsqlite_spark.operators.lexstats import (
    token_pmi_pairs,
    token_zipf_slope,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(rows)],
        "doc_id long, text string, lang string")


def test_zipf_slope_matches_numpy_ols(spark):
    # token i repeated ceil(100/rank) times -> an exact Zipf corpus
    toks = []
    for rank in range(1, 9):
        toks += [f"w{rank:02d}"] * math.ceil(100 / rank)
    docs = _docs(spark, [" ".join(toks)])
    row = token_zipf_slope(docs).collect()[0]
    freqs = sorted((toks.count(f"w{r:02d}") for r in range(1, 9)),
                   reverse=True)
    lr = np.log(np.arange(1, 9, dtype=float))
    lf = np.log(np.array(freqs, dtype=float))
    slope, _icpt = np.polyfit(lr, lf, 1)
    assert row["n_ranks"] == 8
    assert row["token_mass"] == len(toks)
    assert abs(row["zipf_slope"] - slope) < 1e-6
    assert row["r2"] > 0.99  # near-perfect power law by construction


def test_zipf_top_v_caps_the_fit(spark):
    docs = _docs(spark, ["a a a a b b c d e f g h"])
    full = token_zipf_slope(docs).collect()[0]
    head = token_zipf_slope(docs, top_v=3).collect()[0]
    assert full["n_ranks"] == 8 and head["n_ranks"] == 3
    assert head["token_mass"] == 4 + 2 + 1  # a, b, then 'c' by tie-break


def test_pmi_hand_computed(spark):
    # x and y co-occur in 5/8 docs; x alone in 2; y alone in 1
    rows = (["x y pad"] * 5) + (["x pad pad"] * 2) + ["y pad pad"]
    got = {(r["a"], r["b"]): r for r in
           token_pmi_pairs(_docs(spark, rows), min_pair=1).collect()}
    r = got[("x", "y")]
    assert (r["n_ab"], r["df_a"], r["df_b"]) == (5, 7, 6)
    assert abs(r["pmi"] - round(math.log(5 * 8 / (7 * 6)), 6)) < 1e-9
    # pad co-occurs with everything at chance-ish rates but is present
    assert ("pad", "x") in got or ("x", "pad") in got


def test_pmi_min_pair_and_top_v_bound_output(spark):
    rows = (["x y pad"] * 5) + (["x pad pad"] * 2) + ["y pad pad"]
    docs = _docs(spark, rows)
    assert token_pmi_pairs(docs, min_pair=6).count() == 2  # pad-x 7, pad-y 6
    # top_v=2 keeps only the two highest-df tokens (pad df=8, x df=7)
    only = token_pmi_pairs(docs, top_v=2, min_pair=1).collect()
    assert [(r["a"], r["b"]) for r in only] == [("pad", "x")]


def test_pmi_deterministic_topk_ordering(spark):
    rows = (["x y pad"] * 5) + (["x pad pad"] * 2) + ["y pad pad"]
    out = token_pmi_pairs(_docs(spark, rows), min_pair=1).collect()
    key = [(-r["pmi"], r["a"], r["b"]) for r in out]
    assert key == sorted(key)


def test_ngram_novelty_semantics(spark):
    """The first doc is 100% novel; an exact repeat is 0% novel; a
    doc sharing half its grams lands in between."""
    from logsqlite_spark.operators.lexstats import ngram_novelty

    docs = spark.createDataFrame(
        [(0, "abcdefgh"), (1, "abcdefgh"), (2, "efghijkl"), (3, "zzzzzzz")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in ngram_novelty(docs, n=4).collect()}
    assert got[0]["novelty"] == 1.0 and got[0]["n_grams"] == 5
    assert got[1]["novelty"] == 0.0       # exact repeat of doc 0
    # doc 2's grams: efgh (seen in doc 0) + 4 new -> 4/5
    assert got[2]["n_novel"] == 4 and abs(got[2]["novelty"] - 0.8) < 1e-9
    assert got[3]["novelty"] == 1.0       # n_grams=1: 'zzzz' deduped
    assert got[3]["n_grams"] == 1


def test_ngram_novelty_incremental_equals_one_shot(spark):
    """hist one-shot ∪ inc(batch, first_seen(hist)) reproduces the
    one-shot union report row-identically for an id-prefix split —
    and min-merge makes the BATCH rows exact under any split."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.lexstats import (
        ngram_first_seen,
        ngram_novelty,
        ngram_novelty_incremental,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    cutoff = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    hist = docs.filter(F.col("doc_id") <= cutoff)
    batch = docs.filter(F.col("doc_id") > cutoff)
    got = sorted(map(tuple, ngram_novelty(hist).unionByName(
        ngram_novelty_incremental(batch, ngram_first_seen(hist)))
        .collect()))
    want = sorted(map(tuple, ngram_novelty(docs).collect()))
    assert got == want and len(want) > 0

    # batch rows are exact under a NON-prefix split too (min-merge)
    hist2 = docs.filter(F.col("doc_id") % 3 != 0)
    batch2 = docs.filter(F.col("doc_id") % 3 == 0)
    got2 = sorted(map(tuple, ngram_novelty_incremental(
        batch2, ngram_first_seen(hist2)).collect()))
    want2 = sorted(map(tuple, ngram_novelty(docs).filter(
        F.col("doc_id") % 3 == 0).collect()))
    assert got2 == want2 and len(want2) > 0


def test_ngram_novelty_incremental_history_semi_broadcast(spark):
    """Scale pin: the at-rest first-seen state enters the batch
    report through a BROADCAST LEFT-SEMI on the batch's gram set —
    the vocabulary table is pruned, never shuffled in full, and the
    history text is never re-tokenized."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.lexstats import (
        ngram_first_seen,
        ngram_novelty_incremental,
    )
    from logsqlite_spark.plans import explain_str
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    fs = ngram_first_seen(docs.filter(F.col("doc_id") % 4 != 0))
    plan = explain_str(ngram_novelty_incremental(batch, fs))
    assert "BroadcastHashJoin LeftSemi" in plan, plan


def test_vocab_growth_hand_computed(spark):
    """Two checkpoints over a 4-doc corpus where cumulative vocab and
    mass are countable by hand; beta matches numpy OLS."""
    from logsqlite_spark.operators.lexstats import vocab_growth

    docs = _docs(spark, [
        "a b",          # doc 0: vocab {a,b}, mass 2
        "a c c",        # doc 1: +{c}, mass 3
        "d",            # doc 2: +{d}, mass 1
        "a b d e",      # doc 3: +{e}, mass 4
    ])
    rows = {r["ck"]: r for r in vocab_growth(docs, k=2).collect()}
    # cp_1 = 3*1//2 = 1 (docs 0-1), cp_2 = 3
    assert rows[1]["cp"] == 1 and rows[2]["cp"] == 3
    assert (rows[1]["n_docs"], rows[1]["token_mass"],
            rows[1]["vocab"]) == (2, 5, 3)
    assert (rows[2]["n_docs"], rows[2]["token_mass"],
            rows[2]["vocab"]) == (4, 10, 5)
    lv = np.log([3, 5])
    lm = np.log([5, 10])
    beta = np.polyfit(lm, lv, 1)[0]
    assert abs(rows[1]["heaps_beta"] - round(beta, 6)) < 1e-9
    assert rows[1]["heaps_beta"] == rows[2]["heaps_beta"]


def test_vocab_growth_two_scans_only(spark):
    """The checkpoint count multiplies agg COLUMNS, not scans: the
    plan reads the documents parquet at most twice (per-doc counts +
    the first-occurrence index)."""
    import re as _re

    from logsqlite_spark import registry
    from logsqlite_spark.plans import explain_str

    df = registry.queries()["vocab_growth"](spark, "/root/testdata/sf0.001")
    plan = explain_str(df)
    assert len(_re.findall(r"\(\d+\) Scan parquet", plan)) <= 2, plan


def test_ngram_novelty_from_state_lagging_snapshot_safe(spark):
    """Round-13 ADVICE(medium) regression: a first_seen snapshot that
    LAGS the docs (docs ingested after the last state batch) must not
    silently drop unseen grams — they are novel by definition.  A doc
    whose grams are ALL absent from the state must still appear in
    the report (novelty 1.0), and covered docs keep exact counts."""
    from logsqlite_spark.operators.lexstats import (
        ngram_first_seen,
        ngram_novelty,
        ngram_novelty_from_state,
    )

    docs = _docs(spark, [
        "abcdefghij" * 3,          # doc 0
        "abcdefghij" * 2 + "KLMNO",  # doc 1: shares 0's grams + new
        "zzzzyyyyxxxxwwww",        # doc 2: entirely unseen grams
    ])
    covered = docs.filter("doc_id <= 1")
    state = ngram_first_seen(covered)           # snapshot lags doc 2
    got = {r["doc_id"]: r for r in
           ngram_novelty_from_state(docs, state).collect()}
    full = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert set(got) == {0, 1, 2}, f"doc dropped from report: {set(got)}"
    # covered docs: identical to the full-corpus derivation
    for d in (0, 1):
        assert (got[d]["n_grams"], got[d]["n_novel"]) == \
            (full[d]["n_grams"], full[d]["n_novel"])
    # the lagging doc: all grams kept, all scored novel
    assert got[2]["n_grams"] == full[2]["n_grams"]
    assert got[2]["novelty"] == 1.0
    # covering snapshot ≡ full derivation (the original contract)
    got_all = sorted(map(tuple, ngram_novelty_from_state(
        docs, ngram_first_seen(docs)).collect()))
    assert got_all == sorted(map(tuple, ngram_novelty(docs).collect()))
