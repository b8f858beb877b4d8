"""Text analysis operators (X4)."""

import pytest
from pyspark.sql import functions as F

from logsqlite_spark.operators.textstats import (
    doc_stats,
    fingerprint,
    lang_id,
    text_quality,
    token_counts,
    token_frequencies,
)

@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en", "s0", 22),
        (1, "der hund und die katze", "de", "s0", 22),
        (2, "el perro y la gata que", "es", "s1", 22),
        (3, "  spaced   out   text ", "en", "s1", 22),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")

def test_text_quality(docs):
    got = {r["doc_id"]: r for r in text_quality(docs).collect()}
    assert got[0]["n_tokens"] == 6
    assert got[0]["n_stopwords"] == 2  # 'the' twice
    assert abs(got[0]["stopword_ratio"] - 2 / 6) < 1e-6
    assert got[3]["n_tokens"] == 3  # empty tokens filtered

def test_token_counts(docs):
    got = {r["doc_id"]: r for r in token_counts(docs).collect()}
    assert got[0]["ws_tokens"] == 6
    assert got[0]["re_tokens"] == 6
    assert got[3]["ws_tokens"] == 3

def test_token_frequencies(docs):
    got = {r["tok"]: r["n"] for r in token_frequencies(docs, min_count=2).collect()}
    assert got["the"] == 2

def test_fingerprint_normalizes_whitespace(spark, docs):
    extra = spark.createDataFrame(
        [(9, "THE  cat   sat on the MAT", "en", "s9", 20)],
        "doc_id long, text string, lang string, source string, n_chars long")
    fp = {r["doc_id"]: r["fp"] for r in fingerprint(docs.union(extra)).collect()}
    assert fp[0] == fp[9]

def test_lang_id(docs):
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"

def test_doc_stats(docs):
    got = {(r["lang"], r["source"]): r["n_docs"] for r in doc_stats(docs).collect()}
    assert got[("en", "s0")] == 1
    assert got[("en", "s1")] == 1


def test_length_quantiles_exact_discrete(spark):
    from logsqlite_spark.operators.textstats import length_quantiles

    rows = [(i, "x", "en", "s", v) for i, v in
            enumerate([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long")
    got = length_quantiles(docs).collect()[0]
    # discrete percentile: value at row ceil(p*10)
    assert got.n_docs == 10
    assert got.p50 == 50
    assert got.p90 == 90
    assert got.p99 == 100


def test_clean_text_redacts_and_strips(spark):
    from logsqlite_spark.operators.textstats import clean_text

    rows = [
        (0, "Contact me at bob@example.com   or https://x.io/a?b=1 now"),
        (1, "the server at 10.0.0.1 is THE one"),
        (2, "no pii here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_text(docs).collect()}
    assert got[0].clean == "contact me at <EMAIL> or <URL> now"
    assert got[1].clean == "server at <IP> one"  # 'the','is','the' stripped
    assert got[1].n_removed == 3
    assert got[2].clean == "no pii here"
    assert got[2].n_removed == 0


def test_winnow_fingerprints_shared_run_detected(spark):
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints, winnow_matches)

    shared = "this exact boilerplate sentence is long enough to winnow"
    rows = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "other intro " + shared + " closing words"),
        (2, "completely unrelated content with different characters xyz"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fps = {(r["doc_id"], r["fp"])
           for r in winnow_fingerprints(docs).collect()}
    by_doc = {d: {f for dd, f in fps if dd == d} for d in (0, 1, 2)}
    # winnowing guarantee: any shared run of k+w-1 chars shares a
    # fingerprint — docs 0/1 share a long run, doc 2 shares none
    assert by_doc[0] & by_doc[1]
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])

    got = {(r["a_id"], r["b_id"]) for r in
           winnow_matches(docs, min_shared=2, max_doc_freq=64).collect()}
    assert got == {(0, 1)}


def test_winnow_fingerprint_count_sublinear_in_length(spark):
    # ~len/w fingerprints per doc, not ~len: the density guarantee
    from logsqlite_spark.operators.textstats import (
        WINNOW_W, winnow_fingerprints)

    text = " ".join(f"w{i}" for i in range(200))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    n = winnow_fingerprints(docs).count()
    assert n <= 2 * len(text) / WINNOW_W


def test_chunk_documents_coverage_and_zero_shuffle(spark):
    from logsqlite_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(100))),
         (2, "a b c"),             # shorter than one chunk
         (3, " ".join(f"x{i}" for i in range(64)))],  # exactly one
        "doc_id long, text string")
    out = chunk_documents(docs, chunk_tokens=64, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)

    # short doc: one chunk, everything in it
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 64

    # long doc: every token appears; consecutive chunks share exactly
    # `overlap` tokens; no redundant trailing chunk
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    toks = [c["chunk_text"].split(" ") for c in chunks]
    covered = set()
    for t in toks:
        covered.update(t)
    assert covered == {f"t{i}" for i in range(100)}
    for a, b in zip(toks, toks[1:]):
        assert a[-8:] == b[:8]
    assert len(chunks[-1]["chunk_text"].split(" ")) > 8  # adds new toks

    plan = chunk_documents(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_repeated_ngram_stats_planted_duplicates(spark):
    """Lee-et-al substring-dup signal: positions whose token 8-gram
    appears in >= 2 docs are flagged; unique docs measure 0.0."""
    from logsqlite_spark.operators.textstats import repeated_ngram_stats

    shared = "one two three four five six seven eight"  # exactly 8 toks
    rows = [
        (1, shared + " tail1 x1"),
        (2, "head2 " + shared + " tail2"),
        (3, "a b c d e f g h i j"),   # unique 10-token doc
        (4, "short doc"),             # < n tokens -> absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repeated_ngram_stats(docs).collect()}
    assert set(got) == {1, 2, 3}
    # doc1: 3 positions, exactly 1 (the leading 8-gram) duplicated
    assert got[1]["n_grams"] == 3 and got[1]["n_dup_positions"] == 1
    # doc2: 3 positions, the middle one duplicated
    assert got[2]["n_grams"] == 3 and got[2]["n_dup_positions"] == 1
    assert got[3]["n_dup_positions"] == 0
    assert got[3]["dup_fraction"] == 0.0


def test_dedup_span_clean_removes_shared_span(spark):
    """The removal half: tokens covered by a cross-doc 8-gram are cut,
    unique docs pass through verbatim, fully-duplicated docs end empty."""
    from logsqlite_spark.operators.textstats import dedup_span_clean

    shared = "one two three four five six seven eight"
    rows = [
        (1, shared + " tail1 x1"),
        (2, "head2 " + shared + " tail2"),
        (3, "a b c d e f g h i j"),
        (4, shared),                  # nothing but the shared gram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_span_clean(docs).collect()}
    assert got[1]["clean_text"] == "tail1 x1"
    assert got[1]["n_removed"] == 8
    assert got[2]["clean_text"] == "head2 tail2"
    assert got[3]["clean_text"] == "a b c d e f g h i j"
    assert got[3]["n_removed"] == 0
    assert got[4]["clean_text"] == "" and got[4]["n_removed"] == 8


def test_incremental_ngram_stats_equals_batch(spark):
    """VERDICT r6 #7: the incremental path (new batch merged against
    persisted (gram, df) partials) must report EXACTLY what a full
    recompute over history ∪ batch reports for the batch docs —
    including grams duplicated only ACROSS the batch/history split,
    and only WITHIN history (df from partials alone)."""
    from logsqlite_spark.operators.textstats import (
        ngram_df_partials, repeated_ngram_stats,
        repeated_ngram_stats_incremental)

    shared = "one two three four five six seven eight"  # 8 tokens
    hist_rows = [
        (1, shared + " tail1 x1"),
        (2, "a b c d e f g h i j"),
        (3, "p q r s t u v w histonly"),
        (4, "p q r s t u v w histdup"),  # 'p..w'-prefix grams df=2 in history
    ]
    new_rows = [
        (10, "head2 " + shared + " tail2"),   # dup only via history
        (11, "fresh tokens nine ten eleven twelve thirteen fourteen fifteen"),
        (12, "p q r s t u v w batchhit"),     # dup via history pair
        (13, shared + " tail1 x1"),           # exact text seen in history
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")

    inc = {r["doc_id"]: (r["n_grams"], r["n_dup_positions"],
                         r["dup_fraction"])
           for r in repeated_ngram_stats_incremental(
               new, ngram_df_partials(hist)).collect()}
    full = {r["doc_id"]: (r["n_grams"], r["n_dup_positions"],
                          r["dup_fraction"])
            for r in repeated_ngram_stats(hist.unionByName(new)).collect()
            if r["doc_id"] >= 10}
    assert inc == full
    assert inc[10][1] >= 1       # cross-split duplication detected
    assert inc[11][1] == 0       # fresh content untouched

    # two-batch state maintenance: merging batch partials into history
    # partials (sum df per gram) equals recomputing partials over the
    # union — the associativity the persisted snapshot relies on
    from pyspark.sql import functions as F
    merged = (ngram_df_partials(hist).unionByName(ngram_df_partials(new))
              .groupBy("gram").agg(F.sum("df").alias("df")))
    recomputed = ngram_df_partials(hist.unionByName(new))
    assert {(r["gram"], r["df"]) for r in merged.collect()} \
        == {(r["gram"], r["df"]) for r in recomputed.collect()}


# ---------------------------------------------------------------------------
# Incremental winnow matches + persisted fingerprint artifact (VERDICT r8 #4)

def test_winnow_incremental_equals_full_restricted(spark):
    """winnow_matches_incremental(batch, history_fps) must equal the
    full recompute over history ∪ batch restricted to pairs touching
    the batch — group sizes, the df cap, and n_shared all computed
    over the union exactly."""
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints, winnow_matches, winnow_matches_incremental)
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    history = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    inc = winnow_matches_incremental(batch, winnow_fingerprints(history))
    full = winnow_matches(docs).filter(
        (F.col("a_id") % 4 == 0) | (F.col("b_id") % 4 == 0))
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_winnow_incremental_history_only_and_batch_only_pairs(spark):
    """Cross (history x batch) and within-batch pairs surface;
    history-only pairs never do."""
    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints, winnow_matches_incremental)

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows_hist = [(1, shared + " alpha"), (2, shared + " beta"),
                 (3, "completely unrelated text with nothing in common")]
    rows_batch = [(10, shared + " gamma"), (11, shared + " delta")]
    hist = spark.createDataFrame(rows_hist, "doc_id long, text string")
    batch = spark.createDataFrame(rows_batch, "doc_id long, text string")
    out = winnow_matches_incremental(
        batch, winnow_fingerprints(hist), min_shared=2)
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert (1, 2) not in pairs            # history-only: excluded
    assert (10, 11) in pairs              # within-batch
    assert (1, 10) in pairs and (2, 11) in pairs  # cross


def test_winnow_artifact_built_once(spark):
    """The persisted fingerprint artifact's 100 TB contract: the
    at-rest corpus is winnowed ONCE — later calls serve the parquet
    artifact (counter gate, same argument as the SQ scales pin)."""
    from logsqlite_spark.operators import textstats as TS
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") % 4 != 0)
    TS.winnow_fps_artifact(docs).count()   # builds or serves
    before = TS._WINNOW_ARTIFACT_BUILDS
    a = TS.winnow_fps_artifact(docs)
    b = TS.winnow_fps_artifact(docs)
    assert a.count() == b.count() > 0
    assert TS._WINNOW_ARTIFACT_BUILDS == before

    # the artifact serves the same rows the inline computation yields
    inline = TS.winnow_fingerprints(docs)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, inline.collect()))


def test_bpe_pair_stats_position_weighted(spark):
    """Adjacent pairs are position-weighted (every occurrence counts),
    repeated pairs within one doc accumulate, and sub-2-token docs
    contribute nothing."""
    from logsqlite_spark.operators.textstats import bpe_pair_stats

    docs = spark.createDataFrame(
        [(1, "a b a b c"),      # (a,b)x2, (b,a)x1, (b,c)x1
         (2, "a b"),            # (a,b)x1
         (3, "solo"),           # no pairs
         (4, "")],              # no pairs
        "doc_id long, text string")
    got = {(r["first"], r["second"]): r["n"]
           for r in bpe_pair_stats(docs, min_count=1).collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    # min_count drops the tail
    got2 = {(r["first"], r["second"]): r["n"]
            for r in bpe_pair_stats(docs, min_count=2).collect()}
    assert got2 == {("a", "b"): 3}


def test_bigram_logprob_hand_computed(spark):
    """Add-1 smoothed bigram LM on a hand-checkable corpus; sub-2-token
    docs keep a row with n_pairs=0 and NULL score."""
    import math

    from logsqlite_spark.operators.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b"), (3, "x")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_pairs"], r["avg_lp"])
           for r in bigram_logprob(docs).collect()}
    # V=3 ({a,b,x}); U(a)=3; B(a,a)=1, B(a,b)=2
    lp_aa = math.log((1 + 1) / (3 + 3))
    lp_ab = math.log((2 + 1) / (3 + 3))
    assert got[1] == (2, round((lp_aa + lp_ab) / 2, 4))
    assert got[2] == (1, round(lp_ab, 4))
    assert got[3] == (0, None)


def test_bigram_incremental_equals_full_restricted(spark):
    """bigram_logprob_incremental(batch, hist partials) ≡ the union-LM
    recompute restricted to batch docs — union counts and the union
    vocabulary size exactly."""
    from logsqlite_spark.operators.textstats import (
        bigram_lm_artifact,
        bigram_logprob,
        bigram_logprob_incremental,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    bg, un, vocab = bigram_lm_artifact(hist)
    got = sorted(map(tuple, bigram_logprob_incremental(
        batch, bg, un, vocab).collect()))
    want = sorted(map(tuple, bigram_logprob(docs)
                      .filter(F.col("doc_id") % 4 == 0).collect()))
    assert got == want and len(want) > 0


def test_bigram_incremental_batch_only_token_grows_vocab(spark):
    """A token only the batch contains still grows V for smoothing —
    the denominators match the union recompute, hand-checked."""
    import math

    from logsqlite_spark.operators.textstats import (
        bigram_lm_artifact,
        bigram_logprob,
        bigram_logprob_incremental,
    )

    hist = spark.createDataFrame(
        [(1, "a a b"), (2, "a b")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "a b z")], "doc_id long, text string")
    bg, un, vocab = bigram_lm_artifact(hist)
    got = {r["doc_id"]: (r["n_pairs"], r["avg_lp"]) for r in
           bigram_logprob_incremental(batch, bg, un, vocab).collect()}
    # union: V={a,b,z}=3, U(a)=4, U(b)=1, B(a,b)=3, B(b,z)=1
    lp_ab = math.log((3 + 1) / (4 + 3))
    lp_bz = math.log((1 + 1) / (1 + 3))
    assert got[10] == (2, round((lp_ab + lp_bz) / 2, 4))
    full = {r["doc_id"]: (r["n_pairs"], r["avg_lp"]) for r in
            bigram_logprob(hist.unionByName(batch)).collect()}
    assert got[10] == full[10]


def test_tfidf_topk_hand_computed(spark):
    from logsqlite_spark.operators.textstats import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana common common"),
         (3, "cherry common")],
        "doc_id long, text string")
    rows = tfidf_topk(docs, k=2).collect()
    got = {(r["doc_id"], r["rnk"]): (r["tok"], r["tf"], r["df"],
                                     r["score_ppm"]) for r in rows}
    # df: apple=1 banana=2 common=3 cherry=1
    # doc1: apple 2/1=2000000, banana 1/2=500000, common 1/3=333333
    assert got[(1, 1)] == ("apple", 2, 1, 2_000_000)
    assert got[(1, 2)] == ("banana", 1, 2, 500_000)
    # doc2: common 2/3=666666, banana 1/2=500000
    assert got[(2, 1)] == ("common", 2, 3, 666_666)
    assert got[(2, 2)] == ("banana", 1, 2, 500_000)
    # doc3: cherry 1/1=1000000, common 1/3=333333
    assert got[(3, 1)] == ("cherry", 1, 1, 1_000_000)
    assert got[(3, 2)] == ("common", 1, 3, 333_333)
    assert len(rows) == 6


def _ref_bpe(word_freqs, n_merges, min_count=2):
    """Pure-Python reference BPE (Sennrich-style, greedy argmax with
    count-desc then lexicographic tie-break, left-to-right
    non-overlapping replace)."""
    vocab = {w: list(w) + ["</w>"] for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        maxc = max(counts.values())
        if maxc < min_count:
            break
        first, second = min(p for p, c in counts.items() if c == maxc)
        merges.append((rank, first, second, first + second, maxc))
        merged = first + second
        for w, syms in vocab.items():
            out = []
            for s in syms:
                if out and out[-1] == first and s == second:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    from logsqlite_spark.operators.textstats import bpe_segment, bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low lower lower newest newest"),
         (2, "newest newest newest newest widest widest"),
         (3, "widest aaa aaa")],
        "doc_id long, text string")
    wf = {}
    for _, text in [(1, "low low low lower lower newest newest"),
                    (2, "newest newest newest newest widest widest"),
                    (3, "widest aaa aaa")]:
        for w in text.split():
            wf[w] = wf.get(w, 0) + 1
    exp_merges, exp_vocab = _ref_bpe(wf, 10)

    got = [(r["rank"], r["first"], r["second"], r["merged"],
            r["pair_count"])
           for r in bpe_train(docs, n_merges=10).orderBy("rank").collect()]
    assert got == exp_merges

    seg = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
           for r in bpe_segment(docs, merges=exp_merges).collect()}
    def doc_tokens(text):
        ws = text.split()
        return (len(ws), sum(len(exp_vocab[w]) for w in ws))
    assert seg[1] == doc_tokens("low low low lower lower newest newest")
    assert seg[2] == doc_tokens("newest newest newest newest widest widest")
    assert seg[3] == doc_tokens("widest aaa aaa")


def test_bpe_merge_pass_nonoverlapping(spark):
    # 'aaaa' under (a,a) must become [aa, aa, </w>] — left-to-right
    # non-overlap, the classic trap for fold-based implementations
    from logsqlite_spark.operators.textstats import bpe_train

    docs = spark.createDataFrame([(1, "aaaa aaaa")],
                                 "doc_id long, text string")
    rows = bpe_train(docs, n_merges=3).orderBy("rank").collect()
    got = [(r["rank"], r["first"], r["second"], r["merged"],
            r["pair_count"]) for r in rows]
    exp, _ = _ref_bpe({"aaaa": 2}, 3)
    assert got == exp
    # merge 1: (a,a) count 6 — NOT 4: the fold must see aaaa as three
    # overlapping bigram positions weighted by freq 2
    assert got[0][1:] == ("a", "a", "aa", 6)
    # pass 1 must produce [aa, aa, </w>] (non-overlapping replace):
    # the round-2 candidate set is {(aa,aa): 2, (aa,</w>): 2}, and the
    # lexicographic tie-break picks (aa, </w>)
    assert got[1][1:] == ("aa", "</w>", "aa</w>", 2)


def test_bpe_merge_fold_property(spark):
    # the codegen fold must equal the textbook left-to-right
    # non-overlapping replace on adversarial symbol sequences
    # (overlapping runs, pair-at-ends, merged-equals-neighbor)
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F
    from logsqlite_spark.operators.textstats import _merge_pass_expr

    syms_strat = st.lists(st.sampled_from(["a", "b", "ab", "</w>"]),
                          min_size=0, max_size=12)
    pair_strat = st.tuples(st.sampled_from(["a", "b", "ab"]),
                           st.sampled_from(["a", "b", "</w>"]))

    def ref_pass(syms, first, second):
        out = []
        for s in syms:
            if out and out[-1] == first and s == second:
                out[-1] = first + second
            else:
                out.append(s)
        return out

    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(syms_strat, min_size=1, max_size=4), pair_strat)
    def check(words, pair):
        first, second = pair
        df = spark.createDataFrame([(w,) for w in words],
                                   "syms array<string>")
        got = [r["m"] for r in df.select(
            F.expr(_merge_pass_expr("syms", first, second)).alias("m")
        ).collect()]
        assert got == [ref_pass(w, first, second) for w in words]

    check()


def test_doc_entropy_hand_computed(spark):
    """Entropy = (ln n − Σ c·ln(c)/n)/ln 2, hand-checked, plus the
    empty-doc NULL route and the single-token exact-zero route."""
    import math

    from logsqlite_spark.operators.textstats import doc_entropy

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "x"), (3, ""), (4, "a a a a")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_unique"], r["entropy_bits"])
           for r in doc_entropy(docs).collect()}
    # doc 1: two tokens x2 each -> exactly 1 bit
    h1 = round((math.log(4) - (2 * math.log(2) + 2 * math.log(2)) / 4)
               / math.log(2), 4)
    assert got[1] == (4, 2, h1) and h1 == 1.0
    assert got[2] == (1, 1, 0.0)     # single token: zero entropy
    assert got[3] == (0, 0, None)    # empty: routed explicitly
    assert got[4] == (4, 1, 0.0)     # one run of 4: ln cancels exactly


def test_doc_entropy_zero_shuffle(spark):
    """The fold formulation is a pure projection — no Exchange."""
    from logsqlite_spark.operators.textstats import doc_entropy
    from logsqlite_spark.tables import table as t

    df = doc_entropy(t(spark, "/root/testdata/sf0.001", "documents"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
