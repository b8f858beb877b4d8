"""Dedup operators (X1/X2) with planted duplicates."""

import pytest

from logsqlite_spark.operators.dedup import (
    exact_dedup_groups,
    exact_dedup_kept,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash_dedup,
)

@pytest.fixture()
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different words entirely unrelated text"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")

def test_exact_groups(docs):
    got = {r["keep_id"]: r["dup_count"] for r in exact_dedup_groups(docs).collect()}
    assert got == {0: 3, 2: 1, 3: 1}

def test_exact_kept(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup_kept(docs).collect())
    assert kept == [0, 2, 3]

def test_jaccard_near_dups(docs):
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in jaccard_pairs(docs, threshold=0.5).collect()}
    # exact dups share everything
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 4)] == 1.0
    # near dup: 8 tokens, 7 shared ('the' dedups) => 7/9
    assert (0, 2) in pairs
    assert abs(pairs[(0, 2)] - 7 / 9) < 1e-6
    # unrelated never pairs
    assert not any(3 in p for p in pairs)

def test_jaccard_hot_token_cap(spark):
    # 'stop' is a planted stop-word present in EVERY doc (df=4); the
    # only other overlap between doc 0 and doc 1 is 'shared'.
    rows = [
        (0, "stop shared alpha beta"),
        (1, "stop shared gamma delta"),
        (2, "stop epsilon zeta eta"),
        (3, "stop theta iota kappa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # Uncapped: every pair shares 'stop' (1/7 = .143 for non-(0,1)
    # pairs, 2/6 = .333 for (0,1)), so threshold .14 admits all 6.
    uncapped = {(r["a_id"], r["b_id"]) for r in
                jaccard_pairs(docs, threshold=0.14).collect()}
    assert len(uncapped) == 6  # all C(4,2) pairs meet via 'stop'
    # Capped at df<=3: 'stop' is dropped from the token sets; only the
    # genuine 'shared' overlap remains => exactly (0,1) at 1/5.
    capped = {(r["a_id"], r["b_id"]): r["jaccard"] for r in
              jaccard_pairs(docs, threshold=0.14, max_doc_freq=3).collect()}
    assert set(capped) == {(0, 1)}
    assert abs(capped[(0, 1)] - 1 / 5) < 1e-6
    # Fractional form: cap = floor(0.75 * 4) = 3, same result.
    frac = {(r["a_id"], r["b_id"]) for r in
            jaccard_pairs(docs, threshold=0.14, max_df_frac=0.75).collect()}
    assert frac == {(0, 1)}

def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = {(r["a_id"], r["b_id"])
             for r in minhash_lsh_pairs(spark, docs, threshold=0.5).collect()}
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    assert not any(3 in p for p in pairs)

def test_minhash_signatures_identical_for_dups(docs):
    from logsqlite_spark.operators.dedup import MINHASH_K, minhash_signatures

    sig = {r["doc_id"]: tuple(r[f"m{k}"] for k in range(MINHASH_K))
           for r in minhash_signatures(docs).collect()}
    assert sig[0] == sig[1] == sig[4]
    # near-dup shares most hash mins; unrelated doc shares few
    near = sum(a == b for a, b in zip(sig[0], sig[2]))
    far = sum(a == b for a, b in zip(sig[0], sig[3]))
    assert near > far

def test_minhash_band_pairs_find_planted(docs):
    from logsqlite_spark.operators.dedup import minhash_band_pairs

    pairs = {(r["a_id"], r["b_id"]) for r in minhash_band_pairs(docs).collect()}
    assert {(0, 1), (0, 4), (1, 4)} <= pairs
    assert not any(3 in p for p in pairs)

def test_simhash_band_pairs_find_planted(docs):
    from logsqlite_spark.operators.dedup import simhash_band_pairs

    # 8 bands of 4 bits: pigeonhole guarantees recall for hamming < 8
    # (the planted near-dup sits at distance 6)
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in simhash_band_pairs(docs, max_hamming=7,
                                         n_bands=8).collect()}
    # exact dups are Hamming-0 and must always band-collide
    assert pairs[(0, 1)] == 0 and pairs[(0, 4)] == 0 and pairs[(1, 4)] == 0
    # the near-dup is within the radius; the unrelated doc is not
    assert (0, 2) in pairs and pairs[(0, 2)] > 0
    assert not any(3 in p for p in pairs)

def test_simhash_combo_banding_equals_brute_force(docs):
    # deployment config: 6 blocks, r=3 -> C(6,3)=20 combinatorial
    # bands. Output must equal the brute-force hamming<=3 pair set
    # (combinatorial banding is exact: no false negatives by the
    # pigeonhole-on-blocks argument, collisions removed by the filter)
    from logsqlite_spark.operators.dedup import (simhash_band_pairs,
                                                 simhash_dedup)

    fps = {r["doc_id"]: r["simhash"]
           for r in simhash_dedup(docs, n_bits=60).collect()}
    ids = sorted(fps)
    want = {(a, b): bin(fps[a] ^ fps[b]).count("1")
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if bin(fps[a] ^ fps[b]).count("1") <= 3}
    got = {(r["a_id"], r["b_id"]): r["hamming"]
           for r in simhash_band_pairs(docs, max_hamming=3,
                                       n_bits=60, n_bands=6).collect()}
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 0  # exact dups always found


def test_simhash_identical_texts_same_hash(docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash_dedup(docs).collect()}
    assert got[0] == got[1] == got[4]
    # near-dup hash is close in hamming distance, far doc differs
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(got[0], got[2]) <= ham(got[0], got[3])


def test_shingle_jaccard_catches_word_reorder(spark):
    from logsqlite_spark.operators.dedup import shingle_jaccard_pairs

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta!"),   # char-level edit
        (2, "zeta epsilon delta gamma beta alpha"),    # full reorder
        (3, "completely unrelated words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["a_id"], r["b_id"]): r["jaccard"]
             for r in shingle_jaccard_pairs(docs, threshold=0.5).collect()}
    # one appended char keeps almost all 5-gram shingles
    assert pairs[(0, 1)] > 0.8
    # token jaccard calls 0~2 identical (same token set); shingles don't
    tok = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert tok[(0, 2)] == 1.0
    assert (0, 2) not in pairs or pairs[(0, 2)] < 0.5
    assert not any(3 in p for p in pairs)


def test_shingle_jaccard_df_cap_drops_hot_shingles(spark):
    from logsqlite_spark.operators.dedup import shingle_jaccard_pairs

    # every doc shares the hot prefix "aaaaa"; cap removes it
    rows = [
        (0, "aaaaa bbbbb"),
        (1, "aaaaa ccccc"),
        (2, "aaaaa ddddd"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = shingle_jaccard_pairs(docs, threshold=0.1).collect()
    capped = shingle_jaccard_pairs(docs, threshold=0.1,
                                   max_doc_freq=2).collect()
    assert len(uncapped) > len(capped)


def test_two_stage_dedup_confirms_with_text(spark):
    from logsqlite_spark.operators.dedup import two_stage_dedup

    docs = spark.createDataFrame([
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma epsilon"),   # text near-dup of 0
        (2, "totally different words here"),  # same embedding as 0, other text
    ], "doc_id long, text string")
    emb = spark.createDataFrame([
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.98, 0.02, 0.0, 0.0]),  # embedding says dup; text disagrees
    ], "vec_id long, embedding array<float>")
    got = {(r.a_id, r.b_id) for r in
           two_stage_dedup(docs, emb, cos_threshold=0.9,
                           jac_threshold=0.5, method="exact").collect()}
    # stage 1 emits (0,1),(0,2),(1,2); stage 2 keeps only the true pair
    assert got == {(0, 1)}


def test_connected_components_planted_chain(spark):
    from logsqlite_spark.operators.dedup import (
        cluster_stats, connected_components)

    # chain 1-2, 2-3 plus disjoint 7-9: two components, min-id labels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "a_id long, b_id long")
    comp = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    stats = {r["cluster_id"]: (r["n_members"], r["max_doc_id"])
             for r in cluster_stats(connected_components(pairs)).collect()}
    assert stats == {1: (3, 3), 7: (2, 9)}


def test_connected_components_long_path_converges(spark):
    from logsqlite_spark.operators.dedup import connected_components

    # a 12-node path is the worst case for min propagation (diameter 11)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "a_id long, b_id long")
    comp = connected_components(pairs, max_iter=30).collect()
    assert {r["cluster_id"] for r in comp} == {0}
    assert len(comp) == 13


def test_connected_components_path_graph_logarithmic_rounds(spark):
    """The r17 pointer-jump loop (VERDICT r16 #4): a path graph — the
    adversarial diameter case — must converge in O(log diameter)
    rounds, not O(diameter).  A 41-node path (diameter 40) under the
    plain min-propagation loop needs ~39 rounds and would blow
    max_iter=12 here; label(label) composition per round makes reach
    grow geometrically.  Labels stay the min-reachable-id fixpoint."""
    from logsqlite_spark.operators import dedup as DD

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "a_id long, b_id long")
    comp = DD.connected_components(pairs, max_iter=12).collect()
    assert {r["cluster_id"] for r in comp} == {0}
    assert len(comp) == 41
    # seeded start reaches distance 1; each round propagates one hop
    # then composes labels, so reach ~doubles per round: ceil(log2(40))
    # + slack for the final no-change round
    assert DD._CC_LAST_ROUNDS <= 9, DD._CC_LAST_ROUNDS


def test_connected_components_clique_single_round(spark):
    """The seeded fast path must survive the pointer-jump rewrite: a
    clique (the near-dup common case) converges in ONE loop round —
    the seed labeling already equals the fixpoint."""
    from logsqlite_spark.operators import dedup as DD

    nodes = list(range(5, 11))
    pairs = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b],
        "a_id long, b_id long")
    comp = {r["doc_id"]: r["cluster_id"]
            for r in DD.connected_components(pairs).collect()}
    assert comp == {n: 5 for n in nodes}
    assert DD._CC_LAST_ROUNDS == 1, DD._CC_LAST_ROUNDS


def test_incremental_dedup_drops_exact_and_near_vs_history(spark):
    from logsqlite_spark.operators.dedup import incremental_dedup

    hist = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon"),
        (2, "totally unrelated historical words"),
    ], "doc_id long, text string")
    new = spark.createDataFrame([
        (10, "alpha beta gamma delta epsilon"),       # exact dup of hist 1
        (11, "alpha beta gamma delta zeta"),          # near-dup of hist 1
        (12, "alpha beta gamma delta zeta"),          # exact dup of new 11
        (13, "completely fresh content here indeed"),  # clean
    ], "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  incremental_dedup(new, hist, threshold=0.5).collect())
    # 10 dropped (exact vs history), 12 dropped (exact vs earlier new),
    # 11 dropped (near-dup of history), 13 survives
    assert kept == [13]


def test_incremental_dedup_keeps_all_when_disjoint(spark):
    from logsqlite_spark.operators.dedup import incremental_dedup

    hist = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd")], "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "wwww xxxx yyyy zzzz"), (11, "qqqq rrrr ssss tttt")],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  incremental_dedup(new, hist, threshold=0.5).collect())
    assert kept == [10, 11]


def test_minhash_band_freq_cap_drops_hot_buckets(spark):
    """max_band_freq (round 9): a degenerate bucket — many identical
    docs hashing to one band key — is dropped before any doc list is
    built; distinct near-dup pairs outside the hot bucket survive."""
    from logsqlite_spark.operators.dedup import minhash_band_pairs

    hot = [(i, "the same exact template text repeated everywhere")
           for i in range(20)]
    pair = [(100, "a genuinely different document about spark joins"),
            (101, "a genuinely different document about spark joins")]
    docs = spark.createDataFrame(hot + pair, "doc_id long, text string")

    capped = {(r["a_id"], r["b_id"]) for r in
              minhash_band_pairs(docs, max_band_freq=8).collect()}
    assert capped == {(100, 101)}
    # default (exact) semantics keep the hot bucket's pairs
    full = {(r["a_id"], r["b_id"]) for r in
            minhash_band_pairs(docs).collect()}
    assert (0, 1) in full and (100, 101) in full


def test_minhash_incremental_equals_full_restricted(spark):
    """minhash_band_pairs_incremental(batch, history_bands) must equal
    the full recompute over history ∪ batch restricted to pairs
    touching the batch — bucket membership computed over the union
    exactly (round 9: completes the incremental dedup family)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs,
        minhash_band_pairs_incremental,
        minhash_bands,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    history = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    inc = minhash_band_pairs_incremental(batch, minhash_bands(history))
    full = minhash_band_pairs(docs).filter(
        (F.col("a_id") % 4 == 0) | (F.col("b_id") % 4 == 0))
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_minhash_incremental_cross_within_and_capped(spark):
    """Cross (history x batch) and within-batch pairs surface,
    history-only pairs never do; and the max_band_freq cap counts
    bucket frequency over history ∪ batch (a bucket pushed over the
    cap by history rows is dropped even if the batch alone is small)."""
    from logsqlite_spark.operators.dedup import (
        minhash_band_pairs_incremental,
        minhash_bands,
    )

    dup = "the quick brown fox jumps over the lazy dog once more"
    rows_hist = [(1, dup), (2, dup),
                 (3, "completely unrelated text with nothing in common")]
    rows_batch = [(10, dup), (11, dup)]
    hist = spark.createDataFrame(rows_hist, "doc_id long, text string")
    batch = spark.createDataFrame(rows_batch, "doc_id long, text string")

    out = minhash_band_pairs_incremental(batch, minhash_bands(hist))
    pairs = {(r["a_id"], r["b_id"]) for r in out.collect()}
    assert (1, 2) not in pairs            # history-only: excluded
    assert (10, 11) in pairs              # within-batch
    assert (1, 10) in pairs and (2, 11) in pairs  # cross

    # union df = 4 identical docs per bucket > cap 3, even though the
    # batch contributes only 2 rows: the bucket must drop
    capped = minhash_band_pairs_incremental(
        batch, minhash_bands(hist), max_band_freq=3)
    assert capped.count() == 0


def test_minhash_bands_artifact_built_once(spark):
    """The persisted banded-signature artifact's 100 TB contract: the
    at-rest corpus is shingled/md5-hashed ONCE — later calls serve the
    parquet artifact (counter gate, same as the winnow fps pin)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators import dedup as DD
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") % 4 != 0)
    DD.minhash_bands_artifact(docs).count()   # builds or serves
    before = DD._MINHASH_ARTIFACT_BUILDS
    a = DD.minhash_bands_artifact(docs)
    b = DD.minhash_bands_artifact(docs)
    assert a.count() == b.count() > 0
    assert DD._MINHASH_ARTIFACT_BUILDS == before

    # the artifact serves the same rows the inline computation yields
    inline = DD.minhash_bands(docs)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, inline.collect()))


def test_simhash_incremental_equals_full_restricted(spark):
    """simhash_groups_incremental(batch, history_fps) must equal the
    full groups recompute over history ∪ batch restricted to batch
    docs — rep_id and group_size computed over the union exactly."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        simhash_dedup,
        simhash_dup_groups,
        simhash_groups_incremental,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    history = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    inc = simhash_groups_incremental(
        batch, simhash_dedup(history, n_bits=60))
    full = simhash_dup_groups(docs).filter(F.col("doc_id") % 4 == 0)
    got = sorted(map(tuple, inc.collect()))
    want = sorted(map(tuple, full.collect()))
    assert got == want and len(want) > 0


def test_simhash_incremental_groups_span_history(spark):
    """A batch doc identical to history docs joins their group: rep_id
    is the HISTORY minimum and group_size counts the union; a
    batch-only doc forms its own group of 1."""
    from logsqlite_spark.operators.dedup import (
        simhash_dedup,
        simhash_groups_incremental,
    )

    dup = "the quick brown fox jumps over the lazy dog once more"
    hist = spark.createDataFrame(
        [(1, dup), (2, dup), (3, "completely unrelated text here")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, dup), (11, "another unrelated piece of text")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["rep_id"], r["group_size"])
           for r in simhash_groups_incremental(
               batch, simhash_dedup(hist, n_bits=60)).collect()}
    assert set(out) == {10, 11}          # batch docs only
    assert out[10] == (1, 3)             # joins history group 1,2
    assert out[11] == (11, 1)            # alone


def test_simhash_fps_artifact_built_once(spark):
    """The persisted simhash fingerprint artifact's 100 TB contract:
    the at-rest corpus is token-hashed ONCE (counter gate)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators import dedup as DD
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") % 4 != 0)
    DD.simhash_fps_artifact(docs).count()   # builds or serves
    before = DD._SIMHASH_ARTIFACT_BUILDS
    a = DD.simhash_fps_artifact(docs)
    b = DD.simhash_fps_artifact(docs)
    assert a.count() == b.count() > 0
    assert DD._SIMHASH_ARTIFACT_BUILDS == before

    inline = DD.simhash_dedup(docs, n_bits=60)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, inline.collect()))


def test_incremental_indexed_equals_original(spark):
    """incremental_dedup_indexed(batch, DedupIndex(history)) must be
    row-identical to incremental_dedup(batch, history) — the index is
    a storage change, not a semantics change (round 9: closes the last
    per-batch-O(corpus) incremental path)."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        dedup_index_tables,
        incremental_dedup,
        incremental_dedup_indexed,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    got = sorted(map(tuple, incremental_dedup_indexed(
        new, dedup_index_tables(hist)).collect()))
    want = sorted(map(tuple, incremental_dedup(new, hist).collect()))
    assert got == want and len(want) > 0


def test_incremental_indexed_equals_original_capped(spark):
    """The absolute df cap (max_df — the 100 TB deployment knob; a
    token with df ∝ corpus under frac·n is O(corpus) matched postings
    per batch without it) must keep the twins row-identical, and must
    actually bind: a tight cap changes the result vs uncapped."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        dedup_index_tables,
        incremental_dedup,
        incremental_dedup_indexed,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    idx = dedup_index_tables(hist)
    uncapped = sorted(map(tuple, incremental_dedup_indexed(
        new, idx).collect()))
    for cap in (3, 16):
        got = sorted(map(tuple, incremental_dedup_indexed(
            new, idx, max_df=cap).collect()))
        want = sorted(map(tuple, incremental_dedup(
            new, hist, max_df=cap).collect()))
        assert got == want and len(want) > 0
    # the tightest cap must bind on this corpus — otherwise the knob
    # was a no-op and the pin vacuous.  (Not monotone in either
    # direction: dropping hot tokens shrinks SIZES too, which can push
    # a surviving pair's jaccard over the threshold.)
    got3 = sorted(map(tuple, incremental_dedup_indexed(
        new, idx, max_df=3).collect()))
    assert got3 != uncapped


def test_incremental_indexed_history_only_hot_token(spark):
    """A hot token present only in history still reduces candidate
    sizes exactly as the full recompute sees it: with char shingles
    (n=1), 'q' is hot (df 3 > floor(0.5*4)=2) and absent from the
    batch, so the candidate's size drops from 3 to 2 and the jaccard
    crosses the 0.45 threshold — the batch doc must be dropped by BOTH
    formulations."""
    from logsqlite_spark.operators.dedup import (
        dedup_index_tables,
        incremental_dedup,
        incremental_dedup_indexed,
    )

    hist = spark.createDataFrame(
        [(1, "qqab"), (2, "qqcd"), (3, "qqce")], "doc_id long, text string")
    batch = spark.createDataFrame([(10, "abxy")], "doc_id long, text string")

    want = sorted(map(tuple, incremental_dedup(
        batch, hist, threshold=0.45, n=1).collect()))
    got = sorted(map(tuple, incremental_dedup_indexed(
        batch, dedup_index_tables(hist, n=1),
        threshold=0.45, n=1).collect()))
    assert got == want == []  # near-dup of doc 1 once 'q' is discounted

    # raising the threshold keeps the doc — and the twins still agree
    want2 = sorted(map(tuple, incremental_dedup(
        batch, hist, threshold=0.6, n=1).collect()))
    got2 = sorted(map(tuple, incremental_dedup_indexed(
        batch, dedup_index_tables(hist, n=1),
        threshold=0.6, n=1).collect()))
    assert got2 == want2 == [(10, "abxy")]


def test_incremental_indexed_exact_stage_and_empty_batch(spark):
    """Stage-1 parity: an exact dup of history is dropped via the
    digests table; a batch that empties out returns no rows."""
    from logsqlite_spark.operators.dedup import (
        dedup_index_tables,
        incremental_dedup_indexed,
    )

    hist = spark.createDataFrame(
        [(1, "some history document text")], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "some history document text")], "doc_id long, text string")
    out = incremental_dedup_indexed(batch, dedup_index_tables(hist))
    assert out.count() == 0


def test_dedup_index_artifact_built_once(spark):
    """The persisted DedupIndex's 100 TB contract: the at-rest corpus
    is tokenized ONCE (counter gate); the served tables equal the
    inline computation."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators import dedup as DD
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") % 5 != 0)
    DD.dedup_index_artifact(docs).stats.count()   # builds or serves
    before = DD._DEDUP_INDEX_BUILDS
    a = DD.dedup_index_artifact(docs)
    b = DD.dedup_index_artifact(docs)
    assert DD._DEDUP_INDEX_BUILDS == before
    inline = DD.dedup_index_tables(docs)
    for fld in ("digests", "inverted", "sizes", "dfreq"):
        assert sorted(map(tuple, getattr(a, fld).collect())) == \
            sorted(map(tuple, getattr(inline, fld).collect()))
    assert a.stats.collect() == inline.stats.collect() \
        == b.stats.collect()


def test_cc_incremental_merges_existing_components(spark):
    """A batch edge bridging two existing components merges them to
    the global min label; untouched components pass through; purely
    new nodes form their own components."""
    from logsqlite_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    old_pairs = spark.createDataFrame(
        [(1, 2), (5, 6), (8, 9)], "a_id long, b_id long")
    hist = connected_components(old_pairs)
    # 10-2 and 10-5 bridges {1,2} and {5,6} through new node 10;
    # (20,21) is a brand-new component; {8,9} untouched
    new_pairs = spark.createDataFrame(
        [(2, 10), (5, 10), (20, 21)], "a_id long, b_id long")
    got = {r["doc_id"]: r["cluster_id"] for r in
           connected_components_incremental(new_pairs, hist).collect()}
    assert got == {1: 1, 2: 1, 5: 1, 6: 1, 10: 1,
                   8: 8, 9: 8, 20: 20, 21: 20}
    # ≡ full recompute over the union
    full = {r["doc_id"]: r["cluster_id"] for r in connected_components(
        old_pairs.unionByName(new_pairs)).collect()}
    assert got == full


def test_cc_incremental_equals_full_on_minhash_pairs(spark):
    """On real data with minhash pairs (whose generation decomposes
    exactly across the batch split), the incremental update equals
    the full recompute over the union pair set."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
        minhash_band_pairs,
        minhash_band_pairs_incremental,
        minhash_bands,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    hist = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    new_pairs = minhash_band_pairs_incremental(batch, minhash_bands(hist))
    got = sorted(map(tuple, connected_components_incremental(
        new_pairs, connected_components(minhash_band_pairs(hist)))
        .collect()))
    want = sorted(map(tuple,
                      connected_components(minhash_band_pairs(docs))
                      .collect()))
    assert got == want and len(want) > 0


def test_cc_merge_delta_bucketed_equals_plain(spark, tmp_path):
    """The bucketed at-rest components layout is a pure storage
    optimization: cc_merge_delta over it yields the same (mapping,
    new_rows) as over the plain table, and the incremental update
    still equals the full recompute."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
        minhash_band_pairs,
        minhash_band_pairs_incremental,
        minhash_bands,
        read_components_bucketed,
        write_components_bucketed,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    hist_docs = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    new_pairs = minhash_band_pairs_incremental(
        batch, minhash_bands(hist_docs))
    plain = connected_components(minhash_band_pairs(hist_docs))
    path = str(tmp_path / "comp")
    write_components_bucketed(plain, path)
    bucketed = read_components_bucketed(spark, path)
    assert "bkt" in bucketed.columns

    got = sorted(map(tuple, connected_components_incremental(
        new_pairs, bucketed).collect()))
    want = sorted(map(tuple,
                      connected_components(minhash_band_pairs(docs))
                      .collect()))
    assert got == want and len(want) > 0


def test_cc_merge_delta_driver_side_equals_distributed(spark):
    """The control-plane fast path (collected label graph + exact
    union-find) returns the same (mapping, new_rows) as the
    distributed min-label loop, and its outputs are local relations
    (no parquet scan, no iterative jobs)."""
    import logsqlite_spark.operators.dedup as _dd
    from logsqlite_spark.operators.dedup import (
        cc_merge_delta,
        connected_components,
    )
    from logsqlite_spark.plans import explain_str

    old_pairs = spark.createDataFrame(
        [(1, 2), (5, 6), (8, 9), (30, 31)], "a_id long, b_id long")
    hist = connected_components(old_pairs).localCheckpoint(eager=True)
    new_pairs = spark.createDataFrame(
        [(2, 10), (5, 10), (20, 21), (9, 30)], "a_id long, b_id long")

    m_fast, nr_fast = cc_merge_delta(new_pairs, hist)
    assert "LocalTableScan" in explain_str(m_fast) \
        or "ExistingRDD" in explain_str(m_fast)
    orig = _dd.CC_EDGE_COLLECT_CAP
    _dd.CC_EDGE_COLLECT_CAP = 0
    try:
        m_slow, nr_slow = cc_merge_delta(new_pairs, hist)
        got_m = sorted(map(tuple, m_slow.collect()))
        got_nr = sorted(map(tuple, nr_slow.collect()))
    finally:
        _dd.CC_EDGE_COLLECT_CAP = orig
    assert sorted(map(tuple, m_fast.collect())) == got_m
    assert sorted(map(tuple, nr_fast.collect())) == got_nr
    assert len(got_m) > 0 and len(got_nr) > 0


def test_cc_incremental_empty_batch_is_identity(spark):
    from logsqlite_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    old_pairs = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    hist = connected_components(old_pairs)
    empty = spark.createDataFrame([], "a_id long, b_id long")
    got = sorted(map(tuple, connected_components_incremental(
        empty, hist).collect()))
    assert got == sorted(map(tuple, hist.collect()))


def test_dedup_decisions_planted(spark):
    """One row per doc with verdict + reason: min-id representative
    kept, other members dropped as near_dup, untouched docs unique."""
    from logsqlite_spark.operators.dedup import dedup_decisions

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words entirely unrelated text"),
         (3, "yet another corpus member with its own content"),
         (4, "and one more document padding the df denominator")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
           for r in dedup_decisions(docs).collect()}
    assert got[0] == (0, True, "representative")
    assert got[1] == (0, False, "near_dup")
    assert got[2] == (None, True, "unique")
    assert got[3] == (None, True, "unique")


def test_decisions_incremental_delta_planted(spark):
    """The delta covers exactly: every batch doc, history members of
    merged components (rep demotion rides the cluster change), and
    previously-unique history docs pulled into clusters; untouched
    components and still-unique history docs emit nothing. Upserting
    the delta over old verdicts ≡ verdicts over the union."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        _verdict_rows,
        connected_components,
        dedup_decisions_incremental,
    )

    old_pairs = spark.createDataFrame(
        [(1, 2), (5, 6), (8, 9)], "a_id long, b_id long")
    hist_docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 5, 6, 8, 9, 15)], "doc_id long")
    hist_comp = connected_components(old_pairs)
    # batch: 10 bridges {1,2}+{5,6}; 20/21 pair up; 30 unique;
    # 15 (history-unique) joins 21
    batch_docs = spark.createDataFrame(
        [(i,) for i in (10, 20, 21, 30)], "doc_id long")
    new_pairs = spark.createDataFrame(
        [(2, 10), (5, 10), (20, 21), (15, 21)], "a_id long, b_id long")
    delta = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
             for r in dedup_decisions_incremental(
                 batch_docs, new_pairs, hist_comp).collect()}
    # {5,6} merged into cluster 1 (rep 5 demoted); {8,9} untouched;
    # 15 pulled in; 30 unique
    assert delta == {
        5: (1, False, "near_dup"),
        6: (1, False, "near_dup"),
        10: (1, False, "near_dup"),
        15: (15, True, "representative"),
        20: (15, False, "near_dup"),
        21: (15, False, "near_dup"),
        30: (None, True, "unique"),
    }
    assert 8 not in delta and 1 not in delta and 2 not in delta

    # upsert ≡ union verdicts
    old = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
           for r in _verdict_rows(
               hist_docs.join(
                   hist_comp.withColumnRenamed("doc_id", "__cd"),
                   hist_docs["doc_id"] == F.col("__cd"), "left")
               .select("doc_id", "cluster_id")).collect()}
    upserted = {**old, **delta}
    union_docs = hist_docs.unionByName(batch_docs)
    union_comp = connected_components(
        old_pairs.unionByName(new_pairs))
    want = {r["doc_id"]: (r["cluster_id"], r["keep"], r["reason"])
            for r in _verdict_rows(
                union_docs.join(
                    union_comp.withColumnRenamed("doc_id", "__cd"),
                    union_docs["doc_id"] == F.col("__cd"), "left")
                .select("doc_id", "cluster_id")).collect()}
    assert upserted == want


def test_edit_confirmed_pairs_semantics(spark):
    """Exact dups confirm at edit_sim 1.0; a candidate pair whose
    normalized edit similarity is below threshold is dropped even
    though minhash banded it together."""
    from logsqlite_spark.operators.dedup import edit_confirmed_pairs

    base = ("pack my box with five dozen liquor jugs while the "
            "wizard quickly jinxed the gnome before they vaporized")
    near = base + "!"                            # 1-char edit
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, near)],
        "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): r["edit_sim"]
           for r in edit_confirmed_pairs(docs, threshold=0.9).collect()}
    assert got[(1, 2)] == 1.0
    # the 1-char append is ~0.99 similar and banded with the originals
    assert got[(1, 3)] > 0.98 and got[(2, 3)] > 0.98

    # tight threshold drops the near pair but keeps the exact one
    strict = {(r["a_id"], r["b_id"])
              for r in edit_confirmed_pairs(docs, threshold=1.0).collect()}
    assert strict == {(1, 2)}


def test_minhash_estimate_semantics(spark, docs):
    """Exact dups estimate 1.0 (all components agree); every banded
    candidate agrees on at least band_size components; the estimate
    tracks true similarity ordering on the planted corpus."""
    from logsqlite_spark.operators.dedup import (
        MINHASH_K,
        minhash_estimate_pairs,
    )

    got = {(r["a_id"], r["b_id"]): (r["n_agree"], r["est_sim"])
           for r in minhash_estimate_pairs(docs).collect()}
    assert got[(0, 1)] == (MINHASH_K, 1.0)
    assert got[(0, 4)] == (MINHASH_K, 1.0)
    assert all(n >= 4 for n, _ in got.values())  # band_size=4 floor
    assert not any(3 in p for p in got)          # unrelated never bands


def test_lsh_precision_planted(spark):
    """Two exact dups (jaccard 1.0) + unrelated docs: every banded
    candidate is the planted pair, so precision is 1.0 and
    mean_jaccard 1.0; with an impostor sharing bands but low true
    jaccard the report must count it as a false candidate."""
    from logsqlite_spark.operators.dedup import (
        lsh_precision,
        minhash_band_pairs,
    )

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different content with other words"),
         (3, "unrelated text about something else entirely")],
        "doc_id long, text string")
    row = lsh_precision(docs, threshold=0.5).collect()[0]
    n_cand = minhash_band_pairs(docs, band_size=8).count()
    assert row["n_candidates"] == n_cand >= 1
    assert row["n_true"] == row["n_candidates"]
    assert row["precision"] == 1.0
    assert row["mean_jaccard"] == 1.0


def test_cross_source_dup_matrix_planted(spark):
    """Planted dups across two sources: the (cc, web) off-diagonal
    cell counts the cross-feed pair, the (web, web) diagonal counts
    the within-feed pair, ordering is lexicographic."""
    from logsqlite_spark.operators.dedup import cross_source_dup_matrix

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog", "web"),
         (1, "the quick brown fox jumps over the lazy dog", "cc"),
         (2, "the quick brown fox jumps over the lazy dog", "web"),
         (3, "totally different content with other words", "cc")],
        "doc_id long, text string, source string")
    got = {(r["source_a"], r["source_b"]): r["n_pairs"]
           for r in cross_source_dup_matrix(docs).collect()}
    assert got[("cc", "web")] == 2   # (0,1) and (1,2)
    assert got[("web", "web")] == 1  # (0,2)
    assert ("cc", "cc") not in got


def test_incremental_banded_planted(spark):
    """Planted scenario for the O(batch) banded path (VERDICT r11
    #1): exact dup of history drops at stage 1, high-similarity near
    dup of history drops at the banded confirm, a batch-internal dup
    pair keeps the earlier id, a unique doc survives."""
    from logsqlite_spark.operators.dedup import incremental_dedup_banded

    base = "the quick brown fox jumps over the lazy dog again and again "
    hist = spark.createDataFrame(
        [(1, base * 4), (3, "history only content nothing like it " * 4)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, base * 4),                       # exact dup of hist 1
         (12, base * 4 + "x"),                 # near dup of hist 1
         (14, "fresh unique content with its own words " * 4),
         (16, "fresh unique content with its own words " * 4 + "y"),
         (18, "completely standalone novel sentence material " * 4)],
        "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in
                  incremental_dedup_banded(new, hist).collect())
    # 10 exact-dropped, 12 near-dropped vs history, 16 near-dropped
    # vs earlier batch doc 14, 14 and 18 survive
    assert kept == [14, 18]


def test_incremental_banded_superset_of_exact_path(spark):
    """Banding can only MISS pairs, never invent (the confirm is
    exact Jaccard) — so on the driver corpus the banded kept set is a
    SUPERSET of the exact uncapped path's kept set at the same
    threshold, and the delta is exactly the banding misses the
    lsh_precision gate prices.  On this corpus the delta is small;
    assert the invariant and bound the miss count rather than pin a
    brittle exact number."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import (
        incremental_dedup,
        incremental_dedup_banded,
    )
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    banded = {r["doc_id"] for r in incremental_dedup_banded(
        new, hist, threshold=0.6).collect()}
    exact = {r["doc_id"] for r in incremental_dedup(
        new, hist, threshold=0.6, max_df_frac=1.0).collect()}
    assert banded >= exact and len(exact) > 0
    misses = banded - exact
    # banding-miss delta: docs whose only near-dup partner fell
    # outside every band bucket.  Documented, not hidden: must stay a
    # small fraction of the batch at the default band config.
    assert len(misses) <= max(2, len(exact) // 10)


def test_doc_digests_artifact_built_once(spark):
    """The persisted digest table's 100 TB contract: the at-rest text
    is md5-hashed ONCE — later calls serve the parquet artifact."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators import dedup as DD
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents") \
        .filter(F.col("doc_id") % 5 != 0)
    DD.doc_digests_artifact(docs).count()   # builds or serves
    before = DD._DOC_DIGESTS_BUILDS
    a = DD.doc_digests_artifact(docs)
    b = DD.doc_digests_artifact(docs)
    assert a.count() == b.count() > 0
    assert DD._DOC_DIGESTS_BUILDS == before
    inline = docs.select(F.col("doc_id").cast("long"),
                         F.md5("text").alias("h"))
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, inline.collect()))


def test_incremental_banded_cap_binds_and_only_loosens(spark):
    """The band-freq cap can only DROP candidate buckets, so the
    capped kept set is a superset of the uncapped one — and cap=2
    must actually bind on the driver corpus (planted exact-dup groups
    exceed it), otherwise the capped registry row is a no-op."""
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.dedup import incremental_dedup_banded
    from logsqlite_spark.tables import table as t

    docs = t(spark, "/root/testdata/sf0.001", "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    uncapped = {r["doc_id"] for r in incremental_dedup_banded(
        new, hist, threshold=0.6).collect()}
    capped = {r["doc_id"] for r in incremental_dedup_banded(
        new, hist, threshold=0.6, max_band_freq=2).collect()}
    assert capped >= uncapped
    assert capped != uncapped  # the cap binds
