"""Property tests for the winnowing fingerprinter (textstats).

Two layers:
1. Spark == pure-Python model: `winnow_fingerprints` must agree
   exactly with a direct Python implementation of the documented
   algorithm (md5 k-gram hashes, w-window minima, distinct) on
   hypothesis-generated docs — run as ONE Spark job over the whole
   generated corpus, because a job per example would dominate the
   suite's wall time.
2. The MOSS guarantee, on the model: two docs sharing any substring
   of length >= k + w - 1 share at least one fingerprint. With (1)
   holding exactly, the guarantee transfers to the Spark operator.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logsqlite_spark.operators.textstats import (
    WINNOW_K, WINNOW_W, winnow_fingerprints)


def model_fps(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    """The documented algorithm, straight-line Python."""
    n_grams = max(len(text) - (k - 1), 1)
    grams = [
        int(hashlib.md5(text[i:i + k].encode("utf-8")).hexdigest()[:15], 16)
        % 2**32
        for i in range(n_grams)
    ]
    n_win = max(len(grams) - (w - 1), 1)
    return {min(grams[j:j + w]) for j in range(n_win)}


TEXT = st.text(
    alphabet=st.sampled_from(list("ab xyz0éλ")),  # repeats + multibyte
    min_size=0, max_size=60,
)


def test_spark_matches_model_bulk(spark):
    """One Spark job over a deterministic adversarial corpus: empty,
    shorter-than-k, exactly-k, repetitive, multibyte, and long docs."""
    docs = [
        "", "a", "abcdefg", "abcdefgh", "abcdefghi",
        "aaaaaaaaaaaaaaaaaaaaaaaa", "ab" * 40,
        "the quick brown fox jumps over the lazy dog",
        "é" * 20, "naïve café résumé — λcalculus",
        "spark hash join merge sort " * 4,
    ]
    import random

    rng = random.Random(42)
    alpha = "abcdefg "
    docs += ["".join(rng.choice(alpha) for _ in range(rng.randrange(0, 80)))
             for _ in range(50)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got: dict[int, set[int]] = {i: set() for i in range(len(docs))}
    for r in winnow_fingerprints(df).collect():
        got[r["doc_id"]].add(r["fp"])
    for i, t in enumerate(docs):
        assert got[i] == model_fps(t), (i, repr(t))


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=st.lists(TEXT, min_size=1, max_size=12))
def test_spark_matches_model_hypothesis(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got: dict[int, set[int]] = {i: set() for i in range(len(texts))}
    for r in winnow_fingerprints(df).collect():
        got[r["doc_id"]].add(r["fp"])
    for i, t in enumerate(texts):
        assert got[i] == model_fps(t), (i, repr(t))


@settings(max_examples=200, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(prefix_a=TEXT, prefix_b=TEXT, shared=st.text(
    alphabet=st.sampled_from(list("ab xyz0éλ")),
    min_size=WINNOW_K + WINNOW_W - 1, max_size=WINNOW_K + WINNOW_W + 10),
    suffix_a=TEXT, suffix_b=TEXT)
def test_guarantee_shared_run_shares_fp(prefix_a, prefix_b, shared,
                                        suffix_a, suffix_b):
    """MOSS guarantee (pure-Python model; transfers to Spark via the
    equality tests above): a common substring of length k + w - 1
    forces a common window minimum."""
    a = prefix_a + shared + suffix_a
    b = prefix_b + shared + suffix_b
    assert model_fps(a) & model_fps(b)


# ---------------------------------------------------------------------------
# Layer 3 (round 9): the match operators against a pure-Python model —
# winnow_matches and its incremental twin must agree exactly with a
# straight-line implementation of bucket→pairs over model_fps, and the
# incremental result must equal the full model restricted to
# batch-involving pairs (the defining equivalence).

def model_matches(docs: dict[int, str], min_shared: int = 2,
                  cap: int = 64) -> dict[tuple[int, int], int]:
    inv: dict[int, list[int]] = {}
    for d in sorted(docs):
        for fp in model_fps(docs[d]):
            inv.setdefault(fp, []).append(d)
    counts: dict[tuple[int, int], int] = {}
    for ds in inv.values():
        if not (2 <= len(ds) <= cap):
            continue
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    return {p: n for p, n in counts.items() if n >= min_shared}


def _match_corpus():
    import random

    rng = random.Random(7)
    alpha = "abcde "
    base = ["".join(rng.choice(alpha) for _ in range(rng.randrange(12, 60)))
            for _ in range(30)]
    docs = {}
    for i, t in enumerate(base):
        docs[i] = t
    # planted near-dups across the batch boundary (doc_id % 4 == 0 is
    # the batch): shared long substrings guarantee shared fingerprints
    docs[100] = base[1] + " tail one"      # batch (100 % 4 == 0)
    docs[101] = base[1] + " tail two"      # history
    docs[104] = base[2] + base[3]          # batch
    docs[105] = base[2] + " other"         # history
    return docs


def test_matches_agree_with_model(spark):
    from pyspark.sql import functions as F

    from logsqlite_spark.operators.textstats import (
        winnow_fingerprints, winnow_matches, winnow_matches_incremental)

    docs = _match_corpus()
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    want_full = model_matches(docs)
    got_full = {(r["a_id"], r["b_id"]): r["n_shared"]
                for r in winnow_matches(df, min_shared=2).collect()}
    assert got_full == want_full and len(want_full) > 0

    batch = df.filter(F.col("doc_id") % 4 == 0)
    hist = df.filter(F.col("doc_id") % 4 != 0)
    want_inc = {p: n for p, n in want_full.items()
                if p[0] % 4 == 0 or p[1] % 4 == 0}
    got_inc = {(r["a_id"], r["b_id"]): r["n_shared"]
               for r in winnow_matches_incremental(
                   batch, winnow_fingerprints(hist),
                   min_shared=2).collect()}
    assert got_inc == want_inc and len(want_inc) > 0
