"""Property tests: packing invariants + shingle Jaccard vs Python model.

Hypothesis hunts the boundary cases a fixture won't: zero-token docs,
exactly-budget docs, oversized docs, empty/short texts, identical
texts. The packer is checked against its *invariants* (every doc
placed once, fills never exceed budget, offsets are prefix sums,
oversized docs isolated and flagged) rather than a replayed model —
the SQL oracle already replays the greedy walk step by step.
"""

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logsqlite_spark.operators.dedup import shingle_jaccard_pairs
from logsqlite_spark.operators.packing import pack_sequences

BUDGET = 16

TOKEN_COUNTS = st.lists(st.integers(min_value=0, max_value=40),
                        min_size=1, max_size=25)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(counts=TOKEN_COUNTS)
def test_packing_invariants(spark, counts):
    rows = [(i, " ".join(["t"] * c)) for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, budget=BUDGET, n_buckets=4).collect()

    # every doc packed exactly once
    assert sorted(r["doc_id"] for r in out) == list(range(len(counts)))

    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for rows_ in by_pack.values():
        # a pack never spans buckets (pack_id embeds the bucket)
        assert len({r["bucket"] for r in rows_}) == 1
        rows_ = sorted(rows_, key=lambda r: r["doc_id"])
        if any(r["truncated"] for r in rows_):
            # oversized doc: flagged, offset 0, and shares its pack
            # only with zero-token docs (which consume no budget —
            # the fill-based own-pack rule ignores empty docs, and the
            # SQL oracle replays exactly that)
            trunc = [r for r in rows_ if r["truncated"]]
            rest = [r for r in rows_ if not r["truncated"]]
            assert len(trunc) == 1
            assert trunc[0]["token_count"] > BUDGET
            assert trunc[0]["offset"] == 0
            assert all(r["token_count"] == 0 for r in rest)
        else:
            fill = 0
            for r in rows_:
                assert r["offset"] == fill
                fill += r["token_count"]
            assert fill <= BUDGET


def _py_shingles(t: str, n: int = 5) -> set[str]:
    # mirror of the SQL expression: positions 1..max(len-n+1, 1),
    # empty shingles dropped
    return {s for s in (t[i:i + n] for i in range(max(len(t) - n + 1, 1)))
            if s != ""}


TEXTS = st.lists(st.text(alphabet="ab ", min_size=0, max_size=24),
                 min_size=2, max_size=6)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_shingle_jaccard_matches_python_model(spark, texts):
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = {(r["a_id"], r["b_id"]): r["jaccard"]
           for r in shingle_jaccard_pairs(docs, threshold=0.0).collect()}

    sh = [_py_shingles(t) for t in texts]
    expected = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if inter:  # inverted-index join only emits pairs sharing a shingle
            expected[(a, b)] = inter / union

    assert set(got) == set(expected)
    for pair, exp in expected.items():
        assert abs(got[pair] - exp) < 1e-6


EDGES = st.lists(
    st.tuples(st.integers(min_value=0, max_value=15),
              st.integers(min_value=0, max_value=15)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=20)


def _py_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(edges=EDGES)
def test_connected_components_matches_union_find(spark, edges):
    from logsqlite_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, "a_id long, b_id long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in connected_components(pairs).collect()}
    assert got == _py_components(edges)


VALUES = st.lists(st.integers(min_value=0, max_value=100_000),
                  min_size=1, max_size=20)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(vals=VALUES)
def test_ewma_matches_python_model_any_partitioning(spark, vals):
    from logsqlite_spark.operators.anomaly import ewma_smooth

    rows = [(1, i, (1_704_067_200 + i) * 1_000_000_000, v / 100)
            for i, v in enumerate(vals)]
    events = spark.createDataFrame(
        rows, "user_id long, event_id long, ts long, value double")
    # many input partitions: the per-key walk must still see rows in
    # (ts, event_id) order regardless of physical layout
    got = {r["event_id"]: r["ewma_c"]
           for r in ewma_smooth(events.repartition(7)).collect()}

    s = None
    expected = {}
    for i, v in enumerate(vals):
        x = float(v)  # cents, exactly what _CENTS quantizes to
        s = x if s is None else (s + x) / 2
        expected[i] = s
    assert got == expected
