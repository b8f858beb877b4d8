"""Property tests for the round-9 incremental operators: hypothesis
folds random edge/doc batches through the incremental APIs and the
result must equal the one-shot recompute over the union — a pure-
Python union-find is the model for components."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EDGE_BATCHES = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.integers(min_value=0, max_value=30))
        .map(lambda p: (min(p), max(p)))
        .filter(lambda p: p[0] != p[1]),
        min_size=0, max_size=8,
    ),
    min_size=1, max_size=3,
)


def _model_components(edges):
    """Union-find with min-label roots."""
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
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {n: find(n) for n in parent}


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=EDGE_BATCHES)
def test_cc_incremental_folds_match_model(spark, batches):
    """Sequentially folding edge batches through
    connected_components_incremental equals the union-find model over
    every edge (and hence the one-shot Spark recompute, separately
    pinned)."""
    from logsqlite_spark.operators.dedup import (
        connected_components_incremental,
    )

    EDGES = "a_id long, b_id long"
    labels = spark.createDataFrame([], "doc_id long, cluster_id long")
    all_edges = []
    for batch in batches:
        all_edges.extend(batch)
        bdf = spark.createDataFrame(batch, EDGES) if batch else \
            spark.createDataFrame([], EDGES)
        labels = connected_components_incremental(bdf, labels)
        # keep the fold cheap: materialize between batches
        labels = labels.localCheckpoint(eager=True)
    got = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    assert got == _model_components(all_edges)


CHAIN = st.lists(
    st.tuples(st.integers(min_value=1, max_value=40),
              st.integers(min_value=0, max_value=39)),
    min_size=0, max_size=25,
)


@settings(max_examples=200, deadline=None)
@given(raw_pairs=CHAIN)
def test_flatten_relabels_matches_naive_resolution(raw_pairs):
    """_flatten_relabels must equal naive follow-the-chain resolution
    on any DECREASING mapping (the only shape the sink produces: a
    merge maps a label to a strictly smaller one, and one old label
    is retired at most once — later batches only remap the target)."""
    from logsqlite_spark.streaming.incremental import _flatten_relabels

    raw = {}
    for a, b in raw_pairs:
        if b < a and a not in raw:
            raw[a] = b

    rows = [{"old": o, "new": n} for o, n in raw.items()]
    flat = _flatten_relabels(rows)

    def naive(x):
        while x in raw:
            x = raw[x]
        return x

    assert set(flat) == set(raw)
    for o in raw:
        assert flat[o] == naive(o)


# ---------------------------------------------------------------------------
# Round 12: banded incremental dedup vs a pure-Python model of the
# SAME semantics (same md5-based minhash coefficients, banding,
# exact-Jaccard confirm, first-arrival victim rule).

_WORDS = ["aa", "bb", "cc", "dd"]
_DOC_TEXT = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6) \
    .map(" ".join)


def _model_minhash_sig(text):
    import hashlib

    P32 = 4294967291
    coeffs = [
        (268435399, 97), (268435367, 193), (268435361, 389),
        (268435353, 769), (268435331, 1543), (268435313, 3079),
        (268435291, 6151), (268435273, 12289),
    ]
    sh = {text[i:i + 5] for i in range(max(len(text) - 4, 1))} - {""}
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % (1 << 32)
          for s in sh]
    return [min((a * h + b) % P32 for h in hs) for a, b in coeffs]


def _model_banded_kept(hist, batch, threshold, band_size=4):
    """hist/batch: list[(doc_id, text)]; returns kept batch ids."""
    import hashlib

    def shingles(t):
        return {t[i:i + 5] for i in range(max(len(t) - 4, 1))} - {""}

    # stage 1: first arrival within batch, anti vs history digests
    hd = {hashlib.md5(t.encode()).hexdigest() for _, t in hist}
    seen, ae = set(), []
    for d, t in sorted(batch):
        h = hashlib.md5(t.encode()).hexdigest()
        if h in seen or h in hd:
            continue
        seen.add(h)
        ae.append((d, t))
    # bands over survivors + all history
    uni = ae + list(hist)
    n_bands = 8 // band_size
    buckets = {}
    for d, t in uni:
        sig = _model_minhash_sig(t)
        for bi in range(n_bands):
            key = (bi, tuple(sig[bi * band_size:(bi + 1) * band_size]))
            buckets.setdefault(key, []).append(d)
    new_ids = {d for d, _ in ae}
    cand = set()
    for ds in buckets.values():
        ds = sorted(set(ds))
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                if a in new_ids or b in new_ids:
                    cand.add((a, b))
    txt = dict(uni)
    flagged = set()
    for a, b in cand:
        sa, sb = shingles(txt[a]), shingles(txt[b])
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= threshold:
            a_new, b_new = a in new_ids, b in new_ids
            flagged.add(b if (a_new and b_new) else (a if a_new else b))
    return sorted(d for d, _ in ae if d not in flagged)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(hist=st.lists(_DOC_TEXT, min_size=0, max_size=5),
       batch=st.lists(_DOC_TEXT, min_size=1, max_size=5),
       threshold=st.sampled_from([0.4, 0.6, 0.9]))
def test_banded_incremental_matches_python_model(spark, hist, batch,
                                                 threshold):
    """incremental_dedup_banded over random tiny corpora equals the
    pure-Python model of its exact semantics — minhash coefficients,
    banding, candidate rule, exact-Jaccard confirm, and the
    first-arrival victim rule all independently re-implemented."""
    from logsqlite_spark.operators.dedup import incremental_dedup_banded

    hrows = [(i, t) for i, t in enumerate(hist)]
    brows = [(100 + i, t) for i, t in enumerate(batch)]
    DOC = "doc_id long, text string"
    hdf = spark.createDataFrame(hrows, DOC) if hrows else \
        spark.createDataFrame([], DOC)
    bdf = spark.createDataFrame(brows, DOC)
    got = sorted(r["doc_id"] for r in incremental_dedup_banded(
        bdf, hdf, threshold=threshold).collect())
    want = _model_banded_kept(hrows, brows, threshold)
    assert got == want
